package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered per-key sequence construction (beyond-parity; SURVEY.md
  * §7.3#7): turn an event log into one training example per key —
  * the user-trajectory / session-sequence builder behavioral models
  * train on.
  *
  * Shape: ONE shuffle keyed by `keyCols` with partial aggregation;
  * ordering happens inside each assembled row (`array_sort` on
  * (orderCols..., value) structs), not via a global sort. Per-key
  * payload is bounded by `maxLen` — the cap is the scale contract:
  * a key with unbounded activity (a bot) would otherwise build an
  * unbounded row. Truncation keeps the PREFIX in order, and
  * `n_events` reports the true count so truncation is observable.
  */
object Sequences {

  /** One row per key: `n_events` (true count, pre-cap) and `seq` —
    * the first `maxLen` values of `valueCol` ordered by `orderCols`
    * (include a unique tiebreaker for determinism). */
  def ordered(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, maxLen: Int = 1 << 16): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    require(maxLen >= 1)
    val sortStruct = struct((orderCols :+ valueCol).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        slice(array_sort(collect_list(sortStruct)), 1, maxLen).as("__sorted"))
      .withColumn("seq", transform(col("__sorted"), _.getField(valueCol)))
      .drop("__sorted")
  }

  /** [[ordered]] flattened to a delimiter-joined string — the
    * compact, any-engine-comparable form. */
  def orderedJoined(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valueCol: String, sep: String = ">",
      maxLen: Int = 1 << 16): DataFrame =
    ordered(df, keyCols, orderCols, valueCol, maxLen)
      .withColumn("seq", array_join(col("seq"), sep))
}
