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
    * (include a unique tiebreaker for determinism).
    *
    * The cap is enforced BEFORE aggregation (row_number over the key
    * window), so no aggregation buffer ever holds more than `maxLen`
    * elements — a slice after collect_list would bound the OUTPUT but
    * still assemble the bot key's unbounded list in memory. The
    * window and the groupBy share the key distribution, so this is
    * still one exchange.
    */
  def ordered(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, maxLen: Int = 1 << 16): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    require(maxLen >= 1)
    val keyWin = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val orderedWin = keyWin.orderBy(orderCols.map(c => col(c).asc): _*)
    val sortStruct = struct((orderCols :+ valueCol).map(col): _*)
    df.withColumn("__rn", row_number().over(orderedWin))
      .withColumn("__n", count(lit(1)).over(keyWin))
      .filter(col("__rn") <= maxLen)
      .groupBy(keyCols.map(col): _*)
      .agg(max("__n").as("n_events"),
        array_sort(collect_list(sortStruct)).as("__sorted"))
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

  /** MATCH_RECOGNIZE-lite: regex over each entity's chronological
    * event-TYPE string. Every event becomes one symbol (the first
    * character of `typeCol` — callers map types to distinct symbols),
    * the per-entity history is assembled by [[ordered]]'s
    * single-exchange shape, and `pattern` runs ONCE per entity as a
    * row-local regex. Output: keyCols + n_events + `history` +
    * `match_text` (the leftmost match, '' when none). Keep the
    * pattern lookaround- and backreference-free and it replays
    * identically on any regex engine (incl. RE2) — same contract as
    * [[Chunking.chunkBySentences]].
    *
    * This trades MATCH_RECOGNIZE's streaming row semantics for a
    * symbol string — exactly right for funnel/journey shapes
    * ("a view converting to purchase with no second view between":
    * `v[^vp]*p`), where the alternative is a self-join chain per
    * pattern step. */
  def matchPattern(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], typeCol: String, pattern: String,
      maxLen: Int = 1 << 16): DataFrame =
    orderedJoined(
      df.withColumn("__sym", substring(col(typeCol), 1, 1)),
      keyCols, orderCols, "__sym", sep = "", maxLen = maxLen)
      .withColumnRenamed("seq", "history")
      .withColumn("match_text", regexp_extract(col("history"), pattern, 0))

  /** First-order transition matrix over each entity's chronological
    * event types: for every consecutive (from → to) pair, the count
    * and the row-normalized transition probability P(to | from) — the
    * Markov-chain view of user journeys ("after a view, 40% click").
    * Counts are exact integers; the probability is one division of
    * exact scalars, so the matrix replays exactly in any engine.
    *
    * Scale shape: one per-entity window pass builds the lead pairs,
    * one map-side-combined aggregate counts them, and the from-margin
    * (|types| rows) joins back broadcast. */
  def transitions(df: DataFrame, entityCol: String,
      orderCols: Seq[String], typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entityCol).orderBy(orderCols.map(col(_).asc): _*)
    val pairs = df
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val margins = pairs.groupBy(col("from_type"))
      .agg(sum("n").as("__m"))
    pairs.join(broadcast(margins), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__m").cast("double"), 6)
          .as("prob"))
  }
}
