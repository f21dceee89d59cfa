package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-stage (salted) aggregates for
  * heavy-hitter keys. Spark's partial aggregation already combines
  * map-side, which covers algebraic aggregates (sum/count/min/max) —
  * but `collect_list`/`collect_set`-style holistic aggregates and
  * high-cardinality-input distincts funnel every row of a hot key to
  * one reducer. Salting splits each key into `salt` subkeys, reduces
  * per subkey, then combines — turning one overloaded reducer into
  * `salt` balanced ones at the cost of a second (tiny) shuffle.
  */
object Skew {

  /** Salted count: exactly count(*) per key, skew-proof. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salt: Int = 32): DataFrame = {
    require(salt > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("n"))
  }

  /** Salted sum of a numeric column per key. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salt: Int = 32): DataFrame = {
    require(salt > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))
  }

  /** Salted exact distinct count per key: stage 1 dedupes
    * (key, value) pairs — THE skew killer: the hot key's values
    * spread over `salt` reducers — stage 2 counts the deduped pairs.
    * (Spark's count_distinct expands internally but keeps the hot
    * key on one reducer for the final distinct.) */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salt: Int = 32): DataFrame = {
    require(salt > 0)
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salt)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(s"n_distinct_$valueCol"))
  }
}
