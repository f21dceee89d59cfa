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

  /** Salted equi-join for a skewed fact against a dim too large to
    * broadcast: the fact side gets a per-row salt (hash of
    * `saltFrom`, a high-cardinality fact column OUTSIDE the join
    * key), the dim side replicates `replication` ways, and the join
    * runs on (keys..., salt) — so a pathological hot key's rows
    * spread over `replication` reducers instead of funneling into
    * one. Exactly the plain join's rows (each fact row meets each
    * matching dim row exactly once, in the one salt partition it
    * landed in), at the cost of a `replication`× dim shuffle.
    *
    * This is the MANUAL form for when AQE's skew-join split can't
    * see the skew (first-shuffle skew, or stats hidden behind a
    * complex child). Prefer broadcast when the dim fits; prefer AQE
    * when it fires. Inner and left_outer survive salting untouched;
    * other types would need dim-side null handling — rejected. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFrom: String, replication: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(replication > 0, "replication must be positive")
    require(keys.nonEmpty, "saltedJoin needs join keys")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer, got $joinType")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(replication)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(replication - 1L))))
    f.join(d, keys :+ "__salt", joinType).drop("__salt")
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
