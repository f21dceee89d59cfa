package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregates (beyond-parity): keep a
  * per-group STATE table of algebraic aggregate pieces (count, sum,
  * min, max), fold NEW data in by aggregating only the arrival and
  * merging state-with-state, and answer any coarser grouping from
  * state alone. This is how a 100 TB warehouse keeps daily/source
  * rollups current: the corpus is touched once per arrival batch —
  * by the batch-sized aggregate — never rescanned, and the merge
  * itself runs over STATE rows (groups, not data).
  *
  * Only algebraic pieces qualify: counts and sums add, mins and
  * maxes combine, and avg derives as sum/n at read time. Exact
  * distinct does NOT (distincts don't sum) — that is what the
  * mergeable-HLL surface ([[Profiling.vocabularySketched]], pf5) is
  * for; compose the two when a rollup needs both. The defining
  * invariant — merge(state(old), state(new)) == state(old ∪ new),
  * groups present in either side survive — is what the inc1 oracle
  * checks by recomputing from scratch.
  */
object IncrementalAgg {

  private val pieces = Seq("n", "n_v", "sum_v", "min_v", "max_v")

  /** Aggregate `valueCol` into mergeable state per `groupCols`:
    * (n, n_v, sum_v, min_v, max_v). `n` counts rows, `n_v` counts
    * non-null values (the AVG denominator), mirroring SQL aggregate
    * semantics. One map-side-combined aggregate — the only pass over
    * the data this module ever takes. */
  def state(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "state needs group columns")
    val clash = groupCols.filter(pieces.contains)
    require(clash.isEmpty,
      s"group column(s) ${clash.mkString(", ")} collide with reserved state " +
        s"piece names (${pieces.mkString(", ")}); rename them before state()")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(valueCol).as("n_v"),
        sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"))
  }

  /** Merge any number of state frames: groups union, pieces combine.
    * Cost is proportional to STATE rows (distinct groups), not to
    * the data that produced them. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    val missing = pieces.filterNot(states.head.columns.contains)
    require(missing.isEmpty,
      s"not a state frame: missing piece column(s) ${missing.mkString(", ")}")
    val groupCols = states.head.columns.filterNot(pieces.contains).toSeq
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"),
        sum("n_v").as("n_v"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))
  }

  /** Roll state up to a coarser grouping (a subset of its group
    * columns) — answered entirely from state, the corpus is not
    * consulted. */
  def rollup(state: DataFrame, coarserCols: Seq[String]): DataFrame =
    merge(state.select((coarserCols.map(col) ++ pieces.map(col)): _*))

  /** Read-time view: derive avg from the pieces (round to keep the
    * double engine-comparable). */
  def withAvg(state: DataFrame, decimals: Int = 4): DataFrame =
    state.withColumn("avg_v",
      round(col("sum_v") / col("n_v"), decimals))
}
