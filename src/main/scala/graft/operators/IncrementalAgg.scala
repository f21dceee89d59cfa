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

  /** Incremental JOIN-view maintenance: the delta of `A ⋈ B` when
    * arrival batches `dA`/`dB` append to the bases, from the standard
    * delta-join identity
    *
    *   Δ(A ⋈ B) = (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)
    *
    * so the maintained view advances by `view ∪ joinDelta(...)`
    * WITHOUT re-joining the bases — the dominant cost is each delta
    * joined against the opposite base on the equi key (broadcast the
    * delta when it is small, which arrival batches are; the base side
    * never self-joins). This is how a CDC pipeline keeps a denormalized
    * downstream table current: `Modes.applyChanges` maintains the base
    * replicas, this maintains the join of them. Append-only deltas
    * (inserts); updates/deletes route through applyChanges first and
    * re-emit as retract+insert pairs upstream of this.
    *
    * `leftKeys`/`rightKeys` pair positionally. Column names of A and B
    * must be disjoint (alias first), so the output is the plain join
    * schema.
    */
  def joinDelta(
      baseA: DataFrame, dA: DataFrame,
      baseB: DataFrame, dB: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String]): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "leftKeys and rightKeys must pair positionally")
    def cond(l: DataFrame, r: DataFrame) =
      leftKeys.zip(rightKeys).map { case (lk, rk) => l(lk) === r(rk) }
        .reduce(_ && _)
    // dA sees the FULL new right side (B ∪ dB); A-only sees dB: the
    // union of the three classic terms regrouped into two joins —
    // (dA ⋈ B) ∪ (dA ⋈ dB) = dA ⋈ (B ∪ dB) — one fewer delta scan
    val newB = baseB.unionByName(dB)
    val dAFull = dA.join(newB, cond(dA, newB), "inner")
    val aDb = baseA.join(dB, cond(baseA, dB), "inner")
    dAFull.unionByName(aDb)
  }
}
