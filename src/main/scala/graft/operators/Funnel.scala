package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics (beyond-parity): ordered funnels and
  * cohort retention — the two questions every event warehouse is
  * actually built to answer ("how far do users get, in order?" and
  * "do they come back?").
  *
  * Scale shape: everything is keyed by the entity. The funnel is k-1
  * entity-joins + k aggregates that all share one hash partitioning
  * (Spark reuses the exchange); retention is two aggregates and an
  * entity join. Nothing is windowed over time order — first-times
  * are conditional MINs, so no per-entity event sort ever happens;
  * the per-stage "strictly after the previous stage" constraint
  * rides in the join predicate. Event-time skew (one bot entity with
  * millions of events) concentrates in the conditional-min
  * aggregate, which partial aggregation already absorbs map-side.
  */
object Funnel {

  /** Per-entity ordered-funnel times: `t_1` = first `stages(0)`
    * event, `t_i` = first `stages(i-1)` event STRICTLY AFTER
    * `t_{i-1}` — an out-of-order conversion (purchase before click)
    * does not count, which is the difference between a funnel and k
    * independent existence checks. Entities that never reach stage i
    * carry null from `t_i` on. */
  def funnelTimes(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelTimes needs at least one stage")
    val e = df.select(col(entityCol).as("__e"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var acc = e.groupBy("__e")
      .agg(min(when(col("__t") === stages.head, col("__ts"))).as("t_1"))
    for (i <- 2 to stages.length) {
      val prev = s"t_${i - 1}"
      val nxt = e.filter(col("__t") === stages(i - 1))
        .join(acc.select(col("__e").as("__e2"), col(prev)),
          col("__e") === col("__e2") && col("__ts") > col(prev))
        .groupBy("__e").agg(min("__ts").as(s"t_$i"))
      acc = acc.join(nxt, Seq("__e"), "left")
    }
    acc.withColumnRenamed("__e", entityCol)
  }

  /** Funnel summary: one row per stage with the count of entities
    * that reached it (in order). Derived from [[funnelTimes]] in a
    * single 1-row aggregate, then unpivoted row-locally. */
  def funnel(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val times = funnelTimes(df, entityCol, typeCol, tsCol, stages)
    val counts = times.agg(
      count(col("t_1")).as("n_1"),
      stages.indices.drop(1).map(i => count(col(s"t_${i + 1}")).as(s"n_${i + 1}")): _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (s, i) =>
      struct(lit(s).as("stage"), lit((i + 1).toLong).as("stage_idx"),
        col(s"n_${i + 1}").as("n_entities"))
    }: _*)).as("x")).select("x.*")
  }

  /** Cohort retention: entities grouped by first-activity week,
    * counted in every subsequent week they were active. Output
    * (cohort_week, weeks_since, n_users) — the retention triangle. */
  def retention(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val e = df.select(col(entityCol).as("__e"), col(tsCol).as("__ts"))
    val firstw = e.groupBy("__e")
      .agg(date_trunc("week", min("__ts")).as("cohort_week"))
    val act = e.select(col("__e"), date_trunc("week", col("__ts")).as("w"))
      .distinct()
    act.join(firstw, Seq("__e"))
      .groupBy(col("cohort_week"),
        expr("datediff(to_date(w), to_date(cohort_week)) div 7")
          .cast("long").as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
  }
}
