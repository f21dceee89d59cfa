package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-transition conversion latency — the "how LONG does the
    * funnel take" companion of [[funnel]]'s "how far": for each
    * consecutive stage pair, over the entities that completed both
    * IN ORDER, the converter count and the median / p90 gap in
    * seconds. Gaps are exact integer MICROSECONDS
    * (`unix_micros`, no sub-second truncation); the percentile
    * interpolates over those integers and one final divide converts
    * to seconds — engine-replayable like pct1. Transitions nobody
    * completed emit n_converted = 0 with null latencies.
    *
    * Scale shape: [[funnelTimes]]' joins + one 1-row aggregate per
    * transition (k−1 tiny aggregates over the entity-times frame). */
  def stepLatency(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "stepLatency needs at least two stages")
    val times = funnelTimes(df, entityCol, typeCol, tsCol, stages)
      .localCheckpoint()
    val rows = (1 until stages.length).map { i =>
      val gapUs = unix_micros(col(s"t_${i + 1}").cast("timestamp")) -
        unix_micros(col(s"t_$i").cast("timestamp"))
      times.filter(col(s"t_${i + 1}").isNotNull)
        .select(gapUs.as("__gap_us"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(__gap_us, 0.5)") / 1000000.0, 4)
            .as("median_seconds"),
          round(expr("percentile(__gap_us, 0.9)") / 1000000.0, 4)
            .as("p90_seconds"))
        .select(lit(stages(i - 1)).as("from_stage"),
          lit(stages(i)).as("to_stage"),
          col("n_converted"), col("median_seconds"), col("p90_seconds"))
    }
    rows.reduce(_.union(_))
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

  /** Cohort LTV curve: cumulative value per acquisition cohort by
    * weeks since acquisition — the revenue companion to
    * [[retention]]'s activity triangle ("how much has the January
    * cohort spent by week 4?"). `valueCol` must be integral (pass
    * cents) so the sums — and the running cumulative — are exact.
    * Output: (cohort_week, weeks_since, n_active, week_value,
    * cum_value); the cumulative window runs over WEEK rows per
    * cohort, never events. */
  def ltvCurve(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: Column): DataFrame = {
    val e = df.select(col(entityCol).as("__e"), col(tsCol).as("__ts"),
      valueCol.cast("long").as("__v"))
    val firstw = e.groupBy("__e")
      .agg(date_trunc("week", min("__ts")).as("cohort_week"))
    val weekly = e.join(firstw, Seq("__e"))
      .groupBy(col("cohort_week"),
        expr("datediff(to_date(date_trunc('week', __ts)), to_date(cohort_week)) div 7")
          .cast("long").as("weeks_since"))
      .agg(count_distinct(col("__e")).as("n_active"),
        sum("__v").as("week_value"))
    val w = Window.partitionBy("cohort_week").orderBy("weeks_since")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.withColumn("cum_value", sum("week_value").over(w))
  }

  /** Position-based (U-shaped) multi-touch attribution in exact
    * integer basis points: every touch event attributes to the
    * earliest conversion at-or-after it in the same entity's
    * timeline, and each conversion's 10 000 bp split 40/20/40 —
    * first touch 4000, last 4000, the middle 2000 divided by largest
    * remainder (earliest middles get the odd bp), so credits sum to
    * exactly 10 000 per conversion with no float residue. 1 touch →
    * 10 000; 2 touches → 5000/5000.
    *
    * Conversion assignment avoids composite-key encodings: the
    * running COUNT of conversions from the row to the end of the
    * entity's timeline indexes conversions from the last backwards,
    * so touch k joins conversion k — two per-entity window passes and
    * one per-(entity, k) join, all on the entity shuffle.
    *
    * Output: one row per attributed touch (entity, conv id/ts, touch
    * id/ts, n_touches, position, credit_bp). Touches after the last
    * conversion drop (nothing to credit); zero-touch conversions
    * don't appear (no credit to hand out). */
  def positionCredit(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, isTouch: Column, isConv: Column): DataFrame = {
    val wAfter = Window.partitionBy(entityCol)
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cnt = df
      .withColumn("__touch", isTouch)
      .withColumn("__conv", isConv)
      .filter(col("__touch") || col("__conv"))
      .withColumn("__k", sum(when(col("__conv"), 1L).otherwise(0L)).over(wAfter))
    val convs = cnt.filter(col("__conv"))
      .select(col(entityCol), col("__k"),
        col(idCol).as("conv_id"), col(tsCol).as("conv_ts"))
    val touches = cnt.filter(col("__touch") && col("__k") > 0)
      .select(col(entityCol), col("__k"),
        col(idCol).as("touch_id"), col(tsCol).as("touch_ts"))
    val wPos = Window.partitionBy(entityCol, "__k")
      .orderBy(col("touch_ts"), col("touch_id"))
    val positioned = touches
      .withColumn("position", row_number().over(wPos).cast("long"))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy(entityCol, "__k")))
    val n = col("n_touches"); val p = col("position")
    val mid = n - 2L
    val credit = when(n === 1L, 10000L)
      .when(n === 2L, 5000L)
      .when(p === 1L || p === n, 4000L)
      .otherwise((lit(2000L) / mid).cast("long") +
        when(p - 1L <= pmod(lit(2000L), mid), 1L).otherwise(0L))
    positioned.join(convs, Seq(entityCol, "__k"))
      .select(col(entityCol), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"), n, p,
        credit.as("credit_bp"))
  }
}
