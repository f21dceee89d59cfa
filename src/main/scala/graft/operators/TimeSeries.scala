package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense time-series resampling (beyond-parity): bucket rows into
  * fixed intervals, aggregate, emit EVERY interval between the first
  * and last (empty ones included — a gap that silently disappears
  * reads as a different series), and forward-fill across the gaps.
  * The resample + ffill pair is the standard prep for rate
  * dashboards, anomaly baselines, and joining event series to
  * regular-grid models.
  *
  * Scale shape: ONE map-side-combined aggregate collapses the data
  * to interval grain; the spine generates from a 2-value min/max
  * frame; the join and the forward-fill window run over INTERVAL
  * rows, not events — a year of hours is 8.8 K rows no matter how
  * many billions of events fed them. The ffill window is globally
  * ordered by design: it is bounded by the grid size, never by data.
  */
object TimeSeries {

  /** Hourly resample of (`tsCol`, `valueCol`): per-hour event count
    * and value sum, dense spine, plus `sum_value_ffill` carrying the
    * last non-empty hour's sum across gaps. */
  def resampleHourly(df: DataFrame, tsCol: String,
      valueCol: String): DataFrame = {
    val perHour = df
      .select(date_trunc("hour", col(tsCol)).as("h"), col(valueCol).as("v"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_events"), round(sum("v"), 4).as("sum_value"))
    val bounds = df.agg(
      date_trunc("hour", min(col(tsCol))).as("lo"),
      date_trunc("hour", max(col(tsCol))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val w = Window.orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perHour, Seq("h"), "left")
      .select(col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("sum_value_ffill"))
  }

  /** Trailing-window stats over an (ordered, dense) grid frame —
    * moving average / min / max / non-empty count of `valueCol` over
    * the current row and the `trailing` rows before it. The moving
    * baseline every rate monitor and anomaly detector compares
    * against; run it on [[resampleHourly]] output so gaps (null
    * value, counted out by `mov_n`) don't silently shrink the
    * window. Same scale argument as the ffill window: ordered by the
    * GRID column, bounded by grid size, never by event count. */
  def rollingStats(grid: DataFrame, orderCol: String, valueCol: String,
      trailing: Int = 3): DataFrame = {
    require(trailing >= 1, "rollingStats needs a trailing window >= 1")
    val w = Window.orderBy(orderCol).rowsBetween(-trailing, Window.currentRow)
    grid
      .withColumn("mov_n", count(col(valueCol)).over(w))
      .withColumn("mov_avg", round(avg(col(valueCol)).over(w), 4))
      .withColumn("mov_min", min(col(valueCol)).over(w))
      .withColumn("mov_max", max(col(valueCol)).over(w))
  }

  /** Rolling-z-score anomaly detection over an ordered grid: flag
    * rows whose value deviates from the TRAILING baseline (the
    * `trailing` rows strictly BEFORE the current one — the tested
    * point never contaminates its own baseline, the standard
    * monitoring rule) by more than `k` sample standard deviations.
    * Emits only the anomalous rows, with the baseline mean/std they
    * were judged against. Rows whose baseline has fewer than 2
    * non-null values (no defined std) or zero std are never flagged
    * — a verdict from no evidence is noise, not detection.
    *
    * Same scale argument as [[rollingStats]]: the window is ordered
    * by the grid column and bounded by grid size, never event
    * count. */
  def anomalies(grid: DataFrame, orderCol: String, valueCol: String,
      trailing: Int = 6, k: Double = 3.0): DataFrame = {
    require(trailing >= 2, "anomaly baseline needs >= 2 trailing rows")
    require(k > 0, s"threshold k must be positive: $k")
    val w = Window.orderBy(orderCol).rowsBetween(-trailing, -1)
    val v = col(valueCol)
    grid
      .withColumn("base_n", count(v).over(w))
      .withColumn("base_avg", avg(v).over(w))
      .withColumn("base_std", stddev_samp(v).over(w))
      .filter(v.isNotNull && col("base_n") >= 2 && col("base_std") > 0 &&
        abs(v - col("base_avg")) > col("base_std") * k)
      .withColumn("base_avg", round(col("base_avg"), 4))
      .withColumn("base_std", round(col("base_std"), 4))
  }

  /** Distributed sweep-line concurrency: given intervals
    * [`startCol`, `endCol`) — sessions, jobs, connections — the
    * maximum number simultaneously open within each day. The classic
    * single-machine sweep (sort all boundaries, running ±1 sum) has
    * a global order in it; this is its two-level distributed form:
    *
    *  1. boundaries → ±1 deltas, hash-partitioned BY DAY; the
    *     running sum windows within each day independently.
    *  2. each day's net delta (one row per day) rolls into a
    *     carry-in offset via a second running sum over DAY rows —
    *     the same distributed-prefix-sum shape as
    *     [[Packing.packByBudget]]: the global pass touches one row
    *     per day, never the data.
    *
    * Ties resolve end-before-start (half-open intervals: an interval
    * ending at t and one starting at t never overlap). Output:
    * (day, max_concurrent) for days with at least one boundary. */
  def maxConcurrencyByDay(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val deltas = df.select(col(startCol).as("t"), lit(1).as("d"))
      .unionAll(df.select(col(endCol).as("t"), lit(-1).as("d")))
      .withColumn("day", to_date(col("t")))
    // ends sort before starts at the same instant: d ascending
    val inDay = Window.partitionBy("day").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = deltas.withColumn("run", sum("d").over(inDay))
    val perDay = run.groupBy("day")
      .agg(max("run").as("day_max"), sum("d").as("day_net"))
    val acrossDays = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("carry", coalesce(sum("day_net").over(acrossDays), lit(0L)))
      .select(col("day"),
        (col("carry") + col("day_max")).as("max_concurrent"))
  }

  /** Linear interpolation across grid gaps: null `valueCol` rows get
    * v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev) from
    * the nearest non-null neighbors; leading/trailing nulls (no
    * neighbor on one side) stay null. The standard gap-fill when a
    * rate series feeds a model that can't see NULLs and a step
    * function (ffill) would bias it.
    *
    * NOT rounded: the neighbor values and the time ratio are
    * identical in any engine replaying the grid, so the interpolated
    * doubles match bit-for-bit; rounding would reintroduce
    * half-boundary disagreement. Same global-grid window argument as
    * [[resampleHourly]]'s ffill: ordered by the GRID column, bounded
    * by grid size, never by event count. */
  def interpolateLinear(grid: DataFrame, orderCol: String,
      valueCol: String): DataFrame = {
    val t = col(orderCol); val v = col(valueCol)
    val wPrev = Window.orderBy(t)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy(t).rowsBetween(1, Window.unboundedFollowing)
    val pv = last(when(v.isNotNull, v), ignoreNulls = true).over(wPrev)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(wPrev)
    val nv = first(when(v.isNotNull, v), ignoreNulls = true).over(wNext)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(wNext)
    val ratio = (unix_micros(t) - unix_micros(pt)).cast("double") /
      (unix_micros(nt) - unix_micros(pt)).cast("double")
    grid.withColumn(s"${valueCol}_interp",
      when(v.isNotNull, v)
        .otherwise(pv + (nv - pv) * ratio))
  }

  /** Exponentially-weighted moving average with α = 1/2 over each
    * key's most recent `lastN` observations: eₙ = xₙ/2 + eₙ₋₁/2,
    * e₁ = x₁ — the standard recency smoother for rates and gauges.
    *
    * The recurrence unrolls to a RUNNING SUM: with integer inputs and
    * dyadic weights (w₁ = 4, wᵢ = 2ⁱ), eₙ = Σwᵢxᵢ / 2ⁿ⁺¹ — every
    * intermediate is an exact integer and the final division is by a
    * power of two, so the result is bit-reproducible across engines
    * (why α = 1/2 and why `valueCol` must be integral; `scale`
    * converts fixed-point units back at the end).
    *
    * Exactness envelope — BOTH bounds are part of the contract:
    * `lastN` ≤ 36 alone is not sufficient; the running Σwᵢxᵢ must
    * stay below 2⁵³ for the final CAST to DOUBLE to be exact (and
    * below 2⁶³ for the long sum not to overflow — loud only under
    * ANSI). The weight alone reaches 2ⁿ⁺¹, and up to lastN terms
    * telescope to < 2ⁿ⁺², so callers must keep
    * |value| < 2^(53 − lastN − 2) in the SCALED integral unit
    * (lastN = 16 → |value| < 2³⁵ ≈ 3.4e10; lastN = 36 → |value| <
    * 2¹⁵ = 32768, i.e. ≤ $327 in cents). Outside that envelope the
    * result silently loses bit-reproducibility (not correctness to
    * ~1 ulp — reproducibility). Longer horizons re-anchor rather
    * than raise `lastN` (a 2⁻³⁶ weight is zero signal anyway).
    *
    * Scale shape: per-key windows only — one shuffle on the key, the
    * two window passes (recency cut, running sum) share it. No global
    * window, no driver state. */
  def ewmaHalf(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: Column, lastN: Int = 16, scale: Double = 1.0): DataFrame = {
    require(lastN >= 1 && lastN <= 36,
      s"lastN must be in [1, 36] (2^n exactness bound): $lastN")
    val keys = keyCols.map(col)
    val asc = orderCols.map(col(_).asc)
    val desc = orderCols.map(col(_).desc)
    val recent = df
      .withColumn("__rd",
        row_number().over(Window.partitionBy(keys: _*).orderBy(desc: _*)))
      .filter(col("__rd") <= lastN)
    val w = Window.partitionBy(keys: _*).orderBy(asc: _*)
    val n = row_number().over(w)
    val weighted = recent
      .withColumn("__n", n)
      .withColumn("__wx",
        when(col("__n") === 1, valueCol.cast("long") * 4L)
          .otherwise(valueCol.cast("long") *
            expr("shiftleft(CAST(1 AS BIGINT), __n)")))
    val run = sum(col("__wx")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // NOT rounded: Σwx is an exact integer, /2ⁿ⁺¹ is exact dyadic,
    // /scale is one correctly-rounded IEEE op — every engine computes
    // the identical bits, while round(·, 6) would REINTRODUCE
    // disagreement at half-boundaries (dyadic values land on them)
    weighted
      .withColumn("__s", run)
      .select(keys ++ orderCols.map(col) ++ Seq(col("__n").as("n"),
        (col("__s").cast("double") /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), __n + 1) AS DOUBLE)") /
          scale).as("ewma")): _*)
  }

  /** Growth curve: per day, NEW entities (first ever seen that day)
    * and the CUMULATIVE unique count — the DAU/total-registered
    * readout. A naive count(DISTINCT) per day rescans all history
    * per day; this is two aggregates + one distributed prefix sum:
    * first-seen day per entity (one map-combined min), new-per-day
    * counts, then [[Packing.cumulative]]'s range-bucketed scan (no
    * SinglePartition window) over DAY rows — a decade is ~3.7 K rows
    * regardless of event volume.
    *
    * Output: (d DATE, new_entities, cum_entities). */
  def cumulativeUniques(df: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val first = df
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(entityCol).as("__e"))
      .agg(min(to_date(col(tsCol))).as("d"))
    val daily = first.groupBy("d")
      .agg(count(lit(1)).as("new_entities"))
      // numeric, unique order key for the bucketed prefix sum
      .withColumn("__day", datediff(col("d"), lit("1970-01-01")))
    Packing.cumulative(daily, "__day", "new_entities")
      .select(col("d"), col("new_entities"),
        col("cum").as("cum_entities"))
  }

  /** Day-of-week seasonal index: per weekday bucket, mean metric
    * over the bucket divided by the grand mean — the > 1 / < 1
    * "which days run hot" readout. `valueCol` must be INTEGRAL
    * (fixed-point-scale upstream, the Stats exactness contract), so
    * both sums are exact and the index is a fixed four-divide double
    * tree. The weekday bucket is epoch-day arithmetic
    * ((days since 1970-01-01 + 4) % 7, 0 = Sunday) — identical
    * integer math in any engine, no locale-dependent weekday
    * function.
    *
    * Scale shape: ONE map-combined aggregate to 7 counter rows plus
    * a broadcast 1-row grand total. */
  def seasonalIndex(df: DataFrame, tsCol: String, valueCol: Column,
      scale: Double = 1.0): DataFrame = {
    val dow = pmod(datediff(to_date(col(tsCol)), lit("1970-01-01")) + 4, lit(7))
    val base = df.filter(col(tsCol).isNotNull && valueCol.isNotNull)
      .select(dow.cast("int").as("dow"), valueCol.cast("long").as("__v"))
    val perDow = base.groupBy("dow")
      .agg(count(lit(1)).as("n"), sum("__v").as("__s"))
    val total = perDow.agg(sum("n").as("__tn"), sum("__s").as("__ts"))
    val mean = col("__s").cast("double") / col("n").cast("double") / scale
    val grand = col("__ts").cast("double") / col("__tn").cast("double") / scale
    perDow.crossJoin(broadcast(total))
      .select(col("dow"), col("n"),
        round(mean, 6).as("mean_value"),
        round(mean / grand, 6).as("seasonal_index"))
  }
}
