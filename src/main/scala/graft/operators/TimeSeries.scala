package graft.operators

import org.apache.spark.sql.DataFrame
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
}
