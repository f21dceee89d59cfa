package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same keys —
  * the temporal-enrichment primitive training and feature pipelines
  * need (e.g. "state of X as of this event").
  *
  * Spark has no as-of join operator. Preference order from the build
  * brief: compose built-ins before custom Catalyst machinery — and the
  * composition here is optimal: union both sides, one shuffle+sort by
  * (keys, ts, side), carry the right row forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window, keep
  * left rows. No range-condition join (which Spark would execute as a
  * broadcast nested loop or cartesian), no per-row probe. Cost is one
  * exchange of |L|+|R| rows — the same lower bound a native
  * as-of SparkPlan would have.
  *
  * Ties (right.ts == left.ts) match, like DuckDB/pandas ASOF backward
  * joins. Right side must be unique per (keys, ts); pre-aggregate if
  * not — ambiguity is a data bug, not something to resolve silently.
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")

    val leftCols = left.columns.toSeq
    // All value columns are carried as ONE struct per right row: a
    // per-column last(_, ignoreNulls) would resurrect an older row's
    // value whenever the most recent right row holds NULL in one
    // column, stitching the output from different right rows. The
    // struct is the whole right row — its NULL fields stay NULL.
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // union layout: keys ++ ts ++ side ++ left payload ++ right struct
    val lPrepped = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rPrepped = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(valueCols.map(col): _*).as("__r"): _*)

    // sort right rows before left rows at equal ts so ties match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lPrepped.unionByName(rPrepped)
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c")) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)

    carried.filter(col("__side") === 1)
      .select(
        (keys.map(col) :+ col("__ts").as(leftTs)) ++
          leftCols.filterNot(k => keys.contains(k) || k == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Range join: left rows matched to right intervals
    * [startCol, endCol) sharing `keys`. Composed as an equi-join on
    * keys plus range predicates — with AQE and a broadcastable right
    * side this stays a hash join; for large interval tables prefer
    * bucketing both sides by key first. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      startCol: String,
      endCol: String): DataFrame = {
    val cond = keys.map(k => left(k) === right(k)).reduce(_ && _) &&
      left(leftTs) >= right(startCol) && left(leftTs) < right(endCol)
    left.join(right, cond)
  }
}
