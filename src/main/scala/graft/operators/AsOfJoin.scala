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
      valueCols: Seq[String]): DataFrame =
    asofDirectional(left, right, keys, leftTs, rightTs, valueCols, forward = false)

  /** Forward as-of: the EARLIEST right row with `right.ts >= left.ts`
    * ("next known state after this event"). Mirror image of
    * [[asofBackward]] — same union + one-exchange carry, with the
    * window scanning time descending; ties match. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame =
    asofDirectional(left, right, keys, leftTs, rightTs, valueCols, forward = true)

  /** Point-in-time join against an SCD-style dimension HISTORY (the
    * [[Modes.scdHistory]] layout: versions with `valid_from` /
    * `valid_to`, half-open, null `valid_to` = current): each fact row
    * gets the dimension values that were valid AT its own
    * `factTs` — the only correct way to join facts to a mutable
    * dimension (joining the current version backdates every late
    * fact). Facts before the key's first version, or inside a gap a
    * delete opened, keep NULL dimension values.
    *
    * Composition, not new machinery: the valid version is the latest
    * `valid_from <= factTs` — exactly [[asofBackward]] (one union +
    * one exchange, no range join) — followed by a row-local
    * expiry check against the carried `valid_to`. */
  def pointInTime(
      facts: DataFrame,
      dimHistory: DataFrame,
      keys: Seq[String],
      factTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(dimHistory.columns.contains("valid_from") &&
      dimHistory.columns.contains("valid_to"),
      "dimHistory must carry valid_from/valid_to (see Modes.scdHistory)")
    require(!valueCols.contains("valid_to"), "valid_to is carried internally")
    val joined = asofBackward(facts, dimHistory, keys, factTs,
      "valid_from", valueCols :+ "valid_to")
    // version closed before the fact: a delete (or a successor the
    // as-of already preferred) ended it — dimension values are gone
    val expired = col("valid_to").isNotNull && col(factTs) >= col("valid_to")
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(expired, lit(null)).otherwise(col(c)))
    }.drop("valid_to")
  }

  private def asofDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      forward: Boolean): DataFrame = {
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

    // sort right rows before left rows at equal ts so ties match;
    // forward scans time DESCENDING so "last seen" = earliest at-or-after
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side").asc)
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

  /** Nearest as-of: the right row minimizing |right.ts - left.ts|,
    * ties broken BACKWARD (at-or-before wins). One union and ONE
    * exchange like the directional forms; the two opposite-order
    * window carries share the partitioning, so Spark re-sorts within
    * partitions but never reshuffles. The per-row choice compares the
    * two candidates' timestamp distances.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")

    val leftCols = left.columns.toSeq
    // carried struct = right ts (for the distance) + the value columns
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        right.schema(rightTs).dataType, nullable = true) +:
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lPrepped = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rPrepped = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(col(rightTs).as("__rts") +: valueCols.map(col): _*).as("__r"): _*)

    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lPrepped.unionByName(rPrepped)
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c")) :+
        last(col("__r"), ignoreNulls = true).over(wB).as("__b") :+
        last(col("__r"), ignoreNulls = true).over(wF).as("__f"): _*)

    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val db = us(col("__ts")) - us(col("__b.__rts"))
    val df = us(col("__f.__rts")) - us(col("__ts"))
    val chosen = when(col("__f").isNull, col("__b"))
      .when(col("__b").isNull, col("__f"))
      .when(df < db, col("__f"))
      .otherwise(col("__b")) // tie -> backward

    carried.filter(col("__side") === 1)
      .withColumn("__c", chosen)
      .select(
        (keys.map(col) :+ col("__ts").as(leftTs)) ++
          leftCols.filterNot(k => keys.contains(k) || k == leftTs)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col("__c").getField(c).as(c)): _*)
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

  /** KEYLESS interval join at scale: points matched to intervals
    * [startCol, endCol) with no equi key. Spark plans a pure range
    * predicate as BroadcastNestedLoopJoin — O(|points|·|intervals|)
    * comparisons, the classic scale-killer. Binning turns it into an
    * equi-join: every interval explodes to the integer time bins it
    * overlaps, every point lands in its single bin, the join runs on
    * bin equality (hash/sort-merge, shuffle-partitioned), and the
    * exact range predicate filters the candidates. A point's bin is
    * unique, so each qualifying (point, interval) pair is emitted
    * exactly once — no dedup pass.
    *
    * `binWidth` should be ≥ the typical interval length: an interval
    * explodes to `len/binWidth + 1` bins, so width ≈ max interval
    * length caps the blowup at 2× |intervals| while keeping bins
    * selective. Optional `keys` become additional equi conditions
    * (bins then bound per-key skew too).
    *
    * Both frames must have disjoint column names (alias first).
    */
  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: String = "1 day",
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Int = 100000): DataFrame = {
    val widthMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(binWidth)) match {
      case iv =>
        require(iv.months == 0, "binWidth must be a fixed-length interval (days/hours/...)")
        iv.days * 86400000000L + iv.microseconds
    }
    require(widthMicros > 0, s"binWidth must be positive, got '$binWidth'")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    def binOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / widthMicros)

    val p = points.withColumn("__bin", binOf(col(pointCol)))
    // sequence() is inclusive of both bounds -> covers every bin the
    // interval [start, end) can touch; the exact filter below removes
    // the end-boundary slack. Guards: an inverted interval (end <
    // start) matches no point, so it contributes ZERO bins instead of
    // a descending sequence of spurious candidates; an interval
    // spanning more than `maxBinsPerInterval` bins fails loudly — the
    // per-row explode array is the operator's memory bound, and a
    // degenerate interval (or a too-narrow binWidth) silently building
    // a millions-long array is an OOM, not a join.
    val startBin = binOf(col(startCol))
    val endBin = binOf(col(endCol))
    val binSpan = endBin - startBin
    val bins = when(binSpan < 0, array().cast("array<bigint>"))
      .when(binSpan >= maxBinsPerInterval, raise_error(concat(
        lit(s"binnedRangeJoin: interval [$startCol, $endCol) spans "),
        (binSpan + 1).cast("string"),
        lit(s" bins at binWidth='$binWidth' (cap $maxBinsPerInterval); " +
          "widen binWidth or raise maxBinsPerInterval"))))
      .otherwise(sequence(startBin, endBin))
    val i = intervals.withColumn("__bin", explode(bins))

    val eq = (Seq(p("__bin") === i("__bin")) ++ keys.map(k => p(k) === i(k)))
      .reduce(_ && _)
    p.join(i, eq && p(pointCol) >= i(startCol) && p(pointCol) < i(endCol))
      .drop("__bin")
  }
}
