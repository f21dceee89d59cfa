package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchExpressions

/** Join-shape utilities beyond the as-of / range family
  * ([[AsOfJoin]]): prefilters and ownership-binned overlap joins that
  * keep a selective join selective at fact-table scale.
  */
object Joins {

  /** Inner/semi join of a huge fact against a SELECTIVE dim whose key
    * set fits a Bloom filter but whose rows do not fit a broadcast
    * hash table.
    *
    * The scale problem: `fact ⋈ dim` with |dim| past the broadcast
    * threshold plans as a shuffle join — the ENTIRE fact table is
    * hashed across the wire even when only a sliver of it matches.
    * Spark's own runtime row-level filters cover some of these
    * shapes, but only under the planner's heuristics and never for a
    * dim produced by arbitrary upstream operators.
    *
    * The fix is the classic semi-join reduction: one pass over the
    * dim builds a Bloom filter of its join keys (a treeAggregate —
    * partition-local inserts, log-depth merge, no shuffle; ~12 MB for
    * 10M keys at 1% fpp vs GBs of broadcast rows), and the fact side
    * probes it inside whole-stage codegen BEFORE its shuffle. False
    * positives only pass extra rows to the exact join — the result is
    * exactly the plain join — while the shuffle now carries
    * ~selectivity·|fact| instead of |fact|.
    *
    * Restricted to `inner` and `left_semi`: those are the types where
    * dropping non-matching FACT rows early cannot change the result.
    * (An outer side that must survive unmatched cannot be
    * prefiltered.)
    *
    * `expectedDimKeys` sizes the filter — overestimate freely (size
    * grows linearly, correctness never depends on it); an
    * underestimate only raises the false-positive rate, never drops
    * a row.
    */
  def bloomPrefilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedDimKeys: Long,
      fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloomPrefilteredJoin: only inner/left_semi are prefilter-safe, got '$joinType'")
    val bloomBytes = SketchExpressions.buildLongBloom(dim, dimKey, expectedDimKeys, fpp)
    val prefiltered = fact.filter(
      SketchExpressions.bloom_might_contain_long(bloomBytes, col(factKey)))
    prefiltered.join(dim, prefiltered(factKey) === dim(dimKey), joinType)
  }

  /** KEYLESS interval-overlap join at scale: every pair of intervals
    * `[leftStart, leftEnd) × [rightStart, rightEnd)` that overlap —
    * `leftStart < rightEnd AND rightStart < leftEnd`. Spark plans the
    * raw conjunction as BroadcastNestedLoopJoin (O(|L|·|R|)); this is
    * the two-sided generalization of [[AsOfJoin.binnedRangeJoin]]:
    * BOTH sides explode to the integer time bins they cover, the join
    * runs on bin equality, and the exact predicate filters the
    * candidates.
    *
    * With both sides exploded a pair shares EVERY bin their overlap
    * covers, so an ownership rule dedups at emission instead of with
    * a distinct pass: the pair belongs to the bin containing
    * `greatest(leftStart, rightStart)` — the overlap's first instant,
    * which both intervals provably cover, so exactly one exploded row
    * per side carries it.
    *
    * `binWidth` ≥ the typical interval length keeps the explode
    * factor ≈2×; a degenerate interval spanning more than
    * `maxBinsPerInterval` bins fails loudly (the per-row explode
    * array is the operator's memory bound). Inverted intervals
    * (end < start) contribute zero bins. Column names of the two
    * frames must be disjoint (alias first); optional `keys` add equi
    * conditions that also bound per-key skew.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binWidth: String = "1 day",
      keys: Seq[(String, String)] = Nil,
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
    def explodedBins(startCol: String, endCol: String): Column = {
      val startBin = binOf(col(startCol))
      val endBin = binOf(col(endCol))
      val binSpan = endBin - startBin
      when(binSpan < 0, array().cast("array<bigint>"))
        .when(binSpan >= maxBinsPerInterval, raise_error(concat(
          lit(s"intervalOverlapJoin: interval [$startCol, $endCol) spans "),
          (binSpan + 1).cast("string"),
          lit(s" bins at binWidth='$binWidth' (cap $maxBinsPerInterval); " +
            "widen binWidth or raise maxBinsPerInterval"))))
        .otherwise(sequence(startBin, endBin))
    }

    val l = left.withColumn("__lbin", explode(explodedBins(leftStart, leftEnd)))
    val r = right.withColumn("__rbin", explode(explodedBins(rightStart, rightEnd)))
    val eq = (Seq(l("__lbin") === r("__rbin")) ++
      keys.map { case (lk, rk) => l(lk) === r(rk) }).reduce(_ && _)
    val overlaps = l(leftStart) < r(rightEnd) && r(rightStart) < l(leftEnd)
    val owned = binOf(greatest(l(leftStart), r(rightStart))) === l("__lbin")
    l.join(r, eq && overlaps && owned)
      .drop("__lbin", "__rbin")
  }
}
