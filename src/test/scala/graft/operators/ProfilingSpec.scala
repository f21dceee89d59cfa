package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfilingSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(sf() + "/documents.parquet")

  test("column profile: exact counts, numeric min/max, null for strings") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option("a"), 1.5),
      (Option(2L), Option("a"), -2.0),
      (None, None, 1.5))
      .toDF("id", "tag", "v")
    val got = Profiling.columnProfile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(got("id") == ((3L, 1L, 2L, Some(1.0), Some(2.0))))
    assert(got("tag") == ((3L, 1L, 1L, None, None)))   // string: no min/max
    assert(got("v") == ((3L, 0L, 2L, Some(-2.0), Some(1.5))))
    // approx form: same shape, distinct within HLL tolerance
    val ap = Profiling.columnProfile(df, Seq("id"), approx = true)
      .collect().head
    assert(ap.getLong(1) == 3L && ap.getLong(3) >= 1L)
  }

  test("sketched vocabulary: per-group and UNIONED estimates track exact counts") {
    val got = Profiling.vocabularySketched(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Profiling.vocabulary(docs, Seq("lang"), "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val globalExact = Profiling.vocabulary(
      docs.selectExpr("'x' AS g", "text"), Seq("g"), "text")
      .collect().head.getLong(1)
    for ((lang, (est, nTok)) <- got if lang != "ALL") {
      assert(nTok == exact(lang)._2)
      assert(math.abs(est - exact(lang)._1).toDouble / exact(lang)._1 < 0.05,
        s"$lang est=$est exact=${exact(lang)._1}")
    }
    // the ALL row merges SKETCHES — it must estimate the true global
    // distinct (vocabularies overlap, so summing groups would not)
    val all = got("ALL")
    assert(all._2 == exact.values.map(_._2).sum)
    assert(math.abs(all._1 - globalExact).toDouble / globalExact < 0.05,
      s"union est=${all._1} exact=$globalExact")
    assert(all._1 < exact.values.map(_._1).sum) // overlap: union < sum of parts
  }

  test("approx corpus stats track the exact aggregates within sketch bounds") {
    def byLang(df: org.apache.spark.sql.DataFrame): Map[String, Row] =
      df.collect().map(r => r.getString(0) -> r).toMap
    val exact = byLang(Profiling.corpusStats(docs, Seq("lang"), "n_chars"))
    val approx = byLang(Profiling.approxCorpusStats(docs, Seq("lang"), "n_chars"))
    assert(exact.keySet == approx.keySet)
    for ((lang, e) <- exact) {
      val a = approx(lang)
      // exact columns are exact in both forms
      assert(a.getAs[Long]("n_docs") == e.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("min_len") == e.getAs[Long]("min_len"))
      assert(a.getAs[Long]("max_len") == e.getAs[Long]("max_len"))
      assert(a.getAs[Double]("mean_len") == e.getAs[Double]("mean_len"))
      // t-digest at accuracy=10000 on a few hundred values per group
      // must land within a small relative error of the exact quantile
      def close(ac: Double, ex: Double) =
        math.abs(ac - ex) <= math.max(5.0, 0.05 * math.abs(ex))
      assert(close(a.getAs[Double]("median_len"), e.getAs[Double]("median_len")),
        s"$lang median: ${a.getAs[Double]("median_len")} vs ${e.getAs[Double]("median_len")}")
      assert(close(a.getAs[Double]("p95_len"), e.getAs[Double]("p95_len")),
        s"$lang p95: ${a.getAs[Double]("p95_len")} vs ${e.getAs[Double]("p95_len")}")
      // HLL at default 5% sd: generous 3-sigma bound vs the true
      // distinct count of lengths in the group
      val trueDistinct = docs.filter(col("lang") === lang)
        .select("n_chars").distinct().count()
      val hll = a.getAs[Long]("approx_distinct_len")
      assert(math.abs(hll - trueDistinct) <= math.max(3, 0.15 * trueDistinct),
        s"$lang distinct: $hll vs $trueDistinct")
    }
  }

  test("approx stats plan is a single partial-agg pass (no extra shuffle)") {
    val df = Profiling.approxCorpusStats(docs, Seq("lang"), "n_chars")
    val p = df.queryExecution.executedPlan.toString
    // partial + final aggregate over one exchange, like the exact form
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("histogram is dense: empty, under- and overflow buckets all present") {
    import spark.implicits._
    val vals = Seq(-5.0, 0.0, 0.5, 9.99, 25.0, 120.0, 120.0)
      .toDF("v").union(Seq.empty[Double].toDF("v"))
    val out = Profiling.histogram(vals, "v", lo = 0.0, hi = 100.0, nBuckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.length == 12) // 10 buckets + underflow + overflow
    assert(out(0) == ((-1L, 1L)))                  // -5.0
    assert(out(1) == ((0L, 3L)))                   // 0.0, 0.5, 9.99
    assert(out(3) == ((2L, 1L)))                   // 25.0
    assert(out(11) == ((10L, 2L)))                 // both 120.0 overflow
    assert(out.map(_._2).sum == 7)
    // interior bounds are populated, sentinels are null
    val rows = Profiling.histogram(vals, "v", 0.0, 100.0, 10)
      .orderBy("bucket").collect()
    assert(rows(1).getDouble(1) == 0.0 && rows(1).getDouble(2) == 10.0)
    assert(rows(0).isNullAt(1) && rows(11).isNullAt(2))
  }

  test("percentile bins are balanced and ordered; nulls get a null bin") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toLong, Some(i))) :+ (101L, Option.empty[Int])
    val df = rows.toDF("id", "v")
    val out = Profiling.percentileBins(df, "id", "v", nBins = 4).collect()
    val bins = out.filter(!_.isNullAt(2)).map(r => r.getInt(1) -> r.getInt(2))
    // 1..100 into quartiles: exact 25/25/25/25
    assert(bins.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
    // monotone: higher value never lands in a lower bin
    val sorted = bins.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2)
      case _ =>
    }
    assert(out.find(_.getLong(0) == 101L).get.isNullAt(2))
    assertThrows[IllegalArgumentException](
      Profiling.percentileBins(df, "id", "v", 1))
    // empty / all-null input fails loudly, not with an opaque NPE
    assertThrows[IllegalArgumentException](
      Profiling.percentileBins(df.filter("id > 1000"), "id", "v", 4))
    assertThrows[IllegalArgumentException](
      Profiling.percentileBins(df.filter("id = 101"), "id", "v", 4))
  }

  test("histogram top edge: FP division cannot leak in-range rows to overflow") {
    import spark.implicits._
    // (v - lo) / (range / 3) rounds to exactly 3.0 for this v < hi
    val v = 0.9999999999999999
    val out = Profiling.histogram(Seq(v).toDF("v"), "v", 0.0, 1.0, 3)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((-1L, 0L), (0L, 0L), (1L, 0L), (2L, 1L), (3L, 0L)))
  }

  test("edit distance pairs verify candidates with exact Levenshtein") {
    import spark.implicits._
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", cands, "a", "b")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 2L, 3L, 0.5714))) // 1 - 3/7 rounded to 4
    assert(out(1) == ((1L, 3L, 0L, 1.0)))
  }

  test("countMin estimates never undercount and are exact without collisions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val items = (Seq.fill(10)(1L) ++ Seq.fill(5)(2L) ++ Seq(3L)).toDF("it")
    // 3 items into a wide sketch: no collisions, estimates exact
    val wide = Profiling.countMinEstimates(items, col("it"),
      depth = 4, width = 1024).collect()
    assert(wide.forall(r => r.getAs[Long]("cms_est") == r.getAs[Long]("n_true")))
    assert(wide.forall(r => r.getAs[Long]("overcount") == 0L))
    // width 2 forces collisions: never undercounts, min bounds by the
    // total stream weight
    val tight = Profiling.countMinEstimates(items, col("it"),
      depth = 2, width = 2).collect()
    assert(tight.forall(r => r.getAs[Long]("cms_est") >= r.getAs[Long]("n_true")))
    assert(tight.forall(r => r.getAs[Long]("cms_est") <= 16L))
  }

  test("sourceOverlap: identical sources hit 1, disjoint never appear") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", "x y z"), ("a", "x y"), ("b", "z x y"),
      ("c", "p q r")).toDF("src", "text")
    val out = Profiling.sourceOverlap(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("jaccard"))).toMap
    assert(out(("a", "b")) == ((3L, 1.0))) // same vocab, different docs
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
  }

  test("cmsEstimates reads empty buckets as zero for unseen probe items") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    val seen = Seq.fill(4)(1L).toDF("it")
    val counters = seen
      .select(col("it").cast("long").as("item"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.sequence(lit(0L), lit(3L))).as("d"))
      .withColumn("bucket", Profiling.cmsBucket(col("item"), col("d"), 1024))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    // probe an item the sketch never saw: wide sketch -> no collision
    // -> at least one empty bucket -> estimate must be exactly 0
    val probes = Seq((999L, 0L)).toDF("item", "n_true")
    val est = Profiling.cmsEstimates(probes, counters, 4, 1024).collect()(0)
    assert(est.getAs[Long]("cms_est") === 0L)
    // and an EMPTY counter table (stream not started) gives all-zero
    // estimates, not zero rows
    val none = counters.filter(lit(false))
    val est2 = Profiling.cmsEstimates(probes, none, 4, 1024).collect()
    assert(est2.length === 1 && est2(0).getAs[Long]("cms_est") === 0L)
  }

  test("KMV: exact below k, estimator in bound, merge == direct, idempotent") {
    import spark.implicits._
    val k = 128
    val df = ((0 until 50).map(i => ("small", s"s$i")) ++
        (0 until 5000).map(i => ("big", s"b$i"))).toDF("g", "v")
    val sk = Profiling.kmvSketch(df, "g", col("v"), k)
    val est = Profiling.kmvEstimate(sk, "g", k).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(3))).toMap
    assert(est("small") == ((50, 50.0))) // saw everything: exact
    val (bn, bEst) = est("big")
    assert(bn == k)
    // ~3 sigma at k=128 (stderr ≈ 1/sqrt(k-2) ≈ 8.9%)
    assert(math.abs(bEst - 5000.0) / 5000.0 < 0.35, s"est $bEst")
    // merge of half-sketches == sketch of the whole (associative
    // bottom-k recursion), and re-merging a sketch is a no-op
    val half1 = df.filter(length(col("v")) % 2 === 0)
    val half2 = df.filter(length(col("v")) % 2 === 1)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val merged = Profiling.kmvMerge(
      Profiling.kmvSketch(half1, "g", col("v"), k),
      Profiling.kmvSketch(half2, "g", col("v"), k), "g", k)
    assert(rows(merged) == rows(sk))
    assert(rows(Profiling.kmvMerge(sk, sk, "g", k)) == rows(sk))
  }

  test("KMV set ops: known overlap recovered within sketch error") {
    import spark.implicits._
    val k = 128
    // X = {0..999}, Y = {500..1499}: union 1500, intersection 500,
    // Jaccard 1/3
    val df = ((0 until 1000).map(i => ("x", s"e$i")) ++
        (500 until 1500).map(i => ("y", s"e$i"))).toDF("g", "v")
    val sk = Profiling.kmvSketch(df, "g", col("v"), k)
    val out = Profiling.kmvSetOps(sk, "g", k).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "x" && r.getString(1) == "y")
    assert(r.getInt(2) == k)
    val estU = r.getDouble(3); val jac = r.getDouble(4); val estI = r.getDouble(5)
    assert(math.abs(estU - 1500.0) / 1500.0 < 0.35, s"union $estU")
    // rho-hat stderr ≈ sqrt(rho(1-rho)/k) ≈ 0.042; 3 sigma + slack
    assert(math.abs(jac - 1.0 / 3.0) < 0.15, s"jaccard $jac")
    assert(estI == jac * estU) // exact identity by construction
    // disjoint pair: zero overlap estimated as exactly zero
    val dj = ((0 until 300).map(i => ("p", s"p$i")) ++
        (0 until 300).map(i => ("q", s"q$i"))).toDF("g", "v")
    val o2 = Profiling.kmvSetOps(
      Profiling.kmvSketch(dj, "g", col("v"), k), "g", k).collect()(0)
    assert(o2.getDouble(4) == 0.0 && o2.getDouble(5) == 0.0)
  }

  test("sourceGramOverlap: shared grams, jaccard, and containment by hand") {
    import spark.implicits._
    // srcA: grams {a b c, b c d}; srcB: {b c d, c d e}; srcC disjoint.
    // shared(A,B) = {b c d} -> jaccard 1/3, containment 1/2
    val docs = Seq(
      (1L, "A", "a b c d"),         // grams: "a b c", "b c d"
      (2L, "B", "b c d e"),         // grams: "b c d", "c d e"
      (3L, "C", "x y z w")).toDF("doc_id", "source", "text")
    val out = Profiling.sourceGramOverlap(docs, "source", "text", gramSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(out(("A", "B")) == ((1L, 2L, 2L, round6(1.0 / 3), 0.5)))
    // DISJOINT pairs still get a row — zero overlap is the signal a
    // mixture designer most wants surfaced, not a missing entry
    assert(out(("A", "C")) == ((0L, 2L, 2L, 0.0, 0.0)))
    assert(out(("B", "C")) == ((0L, 2L, 2L, 0.0, 0.0)))
    assert(out.size == 3) // the full S-choose-2 matrix, exactly
    // a duplicated doc adds no new distinct grams: totals unchanged
    val out2 = Profiling.sourceGramOverlap(
      docs.unionByName(Seq((4L, "B", "b c d e")).toDF("doc_id", "source", "text")),
      "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4))).toSet
    assert(out2.contains(("A", "B", 1L, 2L)))
  }

  test("shardManifest: counts, ranges, token totals, and digest locality") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma"), (2L, "  delta   epsilon  zeta "),
      (3L, "eta"), (4L, "theta iota"), (16L, "kappa"), (17L, null))
      .toDF("doc_id", "text")
    val m = Profiling.shardManifest(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(m.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(m(0L)._1 == 2L && m(0L)._3 == 0L && m(0L)._4 == 16L) // ids 0 and 16
    assert(m(1L)._1 == 2L) // ids 1 and 17 (null text)
    assert(m(2L)._2 == 3L) // whitespace runs collapse: 3 tokens
    // digest is local: perturbing one doc changes ONLY its shard
    val docs2 = docs.withColumn("text",
      when(col("doc_id") === 3L, lit("eta CHANGED")).otherwise(col("text")))
    val m2 = Profiling.shardManifest(docs2, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(m2(3L) != m(3L)._5)
    assert(Seq(0L, 1L, 2L, 4L).forall(sh => m2(sh) == m(sh)._5))
    // digest is order-free: a reshuffled frame produces equal manifests
    val m3 = Profiling.shardManifest(docs.orderBy(col("text").desc_nulls_last),
      "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(m3 == m.map { case (k, v) => k -> v._5 })
  }

  test("manifestDiff: changed/shrunk/missing shards flagged, others ok") {
    import spark.implicits._
    val a = Seq((0L, "x"), (1L, "y"), (2L, "z"), (16L, "w"))
      .toDF("doc_id", "text")
    // gen B: shard 1 text changed, shard 2 dropped entirely
    val b = Seq((0L, "x"), (1L, "Y2"), (16L, "w")).toDF("doc_id", "text")
    val d = Profiling.manifestDiff(
      Profiling.shardManifest(a, "doc_id", "text", 16),
      Profiling.shardManifest(b, "doc_id", "text", 16))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(d(0L) == ((2L, 2L, true, true))) // ids 0+16, untouched
    assert(d(1L) == ((1L, 1L, true, false))) // same count, new content
    assert(d(2L) == ((1L, 0L, false, false))) // shard gone from B
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
