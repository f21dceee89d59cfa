package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic "shuffled" stream: multiplicative-hash ordering of
  // 1..n (no RNG — house rule)
  private def stream(n: Int): Seq[Double] =
    (1 to n).sortBy(i => (i * 2654435761L) % 4294967296L).map(_.toDouble)

  private def rankOf(est: Double, n: Int): Int = (1 to n).count(_ <= est)

  test("rank error stays within eps*n across quantiles (10k stream, k=200)") {
    val n = 10000
    val s = new KllSketch.State(200)
    stream(n).foreach(KllSketch.update(s, _))
    assert(s.count == n)
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val est = KllSketch.quantile(s, q)
      assert(est == est.floor && est >= 1 && est <= n,
        s"estimate must be a stream element: $est")
      val err = math.abs(rankOf(est, n) - q * n)
      assert(err <= 0.03 * n, s"q=$q est=$est rank err $err > ${0.03 * n}")
    }
  }

  test("merge preserves count exactly and keeps the rank bound") {
    val n = 9973 // prime: uneven chunking
    val all = stream(n)
    val chunks = all.grouped(1500).toSeq
    val sketches = chunks.map { c =>
      val s = new KllSketch.State(200)
      c.foreach(KllSketch.update(s, _))
      s
    }
    // fold in a scrambled order — merge must not care
    val order = sketches.indices.sortBy(i => (i * 7 + 3) % sketches.size)
    val merged = order.map(sketches).reduceLeft(KllSketch.merge)
    assert(merged.count == n)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = KllSketch.quantile(merged, q)
      val err = math.abs(rankOf(est, n) - q * n)
      assert(err <= 0.04 * n, s"merged q=$q est=$est rank err $err")
    }
  }

  test("serialize/deserialize round-trips state and quantiles") {
    val s = new KllSketch.State(64)
    stream(5000).foreach(KllSketch.update(s, _))
    val back = KllSketch.deserialize(KllSketch.serialize(s))
    assert(back.count == s.count && back.k == s.k)
    for (q <- Seq(0.2, 0.5, 0.8))
      assert(KllSketch.quantile(back, q) == KllSketch.quantile(s, q))
    assert(KllSketch.countBytes(KllSketch.serialize(s)) == 5000L)
  }

  test("empty and tiny sketches: NaN on empty, exact below capacity") {
    val empty = new KllSketch.State(32)
    assert(KllSketch.quantile(empty, 0.5).isNaN)
    val tiny = new KllSketch.State(200)
    Seq(5.0, 1.0, 3.0).foreach(KllSketch.update(tiny, _))
    // everything fits level 0: quantiles are exact order statistics
    assert(KllSketch.quantile(tiny, 0.0) == 1.0)
    assert(KllSketch.quantile(tiny, 0.5) == 3.0)
    assert(KllSketch.quantile(tiny, 1.0) == 5.0)
  }

  test("DataFrame aggregate: per-group sketch bounds hold, NULLs skipped") {
    val df = (1 to 4000)
      .map(i => (if (i % 2 == 0) "a" else "b", Option(i.toDouble)))
      .toDF("g", "v")
      .unionByName(Seq(("a", None: Option[Double])).toDF("g", "v"))
    val K = KllExpressions
    val sk = df.groupBy("g").agg(K.kll_sketch(col("v"), 200).as("sk"))
      .select(col("g"), K.kll_count(col("sk")).as("n"),
        K.kll_quantile(col("sk"), 0.5).as("q50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sk("a")._1 == 2000L && sk("b")._1 == 2000L) // null skipped
    // group a = evens 2..4000, group b = odds 1..3999; median within 3%
    assert(math.abs(sk("a")._2 - 2000.0) <= 0.03 * 4000)
    assert(math.abs(sk("b")._2 - 2000.0) <= 0.03 * 4000)
  }

  test("kll_merge rollup equals one-shot sketch contract; mixed k rejected") {
    val df = (1 to 6000).map(i => (s"p${i % 5}", i.toDouble)).toDF("p", "v")
    val K = KllExpressions
    val parts = df.groupBy("p").agg(K.kll_sketch(col("v"), 128).as("sk"))
    val rolled = parts.agg(K.kll_merge(col("sk")).as("m"))
      .select(K.kll_count(col("m")).as("n"),
        K.kll_quantile(col("m"), 0.5).as("q50"))
      .head()
    assert(rolled.getLong(0) == 6000L)
    assert(math.abs(rolled.getDouble(1) - 3000.0) <= 0.04 * 6000)
    val bad = df.limit(100).agg(K.kll_sketch(col("v"), 128).as("a"))
      .crossJoin(df.limit(100).agg(K.kll_sketch(col("v"), 64).as("b")))
      .select(explode(array(col("a"), col("b"))).as("sk"))
      .agg(K.kll_merge(col("sk")))
    val err = intercept[Exception](bad.collect())
    assert(err.getMessage != null)
  }

  test("accuracy fence: <= 2% max rank error at k=200 on a structured " +
      "100k permutation (the r11b probe's defect class)") {
    // the global-alternation parity bug read 3.5-5.9% on exactly this
    // order class; the per-level splitmix coin reads ~0.6%. This spec
    // fails any future change that re-correlates compaction parity
    // with structured input orders
    val n = 100000
    val s = new KllSketch.State(200)
    (1 to n).sortBy(i => (i.toLong * 2654435761L) % 4294967296L)
      .foreach(i => KllSketch.update(s, i.toDouble))
    val maxErr = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).map { q =>
      math.abs(KllSketch.quantile(s, q) - math.ceil(q * n)) / n
    }.max
    assert(maxErr <= 0.02, f"max rank error ${maxErr * 100}%.2f%% > 2%%")
  }

  test("SQL registration: kll_* usable from spark.sql") {
    KllExpressions.registerAll(spark)
    spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kll_probe")
    val r = spark.sql(
      """SELECT kll_count(sk) AS n, kll_quantile(sk, 0.5) AS q50
        |FROM (SELECT kll_sketch(v, 200) AS sk FROM kll_probe)""".stripMargin)
      .head()
    assert(r.getLong(0) == 1000L)
    assert(math.abs(r.getDouble(1) - 500.0) <= 40.0)
    spark.catalog.dropTempView("kll_probe")
  }

  test("corrupt persisted bytes fail with an integrity message, " +
      "not a preallocation or EOF (review r11)") {
    val st = new KllSketch.State(64)
    (1 to 5000).foreach(i => KllSketch.update(st, i.toDouble))
    val good = KllSketch.serialize(st)
    // sanity: the untouched bytes round-trip
    assert(KllSketch.deserialize(good).count == 5000L)
    def expectCorrupt(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](KllSketch.deserialize(bytes))
      assert(e.getMessage.contains("rebuild it from the source data"),
        s"$what: got '${e.getMessage}'")
    }
    // truncated mid-payload: level sizes now exceed remaining bytes
    expectCorrupt(good.take(good.length / 2), "truncated blob")
    // level-count field inflated to a huge value (the preallocation
    // hazard): bytes[13..16] is nLevels in the v2 layout
    val bigLevels = good.clone()
    bigLevels(13) = 0x7F.toByte
    expectCorrupt(bigLevels, "inflated nLevels")
    // first per-level size field inflated (offset 17 header + 8 parity)
    val bigSize = good.clone()
    bigSize(25) = 0x7F.toByte
    expectCorrupt(bigSize, "inflated level size")
    // too short to even hold the fixed header
    expectCorrupt(Array[Byte](2, 0, 0), "header-short blob")
    // version mismatch keeps its own distinct generation message
    val wrongVer = good.clone(); wrongVer(0) = 9
    val e = intercept[IllegalArgumentException](KllSketch.deserialize(wrongVer))
    assert(e.getMessage.contains("different engine generation"))
  }

  test("k argument: any integral literal accepted, non-constant " +
      "rejected with a named analysis error (review r11)") {
    KllExpressions.registerAll(spark)
    spark.range(1, 101).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kll_arg_probe")
    // BIGINT and SMALLINT literals used to ClassCastException
    for (lit <- Seq("200L", "CAST(200 AS SMALLINT)", "CAST(200 AS INT)")) {
      val n = spark.sql(
        s"SELECT kll_count(kll_sketch(v, $lit)) AS n FROM kll_arg_probe")
        .head().getLong(0)
      assert(n == 100L, s"k literal $lit")
    }
    // non-constant, NULL, and non-integral arguments name the function
    for (bad <- Seq("v", "NULL", "'x'", "2.5")) {
      val e = intercept[Exception](spark.sql(
        s"SELECT kll_sketch(v, $bad) FROM kll_arg_probe").collect())
      assert(e.getMessage.contains("kll_sketch"),
        s"arg $bad: got '${e.getMessage}'")
      assert(e.getMessage.contains("constant integer"),
        s"arg $bad: got '${e.getMessage}'")
    }
    spark.catalog.dropTempView("kll_arg_probe")
  }
}
