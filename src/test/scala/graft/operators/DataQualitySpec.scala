package graft.operators

import graft.SparkTestBase

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  // planted defects: one null key, one duplicated key (x3), one value
  // outside the domain, one out-of-range amount
  private val rows = Seq(
    (Option(1L), "A", 10.0),
    (Option(2L), "A", 20.0),
    (Option(2L), "B", 30.0),
    (Option(2L), "B", 40.0),
    (None, "C", 50.0),
    (Option(5L), "Z", -7.0))
    .toDF("id", "status", "amount")
  private val parent = Seq(1L, 2L).toDF("pid")

  test("each check counts exactly its planted violations") {
    val got = DataQuality.report(
      DataQuality.notNull(rows, "id"),
      DataQuality.unique(rows, Seq("id")),
      DataQuality.referential(rows, "id", parent, "pid"),
      DataQuality.acceptedValues(rows, "status", Seq("A", "B", "C")),
      DataQuality.inRange(rows, "amount", 0, 45))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("not_null:id") == 1)         // the None row
    assert(got("unique:id") == 2)           // id=2 appears 3x -> 2 excess
    assert(got("fk:id->pid") == 1)          // id=5 orphan; null id exempt
    assert(got("accepted:status") == 1)     // "Z"
    assert(got("range:amount") == 2)        // -7 and 50
  }

  test("referential check works when child and parent key share a name") {
    val child = Seq(1L, 2L, 9L).toDF("id")
    val par = Seq(1L, 2L).toDF("id") // same column name: must not collide
    val got = DataQuality.referential(child, "id", par, "id")
      .collect().head
    assert(got.getString(0) == "fk:id->id")
    assert(got.getLong(1) == 1L) // the orphan 9
  }

  test("fused single-pass rowChecks equals the standalone checks exactly") {
    val fused = DataQuality.rowChecks(rows, Seq(
      "not_null:id" -> DataQuality.isNullViolation("id"),
      "accepted:status" -> DataQuality.acceptedViolation("status", Seq("A", "B", "C")),
      "range:amount" -> DataQuality.rangeViolation("amount", 0, 45)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val standalone = DataQuality.report(
      DataQuality.notNull(rows, "id"),
      DataQuality.acceptedValues(rows, "status", Seq("A", "B", "C")),
      DataQuality.inRange(rows, "amount", 0, 45))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused == standalone)
    // and the fused form reads the table once
    val p = DataQuality.rowChecks(rows, Seq(
      "a" -> DataQuality.isNullViolation("id"),
      "b" -> DataQuality.rangeViolation("amount", 0, 45)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(p).size <= 1, p)
  }

  test("observed metrics ride along with the action — no extra scan") {
    val listener = new DataQuality.MetricsListener
    spark.listenerManager.register(listener)
    try {
      val observed = DataQuality.observed(rows, "dq_metrics", Seq(
        "null_ids" -> DataQuality.isNullViolation("id"),
        "bad_amounts" -> DataQuality.rangeViolation("amount", 0, 45)))
      // the action the pipeline was going to run anyway
      assert(observed.count() == 6)
      val m = listener.metricsFor("dq_metrics")
      assert(m.isDefined, "observed metrics not delivered")
      assert(m.get.getAs[Long]("null_ids") == 1L)
      assert(m.get.getAs[Long]("bad_amounts") == 2L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("tukey outliers: exact fences per group, strict-outside filter") {
    // group A: 1..11 uniform plus one far point; B: tight cluster
    val rows = ((1 to 11).map(i => ("A", i.toDouble)) :+ ("A", 100.0)) ++
      Seq(("B", 5.0), ("B", 5.1), ("B", 4.9), ("B", 50.0))
    val df = rows.toDF("g", "v")
    val out = DataQuality.outliers(df, Seq("g"), "v")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // A: q1=3.75, q3=9.25 -> fences [-4.5, 17.5]: only 100 outside
    // B: q1=4.975, q3=16.325 -> hi fence 33.35: only 50 outside
    assert(out.toSeq == Seq(("A", 100.0), ("B", 50.0)))
    val fences = DataQuality.outliers(df, Seq("g"), "v")
      .select("g", "lo_fence", "hi_fence").distinct().orderBy("g").collect()
    assert(fences.length == 2) // one fence pair per group survives
  }

  test("outliers: null-keyed groups are checked, not silently dropped") {
    val rows = Seq((Some("A"), 1.0), (Some("A"), 2.0), (Some("A"), 3.0),
      (None, 1.0), (None, 1.1), (None, 0.9), (None, 1000.0))
    val df = rows.toDF("g", "v")
    val out = DataQuality.outliers(df, Seq("g"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1)))
    // the dirty null group's extreme value must surface
    assert(out.toSeq == Seq((None, 1000.0)))
  }

  test("table checksum localizes planted corruption to exactly its chunks") {
    import org.apache.spark.sql.functions._
    val cols = Seq("id", "v")
    val src = (0 until 100).map(i =>
      (i.toLong, if (i == 90) null else s"val_$i")).toDF("id", "v")
    val dst = src
      .withColumn("v", when(col("id") === 25, lit("tampered")).otherwise(col("v")))
      .filter(col("id") =!= 47)
    val report = DataQuality.checksumCompare(
      DataQuality.tableChecksum(src, "id", 10L, cols),
      DataQuality.tableChecksum(dst, "id", 10L, cols))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(report.size == 10)
    assert(report(2L) == ((10L, 10L, false)), "mutated value: digest mismatch")
    assert(report(4L) == ((10L, 9L, false)), "deleted row: count mismatch")
    // every other chunk — including the one with the NULL row — agrees
    (0L until 10L).filterNot(Set(2L, 4L)).foreach { c =>
      assert(report(c) == ((10L, 10L, true)), s"chunk $c must match")
    }
    // identical tables: every chunk ok
    val clean = DataQuality.checksumCompare(
      DataQuality.tableChecksum(src, "id", 10L, cols),
      DataQuality.tableChecksum(
        (0 until 100).map(i => (i.toLong, if (i == 90) null else s"val_$i"))
          .toDF("id", "v"), "id", 10L, cols))
      .collect()
    assert(clean.forall(_.getBoolean(3)))
  }

  test("a clean table reports zero violations on every check") {
    val clean = Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("id", "status", "amount")
    val got = DataQuality.report(
      DataQuality.notNull(clean, "id"),
      DataQuality.unique(clean, Seq("id")),
      DataQuality.referential(clean, "id", parent, "pid"),
      DataQuality.acceptedValues(clean, "status", Seq("A", "B")),
      DataQuality.inRange(clean, "amount", 0, 10))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
    assert(got.size == 5)
  }
}

class DiffWinsorizeSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("diff: added/removed/changed with null-safe value compare and null keys") {
    val before = Seq(
      (Option(1L), Option("a"), Option(10.0)),
      (Option(2L), Option("b"), Option.empty[Double]),   // null -> value = changed
      (Option(3L), Option("c"), Option(30.0)),           // removed
      (Option.empty[Long], Option("nk"), Option(1.0)))   // null key, unchanged
      .toDF("k", "name", "bal")
    val after = Seq(
      (Option(1L), Option("a"), Option(10.0)),           // unchanged -> absent
      (Option(2L), Option("b"), Option(2.5)),
      (Option(4L), Option("d"), Option(40.0)),           // added
      (Option.empty[Long], Option("nk"), Option(1.0)))
      .toDF("k", "name", "bal")
    val out = DataQuality.diff(before, after, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1), r.getString(2))).toSet
    assert(out == Set((2L, "changed", "bal"), (3L, "removed", ""),
      (4L, "added", "")))
    // schema drift fails loudly instead of diffing garbage
    intercept[IllegalArgumentException] {
      DataQuality.diff(before, after.withColumnRenamed("bal", "balance"), Seq("k"))
    }
  }

  test("diff: multi-column changes list every differing column, sorted") {
    val b = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    val a = Seq((1L, "y", 2.0)).toDF("k", "name", "bal")
    val r = DataQuality.diff(b, a, Seq("k")).first()
    assert(r.getString(1) == "changed" && r.getString(2) == "bal,name")
  }

  test("winsorize clamps to exact percentiles, leaves the middle alone") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = DataQuality.winsorize(df, "v", 0.05, 0.95)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // exact percentiles of 1..100: p5 = 5.95, p95 = 95.05
    assert(out(1.0) == 5.95 && out(100.0) == 95.05)
    assert(out(50.0) == 50.0)
    assert(out(6.0) == 6.0 && out(95.0) == 95.0)
  }

  test("winsorize keeps null in, null out — no fabricated cutoff values") {
    val df = Seq(Some(1.0), None, Some(100.0), Some(50.0)).toDF("v")
    val out = DataQuality.winsorize(df, "v", 0.25, 0.75)
    assert(out.filter($"v".isNull).count() == 1)
    assert(out.filter($"v".isNull && $"v_w".isNotNull).count() == 0)
    assert(out.filter($"v" === 50.0).first().getDouble(1) == 50.0)
  }

  test("nucleusByGroup includes the crossing row and never empties a group") {
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 30L), ("a", 3L, 15L), ("a", 4L, 5L),
      ("b", 5L, 100L)).toDF("g", "id", "w")
    val kept = Sampling.nucleusByGroup(df, Seq("g"), "id", "w", 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    // group a total 100: row 50 (before=0) kept; row 30 (before=50 < 60)
    // kept — crossing row included; row 15 (before=80) dropped
    assert(kept == Set(1L, 2L, 5L))
    // p tiny: the top row still survives (before=0 < anything positive)
    val one = Sampling.nucleusByGroup(df, Seq("g"), "id", "w", 0.01)
      .filter(col("g") === "a").count()
    assert(one == 1L)
  }

  test("ks drift equals the all-values reference model and locates the sup") {
    val aVals = (1 to 100).map(_.toDouble)
    val bVals = (41 to 140).map(_.toDouble) // shifted by 40
    val ref = aVals.toDF("x")
    val cur = bVals.toDF("x")
    val r = DataQuality.ksDrift(ref, cur, "x", buckets = 8).collect().head
    // naive reference: evaluate |Fa - Fb| at every observed value
    val all = (aVals ++ bVals).distinct.sorted
    val naive = all.map { v =>
      val fa = aVals.count(_ <= v).toDouble / aVals.size
      val fb = bVals.count(_ <= v).toDouble / bVals.size
      (math.abs(fa - fb), v)
    }.max // (diff, value) max == the operator's struct ordering
    assert(math.abs(r.getDouble(0) - naive._1) < 1e-9,
      s"ks ${r.getDouble(0)} vs naive ${naive._1}")
    assert(r.getDouble(1) == naive._2)
    assert(r.getLong(2) == 100L && r.getLong(3) == 100L)
    // identical samples: zero drift
    val same = DataQuality.ksDrift(ref, aVals.toDF("x"), "x").collect().head
    assert(same.getDouble(0) == 0.0)
  }

  test("psi drift: identical frames score ~0, drained bucket dominates, all finite") {
    val ref = (0 until 100).map(i => Tuple1((i % 10).toDouble * 10 + 5)).toDF("v")
    // current: bucket 9 (90..100) drained into bucket 0
    val cur = (0 until 100).map { i =>
      val b = i % 10; Tuple1((if (b == 9) 0 else b).toDouble * 10 + 5) }.toDF("v")
    def psi(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      DataQuality.psiDrift(a, b, "v", 0.0, 100.0, 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val same = psi(ref, ref)
    assert(same.size == 12) // 10 interior + under/overflow
    assert(same.values.forall(_ == 0.0)) // p == q exactly -> term 0
    val moved = psi(ref, cur)
    assert(moved.values.forall(v => !v.isNaN && !v.isInfinite)) // smoothing
    // exact terms: bucket 9 went 10 -> 0, bucket 0 went 10 -> 20,
    // totals 100 each, 12 smoothing cells
    def term(nRef: Long, nCur: Long) = {
      val p = (nCur + 1.0) / 112; val q = (nRef + 1.0) / 112
      BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(moved(9L) == term(10, 0))
    assert(moved(0L) == term(10, 20))
    assert(moved(5L) == 0.0)
    // the drained and doubled buckets dominate the total
    assert(moved(9L) + moved(0L) > 0.8 * moved.values.sum)
  }

  test("keyProfile: exact uniqueness, composite keys, null combos count") {
    val df = Seq((1L, Some("a"), "x"), (2L, Some("a"), "y"),
      (3L, None, "x"), (4L, None, "x"))
      .toDF("id", "c1", "c2")
    val out = DataQuality.keyProfile(df,
      Seq(Seq("id"), Seq("c1"), Seq("c1", "c2")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("id") == ((4L, 4L, 1.0, true)))
    // c1 values: a, a, null, null -> 2 distinct incl. the null class
    assert(out("c1") == ((4L, 2L, 0.5, false)))
    // (c1,c2): (a,x) (a,y) (null,x) (null,x) -> 3 distinct
    assert(out("c1,c2") == ((4L, 3L, 0.75, false)))
  }

  test("fdProfile: g3 violations, holding key, null-as-value semantics") {
    val df = Seq(
      (1L, "a", "x"), (1L, "a", "x"), (1L, "a", "y"),  // k=1 -> always 'a'
      (2L, "b", "x"), (2L, "b", "x"),                  // k=2 -> always 'b'
      (3L, null, "z"))                                 // null dep is a value
      .toDF("k", "dep", "other")
    val out = DataQuality.fdProfile(df, Seq(("k", "dep"), ("other", "dep")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val kd = out(("k", "dep"))
    assert(kd.getAs[Long]("n_rows") == 6L)
    assert(kd.getAs[Long]("n_groups") == 3L)
    assert(kd.getAs[Long]("violating_groups") == 0L)   // one dep per k
    assert(kd.getAs[Long]("violating_rows") == 0L)
    assert(kd.getAs[Boolean]("holds"))
    val od = out(("other", "dep"))
    assert(!od.getAs[Boolean]("holds"))
    // g3 = rows - sum(majority): x -> {a:2, b:2} maj 2, y -> {a:1},
    // z -> {null:1}  =>  6 - (2 + 1 + 1) = 2
    assert(od.getAs[Long]("violating_rows") == 2L)
    assert(od.getAs[Long]("violating_groups") == 1L)
    assert(od.getAs[Double]("violation_rate") ==
      BigDecimal(2.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }
}
