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
