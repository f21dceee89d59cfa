package graft.core

import graft.SparkTestBase

class TelemetrySpec extends SparkTestBase {

  test("measure captures rows read, shuffle traffic and task time") {
    val (rows, m) = Telemetry.measure(spark) {
      spark.read.parquet(s"${sf()}/lineitem.parquet")
        .groupBy("l_returnflag").count().collect().length
    }
    assert(rows == 3)
    assert(m.recordsRead >= 6000)
    assert(m.bytesRead > 0)
    assert(m.shuffleBytesWritten > 0 && m.shuffleBytesRead > 0)
    assert(m.tasks > 0 && m.taskTimeMs >= 0)
    assert(m.pretty.contains("rows"))
  }

  test("collection is scoped: listener removed after the block") {
    import org.apache.spark.graftbridge.ListenerBridge
    val before = ListenerBridge.listenerCount(spark.sparkContext)
    Telemetry.measure(spark)(spark.range(10).count())
    assert(ListenerBridge.listenerCount(spark.sparkContext) == before)
  }
}

class GraftExtensionsSpec extends SparkTestBase {

  test("extension registers the native functions in a fresh extensions set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders resolvable
    // and the runtime-registration path exposes the same names via SQL
    graft.functions.TextExpressions.registerAll(spark)
    val out = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L))")
      .first().getInt(0)
    assert(out == 2)
  }

  test("new injections resolve and evaluate through plain SQL") {
    graft.functions.TextExpressions.registerAll(spark)
    val row = spark.sql(
      """SELECT dedup_tokens_in_doc('a b a').clean_text AS c,
        |       unicode_normalize('é', 'NFC') AS n,
        |       repetition_stats('x x x', 1).top_count AS t,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
        |""".stripMargin).first()
    assert(row.getAs[String]("c") == "a b")
    assert(row.getAs[String]("n") == "é")
    assert(row.getAs[Long]("t") == 3L)
    assert(row.getAs[Double]("d") == 11.0)
  }

  test("pq_argmin resolves through SQL with a literal codebook") {
    graft.functions.VectorExpressions.registerAll(spark)
    val code = spark.sql(
      "SELECT pq_argmin(array(0.4D, 0.6D), " +
        "array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS c").first().getInt(0)
    assert(code == 1) // closer to (0,1)
    // plain SQL literals parse as DECIMAL — the codebook fold must
    // cast, not ClassCastException
    val dec = spark.sql(
      "SELECT pq_argmin(cast(array(0.4, 0.6) AS array<double>), " +
        "array(array(1.0, 0.0), array(0.0, 1.0))) AS c").first().getInt(0)
    assert(dec == 1)
    // a non-foldable codebook is rejected with the artifact message
    val err = intercept[Exception] {
      spark.range(1).selectExpr(
        "pq_argmin(array(0.1D), array(array(cast(id AS double))))").collect()
    }
    assert(err.getMessage.contains("artifact"))
  }
}
