package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.core.{ReplicationMode, SinkConf, SourceConf}
import graft.sources.JdbcConnector

/** The reference's canonical e2e shape (SURVEY.md §5, FIXTURES.md §1):
  * one wide every-type table seeded with generated rows plus one
  * all-NULL row (non-null PK), replicated under each mode at 1 and 4
  * partitions, asserting row count AND full content — the content
  * check is the deliberate improvement over the reference's
  * count-only oracle (`Postgres2MySQLTest.java:100-206`).
  * Sink: embedded Derby (the environment's real JDBC database).
  */
class ReplicationMatrixSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("C_INTEGER", IntegerType, nullable = false),
    StructField("C_SMALLINT", ShortType),
    StructField("C_BIGINT", LongType),
    StructField("C_DECIMAL", DecimalType(18, 4)),
    StructField("C_REAL", FloatType),
    StructField("C_DOUBLE", DoubleType),
    StructField("C_BOOLEAN", BooleanType),
    StructField("C_VARCHAR", StringType),
    StructField("C_BINARY", BinaryType),
    StructField("C_DATE", DateType),
    StructField("C_TIMESTAMP", TimestampType)))

  private def fixture(n: Int): DataFrame = {
    val rows = (1 to n).map { i =>
      Row(i, (i % 100).toShort, i.toLong * 1000003,
        new java.math.BigDecimal(s"$i.25"), i / 4.0f, i / 8.0,
        i % 2 == 0, s"row_$i", Array[Byte](i.toByte, (i + 1).toByte),
        Date.valueOf("2024-01-01").toLocalDate.plusDays(i % 365)
          .let(java.sql.Date.valueOf),
        Timestamp.valueOf(s"2024-01-01 0${i % 10}:00:00"))
    } :+ Row(n + 1, null, null, null, null, null, null, null, null, null, null)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  // tiny let-helper for the date chain above
  implicit private class Let[A](a: A) {
    def let[B](f: A => B): B = f(a)
  }

  private def freshSink(): String = {
    val url = s"jdbc:derby:memory:matrix${System.nanoTime()};create=true"
    JdbcConnector.withConnection(url, Map.empty) { c =>
      val st = c.createStatement()
      st.execute("""CREATE TABLE T_SINK (
        C_INTEGER INT PRIMARY KEY, C_SMALLINT SMALLINT, C_BIGINT BIGINT,
        C_DECIMAL DECIMAL(18,4), C_REAL REAL, C_DOUBLE DOUBLE,
        C_BOOLEAN BOOLEAN, C_VARCHAR VARCHAR(64),
        C_BINARY VARCHAR(32) FOR BIT DATA, C_DATE DATE, C_TIMESTAMP TIMESTAMP)""")
      st.close()
    }
    url
  }

  private def readBack(url: String, partitions: Int): DataFrame = {
    val df = JdbcConnector.read(spark, SourceConf(connect = url,
      table = Some("T_SINK"), partitions = partitions,
      options = if (partitions > 1) Map("partition.key" -> "C_INTEGER") else Map.empty))
    df
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        if (r.isNullAt(i)) "NULL"
        else r.get(i) match {
          case b: Array[Byte] => b.mkString(",")
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case v => v.toString
        }
      }.mkString("|")
    }.sorted.toSeq

  private val n = 100

  for (partitions <- Seq(1, 4)) {
    test(s"complete mode, $partitions partition(s): full content round-trips incl. NULL row") {
      val url = freshSink()
      JdbcConnector.write(fixture(n).repartition(partitions),
        SinkConf(connect = url, table = Some("T_SINK"), mode = ReplicationMode.Complete))
      val back = readBack(url, partitions)
      assert(back.count() == n + 1)
      assert(canon(back) == canon(fixture(n)))
    }

    test(s"complete-atomic mode, $partitions partition(s): swapped content matches") {
      val url = freshSink()
      JdbcConnector.write(fixture(5), // pre-existing content to replace
        SinkConf(connect = url, table = Some("T_SINK"), mode = ReplicationMode.Complete))
      JdbcConnector.write(fixture(n).repartition(partitions),
        SinkConf(connect = url, table = Some("T_SINK"), mode = ReplicationMode.CompleteAtomic))
      val back = readBack(url, partitions)
      assert(canon(back) == canon(fixture(n)))
    }

    test(s"incremental mode, $partitions partition(s): merge equals DataFrame upsert oracle") {
      val url = freshSink()
      val base = fixture(n).filter("C_INTEGER % 3 != 0")
      val delta = fixture(n).filter("C_INTEGER % 2 = 0")
        .withColumn("C_VARCHAR", org.apache.spark.sql.functions.lit("updated"))
      JdbcConnector.write(base,
        SinkConf(connect = url, table = Some("T_SINK"), mode = ReplicationMode.Complete))
      JdbcConnector.write(delta.repartition(partitions),
        SinkConf(connect = url, table = Some("T_SINK"), mode = ReplicationMode.Incremental))
      val expected = graft.operators.Modes.upsert(base, delta, Seq("C_INTEGER"))
      assert(canon(readBack(url, partitions)) == canon(expected))
    }
  }

  test("replicate() end-to-end: CSV file source -> where filter -> Derby sink") {
    // the reference's canonical file path (SURVEY.md §3.3: CSV ->
    // Postgres) through the engine's full dispatch: scheme sniffing,
    // declared CSV schema, source-where, mode write, readback
    import graft.core.{ReplConf, ReplicaEngine}
    val dir = java.nio.file.Files.createTempDirectory("graft_repl_e2e").toString + "/in"
    fixture(n).select("C_INTEGER", "C_VARCHAR", "C_DOUBLE")
      .write.option("header", "true").csv(dir)
    val url = freshSink()
    ReplicaEngine.replicate(spark, ReplConf(
      source = SourceConf(connect = dir,
        columnNames = Some(Seq("C_INTEGER", "C_VARCHAR", "C_DOUBLE")),
        columnTypes = Some(Seq("INTEGER", "VARCHAR", "DOUBLE")),
        where = Some("C_INTEGER <= 50"),
        options = Map("format" -> "csv", "header" -> "true")),
      sink = SinkConf(connect = url, table = Some("T_SINK"),
        columns = Some(Seq("C_INTEGER", "C_VARCHAR", "C_DOUBLE")),
        mode = ReplicationMode.Complete)))
    val back = readBack(url, 1).select("C_INTEGER", "C_VARCHAR", "C_DOUBLE")
    assert(back.count() == 50)
    assert(back.filter("C_VARCHAR = 'row_7'").count() == 1)
  }
}
