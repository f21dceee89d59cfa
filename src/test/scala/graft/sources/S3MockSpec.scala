package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{ReplConf, ReplicaEngine, ReplicationMode, SinkConf, SourceConf}

/** W10/W11 e2e through real `s3a://bucket/key` URIs (verdict r11 #2):
  * [[S3MockFileSystem]] plugs into the `fs.s3a.impl` slot exactly as
  * hadoop-aws would, so the engine's S3 dispatch, file-mode writes,
  * atomic swap, incremental append, S3 SOURCE reads, and the
  * object-per-row sink all run their production branches end-to-end —
  * the reference behavior being matched is
  * `manager/S3Manager.java:172-289` (file mode + object-per-row). */
class S3MockSpec extends SparkTestBase {

  // eager: the mock must hold the fs.s3a.impl slot BEFORE the first
  // test touches an s3a:// URI
  private val root: String = {
    val r = Files.createTempDirectory("graft_s3mock").toString
    S3MockFileSystem.install(spark, r)
    r
  }

  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")

  test("complete file-mode replication lands in the bucket and reads " +
      "back through the engine's S3 source path") {
    val sink = s"s3a://bucket-a/out_complete"
    ReplicaEngine.replicate(spark, ReplConf(
      source = SourceConf(connect = s"${sf()}/orders.parquet",
        columns = Some(Seq("o_orderkey", "o_orderstatus", "o_totalprice")),
        where = Some("o_totalprice > 150000")),
      sink = SinkConf(connect = sink, mode = ReplicationMode.Complete,
        options = Map("format" -> "parquet"))))
    val expected = orders.filter("o_totalprice > 150000").count()
    // bytes physically landed under the mock bucket (not the cwd, not
    // a literal "s3a:" local dir)
    val bucketDir = new java.io.File(s"$root/bucket-a/out_complete")
    assert(bucketDir.isDirectory &&
      bucketDir.listFiles().exists(_.getName.endsWith(".parquet")),
      s"no parquet objects under $bucketDir")
    // read back through the ENGINE's source dispatch (kindOf → S3)
    val back = ReplicaEngine.read(spark, SourceConf(connect = sink,
      options = Map("format" -> "parquet")))
    assert(back.count() == expected)
    assert(back.columns.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
  }

  test("incremental file-mode appends to the bucket across two runs") {
    val sink = s"s3a://bucket-a/out_incr"
    def run(whereClause: String): Unit = ReplicaEngine.replicate(spark,
      ReplConf(
        source = SourceConf(connect = s"${sf()}/orders.parquet",
          columns = Some(Seq("o_orderkey", "o_totalprice")),
          where = Some(whereClause)),
        sink = SinkConf(connect = sink, mode = ReplicationMode.Incremental,
          options = Map("format" -> "parquet"))))
    run("o_orderkey % 2 = 0")
    run("o_orderkey % 2 = 1")
    val back = spark.read.parquet(sink)
    assert(back.count() == orders.count())
    assert(back.select(sum("o_orderkey")).head.getLong(0) ==
      orders.select(sum("o_orderkey")).head.getLong(0))
  }

  test("complete-atomic uses the rename-aside branch on s3a and " +
      "swaps a pre-existing table without a partial window") {
    val sink = s"s3a://bucket-b/out_atomic"
    def run(whereClause: String): Unit = ReplicaEngine.replicate(spark,
      ReplConf(
        source = SourceConf(connect = s"${sf()}/orders.parquet",
          columns = Some(Seq("o_orderkey", "o_orderstatus")),
          where = Some(whereClause)),
        sink = SinkConf(connect = sink,
          mode = ReplicationMode.CompleteAtomic,
          options = Map("format" -> "parquet"))))
    run("o_orderkey <= 100") // first write creates the target
    run("o_orderkey > 100") // second write swaps over live content
    val back = spark.read.parquet(sink)
    val expected = orders.filter("o_orderkey > 100")
    assert(back.count() == expected.count())
    assert(back.filter("o_orderkey <= 100").count() == 0,
      "stale generation still visible after the swap")
    // rename-aside cleanup: no __old/__staging leftovers in the bucket
    val names = Option(new java.io.File(s"$root/bucket-b").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(names == Set("out_atomic"), s"leftover dirs: $names")
  }

  test("object-per-row sink (W11) writes one object per key into the " +
      "bucket via the FileSystem API") {
    import spark.implicits._
    val docs = Seq(
      ("doc/1.txt", "alpha"),
      ("doc/2.txt", "beta"),
      ("doc/3.txt", "")).toDF("key", "body").repartition(2)
    ObjectPerRowSink.write(docs, "s3a://bucket-c/objs", "key", "body")
    def read(k: String): String = {
      val f = java.nio.file.Paths.get(s"$root/bucket-c/objs/$k")
      new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    }
    assert(read("doc/1.txt") == "alpha")
    assert(read("doc/2.txt") == "beta")
    assert(read("doc/3.txt") == "")
    // no .crc side files — the object is the payload (reference
    // parity: S3Manager uploads raw bodies)
    val stray = Option(new java.io.File(s"$root/bucket-c/objs/doc")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".crc"))
    assert(stray.isEmpty, s"checksum side files: ${stray.mkString(",")}")
  }
}
