package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.core.{ReplicationMode, SinkConf}
import graft.sources.{FileConnector, JdbcConnector}

/** Task-ATTEMPT retry chaos (verdict r11 #6). StreamingSpec proves
  * replayed-BATCH safety; this suite proves the finer-grained failure
  * mode a 1000-executor cluster hits daily: a task attempt dies
  * mid-stream (preemption, OOM-kill, spot reclaim) and Spark reruns
  * that one task. Every committer and fold the engine ships must
  * produce the same bytes as an undisturbed run — the atomic-swap
  * file committer, the JDBC complete and staging+merge incremental
  * paths (per-partition transactions roll back the dead attempt's
  * rows), and the streaming per-batch part-file folds (st26/st27
  * layout carries exactly-once, not the merge op).
  *
  * The test session runs `local[4,3]` (SparkTestBase) — the local
  * analog of a cluster's `spark.task.maxFailures=4`.
  */
class ChaosRetrySpec extends SparkTestBase {

  /** Kill the FIRST attempt of every task in this stage — at the
    * start (`afterRows=0`) or mid-stream after yielding some rows
    * (the harsher shape: a sink consuming the fused iterator has
    * already acted on rows when the stage dies). Narrow transform:
    * fuses into the consuming stage, so the CONSUMER's attempt is
    * what dies and retries. */
  private def chaos(df: DataFrame, afterRows: Int = 0): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc == null || tc.attemptNumber() > 0) it
      else if (afterRows <= 0)
        throw new RuntimeException("chaos: attempt 0 dies at stage start")
      else new Iterator[Row] {
        private var yielded = 0
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          if (yielded >= afterRows)
            throw new RuntimeException("chaos: attempt 0 dies mid-stream")
          yielded += 1
          it.next()
        }
      }
    }(Encoders.row(df.schema))

  private def fixture(n: Int): DataFrame =
    spark.range(1, n + 1).repartition(4).select(
      col("id").cast("int").as("C_INTEGER"),
      concat(lit("row_"), col("id")).as("C_VARCHAR"),
      (col("id") / 8.0).as("C_DOUBLE"))

  private def freshSink(): String = {
    val url = s"jdbc:derby:memory:chaos${System.nanoTime()};create=true"
    JdbcConnector.withConnection(url, Map.empty) { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE T_SINK (C_INTEGER INT PRIMARY KEY, " +
        "C_VARCHAR VARCHAR(64), C_DOUBLE DOUBLE)")
      st.close()
    }
    url
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "NULL" else r.get(i).toString).mkString("|"))
      .sorted.toSeq

  test("atomic-swap file committer: dead attempts leave no partial " +
      "bytes and exactly one published version") {
    val root = java.nio.file.Files.createTempDirectory("graft_chaos_atomic")
      .toString + "/sink"
    FileConnector.writeAtomic(chaos(fixture(200), afterRows = 7), root,
      "parquet", Map.empty)
    val back = spark.read.parquet(root)
    assert(canon(back) == canon(fixture(200)))
    // the version layout holds exactly one data generation — a dead
    // attempt must not publish a second dir or stray files
    val pub = new java.io.File(root)
    val versions = Option(pub.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(pub.getName))
    assert(versions.length <= 2, // live version + at most the symlink/dir pair
      s"unexpected layout: ${versions.map(_.getName).mkString(",")}")
  }

  test("JDBC complete mode: mid-write attempt death rolls back - no " +
      "duplicate rows after the retry") {
    val url = freshSink()
    JdbcConnector.write(chaos(fixture(200), afterRows = 11),
      SinkConf(connect = url, table = Some("T_SINK"),
        mode = ReplicationMode.Complete))
    val back = JdbcConnector.read(spark,
      graft.core.SourceConf(connect = url, table = Some("T_SINK"),
        partitions = 1))
    assert(back.count() == 200, "retry duplicated or dropped rows")
    assert(canon(back) == canon(fixture(200)))
  }

  test("JDBC incremental staging+merge: attempt death during the " +
      "staging load keeps the upsert exact") {
    val url = freshSink()
    val base = fixture(200).filter("C_INTEGER % 3 != 0")
    val delta = fixture(200).filter("C_INTEGER % 2 = 0")
      .withColumn("C_VARCHAR", lit("updated"))
    JdbcConnector.write(base, SinkConf(connect = url,
      table = Some("T_SINK"), mode = ReplicationMode.Complete))
    JdbcConnector.write(chaos(delta, afterRows = 5),
      SinkConf(connect = url, table = Some("T_SINK"),
        mode = ReplicationMode.Incremental))
    val expected = graft.operators.Modes.upsert(base, delta, Seq("C_INTEGER"))
    val back = JdbcConnector.read(spark,
      graft.core.SourceConf(connect = url, table = Some("T_SINK"),
        partitions = 1))
    assert(canon(back) == canon(expected))
  }

  test("streaming manifest fold: attempt death inside micro-batches " +
      "keeps the XOR digests byte-identical to the one-shot manifest") {
    val base = java.nio.file.Files.createTempDirectory("graft_chaos_man")
      .toString
    val docs = spark.range(0, 400).select(
      col("id").as("doc_id"),
      concat(lit("doc body "), col("id")).as("text"))
    val in = s"$base/in"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val stream = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.EventStream.streamingShardManifest(
      chaos(stream, afterRows = 17), "doc_id", "text", 8,
      s"$base/store", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    def canonMan(df: DataFrame): Seq[String] = canon(df.select(
      col("shard_id"), col("n_docs"), col("n_chars"), col("n_tokens"),
      col("min_id"), col("max_id"), col("digest")))
    val folded = graft.streaming.EventStream
      .manifestTable(spark, s"$base/store")
    val oneShot = graft.operators.Profiling
      .shardManifest(docs, "doc_id", "text", 8)
    // XOR digests are retry-UNSAFE if any row is applied twice — the
    // per-batch part layout must absorb the replayed attempt, or a
    // duplicated row CANCELS its own digest bit-for-bit
    assert(canonMan(folded) == canonMan(oneShot),
      "manifest fold diverged from the one-shot manifest after retries")
  }

  test("streaming KLL fold: attempt death inside micro-batches keeps " +
      "the per-batch part layout exactly-once (lossless count)") {
    val base = java.nio.file.Files.createTempDirectory("graft_chaos_st")
      .toString
    val docs = spark.range(0, 500).select(
      col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("lang"),
      (col("id") % 97 + 10).cast("double").as("n_chars"))
    val in = s"$base/in"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val stream = spark.readStream.schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = graft.streaming.EventStream.streamingKllSketch(
      chaos(stream, afterRows = 13), "lang", col("n_chars"), 200,
      s"$base/store", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val K = graft.functions.KllExpressions
    val folded = graft.streaming.EventStream
      .kllSketchTable(spark, s"$base/store", "lang")
      .select(col("lang"), K.kll_count(col("sk")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == exact,
      s"fold diverged after attempt retries: $folded vs $exact")
  }
}
