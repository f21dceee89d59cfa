package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.{ReplicationMode, SinkConf, SourceConf}
import graft.sources.JdbcConnector

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(ts("2024-01-01 00:15:00"), 1, "click", 2.0),
    Ev(ts("2024-01-01 01:05:00"), 2, "view", 3.0))
  private val batch2 = Seq(
    Ev(ts("2024-01-01 01:30:00"), 2, "view", 4.0),
    Ev(ts("2024-01-01 02:30:00"), 1, "click", 5.0))

  test("windowed aggregation over a memory stream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedAgg(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 2L),
      ("2024-01-01 02:00:00.0", "click", 1L)))
  }

  test("stateful sessionization counts sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .groupBy("user_id").agg(max("n_events").as("n_events"), max("n_sessions").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    q.stop()
    // user 1: 00:05, 00:15 (one session), 02:30 (new) = 2 sessions, 3 events
    // user 2: 01:05, 01:30 within 30min -> 1 session, 2 events
    assert(rows(1L) == ((3L, 2L)))
    assert(rows(2L) == ((2L, 1L)))
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.streamingDedup(mem.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(batch1: _*) // user1/click appears twice in batch1
    q.processAllAvailable()
    mem.addData(batch2: _*) // user1/click + user2/view again
    q.processAllAvailable()
    val rows = spark.table("dedup_out")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    q.stop()
    // one row per distinct (user, type): dups within AND across batches dropped
    assert(rows.length == rows.distinct.length)
    assert(rows.toSet == Set((1L, "click"), (2L, "view")))
  }

  test("stream to JDBC upsert sink stays consistent across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val url = s"jdbc:derby:memory:stream${System.nanoTime()};create=true"
    JdbcConnector.withConnection(url, Map.empty) { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE AGG (USER_ID BIGINT PRIMARY KEY, N_EVENTS BIGINT, N_SESSIONS BIGINT)")
      st.close()
    }
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Ev]
    val stream = EventStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .toDF("USER_ID", "N_EVENTS", "N_SESSIONS")
    val q = EventStream.writeJdbcUpsert(stream,
      SinkConf(connect = url, table = Some("AGG"), mode = ReplicationMode.Incremental),
      checkpoint)
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val out = JdbcConnector.read(spark,
      SourceConf(connect = url, table = Some("AGG"), partitions = 1))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 2L)))
    assert(out(2L) == ((2L, 1L)))
  }

  test("file stream source to file sink e2e: dedup across discovered files") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_e2e")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString

    // second batch re-sends user 2's 01:30 event (a retry within the
    // watermark) plus a genuinely new event; the retry must be dropped
    val dup = Ev(ts("2024-01-01 01:30:00"), 2, "view", 4.0)
    val b2 = Seq(dup, Ev(ts("2024-01-01 02:00:00"), 3, "click", 6.0))

    batch1.toDF().coalesce(1).write.mode("append").parquet(in)
    val stream = EventStream.streamingDedup(
      EventStream.readFileStream(spark, in, batch1.toDF().schema),
      keyCols = Seq("ts", "user_id", "event_type"), watermark = "2 hours")
    val q = EventStream.writeFileStream(stream, out, chk)
    q.processAllAvailable()
    // new files appear after the query started: per-micro-batch discovery
    (batch2 :+ dup).toDF().coalesce(1).write.mode("append").parquet(in)
    b2.toDF().coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
      .select("ts", "user_id", "event_type", "value").as[Ev].collect()
    val expected = (batch1 ++ batch2 :+ b2.last).toSet
    assert(got.toSet == expected) // every distinct event once, no retry
    assert(got.length == expected.size)
  }

  test("stream-stream interval join attributes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventStream.intervalJoin(
      views.toDF().select($"user_id", $"ts".as("view_ts")),
      buys.toDF().select($"user_id", $"ts".as("p_ts"), $"value"),
      Seq("user_id"), "view_ts", "p_ts", window = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    // view arrives in batch 1; the matching purchase only in batch 2 —
    // the join must hold view state across the batch boundary
    views.addData(Ev(ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(ts("2024-01-01 08:00:00"), 2, "view", 0.0))
    q.processAllAvailable()
    buys.addData(Ev(ts("2024-01-01 10:30:00"), 1, "purchase", 9.0),
      Ev(ts("2024-01-01 10:30:00"), 2, "purchase", 7.0)) // 2.5h after u2's view
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out")
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 9.0))) // u2's purchase is outside the window
  }

  test("streaming signature dedup drops same-signature docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = EventStream.streamingNearDedup(
        mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("neardedup_out")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"))
    q.processAllAvailable()
    mem.addData(
      // identical text, different whitespace/case: same signature -> dropped
      (ts("2024-01-01 10:05:00"), 2L, "  THE   quick BROWN fox "),
      (ts("2024-01-01 10:06:00"), 3L, "completely different content here"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("neardedup_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("streaming PQ encode equals the batch codes (stateless projection)") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val books = graft.operators.Similarity.pqTrain(
      e, "vec_id", "embedding", m = 8, k = 16, maxIter = 2)
    val batch = graft.operators.Similarity.pqEncode(e, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.operators.Similarity.pqEncode(
        mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", books)
      .writeStream.format("memory").queryName("pq_stream_out")
      .outputMode("append").start()
    val rows = e.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    mem.addData(rows.take(rows.length / 2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(rows.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pq_stream_out")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(streamed == batch)
  }

  test("gopherRepetition gate: stream over two micro-batches == batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "aa\naa\nbb"), (2L, "x\ny"), (3L, "c\nc\nc\nd"))
    val batch = graft.operators.QualityFilters.gopherRepetition(
      rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val mem = MemoryStream[(Long, String)]
    val gated = graft.operators.QualityFilters.gopherRepetition(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = gated.writeStream.format("memory").queryName("rep_gate_out")
      .outputMode("append").start()
    mem.addData(rows.take(2): _*)
    mem.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rep_gate_out")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("cross-run signature gate drops stored-corpus dups from a stream") {
    // the persistent-store form of streamingNearDedup: the store
    // remembers LAST run's corpus, the stream is THIS run's intake;
    // stream-static anti-join, stateless, append mode
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((10L, "the quick brown fox"), (11L, "stored corpus doc"))
      .toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.simhashStore(corpus, "text")
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val gated = graft.operators.Dedup.incrementalDedupGate(
      mem.toDF().toDF("ts", "doc_id", "text"), sigs, "text")
    val q = gated.writeStream.format("memory").queryName("xrun_gate_out")
      .outputMode("append").start()
    mem.addData(
      // same signature as stored doc 10 (case/whitespace-insensitive)
      (ts("2024-01-01 10:00:00"), 1L, "  THE   quick BROWN fox "),
      (ts("2024-01-01 10:01:00"), 2L, "genuinely new material here"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("xrun_gate_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
    // batch == stream: the identical call on a batch frame agrees
    val batchKept = graft.operators.Dedup.incrementalDedupGate(
      Seq((1L, "  THE   quick BROWN fox "), (2L, "genuinely new material here"))
        .toDF("doc_id", "text"), sigs, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == Set(2L))
    // version guard (r7: the token hash changed generations — a
    // version-blind gate would compare unrelated signatures and
    // silently pass every duplicate): stores without the algo tag or
    // with a different one are refused loudly
    val fresh = Seq((1L, "x")).toDF("doc_id", "text")
    val untagged = sigs.drop("sig_algo")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.incrementalDedupGate(fresh, untagged, "text")
    }
    assert(e1.getMessage.contains("sig_algo"))
    val wrongAlgo = sigs.withColumn("sig_algo", lit("simhash64/xxhash64/v1"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.incrementalDedupGate(fresh, wrongAlgo, "text")
    }
    assert(e2.getMessage.contains("rebuild"))
  }

  test("closed sessions: in-batch close on gap, timeout close on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessionsStream(mem.toDF(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("closed_out")
      .outputMode("append").start()
    def us(s: String) = ts(s).getTime * 1000L
    mem.addData(batch1: _*) // u1: 00:05,00:15; u2: 01:05
    q.processAllAvailable()
    mem.addData(batch2: _*) // u2: 01:30 extends; u1: 02:30 CLOSES 00:05-00:15 in-batch
    q.processAllAvailable()
    val afterB2 = spark.table("closed_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // u1's first session closed in-batch (successor event 02:30);
    // u2's closed by TIMEOUT: batch2 moved the watermark to
    // 02:30 - 10min = 02:20, past u2's 01:30 + 30min deadline. u1's
    // 02:30 session (deadline 03:00) must still be open.
    assert(afterB2 == Set(
      (1L, us("2024-01-01 00:05:00"), us("2024-01-01 00:15:00"), 2L),
      (2L, us("2024-01-01 01:05:00"), us("2024-01-01 01:30:00"), 2L)))
    // push the watermark far past every open session + gap: the
    // event-time timeouts must flush them (two rounds: the watermark
    // advances at the NEXT batch boundary)
    for (h <- Seq("10", "11")) {
      mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("closed_out")
      .filter($"user_id" < 99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(all == Set(
      (1L, us("2024-01-01 00:05:00"), us("2024-01-01 00:15:00"), 2L),
      (1L, us("2024-01-01 02:30:00"), us("2024-01-01 02:30:00"), 1L),
      (2L, us("2024-01-01 01:05:00"), us("2024-01-01 01:30:00"), 2L)))
  }

  test("a late in-watermark event extends the open session backward") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessionsStream(mem.toDF(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    mem.addData(Ev(ts("2024-01-01 03:00:00"), 7, "click", 0.0))
    q.processAllAvailable()
    // 02:55 is 5 min late but inside the 10-min watermark: it must
    // merge AND move session_start back
    mem.addData(Ev(ts("2024-01-01 02:55:00"), 7, "click", 0.0))
    q.processAllAvailable()
    for (h <- Seq("10", "11")) {
      mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("late_out").filter($"user_id" === 7)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val us = (s: String) => ts(s).getTime * 1000L
    assert(got == Set((us("2024-01-01 02:55:00"), us("2024-01-01 03:00:00"), 2L)))
  }

  test("late event chains merge with each other and bridge into the open session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.closedSessionsStream(mem.toDF(), gapMinutes = 5,
        watermark = "60 minutes")
      .writeStream.format("memory").queryName("chain_out")
      .outputMode("append").start()
    mem.addData(Ev(ts("2024-01-01 12:00:00"), 7, "click", 0.0))
    q.processAllAvailable()
    // two late events 4 min apart, the later one 4 min before the open
    // session: {11:52, 11:56, 12:00} is ONE session under gap=5 —
    // naive per-event checks would emit a bogus [11:52] singleton
    mem.addData(Ev(ts("2024-01-01 11:56:00"), 7, "click", 0.0),
      Ev(ts("2024-01-01 11:52:00"), 7, "click", 0.0))
    q.processAllAvailable()
    for (h <- Seq("20", "21")) {
      mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val us = (s: String) => ts(s).getTime * 1000L
    val got = spark.table("chain_out").filter($"user_id" === 7)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((us("2024-01-01 11:52:00"), us("2024-01-01 12:00:00"), 3L)))
  }

  test("a late event more than a gap before the session becomes its own singleton") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // gap 5 min but watermark 60 min: late events can arrive that are
    // NOT mergeable — they must not be absorbed into a session with an
    // internal 30-minute hole
    val q = EventStream.closedSessionsStream(mem.toDF(), gapMinutes = 5,
        watermark = "60 minutes")
      .writeStream.format("memory").queryName("stale_out")
      .outputMode("append").start()
    mem.addData(Ev(ts("2024-01-01 12:00:00"), 7, "click", 0.0))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 11:30:00"), 7, "click", 0.0)) // 30 min late
    q.processAllAvailable()
    for (h <- Seq("20", "21")) {
      mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val us = (s: String) => ts(s).getTime * 1000L
    val got = spark.table("stale_out").filter($"user_id" === 7)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (us("2024-01-01 11:30:00"), us("2024-01-01 11:30:00"), 1L),
      (us("2024-01-01 12:00:00"), us("2024-01-01 12:00:00"), 1L)))
  }

  test("PQ drift monitor: in-distribution batch stays quiet, planted " +
      "drifted batch flips the retrain flag; streaming == batch stats") {
    import graft.operators.Similarity
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val books = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, k = 16,
      maxIter = 2)
    val (baseSq, baseN) = Similarity.pqResidualBaseline(e, "embedding", books)
    // batch 0: the training distribution itself; batch 1: drifted —
    // scaled + shifted vectors the codebooks never saw
    val drifted = e.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f) + lit(1.0f)).as("embedding"))
    val base = java.nio.file.Files.createTempDirectory("graft_pq_drift")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString
    e.select("vec_id", "embedding").coalesce(1).write.mode("append").parquet(in)
    drifted.coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val key = (col("vec_id") >= 10000).cast("int")
    val q = EventStream.pqDriftMonitor(stream, "embedding", books, key,
      baseSq, baseN, tolerance = 1.5, out, chk)
    try q.processAllAvailable() finally q.stop()
    val outCols = Seq("batch_key", "n_vectors", "mean_resid_sq", "retrain_flag")
    val got = spark.read.parquet(out).select(outCols.map(col): _*)
      .collect().map(r => (r.getInt(0), r.getBoolean(3))).toMap
    assert(got == Map(0 -> false, 1 -> true), s"flags: $got")
    // the monitor's per-batch fold is the batch operator verbatim:
    // integer-quantized sums make streaming and batch bit-equal
    val batchStats = Similarity.pqDriftStats(
        e.select("vec_id", "embedding").unionByName(drifted), "embedding",
        books, key, baseSq, baseN, tolerance = 1.5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val streamed = spark.read.parquet(out).select(outCols.map(col): _*)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(streamed == batchStats)
    // idempotence of the batch-id-keyed overwrite: re-writing batch 0
    // replaces its rows instead of appending duplicates
    Similarity.pqDriftStats(e.select("vec_id", "embedding"), "embedding",
        books, key, baseSq, baseN, tolerance = 1.5)
      .write.mode("overwrite").parquet(s"$out/batch=0")
    assert(spark.read.parquet(out).count() == 2)
  }

  test("streaming banded-LSH near-dup gate matches batch incrementalDedup " +
      "across micro-batches (RocksDB state v2)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val body = "the quick brown fox jumps over the lazy dog while rain " +
        "falls gently on the quiet village roofs tonight"
      case class Doc(doc_id: Long, text: String, ts: Timestamp)
      val b1 = Seq(
        (1L, s"$body in winter"),
        (2L, s"$body in summer"),   // near-dup of 1
        (3L, "completely unrelated content about database replication " +
          "engines and their bulk loading wire protocols"))
      val b2 = Seq(
        (4L, s"$body in autumn"),   // near-dup of 1 and 2 (cross-batch)
        (5L, "another fully distinct document mentioning spark catalyst " +
          "expressions and whole stage code generation"))
      def withTs(rows: Seq[(Long, String)]) =
        rows.map { case (id, tx) => (id, tx, ts(s"2024-01-01 00:0$id:00")) }
      val mem = MemoryStream[(Long, String, Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
      val q = EventStream.streamingLshNearDup(stream, "doc_id", "text",
          tsCol = "ts", watermark = "30 days", shingleSize = 3,
          numHashes = 64, numBands = 16, threshold = 0.5)
        .toDF().writeStream.format("memory").queryName("lsh_out")
        .outputMode("append").start()
      mem.addData(withTs(b1): _*)
      q.processAllAvailable()
      mem.addData(withTs(b2): _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("lsh_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // within-batch pair (2,1); cross-batch pairs (4,1), (4,2); the
      // distinct docs 3 and 5 pair with nothing
      assert(got == Set((2L, 1L), (4L, 1L), (4L, 2L)))
      // stream == batch: the cross-batch half must equal
      // incrementalDedup probing batch1 as the persisted store
      val store = b1.toDF("doc_id", "text")
      val fresh = b2.toDF("doc_id", "text")
      val (sb, ss) = graft.operators.Dedup.signatureStore(
        store, "doc_id", "text", 3, 64, 16)
      val batch = graft.operators.Dedup.incrementalDedup(
          fresh, sb, ss, "doc_id", "text", 3, 64, 16, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.filter(_._1 > 3L) == batch)
      // and the verified jaccard values are identical doubles
      val streamJ = spark.table("lsh_out").distinct()
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val batchJ = graft.operators.Dedup.incrementalDedup(
          fresh, sb, ss, "doc_id", "text", 3, 64, 16, threshold = 0.5)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      batchJ.foreach { case (k, v) => assert(streamJ(k) == v, s"jaccard $k") }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("candidates-only LSH stream is a superset of the verifying " +
      "gate's pairs, with ids-only state") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val body = "the quick brown fox jumps over the lazy dog while rain " +
        "falls gently on the quiet village roofs tonight"
      val feed = Seq(
        (1L, s"$body in winter", ts("2024-01-01 00:01:00")),
        (2L, s"$body in summer", ts("2024-01-01 00:02:00")),
        (3L, "completely unrelated content about database replication " +
          "engines and their bulk loading wire protocols",
          ts("2024-01-01 00:03:00")),
        (4L, s"$body in autumn", ts("2024-01-01 00:04:00")))
      def run(name: String, mk: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.Dataset[_]): Set[(Long, Long)] = {
        val mem = MemoryStream[(Long, String, Timestamp)]
        val q = mk(mem.toDF().toDF("doc_id", "text", "ts"))
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        mem.addData(feed.take(2): _*)
        q.processAllAvailable()
        mem.addData(feed.drop(2): _*)
        q.processAllAvailable()
        q.stop()
        spark.table(name).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val cands = run("lsh_cand_out", df =>
        EventStream.streamingLshCandidates(df, "doc_id", "text",
          tsCol = "ts", watermark = "30 days"))
      val verified = run("lsh_verif_out", df =>
        EventStream.streamingLshNearDup(df, "doc_id", "text",
          tsCol = "ts", watermark = "30 days", threshold = 0.5))
      assert(verified.subsetOf(cands),
        s"verified $verified not within candidates $cands")
      assert(verified == Set((2L, 1L), (4L, 1L), (4L, 2L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming LSH gate evicts bucket state behind the watermark " +
      "(boundedness contract)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val body = "the quick brown fox jumps over the lazy dog while rain " +
        "falls gently on the quiet village roofs tonight"
      val mem = MemoryStream[(Long, String, Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
      val q = EventStream.streamingLshNearDup(stream, "doc_id", "text",
          tsCol = "ts", watermark = "10 minutes", shingleSize = 3,
          numHashes = 64, numBands = 16, threshold = 0.5)
        .toDF().writeStream.format("memory").queryName("lsh_evict_out")
        .outputMode("append").start()
      // batch 1: the original doc at 00:00
      mem.addData((1L, s"$body in winter", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // batch 2: an unrelated doc three hours later — after this
      // batch the watermark advances to ~02:50, far past doc 1
      mem.addData((2L, "completely unrelated content about database " +
        "replication engines and wire protocols", ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      // batch 3: a near-dup of doc 1 — its bucket entry is behind the
      // watermark now, so the gate must NOT pair them
      mem.addData((3L, s"$body in summer", ts("2024-01-01 03:01:00")))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("lsh_evict_out").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set.empty[(Long, Long)],
        s"evicted doc must not pair: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("idle LSH bucket state is SWEPT by the event-time timer, not just " +
      "masked on access (r7 review)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String, Timestamp)]
      val stream = mem.toDF().toDF("doc_id", "text", "ts")
      val q = EventStream.streamingLshNearDup(stream, "doc_id", "text",
          tsCol = "ts", watermark = "10 minutes", shingleSize = 3,
          numHashes = 64, numBands = 16, threshold = 0.5)
        .toDF().writeStream.format("memory").queryName("lsh_sweep_out")
        .outputMode("append").start()
      def stateRows: Long =
        Option(q.lastProgress).toSeq.flatMap(_.stateOperators.map(_.numRowsTotal))
          .headOption.getOrElse(0L)
      // batch 1: five distinct docs at 00:00 fan out to many band
      // buckets whose keys will never be touched again
      mem.addData((1L to 5L).map(i => (i,
        s"unique payload number $i with entirely distinct words " +
          s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i",
        ts("2024-01-01 00:00:00"))): _*)
      q.processAllAvailable()
      val peak = stateRows // 5 docs x 16 band buckets
      // batch 2: one late doc pushes the watermark far past batch 1;
      // processAllAvailable includes the watermark-advancing empty
      // batch in which batch 1's sweep timers fire — its buckets are
      // CLEARED here even though no row ever touches those keys again
      mem.addData((10L, "later arrival content one", ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val after = stateRows
      q.stop()
      assert(peak >= 5 * 16, s"batch 1 should fan out state, saw $peak")
      assert(after < peak,
        s"idle buckets not swept: state rows $peak -> $after")
      // what remains is just the late doc's own buckets (+ its timers)
      assert(after <= 2 * 16, s"sweep left too much state: $after")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState sessions (state v2 + RocksDB) match the v1 semantics") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val q = EventStream.closedSessionsStreamV2(mem.toDF(), gapMinutes = 30,
          watermark = "10 minutes")
        .writeStream.format("memory").queryName("closed_v2_out")
        .outputMode("append").start()
      def us(s: String) = ts(s).getTime * 1000L
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      for (h <- Seq("10", "11")) { // push timers past every deadline
        mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
        q.processAllAvailable()
      }
      q.stop()
      val all = spark.table("closed_v2_out")
        .filter($"user_id" < 99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // identical close-out to the mapGroupsWithState form
      assert(all == Set(
        (1L, us("2024-01-01 00:05:00"), us("2024-01-01 00:15:00"), 2L),
        (1L, us("2024-01-01 02:30:00"), us("2024-01-01 02:30:00"), 1L),
        (2L, us("2024-01-01 01:05:00"), us("2024-01-01 01:30:00"), 2L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("built-in session_window works unchanged on a stream (append after watermark)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"sw.start".as("s"), $"sw.end".as("e"), $"n")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    for (h <- Seq("10", "11")) { // advance the watermark to finalize
      mem.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("sw_out").filter($"user_id" < 99)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      .toSet
    // merged sessions with end = last event + gap, emitted exactly once
    assert(got == Set(
      (1L, "2024-01-01 00:05:00.0", "2024-01-01 00:45:00.0", 2L),
      (1L, "2024-01-01 02:30:00.0", "2024-01-01 03:00:00.0", 1L),
      (2L, "2024-01-01 01:05:00.0", "2024-01-01 02:00:00.0", 2L)))
  }

  test("batch sessionBounds rolls up to the per-user sessionize totals") {
    val df = (batch1 ++ batch2).toDF()
    val bounds = EventStream.sessionBounds(df, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString, r.getLong(4))).toSet
    assert(bounds == Set(
      (1L, 1L, "2024-01-01 00:05:00.0", "2024-01-01 00:15:00.0", 2L),
      (1L, 2L, "2024-01-01 02:30:00.0", "2024-01-01 02:30:00.0", 1L),
      (2L, 1L, "2024-01-01 01:05:00.0", "2024-01-01 01:30:00.0", 2L)))
  }

  test("left-outer interval join emits unmatched views once the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventStream.intervalJoin(
      views.toDF().select($"user_id", $"ts".as("view_ts")),
      buys.toDF().select($"user_id", $"ts".as("p_ts"), $"value"),
      Seq("user_id"), "view_ts", "p_ts", window = "1 hour",
      watermark = "1 hour", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("outer_attr_out")
      .outputMode("append").start()
    // u1 converts within the hour; u2 never converts
    views.addData(Ev(ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(ts("2024-01-01 10:00:00"), 2, "view", 0.0))
    buys.addData(Ev(ts("2024-01-01 10:30:00"), 1, "purchase", 9.0))
    q.processAllAvailable()
    // u2's outer row must NOT appear yet: a purchase before 11:00
    // could still arrive
    val early = spark.table("outer_attr_out")
      .select("user_id", "value").as[(Long, java.lang.Double)].collect().toSet
    assert(early == Set((1L, java.lang.Double.valueOf(9.0))))
    // advance BOTH watermarks past view_ts + window + delay; the
    // watermark moves at the NEXT batch boundary, so push two rounds
    for (h <- Seq("20", "21")) {
      views.addData(Ev(ts(s"2024-01-01 $h:00:00"), 99, "view", 0.0))
      buys.addData(Ev(ts(s"2024-01-01 $h:00:00"), 98, "purchase", 1.0))
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("outer_attr_out")
      .filter($"user_id" === 2)
      .select("user_id", "value").as[(Long, java.lang.Double)].collect().toSet
    // exactly one outer row for u2, with null right-side columns
    assert(got == Set((2L, null: java.lang.Double)))
  }

  test("latestPerKey picks one newest row per key with a deterministic tiebreak") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10L, "a"),
      (1L, ts("2024-01-01 00:20:00"), 11L, "b"),
      (1L, ts("2024-01-01 00:20:00"), 12L, "c"),   // ts tie -> higher id wins
      (2L, ts("2024-01-01 00:05:00"), 13L, "d"))
      .toDF("user_id", "ts", "event_id", "tag")
    val out = EventStream.latestPerKey(df, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "c", 2L -> "d"))
  }

  test("upsert sink transform collapses each batch before the merge") {
    // one batch holds two versions of user 1; without the reduce the
    // merge order within the batch would be arbitrary
    implicit val sqlCtx = spark.sqlContext
    val url = s"jdbc:derby:memory:latest${System.nanoTime()};create=true"
    JdbcConnector.withConnection(url, Map.empty) { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE LATEST (USER_ID BIGINT PRIMARY KEY, " +
        "TS TIMESTAMP, VALUE DOUBLE)")
      st.close()
    }
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_lk").toString
    val mem = MemoryStream[Ev]
    val stream = mem.toDF().select(
      col("user_id").as("USER_ID"), col("ts").as("TS"), col("value").as("VALUE"))
    val q = EventStream.writeJdbcUpsert(stream,
      SinkConf(connect = url, table = Some("LATEST"),
        mode = ReplicationMode.Incremental),
      checkpoint,
      b => EventStream.latestPerKey(b, Seq("USER_ID"), Seq("TS")))
    mem.addData(batch1: _*)   // user 1 twice in ONE batch
    q.processAllAvailable()
    mem.addData(batch2: _*)   // later values arrive in a second batch
    q.processAllAvailable()
    q.stop()
    val out = JdbcConnector.read(spark,
      SourceConf(connect = url, table = Some("LATEST"), partitions = 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 5.0, 2L -> 4.0))
  }

  test("streaming count-min counters equal the batch fold across batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[Long]
    val chk = java.nio.file.Files.createTempDirectory("graft_cms_chk").toString
    val q = EventStream.streamingCountMin(mem.toDF().toDF("it"), col("it"),
      depth = 3, width = 8, queryName = "cms_out", checkpoint = chk)
    mem.addData(1L, 1L, 2L, 3L)
    q.processAllAvailable()
    mem.addData(2L, 9L, 9L, 9L, 1L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // batch fold over the union must be identical (associative sums)
    val all = Seq(1L, 1L, 2L, 3L, 2L, 9L, 9L, 9L, 1L).toDF("it")
    val batch = graft.operators.Profiling.countMinEstimates(all, col("it"),
      depth = 3, width = 8)
    val est = graft.operators.Profiling.cmsEstimates(
      all.groupBy(col("it").as("item"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_true")),
      spark.table("cms_out"), depth = 3, width = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batchEst = batch.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(est == batchEst)
    assert(streamed.values.sum == 9L * 3) // every row lands in 3 counters
  }

  test("streaming KMV store equals the batch sketch; replaying the stream " +
      "is a no-op (idempotent merge)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val base = java.nio.file.Files.createTempDirectory("graft_kmv_st").toString
    val store = s"$base/store"
    val q = EventStream.streamingKmv(mem.toDF().toDF("g", "v"), "g",
      col("v"), k = 32, store, s"$base/ckpt1")
    val b1 = (0 until 60).map(i => ("x", s"a$i"))
    val b2 = (30 until 90).map(i => ("x", s"a$i")) ++
      (0 until 10).map(i => ("y", s"b$i"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val streamed = rows(spark.read.parquet(store))
    val batch = rows(graft.operators.Profiling.kmvSketch(
      (b1 ++ b2).toDF("g", "v"), "g", col("v"), 32))
    assert(streamed == batch) // fold across batches == one-shot sketch
    // "y" saw < k distinct values: the sketch holds all 10 exactly
    assert(streamed.count(_._1 == "y") == 10)
    // at-least-once retry: replay the SAME data over the existing
    // store (fresh checkpoint) — the merge must change nothing
    val mem2 = MemoryStream[(String, String)]
    val q2 = EventStream.streamingKmv(mem2.toDF().toDF("g", "v"), "g",
      col("v"), k = 32, store, s"$base/ckpt2")
    mem2.addData(b1: _*); q2.processAllAvailable()
    q2.stop()
    assert(rows(spark.read.parquet(store)) == batch)
  }

  test("streaming IVF occupancy fold equals the batch recount and a " +
      "replayed micro-batch cannot double-count (per-batch partials)") {
    val sim = graft.operators.Similarity
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val books = sim.pqTrain(e, "vec_id", "embedding", m = 8, k = 16, maxIter = 2)
    val (index0, cents) = sim.pqIndexStore(
      e.filter(col("vec_id") <= 250), "vec_id", "embedding", books,
      nCentroids = 8)
    val base = java.nio.file.Files.createTempDirectory("graft_occ_st").toString
    val occPath = s"$base/occ"
    val occ0 = sim.ivfListOccupancy(index0, cents).localCheckpoint(true)
    EventStream.seedIvfOccupancy(occ0, occPath)
    // two real file-discovery micro-batches of appended vectors
    val appended = e.filter(col("vec_id") > 250).localCheckpoint(true)
    val in = s"$base/in"
    appended.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    appended.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runFold(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = EventStream.streamingIvfOccupancy(stream, cents, "vec_id",
        "embedding", books, occPath, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runFold(s"$base/ckpt1")
    def occMap(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
      d.collect().map(r => r.get(0).toString -> r.get(1).toString.toLong).toMap
    val folded = occMap(EventStream.ivfOccupancyTable(spark, occPath))
    // fold == batch recount: seed occupancy + coarse-routed append counts
    val appendedOcc = sim.pqIndexAppendOnline(
        appended, cents, "vec_id", "embedding", books)
      .groupBy("cent_id").agg(count(lit(1)).as("n2"))
    val recount = occMap(occ0.join(appendedOcc, Seq("cent_id"), "left")
      .select(col("cent_id"),
        (col("n_vectors") + coalesce(col("n2"), lit(0L))).as("n")))
    assert(folded == recount)
    // at-least-once replay: re-run the SAME batches against the same
    // store (fresh checkpoint => same batch ids) — each replay
    // overwrites its own batch_id partition, so the fold is unchanged
    runFold(s"$base/ckpt2")
    assert(occMap(EventStream.ivfOccupancyTable(spark, occPath)) == recount)
  }

  test("streaming memorization audit: per-batch partials union to the " +
      "batch audit; replay overwrites instead of duplicating") {
    val dec = graft.operators.Decontaminate
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = docs.filter(col("doc_id") >= 100)
    val gens = docs.filter(col("doc_id") < 40)
      .select("doc_id", "text").localCheckpoint(true)
    val (cg, bloom) = dec.corpusReference(corpus, "text", gramSize = 3)
    val base = java.nio.file.Files.createTempDirectory("graft_memst").toString
    val in = s"$base/in"
    gens.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    gens.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runAudit(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = EventStream.streamingMemorizationAudit(stream, "doc_id",
        "text", 3, cg, bloom, s"$base/out", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runAudit(s"$base/ckpt1")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("gen_id", "n_grams", "n_memorized_grams", "novelty",
        "max_memorized_words")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4))).toSet
    val streamed = rows(spark.read.parquet(s"$base/out"))
    val batch = rows(dec.memorizationAudit(gens, corpus, "doc_id", "text",
      gramSize = 3))
    assert(streamed == batch) // union of per-batch audits == one-shot audit
    // replay with a fresh checkpoint: same batch ids overwrite their
    // own partitions — no duplicated audit rows
    runAudit(s"$base/ckpt2")
    assert(rows(spark.read.parquet(s"$base/out")) == batch)
  }

  test("streaming KLL fold: lossless count, bounded quantiles, replay " +
      "overwrites its own part instead of double-weighting") {
    import spark.implicits._
    val K = graft.functions.KllExpressions
    val n = 4000
    val rows = (1 to n).map(i => (if (i % 4 == 0) "a" else "b", i.toDouble))
    val base = java.nio.file.Files.createTempDirectory("graft_kll_st").toString
    val in = s"$base/in"
    rows.filter(_._2 <= n / 2).toDF("g", "v").coalesce(1)
      .write.mode("append").parquet(in)
    rows.filter(_._2 > n / 2).toDF("g", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runFold(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = EventStream.streamingKllSketch(stream, "g", col("v"), 200,
        s"$base/store", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runFold(s"$base/ckpt1")
    def contract(): Map[String, (Long, Double)] =
      EventStream.kllSketchTable(spark, s"$base/store", "g")
        .select(col("g"), K.kll_count(col("sk")).as("n"),
          K.kll_quantile(col("sk"), 0.5).as("q50"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val c1 = contract()
    assert(c1("a")._1 == n / 4L && c1("b")._1 == 3L * n / 4)
    // group medians: a = multiples of 4 (median ~2000), b = the rest
    assert(math.abs(c1("a")._2 - n / 2.0) <= 0.05 * n)
    assert(math.abs(c1("b")._2 - n / 2.0) <= 0.05 * n)
    // at-least-once replay, fresh checkpoint => same batch ids: each
    // part OVERWRITES itself; a read-modify-write fold would have
    // doubled every weight and the counts would read 2x
    runFold(s"$base/ckpt2")
    val c2 = contract()
    assert(c2("a")._1 == n / 4L && c2("b")._1 == 3L * n / 4)
    assert(math.abs(c2("b")._2 - n / 2.0) <= 0.05 * n)
    // layout guard: a flat pre-partial store is rejected loudly
    val flat = s"$base/flat"
    Seq(("a", Array[Byte](1, 2))).toDF("g", "sk").write.parquet(flat)
    val err = intercept[IllegalArgumentException](
      EventStream.kllSketchTable(spark, flat, "g"))
    assert(err.getMessage.contains("batch_id"))
  }

  test("streaming manifest fold equals the one-shot manifest; replay " +
      "cannot XOR-cancel digests") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft_man_st").toString
    val in = s"$base/in"
    docs.filter(col("doc_id") < 100).coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") >= 100).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def runFold(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = EventStream.streamingShardManifest(stream, "doc_id", "text", 8,
        s"$base/store", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runFold(s"$base/ckpt1")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val batch = rows(graft.operators.Profiling.shardManifest(
      docs, "doc_id", "text", 8))
    assert(rows(EventStream.manifestTable(spark, s"$base/store")) == batch)
    // replay with a fresh checkpoint: the same batch ids OVERWRITE
    // their own parts. A read-modify-write fold would have XOR'd the
    // replayed digests a second time — self-inverse, so they would
    // CANCEL and the digest would claim those rows never existed;
    // the layout makes the replay a byte-identical no-op instead
    runFold(s"$base/ckpt2")
    assert(rows(EventStream.manifestTable(spark, s"$base/store")) == batch)
  }
}
