package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.StructType

import graft.core.SinkConf
import graft.sources.JdbcConnector

/** Structured Streaming surface — a beyond-parity extension (the
  * reference has no streaming; SURVEY.md §2.8): the same replication
  * pipe as `readStream -> transforms -> writeStream`, plus watermarked
  * window aggregation and stateful sessionization.
  *
  * Every transform here works on both batch and streaming DataFrames
  * (the batch equivalents are verified against DuckDB oracles in
  * SparkEntry st1/st2) — write once, run either mode, which is the
  * point of Structured Streaming.
  */
object EventStream {

  /** File-based event stream (the streaming analogue of the engine's
    * file source): new files under `path` are discovered per
    * micro-batch. */
  def readFileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)

  /** Tumbling-window counts/sums per event type with a watermark for
    * state cleanup; late data beyond `watermark` is dropped. */
  def windowedAgg(events: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes",
      tsCol: String = "ts", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window)
        .getField("start").as("window_start"), col(typeCol))
      .agg(count(lit(1)).as("n"), round(sum(valueCol), 2).as("sum_value"))

  /** Session state for mapGroupsWithState sessionization. */
  case class SessionState(lastTsMicros: Long, nEvents: Long, nSessions: Long)
  case class SessionUpdate(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful sessionization: a new session starts after `gapMinutes`
    * of inactivity per user. Streaming-native via
    * KeyValueGroupedDataset.mapGroupsWithState; the batch-equivalent
    * (lag/window) is SparkEntry.st2_sessionize.
    *
    * Scale: state is one tiny record per user key, partitioned by
    * user hash — linear in distinct users, not events.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes.toLong * 60 * 1000000

    events
      .selectExpr("user_id", "unix_micros(ts) AS ts_us")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { ts =>
            val newSession = st.lastTsMicros == Long.MinValue || ts - st.lastTsMicros > gapMicros
            st = SessionState(ts, st.nEvents + 1, st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          SessionUpdate(userId, st.nEvents, st.nSessions)
      }
  }

  /** Closed sessions with bounds, batch form: gaps-and-islands
    * (new-session flag via lag, running sum as session id), then one
    * aggregate per (user, session). Returns (user_id, session_id,
    * session_start, session_end, n_events). One exchange on the user
    * key; tie order at equal timestamps cannot change bounds or
    * counts. The streaming form with event-time-timeout emission is
    * [[closedSessionsStream]]; batch MATCH is SparkEntry st6.
    */
  def sessionBounds(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol).asc)
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol).cast("timestamp")) -
            unix_micros(col("__prev").cast("timestamp")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("__new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Per-key open-session state for [[closedSessionsStream]]. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Shared per-key merge step for both closed-session processors:
    * fold the batch's sorted timestamps into gap-separated intervals,
    * add the open-session interval from state, merge overlapping /
    * within-gap intervals (this is what makes CHAINS of late events
    * sessionize correctly — two late events 2 minutes apart form one
    * late session, and a late chain that reaches within the gap of
    * the open session bridges into it), then return (sessions closed
    * now = all but the last, new open state = the last). */
  private[streaming] def mergeSessions(state: Option[OpenSession],
      sortedTs: Seq[Long], gapUs: Long): (Seq[OpenSession], OpenSession) = {
    val batchIvs = sortedTs.foldLeft(List.empty[OpenSession]) {
      case (h :: t, ts) if ts - h.lastUs <= gapUs =>
        OpenSession(h.startUs, math.max(h.lastUs, ts), h.n + 1) :: t
      case (acc, ts) => OpenSession(ts, ts, 1) :: acc
    }.reverse
    val all = (batchIvs ++ state.toList).sortBy(s => (s.startUs, s.lastUs))
    val merged = all.foldLeft(List.empty[OpenSession]) {
      case (h :: t, iv) if iv.startUs - h.lastUs <= gapUs =>
        OpenSession(math.min(h.startUs, iv.startUs),
          math.max(h.lastUs, iv.lastUs), h.n + iv.n) :: t
      case (acc, iv) => iv :: acc
    }.reverse
    (merged.init, merged.last)
  }

  /** Streaming closed-session emission: a session is emitted exactly
    * once, when it CLOSES — either a later event of the same user
    * opens the next session (in-batch close), or the event-time
    * watermark passes last_event + gap with no successor
    * (`GroupStateTimeout.EventTimeTimeout` fires and flushes the open
    * session). This is the flatMapGroupsWithState shape — emit on
    * state transition — where [[sessionizeStream]]'s
    * mapGroupsWithState emits a running value per key per batch.
    * Timestamps are unix micros in the output (callers re-cast).
    *
    * Scale: state is ONE OpenSession record per live user key, evicted
    * by the timeout — bounded by concurrently-active users, not
    * events. Late events beyond the watermark may resurrect a closed
    * session as a new one (the standard watermark deal).
    */
  def closedSessionsStream(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    events
      .withWatermark("ts", watermark)
      // the watermarked column itself must survive to the stateful
      // operator (Spark's event-time-timeout analysis requires it)
      .selectExpr("user_id", "ts", "unix_micros(ts) AS ts_us")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: no successor can arrive
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.startUs, s.lastUs, s.n))
          } else {
            // interval-merge semantics: batch events fold into their
            // own gap-separated sessions first, then merge with the
            // open session — so late in-watermark events chain with
            // EACH OTHER and can bridge into the open session; every
            // merged interval except the newest closes now (the
            // emit-on-successor contract), the newest stays open
            val sorted = rows.map(_._3).toSeq.sorted
            if (sorted.isEmpty && state.getOption.isEmpty) Iterator.empty
            else {
              val (closedIvs, open) = mergeSessions(state.getOption, sorted, gapUs)
              state.update(open)
              state.setTimeoutTimestamp((open.lastUs + gapUs) / 1000) // millis
              closedIvs.iterator.map(s =>
                ClosedSession(userId, s.startUs, s.lastUs, s.n))
            }
          }
      }
  }

  /** [[closedSessionsStream]] on the Spark 4 arbitrary-state v2 API
    * (`transformWithState`): identical semantics, but state lives in
    * named typed handles (`ValueState[OpenSession]`) and session
    * close-by-inactivity uses REGISTERED EVENT-TIME TIMERS instead of
    * the single implicit mapGroupsWithState timeout — the v2 model
    * allows many timers and state variables per key, schema
    * evolution, and the RocksDB store (required by Spark for this
    * operator; set `spark.sql.streaming.stateStore.providerClass` to
    * the RocksDB provider). Each extension of a session deletes the
    * old timer and registers the new deadline; the expired timer
    * flushes the open session exactly once.
    */
  class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long), ClosedSession] {
    private val gapUs = gapMinutes.toLong * 60 * 1000000
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    private def deadlineMs(s: OpenSession): Long = (s.lastUs + gapUs) / 1000

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val prev = if (open.exists()) Some(open.get()) else None
      prev.foreach(s => getHandle.deleteTimer(deadlineMs(s)))
      val sorted = rows.map(_._3).toSeq.sorted
      if (sorted.isEmpty && prev.isEmpty) Iterator.empty
      else {
        // same interval-merge semantics as the v1 form above
        val (closedIvs, openIv) = mergeSessions(prev, sorted, gapUs)
        open.update(openIv)
        getHandle.registerTimer(deadlineMs(openIv))
        closedIvs.iterator.map(s => ClosedSession(key, s.startUs, s.lastUs, s.n))
      }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists() && deadlineMs(open.get()) == expiredTimerInfo.getExpiryTimeInMs) {
        val s = open.get()
        open.clear()
        Iterator.single(ClosedSession(key, s.startUs, s.lastUs, s.n))
      } else Iterator.empty
  }

  /** See [[SessionProcessor]]; requires the RocksDB state store. */
  def closedSessionsStreamV2(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "ts", "unix_micros(ts) AS ts_us")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming exact dedup: drop rows whose key columns were already
    * seen, with state bounded by the watermark (late duplicates beyond
    * it are not caught — that is the deal that keeps state finite).
    * The in-flight half of Dedup.exact for ingestion pipelines.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming SIGNATURE-level near-dup drop: documents whose 64-bit
    * simhash collides with one already seen inside the watermark are
    * dropped — the in-flight counterpart of [[graft.operators.Dedup.simhashPairs]]
    * for ingestion pipelines (batch near-dup sweeps still run behind
    * it for hamming > 0). Signature equality is aggressive by design:
    * docs at hamming 0 are overwhelmingly boilerplate/near-identical,
    * and an (astronomically rare) unrelated collision costs one doc.
    * State = one signature per distinct doc shape within the
    * watermark, evicted with it.
    *
    * The dedup key includes [[graft.operators.Dedup.SimHashAlgo]]:
    * the state-key schema changes whenever the signature algorithm
    * generation does, so restarting from a checkpoint written by a
    * previous generation FAILS LOUDLY (state schema incompatibility)
    * instead of silently comparing unrelated signature values and
    * passing every pre-restart duplicate for a watermark window —
    * the streaming counterpart of the batch store's sig_algo guard.
    * Upgrading across a generation requires a fresh checkpoint.
    */
  def streamingNearDedup(docs: DataFrame, textCol: String,
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame = {
    var sig = "__sig"
    while (docs.columns.contains(sig)) sig += "_"
    docs
      .withColumn(sig, graft.functions.TextExpressions.simhash64(
        org.apache.spark.sql.functions.split(
          lower(trim(col(textCol))), "\\s+")))
      .withColumn(s"${sig}_algo", lit(graft.operators.Dedup.SimHashAlgo))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(sig, s"${sig}_algo")
      .drop(sig, s"${sig}_algo")
  }

  /** Shared idle-key sweep mechanics for the LSH processors: one
    * event-time timer just past the newest entry (the watermark
    * already encodes the delay), re-armed on every update and on any
    * firing that finds live entries — a key with state always has a
    * pending sweep. */
  private def armSweep(
      handle: org.apache.spark.sql.streaming.StatefulProcessorHandle,
      newestTsUs: Long): Unit = {
    val expiry = newestTsUs / 1000L + 1L
    handle.listTimers().foreach(t => if (t != expiry) handle.deleteTimer(t))
    handle.registerTimer(expiry)
  }

  /** Evict entries behind the watermark; clear the key when nothing
    * survives, otherwise re-arm the sweep for the survivors. */
  private def sweepOrClear[T: scala.reflect.ClassTag](
      state: org.apache.spark.sql.streaming.ListState[T], tsOf: T => Long,
      wmUs: Long,
      handle: org.apache.spark.sql.streaming.StatefulProcessorHandle): Unit = {
    val live = state.get().filter(t => tsOf(t) >= wmUs).toArray
    if (live.isEmpty) state.clear()
    else { state.put(live); armSweep(handle, live.map(tsOf).max) }
  }

  case class LshDocRow(bucket: Long, id: Long, hs: Array[Long],
      ts: java.sql.Timestamp, tsUs: Long)
  case class NearDupHit(new_id: Long, dup_of: Long, jaccard: Double)

  /** Stateful streaming banded-LSH near-dup gate (VERDICT r5 #3) —
    * the in-flight form of [[graft.operators.Dedup.incrementalDedup]]
    * with IDENTICAL semantics: same tokenization, same
    * `minhash_band_buckets_text` band hashing, same
    * `xxhash64(band, bucket)` key, same EXACT shingle-Jaccard verify —
    * so the pairs a stream emits are the pairs the batch probe would
    * have found, micro-batch by micro-batch.
    *
    * Keyed by band-bucket: each key's `ListState` holds the (id,
    * sorted-distinct shingle hashes) of every doc that landed in the
    * bucket inside the watermark. An incoming doc probes the stored
    * list (exact merge-scan Jaccard, threshold gate), emits verified
    * (new_id, dup_of, jaccard) hits against everything earlier —
    * arrival order within a micro-batch is pinned to (ts, id) so the
    * pair direction is deterministic and equals the id-ordered batch
    * sweep — then appends itself to the bucket. Entries behind the
    * current watermark evict lazily on access, AND an event-time
    * timer registered at (newest entry + 1ms) sweeps the key when it
    * goes idle — event-time timers fire only once the WATERMARK
    * passes them, and the watermark itself trails max-event-time by
    * the configured delay, so the delay is encoded in when the timer
    * fires, not in where it is registered (see [[armSweep]]). r6
    * advisory: without the timer, a bucket that stops receiving rows
    * would retain its expired signature-list state forever.
    *
    * A pair colliding in several bands is emitted once per colliding
    * bucket (keys are independent); emissions are identical rows, so
    * the caller's terminal `.distinct()` — a batch post-step over the
    * emitted table, st11-style — restores set semantics. Verifying
    * IN STATE is a deliberate trade: the shingle array rides to all
    * `numBands` buckets (state and shuffle pay signature x bands),
    * buying exact batch-equal verdicts in-flight;
    * [[LshCandidateProcessor]] is the candidates-only variant (ids in
    * state, verify joined downstream) that cuts state to 16 bytes x
    * bands when in-flight verdicts aren't required.
    */
  class LshBucketProcessor(threshold: Double)
      extends StatefulProcessor[Long, LshDocRow, NearDupHit] {
    @transient private var docs: org.apache.spark.sql.streaming.ListState[LshDocRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[LshDocRow]("docs",
        org.apache.spark.sql.Encoders.product[LshDocRow], TTLConfig.NONE)

    /** Exact Jaccard of two sorted-distinct hash arrays, the same
      * I/(A+B-I) double division the batch verify (and the DuckDB
      * oracle) computes from the same exact integers. */
    private def jaccard(a: Array[Long], b: Array[Long]): Double = {
      var i = 0; var j = 0; var inter = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      inter.toDouble / (a.length + b.length - inter)
    }

    override def handleInputRows(key: Long, rows: Iterator[LshDocRow],
        timerValues: TimerValues): Iterator[NearDupHit] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val stored = scala.collection.mutable.ArrayBuffer.empty[LshDocRow]
      docs.get().foreach(d => if (d.tsUs >= wmUs) stored += d)
      val out = List.newBuilder[NearDupHit]
      rows.toArray.sortBy(d => (d.tsUs, d.id)).foreach { r =>
        var k = 0
        while (k < stored.length) {
          val s = stored(k)
          if (s.id != r.id) {
            val j = jaccard(r.hs, s.hs)
            if (j >= threshold) out += NearDupHit(r.id, s.id, j)
          }
          k += 1
        }
        stored += r
      }
      docs.put(stored.toArray)
      // idle-key hygiene: see armSweep
      armSweep(getHandle, stored.map(_.tsUs).max)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[NearDupHit] = {
      // normally clears the key outright; if anything is still live
      // (e.g. a stale timer restored from a checkpoint), sweepOrClear
      // re-arms — never a silent return to unbounded retention
      sweepOrClear[LshDocRow](docs, _.tsUs,
        timerValues.getCurrentWatermarkInMs() * 1000L, getHandle)
      Iterator.empty
    }
  }

  /** See [[LshBucketProcessor]]; requires the RocksDB state store.
    * Returns the verified near-dup pair stream; callers `.distinct()`
    * the materialized output (multi-band emissions are identical
    * rows). */
  def streamingLshNearDup(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String = "ts", watermark: String = "30 days",
      shingleSize: Int = 3, numHashes: Int = 64, numBands: Int = 16,
      threshold: Double = 0.8): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hs = graft.functions.TextExpressions
      .sorted_shingle_hashes(col(textCol), shingleSize)
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), hs.as("hs"),
        col(tsCol).as("ts"),
        posexplode(graft.functions.TextExpressions
          .minhash_band_buckets_text(col(textCol), shingleSize,
            numHashes, numBands)).as(Seq("band", "__bb")))
      .select(xxhash64(col("band"), col("__bb")).as("bucket"),
        col("id"), col("hs"), col("ts"),
        unix_micros(col("ts")).as("tsUs"))
      .as[LshDocRow]
      .groupByKey(_.bucket)
      .transformWithState(new LshBucketProcessor(threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class LshCandRow(bucket: Long, id: Long, ts: java.sql.Timestamp,
      tsUs: Long)
  case class CandidateHit(new_id: Long, dup_of: Long)

  /** The candidates-only sibling of [[LshBucketProcessor]]: bucket
    * state holds (id, ts) ONLY — 16 bytes per (doc, band) instead of
    * the full shingle signature × bands — and the processor emits
    * UNVERIFIED candidate id pairs. Callers run the exact-Jaccard
    * verify downstream as a batch join against a signature store
    * (exactly [[graft.operators.Dedup.incrementalDedup]]'s verify
    * stage), trading in-flight verdicts for an order less state and
    * shuffle. Candidate direction and arrival-order semantics are
    * identical to the verifying processor, so
    * candidates ⊇ its verified pairs on the same feed, always. */
  class LshCandidateProcessor
      extends StatefulProcessor[Long, LshCandRow, CandidateHit] {
    @transient private var docs: org.apache.spark.sql.streaming.ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[(Long, Long)]("ids",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[LshCandRow],
        timerValues: TimerValues): Iterator[CandidateHit] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val stored = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      docs.get().foreach(d => if (d._2 >= wmUs) stored += d)
      val out = List.newBuilder[CandidateHit]
      rows.toArray.sortBy(d => (d.tsUs, d.id)).foreach { r =>
        var k = 0
        while (k < stored.length) {
          if (stored(k)._1 != r.id) out += CandidateHit(r.id, stored(k)._1)
          k += 1
        }
        stored += ((r.id, r.tsUs))
      }
      docs.put(stored.toArray)
      // idle-key hygiene — see armSweep
      armSweep(getHandle, stored.map(_._2).max)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CandidateHit] = {
      sweepOrClear[(Long, Long)](docs, _._2,
        timerValues.getCurrentWatermarkInMs() * 1000L, getHandle)
      Iterator.empty
    }
  }

  /** See [[LshCandidateProcessor]]; same band hashing as
    * [[streamingLshNearDup]] and the batch signature store. Returns
    * the candidate pair stream; callers `.distinct()` the
    * materialized output and verify with exact Jaccard downstream. */
  def streamingLshCandidates(docs: DataFrame, idCol: String,
      textCol: String, tsCol: String = "ts", watermark: String = "30 days",
      shingleSize: Int = 3, numHashes: Int = 64,
      numBands: Int = 16): Dataset[CandidateHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        posexplode(graft.functions.TextExpressions
          .minhash_band_buckets_text(col(textCol), shingleSize,
            numHashes, numBands)).as(Seq("band", "__bb")))
      .select(xxhash64(col("band"), col("__bb")).as("bucket"),
        col("id"), col("ts"), unix_micros(col("ts")).as("tsUs"))
      .as[LshCandRow]
      .groupByKey(_.bucket)
      .transformWithState(new LshCandidateProcessor(),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming count-min fold: micro-batches aggregate straight into
    * the d×w counter table ([[graft.operators.Profiling.cmsBucket]]
    * buckets, complete-mode memory sink named `queryName`). Counter
    * increments are associative sums, so the table after N batches is
    * IDENTICAL to the batch fold over the union — the mergeability
    * that lets a sketch of an unbounded stream live in depth·width
    * rows of state, ever. Read `spark.table(queryName)` after the
    * stream drains and hand it to
    * [[graft.operators.Profiling.cmsEstimates]]. */
  def streamingCountMin(items: DataFrame, itemCol: org.apache.spark.sql.Column,
      depth: Int, width: Int, queryName: String,
      checkpoint: String): StreamingQuery = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2, s"width >= 2: $width")
    items
      .select(itemCol.cast("long").as("item"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("d"))
      .withColumn("bucket",
        graft.operators.Profiling.cmsBucket(col("item"), col("d"), width))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("c"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Streaming KMV distinct-sketch maintenance: each micro-batch's
    * (group, value) rows fold into a persisted (group, rank, h)
    * bottom-k sketch store at `path` — batch sketch via
    * [[graft.operators.Profiling.kmvSketch]], merged with the store
    * through [[graft.operators.Profiling.kmvMerge]] (distinct union,
    * re-rank, k smallest), full overwrite per batch. The store after
    * any prefix of batches IS the batch sketch of their union, so an
    * unbounded stream's distinct-cardinality state lives in
    * groups×k rows, ever — and any moment's store answers
    * [[graft.operators.Profiling.kmvEstimate]]/[[graft.operators.Profiling.kmvSetOps]]
    * directly.
    *
    * foreachBatch is at-least-once; safe here because the KMV merge
    * is IDEMPOTENT — a retried micro-batch re-merges the same hashes
    * into the same sketch (unlike a counter fold, no overcount). The
    * merged frame is localCheckpoint-materialized before the
    * overwrite so the store path is never read and clobbered in the
    * same job. */
  def streamingKmv(stream: DataFrame, groupCol: String,
      valueCol: org.apache.spark.sql.Column, k: Int, path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val batchSk = graft.operators.Profiling.kmvSketch(
          batch.toDF(), groupCol, valueCol, k)
        val dir = new java.io.File(path)
        val merged =
          if (dir.isDirectory && dir.listFiles().exists(f =>
              f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
            graft.operators.Profiling.kmvMerge(
              spark.read.parquet(path), batchSk, groupCol, k)
          else batchSk
        merged.localCheckpoint(true).write.mode("overwrite").parquet(path)
      }
      .start()

  /** Streaming IVF list-occupancy fold — [[graft.operators.Similarity
    * .ivfListSkewReport]]'s mergeable-partial claim exercised at
    * ingestion: each micro-batch of new vectors is coarse-routed
    * against the store's OWN centroids (the streaming-safe
    * [[graft.operators.Similarity.pqIndexAppendOnline]] argmax, no
    * state, no shuffle) and its per-list counts fold into a persisted
    * occupancy table by plain addition — counts are the partials, so
    * stream-fold == batch recount exactly, and the skew report over
    * the folded table equals the batch report (sim19's oracle). Seed
    * `path` with the training-time occupancy (written under
    * `batch_id=-1`, see [[seedIvfOccupancy]]) before starting; zero
    * lists persist through every fold.
    *
    * REPLAY-SAFE BY LAYOUT: foreachBatch is at-least-once, and a
    * counter fold that read-modifies-overwrites one table would
    * double-count a replayed micro-batch (crash after the write,
    * before the offset commit) and could corrupt the store by
    * clobbering the very files the fold is still reading. Instead
    * each batch writes ONLY its own partial counts to the partition
    * `path/batch_id=<id>` — a replay of batch B deterministically
    * overwrites partition B with the same rows (idempotent), never
    * touches other batches' partials, and never reads the store at
    * all. [[ivfOccupancyTable]] folds the partials on read. */
  def streamingIvfOccupancy(stream: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]],
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val enc = graft.operators.Similarity.pqIndexAppendOnline(
          batch.toDF(), centroids, idCol, vecCol, books)
        enc.groupBy("cent_id")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_vectors"))
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** Memorization audit at generation-ingestion time (the st-form of
    * mem1): each micro-batch of model generations is scored against a
    * PREBUILT corpus reference ([[graft.operators.Decontaminate
    * .memorizationAuditAgainst]] — distinct corpus gram frame + its
    * Bloom, both built once before the stream starts) and the batch's
    * audit rows land in the per-batch partition `path/batch_id=<id>`.
    * Every audit column is per-generation-independent, so the union
    * of the partials IS the batch audit of the union — and the
    * partition layout makes an at-least-once replay overwrite its own
    * partial instead of appending duplicates (same replay-safety
    * argument as [[streamingIvfOccupancy]]). The synthetic-data loop
    * this exists for: generations stream out of a sampler, and ones
    * that regurgitate training text are flagged BEFORE they re-enter
    * a training mix. */
  def streamingMemorizationAudit(stream: DataFrame, idCol: String,
      textCol: String, gramSize: Int, corpusGrams: DataFrame,
      bloomBytes: Array[Byte], path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Decontaminate.memorizationAuditAgainst(
          batch.toDF(), idCol, textCol, gramSize, corpusGrams, bloomBytes)
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** Streaming KLL quantile-sketch maintenance: each micro-batch's
    * (group, value) rows become a per-group PART sketch
    * ([[graft.functions.KllExpressions.kll_sketch]]) written ONLY to
    * the partition `path/batch_id=<id>`; [[kllSketchTable]] folds the
    * parts with `kll_merge` on read. The folded store after any
    * prefix of batches satisfies the same rank-error contract as the
    * one-shot batch sketch of their union (merge is lossless in
    * weight, bounded in rank error), so an unbounded stream's
    * length-distribution state lives in batches×groups O(k)-byte
    * rows.
    *
    * REPLAY-SAFE BY LAYOUT, and here it is load-bearing in a way the
    * KMV fold is not: KMV re-merging a replayed batch is a no-op
    * (distinct hashes), but KLL merge is NOT idempotent — re-merging
    * the same part would double those items' weight and silently
    * shift every quantile. The per-batch partition layout makes a
    * replay overwrite its own part with identical bytes instead
    * (the [[streamingIvfOccupancy]] argument), so the fold stays
    * exactly-once without reading the store in the hot path. */
  def streamingKllSketch(stream: DataFrame, groupCol: String,
      valueCol: org.apache.spark.sql.Column, k: Int, path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.toDF().groupBy(groupCol)
          .agg(graft.functions.KllExpressions
            .kll_sketch(valueCol.cast("double"), k).as("sk"))
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** The folded per-group sketch view over a [[streamingKllSketch]]
    * store: `kll_merge` of the per-batch parts. Same layout guard as
    * [[ivfOccupancyTable]] — a flat pre-partial store would fold
    * wrong, so its absence of `batch_id` is rejected loudly. */
  def kllSketchTable(spark: SparkSession, path: String,
      groupCol: String): DataFrame = {
    val raw = spark.read.parquet(path)
    require(raw.columns.contains("batch_id"),
      s"KLL sketch store at $path predates the per-batch partial " +
        "layout (no batch_id partition) - rebuild it via " +
        "streamingKllSketch before folding")
    raw.groupBy(org.apache.spark.sql.functions.col(groupCol))
      .agg(graft.functions.KllExpressions.kll_merge(
        org.apache.spark.sql.functions.col("sk")).as("sk"))
  }

  /** Streaming shard-manifest maintenance: each micro-batch's docs
    * fold into the content-addressed manifest
    * ([[graft.operators.Profiling.shardManifest]]) as a per-batch
    * PART at `path/batch_id=<id>`; [[manifestTable]] folds parts on
    * read (counts/sums/min/max add and fold trivially; the md5-xor
    * digest is a mergeable partial BY DESIGN — XOR of the parts'
    * digests equals the digest of the union). The folded manifest
    * after any prefix of batches is byte-identical to the batch
    * manifest of their union, so generation diffs
    * ([[graft.operators.Profiling.manifestDiff]]) work against a
    * LIVE ingesting corpus.
    *
    * Same replay-safety-by-layout argument as [[streamingKllSketch]],
    * and XOR makes it load-bearing again: re-XORing a replayed
    * batch's digests into a read-modify-write store would CANCEL
    * them (XOR is self-inverse) — strictly worse than double-counting
    * because the digest would read as "these rows were never there".
    * The partition overwrite makes replay a byte-identical no-op. */
  def streamingShardManifest(stream: DataFrame, idCol: String,
      textCol: String, nShards: Int, path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Profiling.shardManifest(
            batch.toDF(), idCol, textCol, nShards)
          .write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** The folded manifest view over a [[streamingShardManifest]]
    * store: every column folds by its own merge (sum / min / max /
    * bit_xor). Layout guard as in [[kllSketchTable]]. */
  def manifestTable(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(path)
    require(raw.columns.contains("batch_id"),
      s"manifest store at $path predates the per-batch partial layout " +
        "(no batch_id partition) - rebuild it via streamingShardManifest " +
        "before folding")
    raw.groupBy("shard_id")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum("n_tokens").as("n_tokens"),
        min("min_id").as("min_id"),
        max("max_id").as("max_id"),
        expr("bit_xor(digest)").as("digest"))
  }

  /** Seed a [[streamingIvfOccupancy]] store with the training-time
    * occupancy (so zero lists persist and the fold starts from the
    * batch baseline): the seed is just the partial at `batch_id=-1`,
    * below every micro-batch id. */
  def seedIvfOccupancy(occupancy: DataFrame, path: String): Unit =
    occupancy.write.mode("overwrite").parquet(s"$path/batch_id=-1")

  /** The folded occupancy view over a [[streamingIvfOccupancy]]
    * store: sum of the per-batch partials (counts are the mergeable
    * partial, so this equals the batch recount after any prefix of
    * batches — and equals it after a replayed batch too, because the
    * replay overwrote its own partition rather than re-adding).
    *
    * Layout guard: a store written by the PRE-partial layout (one
    * flat folded table at `path`) reads back under the identical
    * (cent_id, n_vectors) schema but would silently double-count
    * once partials land next to it — so a store with no `batch_id`
    * partition column is rejected loudly with the migration step. */
  def ivfOccupancyTable(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    require(raw.columns.contains("batch_id"),
      s"occupancy store at $path predates the per-batch partial layout " +
        "(no batch_id partition) - re-seed it with seedIvfOccupancy " +
        "before folding streams into it")
    raw.groupBy("cent_id")
      .agg(org.apache.spark.sql.functions.sum("n_vectors").as("n_vectors"))
  }

  /** Stream -> JDBC incremental sink: each micro-batch is staged and
    * merged (exactly the engine's incremental mode) via foreachBatch —
    * idempotent upserts make the sink consistent under micro-batch
    * retries. `transform` runs per batch before the merge (e.g.
    * [[latestPerKey]] to collapse a batch to one row per key — without
    * it a batch holding two versions of a key would merge both in
    * arbitrary order). */
  def writeJdbcUpsert(stream: DataFrame, conf: SinkConf,
      checkpoint: String,
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        JdbcConnector.write(transform(batch.toDF()), conf)
      }
      .start()

  /** Collapse to the newest row per key: deterministic pick by
    * `orderCols` descending (include a unique tiebreaker column).
    * Used as the per-batch reduce for change-log upserts; when event
    * time is monotone across micro-batches, batch-local latest +
    * last-writer-wins merge composes to the global latest. */
  def latestPerKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Stream-stream interval join (attribution): right-side events
    * matched to same-key left-side events at most `window` earlier —
    * "purchases attributed to the view that preceded them". Both
    * sides carry watermarks, so join state is EVICTED once an event
    * ages past watermark + window; without the time bound a
    * stream-stream join would buffer both streams forever.
    *
    * Mode-agnostic like every transform here: on batch frames the
    * watermark is a no-op and this is a keyed range join (equi on
    * keys -> hash/sort-merge, never a nested loop); the batch
    * equivalent is verified against a DuckDB oracle
    * (SparkEntry st4), the streaming behavior in StreamingSpec.
    * Column names must be disjoint apart from `keys` (alias first).
    *
    * `joinType = "left_outer"` keeps UNMATCHED left rows (right
    * columns null) — the other half of attribution analysis ("which
    * views never converted"). In streaming mode Spark emits an outer
    * row only once the watermark proves no matching right event can
    * still arrive, which is why both the watermark and the time-range
    * bound are mandatory for outer stream-stream joins; on batch
    * frames it is a plain left outer range join. Batch MATCH:
    * SparkEntry st5; streaming emission: StreamingSpec.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, window: String = "1 hour",
      watermark: String = "1 hour", joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join requires key columns")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark) else left)
      .alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark) else right)
      .alias("r")
    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") < col(s"l.$leftTs") + expr(s"INTERVAL $window")
    keys.foldLeft(l.join(r, cond, joinType))((df, k) => df.drop(col(s"r.$k")))
  }

  /** Streaming PQ codebook drift guard — the monitor st15's
    * train-offline/encode-online split needs: nothing in the encode
    * path notices when the incoming distribution has drifted away
    * from the codebooks' training distribution, so stale codebooks
    * silently degrade every downstream ADC ranking. Each micro-batch
    * folds its vectors' quantized reconstruction residuals
    * ([[graft.operators.Similarity.pqResidualQ]] — exact integer
    * sums, order-free and mergeable) into one row per `batchKey`
    * group and appends (batch_key, n_vectors, mean_resid_sq,
    * retrain_flag) to `path`; the flag fires when the batch's mean
    * residual exceeds `tolerance` × the training-time baseline
    * ([[graft.operators.Similarity.pqResidualBaseline]], persisted
    * with the codebooks). Flag up ⇒ re-train and re-encode.
    *
    * foreachBatch (not a stateful agg): the statistic is
    * batch-local by design — drift is a property of "this
    * ingestion slice vs training time", so no cross-batch state and
    * no watermark. foreachBatch is at-least-once, so each batch
    * OVERWRITES its own batch-id-keyed subdirectory — a retried
    * micro-batch replaces its previous rows instead of appending
    * duplicates, making the sink idempotent. */
  def pqDriftMonitor(stream: DataFrame, vecCol: String,
      books: Array[Array[Array[Double]]], batchKey: org.apache.spark.sql.Column,
      baselineSumQ: Long, baselineN: Long, tolerance: Double,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.pqDriftStats(batch.toDF(), vecCol, books,
            batchKey, baselineSumQ, baselineN, tolerance)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .start()

  /** Stream -> files under the engine's file-sink path semantics. */
  def writeFileStream(stream: DataFrame, path: String, checkpoint: String,
      format: String = "parquet"): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()
}
