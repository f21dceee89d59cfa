package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lead, lit, row_number}

/** Replication-mode dataflow as pure DataFrame algebra (SURVEY.md
  * §2.6). The connector layer (JdbcConnector/FileConnector) applies
  * these against physical sinks; expressed here as transforms so the
  * semantics are testable and usable against any sink.
  */
object Modes {

  /** complete: the sink's next content IS the source (truncate+load). */
  def complete(source: DataFrame): DataFrame = source

  /** complete-atomic: same final content as complete; the atomicity is
    * a sink-commit property (single-transaction swap — see
    * JdbcConnector), not a dataflow property. Kept distinct so
    * pipelines can declare intent. */
  def completeAtomic(source: DataFrame): DataFrame = source

  /** incremental upsert: staging rows win over target rows with the
    * same key; target rows with no staging match survive. Semantically
    * the reference's staging⋈sink merge (`PostgresqlManager.java:
    * 262-307` et al.) as a DataFrame op.
    *
    * Scale: one anti join on the keys. The staging side of an
    * incremental load is normally orders of magnitude smaller than the
    * target; `broadcastStaging = true` (default) hints its KEY COLUMNS
    * ONLY for broadcast — at billions of staged rows pass false and
    * let AQE pick the join (the hint would force an executor-memory
    * blowup; a hint is an order, not a suggestion).
    */
  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String],
      broadcastStaging: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "upsert requires key columns")
    val stagingAligned = staging.select(target.columns.map(staging.col).toIndexedSeq: _*)
    val stagingKeys = stagingAligned.select(keys.map(staging.col): _*)
    val probe = if (broadcastStaging) broadcast(stagingKeys) else stagingKeys
    target.join(probe, keys, "left_anti")
      .unionByName(stagingAligned)
  }

  /** CDC change-feed apply (beyond-parity — the reference's
    * incremental mode only upserts; a real replication pipeline also
    * consumes deletes): `changes` carries the target's columns plus an
    * op column ('I'/'U'/'D') and an ordering column. Per key, only the
    * LATEST change applies (ties broken by op so a same-instant
    * delete+insert is deterministic, then by a content hash so even a
    * degenerate feed with two same-instant same-op changes resolves
    * STABLY across runs and micro-batch retries): latest op 'D'
    * removes the key, latest 'I'/'U' replaces the row, untouched
    * target rows survive.
    *
    * Scale: one window over the (small) change feed keyed by the PK,
    * then exactly [[upsert]]'s anti-join shape — the target never
    * shuffles more than the upsert path it extends. */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String, orderCol: String,
      broadcastChanges: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "applyChanges requires key columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(opCol).desc,
        org.apache.spark.sql.functions.xxhash64(
          changes.columns.map(col).toIndexedSeq: _*).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = latest.filter(col(opCol) =!= "D")
      .select(target.columns.map(col).toIndexedSeq: _*)
    val touchedKeys = latest.select(keys.map(col): _*)
    val probe = if (broadcastChanges) broadcast(touchedKeys) else touchedKeys
    target.join(probe, keys, "left_anti")
      .unionByName(survivors)
  }

  /** SCD type-2 history from a change feed: every 'I'/'U' change
    * becomes a VERSION row with a half-open validity interval
    * [valid_from, valid_to) in feed order; the next change for the
    * same key (including a delete) closes it. Delete rows close the
    * previous version without opening one. `is_current` marks the
    * open interval. Precondition (checked per-row semantics, not
    * globally): (key, orderCol) pairs must be unique — same-instant
    * changes have no defined version order; run the feed through
    * [[applyChanges]] instead if only the latest state matters.
    *
    * Scale: one window over the change feed keyed by the PK —
    * dimension history feeds are small next to facts; nothing else
    * shuffles. */
  def scdHistory(changes: DataFrame, keys: Seq[String], opCol: String,
      orderCol: String): DataFrame = {
    require(keys.nonEmpty, "scdHistory requires key columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc)
    changes
      .withColumn("valid_from", col(orderCol))
      // lead BEFORE dropping deletes: a delete closes its predecessor
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Checksum-driven repair — the step [[DataQuality.tableChecksum]]
    * validation exists for: keep the sink's rows where the chunk
    * digests agree, re-replicate from the source ONLY the chunks that
    * don't. After repair the sink equals the source exactly (modulo
    * the 60-bit digest collision odds), which is precisely what the
    * oracle checks.
    *
    * Scale shape: the mismatched-chunk set is a broadcast frame
    * (bounded by table/chunkSize rows, and by damage in practice), so
    * the sink pass is an anti join against it and the source pass a
    * semi join — only damaged chunks' rows ever move, the
    * re-replication analogue of dd14's "never rescan the corpus".
    * `cols` must cover every column the repair should guarantee
    * (an uncovered column can differ without tripping a digest).
    */
  def checksumRepair(src: DataFrame, dst: DataFrame, chunkCol: String,
      chunkSize: Long, cols: Seq[String]): DataFrame = {
    val bad = DataQuality.checksumCompare(
        DataQuality.tableChecksum(src, chunkCol, chunkSize, cols),
        DataQuality.tableChecksum(dst, chunkCol, chunkSize, cols))
      .filter(!col("chunk_ok"))
      .select(col("chunk").as("__bad_chunk"))
    def chunked(df: DataFrame) = df.withColumn("__chunk",
      org.apache.spark.sql.functions.floor(col(chunkCol) / chunkSize)
        .cast("long"))
    chunked(dst)
      .join(broadcast(bad), col("__chunk") === col("__bad_chunk"), "left_anti")
      .unionByName(chunked(src)
        .join(broadcast(bad), col("__chunk") === col("__bad_chunk"),
          "left_semi"))
      .drop("__chunk")
  }

  /** Right-to-be-forgotten purge: drop every row whose `keyCol`
    * appears in `forget` — one anti-join (broadcast when the forget
    * list is small, hash otherwise; Spark picks by size) — plus a
    * purge manifest row per key via a semi-joined count, so the
    * erasure is AUDITABLE: the regulator question is "prove you
    * removed them", not "show me the survivors". Returns (purged,
    * manifest(key, n_purged)) — keys with no rows report n_purged =
    * 0, distinguishing "erased" from "never present". */
  def purgeKeys(df: DataFrame, keyCol: String,
      forget: DataFrame): (DataFrame, DataFrame) = {
    require(forget.columns.length == 1,
      s"forget list must be a single key column, got ${forget.columns.length}")
    val fkey = forget.columns.head
    val purged = df.join(forget.withColumnRenamed(fkey, keyCol),
      Seq(keyCol), "left_anti")
    val manifest = forget.select(col(fkey).as(keyCol)).distinct()
      .join(df.groupBy(keyCol).agg(count(lit(1)).as("__n")),
        Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("__n"), lit(0L)).as("n_purged"))
    (purged, manifest)
  }
}
