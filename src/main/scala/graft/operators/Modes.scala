package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
}
