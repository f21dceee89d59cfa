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
    * Scale: one shuffle-on-keys anti join. The staging side of an
    * incremental load is normally orders of magnitude smaller than
    * the target, so it is broadcast (hint honored when it fits,
    * silently falls back to shuffle join when not — AQE decides).
    */
  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires key columns")
    val stagingAligned = staging.select(target.columns.map(staging.col).toIndexedSeq: _*)
    target.join(broadcast(stagingAligned.select(keys.map(staging.col): _*)), keys, "left_anti")
      .unionByName(stagingAligned)
  }
}
