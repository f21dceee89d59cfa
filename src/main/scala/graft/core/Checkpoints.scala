package graft.core

import org.apache.spark.sql.DataFrame

/** Corpus-sized materialization policy (verdict-r10 #2).
  *
  * Several operators pin a corpus-scale frame so multiple consumers
  * don't replay the plan (mem2's corpus fingerprints, the eval-gram
  * reference, connected-components' iterated edge frontier — the
  * standard Pregel-loop practice). `localCheckpoint` stores those
  * blocks on EXECUTOR-LOCAL disk/memory with lineage truncated: fast
  * and right for a local run or a short-lived iterate, but at the
  * 100 TB target one lost executor fails the whole job instead of
  * recomputing, because there is no lineage left to recompute from.
  *
  * This knob makes the trade explicit: set
  * `spark.graft.checkpointDir` (session conf) to a reliable
  * filesystem path (HDFS/S3/NFS) and every corpus-sized pin becomes a
  * RELIABLE checkpoint — blocks land on the shared store, executor
  * loss costs a re-read, not the job. Unset (the default, and the
  * local/test configuration) it stays `localCheckpoint`, unchanged
  * plan shape and speed. Small bounded pins (per-batch partials,
  * S-row spines) stay localCheckpoint unconditionally — their loss
  * is a cheap recompute and reliable I/O would dominate.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  // setCheckpointDir mints a fresh UUID subdirectory on EVERY call,
  // so bind it once per configured dir, not once per checkpoint
  @volatile private var boundDir: String = null

  /** Materialize a corpus-sized frame under the session's policy. */
  def corpus(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (boundDir != dir) synchronized {
          if (boundDir != dir) {
            spark.sparkContext.setCheckpointDir(dir)
            boundDir = dir
          }
        }
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
  }
}
