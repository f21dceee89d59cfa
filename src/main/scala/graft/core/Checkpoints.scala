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
  // so rebind only when the CONTEXT's bound root diverges from this
  // session's conf. The root is compared against the context's own
  // checkpointDir (a UUID subdir of the configured root), not a
  // process-global cache: two sessions sharing one SparkContext with
  // DIFFERENT checkpointDir confs would race a global cache and a
  // "reliable" checkpoint could land on the other session's store.
  // (The context dir is still context-global — Spark's model — so the
  // checkpoint call itself sits inside the same lock, keeping each
  // frame's materialization on its own session's root.)
  private val bindLock = new Object

  /** Materialize a corpus-sized frame under the session's policy. */
  def corpus(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        bindLock.synchronized {
          val current = spark.sparkContext.getCheckpointDir
          val root = new org.apache.hadoop.fs.Path(dir).toUri.getPath
          val inRoot = current.exists(c =>
            new org.apache.hadoop.fs.Path(c).toUri.getPath
              .stripSuffix("/").startsWith(root.stripSuffix("/") + "/"))
          if (!inRoot) spark.sparkContext.setCheckpointDir(dir)
          df.checkpoint(eager)
        }
      case _ => df.localCheckpoint(eager)
    }
  }
}
