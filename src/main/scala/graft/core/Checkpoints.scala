package graft.core

import org.apache.spark.SparkContext
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
  * `spark.graft.checkpointDir` (session conf, or `--checkpoint-dir`
  * on the CLI) to a reliable filesystem path (HDFS/S3/NFS) and every
  * corpus-sized pin becomes a RELIABLE checkpoint — blocks land on
  * the shared store, executor loss costs a re-read, not the job.
  * Unset (the default, and the local/test configuration) it stays
  * `localCheckpoint`, unchanged plan shape and speed. Small bounded
  * pins (per-batch partials, S-row spines) stay localCheckpoint
  * unconditionally — their loss is a cheap recompute and reliable
  * I/O would dominate.
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
  private val bindLock = new Object

  // every distinct root ever REQUESTED per context (review r11): when
  // only one root has ever been asked of a context, no other session
  // can rebind it mid-materialization, so the (possibly minutes-long)
  // eager checkpoint job runs OUTSIDE the lock and concurrent pins
  // don't serialize. Only genuinely divergent confs — or the one-time
  // first bind — pay a lock held across materialization. (The very
  // FIRST appearance of a second root can still steal one in-flight
  // unlocked materialization started before it registered; every
  // call after registration is race-free. Closing that one-time
  // window would put every checkpoint job back under the lock —
  // the r11 serialization defect — so it is documented, not paid.)
  // WEAK keys (review r12): a long-lived process that stops and
  // recreates contexts (notebook server, embedding service) must not
  // accumulate strong references to every dead SparkContext and its
  // root set. Collections.synchronizedMap makes computeIfAbsent
  // atomic under the wrapper's mutex. Within one context's lifetime a
  // second root flips that context to lock-across-job permanently —
  // deliberate: "the divergent session is gone" is unknowable, and
  // the flip is scoped to the context that actually saw divergence.
  private val rootsSeen: java.util.Map[SparkContext, java.util.Set[String]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkContext, java.util.Set[String]]())

  /** Fully-qualified URI string for a configured or bound path —
    * scheme + authority INCLUDED (review r11: comparing bare path
    * components treats `hdfs://nn/ckpt` and `file:/ckpt` as the same
    * root, and a relative conf root never matches, minting a fresh
    * UUID dir on every call). */
  private def qualified(sc: SparkContext, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    p.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri.toString
      .stripSuffix("/")
  }

  private def boundInRoot(sc: SparkContext, root: String): Boolean =
    sc.getCheckpointDir.exists { c =>
      qualified(sc, c).startsWith(root + "/")
    }

  /** Materialize a corpus-sized frame under the session's policy. */
  def corpus(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        val root = qualified(sc, dir)
        val seen = rootsSeen.computeIfAbsent(sc,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        seen.add(root)
        val mustHoldAcrossJob = bindLock.synchronized {
          val rebound = !boundInRoot(sc, root)
          if (rebound) sc.setCheckpointDir(dir)
          rebound || seen.size > 1
        }
        if (mustHoldAcrossJob) bindLock.synchronized {
          // divergent sessions (or a racing first bind) may have
          // re-bound between the two blocks — re-verify, then keep the
          // lock for the whole materialization so the blocks land on
          // THIS session's root
          if (!boundInRoot(sc, root)) sc.setCheckpointDir(dir)
          df.checkpoint(eager)
        } else {
          val out = df.checkpoint(eager)
          // close the one-shot window (review r12): the FIRST
          // registration of a second root can rebind this context
          // while the unlocked materialization above is in flight,
          // landing the "reliable" blocks on the other session's
          // store. One cheap post-check; redo under the lock only on
          // an actual steal — the steady state never pays it.
          if (boundInRoot(sc, root)) out
          else bindLock.synchronized {
            if (!boundInRoot(sc, root)) sc.setCheckpointDir(dir)
            df.checkpoint(eager)
          }
        }
      case _ => df.localCheckpoint(eager)
    }
  }
}
