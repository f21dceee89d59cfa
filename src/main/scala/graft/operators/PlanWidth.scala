package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared plan-width estimation for operators that need to reason
  * about physical parallelism WITHOUT forcing an RDD-lineage
  * conversion (`df.rdd` rebuilds the frame as a deserialized Row RDD
  * just to answer a width question).
  *
  * Two tiers:
  *  - [[trustedScanBytes]] — the SUM OF LEAF sizes from optimizer
  *    stats, `None` when any leaf reports the unknown-size sentinel
  *    (JDBC and RDD relations). Leaf sums, not root stats: a
  *    post-join/aggregate root can grossly overestimate
  *    `sizeInBytes` and fake a wide plan, while the leaves are file
  *    scans whose sizes are real (and the scan stage is where width
  *    is decided — anything post-shuffle is already at
  *    `spark.sql.shuffle.partitions`).
  *  - [[exactNumPartitions]] — the physical partition count from
  *    `queryExecution.toRdd`, which plans the SAME internal RDD any
  *    subsequent `mapPartitions`/action materializes anyway — no
  *    extra lineage, no Row conversion, no job.
  */
private[graft] object PlanWidth {

  /** Total bytes across plan leaves per optimizer stats; `None` when
    * any leaf reports the unknown-size sentinel (the per-LEAF check
    * matters because a Project above such a source SCALES the
    * sentinel below any root-level threshold). */
  def trustedScanBytes(df: DataFrame): Option[BigInt] = {
    val spark = df.sparkSession
    val sentinel = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    if (leaves.exists(_.stats.sizeInBytes >= sentinel)) None
    else Some(leaves.map(_.stats.sizeInBytes).sum)
  }

  /** Estimated scan-stage task count: leaf bytes over
    * `files.maxPartitionBytes`. `None` when stats are untrusted. */
  def trustedScanWidth(df: DataFrame): Option[BigInt] = {
    val maxPart = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    trustedScanBytes(df).map(_ / BigInt(math.max(maxPart, 1L)))
  }

  /** True when trusted stats prove the scan stage is at least `p`
    * tasks wide; false when narrower OR when stats are untrusted —
    * callers needing certainty then consult [[exactNumPartitions]]. */
  def trustedWidthAtLeast(df: DataFrame, p: Int): Boolean =
    trustedScanWidth(df).exists(_ >= p)

  /** Exact physical partition count of the frame's internal RDD.
    * Triggers physical planning (file listing is already cached from
    * the read) but NOT the `df.rdd` Row-conversion lineage and no
    * Spark job. */
  def exactNumPartitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions
}
