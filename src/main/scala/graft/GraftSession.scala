package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a real cluster: `local[32]` = one JVM,
  * 32 executor threads. Everything else (shuffle partitions, AQE, UTC
  * session time zone) is what we would set on a 1000-executor cluster,
  * scaled to the box: shuffle partitions sized to cores (not the 200
  * default), AQE on so skewed shuffles re-plan at runtime, broadcast
  * threshold left at default so small dims broadcast automatically.
  */
object GraftSession {
  /** `taskFailures` mirrors a real cluster's `spark.task.maxFailures`
    * (default 4 there): local mode fails the job on the FIRST task
    * failure unless the master string allows retries, so committer/
    * fold retry-safety (ChaosRetrySpec) is untestable at the default.
    * Production local runs keep 1 — a local failure is a bug to
    * surface, not mask. */
  def builder(appName: String = "graft", cores: Int = defaultCores,
      taskFailures: Int = 1): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(
        if (taskFailures > 1) s"local[$cores,$taskFailures]"
        else s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // prefer shuffled-hash over sort-merge when the planner's size
      // conditions fit (optimization guide §3.1/§9: no sort, same
      // result set; SMJ remains the fallback when neither side's
      // per-partition build fits), and let AQE rewrite a planned SMJ
      // to SHJ at runtime when every post-shuffle partition is small
      // (64m per partition — scale-independent: it bounds the build
      // HASH TABLE per task, not the dataset)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      // reliable checkpoints (graft.core.Checkpoints with
      // spark.graft.checkpointDir set) are deleted by the
      // ContextCleaner when their RDD is GC'd — without this, an
      // iterated loop (connected components) leaves one full frontier
      // copy on the shared store per iteration for the job's lifetime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // read TIMESTAMP(NANOS) parquet (unsupported by Spark's
      // TimestampType) as raw nano longs; converted at the source
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // catalog tables (bucketed layouts) land in a PER-PROCESS tmp dir,
      // not the cwd and not a shared path (concurrent runs writing the
      // same table name would corrupt each other); removed on JVM exit
      // so repeated runs don't grow tmp. Deployments point this at
      // their real warehouse
      .config("spark.sql.warehouse.dir", defaultWarehouseDir)

  /** Per-process warehouse default, deleted (best-effort) at JVM exit.
    *
    * Registered through Hadoop's ShutdownHookManager (the ordered
    * registry Spark itself uses) at priority 1 — below Spark's
    * Hadoop-level hook (FileSystem.SHUTDOWN_HOOK_PRIORITY + 30 = 40,
    * inside which SparkContext's stop runs) and the Hadoop FileSystem
    * close hook (10), so the delete runs only after Spark has fully
    * stopped and flushed. A plain JVM hook would race Spark's own
    * unordered hooks and could delete catalog files mid-flush.
    */
  private lazy val defaultWarehouseDir: String = {
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-warehouse-${ProcessHandle.current().pid()}")
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        override def run(): Unit =
          try {
            if (java.nio.file.Files.exists(dir))
              java.nio.file.Files.walk(dir)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          } catch { case _: Throwable => () }
      }, 1)
    dir.toString
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
