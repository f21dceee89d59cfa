package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction for file-backed tables (beyond-parity).
  *
  * Long-lived corpora accumulate small files — incremental appends,
  * streaming micro-batches, over-parallel writers — and at 100 TB the
  * file count itself becomes the bottleneck: task-per-file scheduling,
  * NameNode/listing pressure, row-group overhead. Compaction bin-packs
  * a directory back to `targetBytes`-sized files.
  *
  * Shape: one FS metadata listing prices the directory (no job), the
  * rewrite is a single `coalesce` (no shuffle — merging files needs no
  * data movement beyond concatenation; `shuffle = true` opts into a
  * `repartition` when the input is size-skewed enough that balanced
  * outputs are worth a full exchange), and the swap rides
  * [[FileConnector.writeAtomic]] so readers always observe a complete
  * table. The whole directory is rewritten — at warehouse scale run it
  * per partition directory (the unit Hive/Iceberg/Delta compaction
  * jobs use), never across the full table at once.
  */
object Compaction {

  /** Data-file inventory under `path`: (file, bytes) for every file
    * with no hidden component anywhere below the root (Spark's reader
    * skips `_temporary`/`.hidden` subtrees at any depth, so a crashed
    * write's leftovers must not price the directory) — one recursive
    * FS metadata listing, no Spark job, no data read. */
  def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(FileConnector.stripScheme(path))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val rootQ = fs.makeQualified(root).toString
    // only segments BELOW the table root count as hidden — the root
    // itself (or an ancestor tmpdir) may legitimately start with '.'
    def hiddenBelowRoot(p: org.apache.hadoop.fs.Path): Boolean = {
      val s = p.toString
      val rel = if (s.startsWith(rootQ)) s.substring(rootQ.length) else p.getName
      rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
    }
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (!hiddenBelowRoot(f.getPath))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Rewrite the parquet directory at `path` into
    * ceil(totalBytes / targetBytes) files, atomically (readers see the
    * old file set right up until they see the new one). Returns the
    * post-rewrite data-file count — measured from the directory, not
    * assumed from the plan. No-op (returns the current count) when the
    * directory already meets the target — compaction must be safe to
    * run on a schedule.
    *
    * The scan may arrive with fewer partitions than the target
    * (`maxPartitionBytes` packs small files together), and `coalesce`
    * can only shrink — so when the scan is under target the rewrite
    * repartitions up to hit the requested file size. */
  def compactParquet(spark: SparkSession, path: String, targetBytes: Long,
      shuffle: Boolean = false): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val files = dataFiles(spark, path)
    require(files.nonEmpty, s"compactParquet: no data files under $path")
    val total = files.map(_._2).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    if (files.size <= n) return files.size
    val df = spark.read.parquet(FileConnector.stripScheme(path))
    // exact physical width without the df.rdd Row-conversion lineage
    val scanParts = graft.operators.PlanWidth.exactNumPartitions(df)
    val out = if (shuffle || scanParts < n) df.repartition(n) else df.coalesce(n)
    FileConnector.writeAtomic(out, path, "parquet", Map.empty)
    dataFiles(spark, path).size
  }
}
