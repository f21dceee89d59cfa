package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — multi-dimensional data
  * skipping for the scan patterns bucketing can't serve. Bucketing
  * co-locates ONE join key; a warehouse fact table is also range-
  * scanned on several columns at once (date × customer, partkey ×
  * suppkey). Sorting files by the interleaved-bit Morton code of two
  * dimensions gives every file LOCALITY IN BOTH: its parquet
  * min/max footer stats are narrow on each dimension, so a predicate
  * on either (or both) prunes most files before any I/O — the same
  * reason Delta/Iceberg expose OPTIMIZE ZORDER BY.
  *
  * The code itself is pure bit arithmetic (mask, shift, or) over the
  * low `bits` bits of each dimension — whole-stage codegen on the
  * Spark side, and replayed operation-for-operation by the z1 oracle
  * in SQL, so the key is engine-pinned exact. Callers map their
  * domains onto [0, 2^bits) first (truncate a date to days, mask an
  * id; [[scaleToBits]] does min-max scaling with the bounds ridden
  * in as a broadcast 1-row frame, never a driver collect).
  */
object Layout {

  /** Morton code of two non-negative long columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Values are masked
    * to the low `bits` bits first (callers own the domain mapping).
    * `bits` ≤ 31 keeps the result in the positive long range. */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** 2-D Hilbert-curve index of (`aCol`, `bCol`) over a
    * 2^bits × 2^bits grid — [[interleaveBits]]' Morton sibling with
    * STRICTLY better locality: consecutive Hilbert codes are always
    * grid NEIGHBORS (unit Manhattan distance; Morton jumps across
    * the plane at every power-of-two boundary), so range scans over
    * the sorted layout touch contiguous 2-D regions with no seams.
    * The standard xy→d walk (per level: quadrant bit extraction,
    * d += s²·((3·rx) ⊕ ry), conditional reflect-and-swap rotation)
    * unrolled over `bits` levels as materialized integer columns —
    * one withColumn chain per level so the expression tree stays
    * LINEAR in bits (a pure Column fold would double per level), all
    * whole-stage-codegen integer ops, row-local, shuffle-free, and
    * exactly replayable as a recursive SQL CTE. */
  def hilbertKey(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 8, outCol: String = "hkey"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val mask = (1L << bits) - 1
    var cur = df
      .withColumn("__hx", col(aCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hy", col(bCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (col("__rx") * 3).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__hy",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .drop("__nx", "__rx", "__ry")
    }
    cur.withColumn(outCol, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** Min-max scale a numeric column onto [0, 2^bits): the bounds
    * aggregate once and broadcast back — the standard domain mapping
    * when the dimension isn't already a small non-negative int.
    * Degenerate (min == max) maps everything to 0. */
  def scaleToBits(df: DataFrame, valueCol: String, bits: Int,
      outCol: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val top = (1L << bits) - 1
    val bounds = df.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(top), floor(
            (col(valueCol).cast("double") - col("__lo")) /
              (col("__hi") - col("__lo")) * (top + 1)))))
      .drop("__lo", "__hi")
  }

  /** Write `df` z-ordered on (`aCol`, `bCol`): range-partition by the
    * Morton code into `numFiles` files, sort within each, drop the
    * key. One range shuffle at write time buys min/max footer
    * locality on BOTH columns for every scan afterwards. */
  def writeZOrdered(df: DataFrame, path: String, aCol: String,
      bCol: String, numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__z", interleaveBits(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style directory partitioning — the FIRST-order data-skipping
    * mechanism of every warehouse layout, ahead of bucketing (join
    * co-location) and z-order (multi-dim footer stats): a predicate on
    * the partition column prunes whole DIRECTORIES from the listing,
    * before any file footer is even opened. Two pruning paths, both
    * free once the layout exists:
    *  - static: a literal predicate on the partition column resolves
    *    at planning time (`PartitionFilters` on the scan);
    *  - dynamic (DPP): a JOIN on the partition column against a
    *    filtered dimension prunes at runtime — Spark broadcasts the
    *    dim's key set and injects a `dynamicpruningexpression` into
    *    the fact scan, so only the joined partitions are listed.
    *
    * `repartition` on the partition column first: without it every
    * upstream task writes a file into EVERY partition directory
    * (tasks × partitions small files); with it each partition's rows
    * land in one task → one file per directory. Pick the partition
    * column so directories stay in the hundreds-to-thousands and each
    * holds ≥ one parquet row group; day/month grains, not user ids.
    */
  def writeHivePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Dynamic partition overwrite — the partition-grain replication
    * mode between complete (m1: replace the table) and incremental
    * (m3/m4: merge rows): a batch REPLACES exactly the partitions it
    * contains and leaves every other partition byte-untouched — the
    * daily-reload contract ("re-ship yesterday and today, keep
    * history"). Spark's `partitionOverwriteMode=dynamic` makes the
    * swap per-partition atomic (write staged, then directory rename),
    * and only the batch's partitions move — never a full-table
    * rewrite. The session conf is scoped to this write and restored
    * in finally. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCol: String): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.repartition(col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
