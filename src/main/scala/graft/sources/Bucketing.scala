package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins — the
  * "pay the shuffle once at write time" tool for fact tables that are
  * joined on the same key repeatedly.
  *
  * A table written with `bucketBy(n, key)` is physically split into n
  * files per partition by `hash(key) % n`, and the layout is recorded
  * in the catalog. Joining two tables bucketed on the same key with
  * the SAME bucket count lets Spark plan a sort-merge join with NO
  * exchange on either side (BucketingSpec pins that plan): at 100 TB
  * this converts every repeated join/aggregation on the key from a
  * full-corpus shuffle into a local merge per bucket. Bucket counts
  * should be sized so one bucket ≈ one task's worth of data at the
  * target scale; mismatched counts fall back gracefully (Spark
  * shuffles the smaller side or, within a power-of-two ratio with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`, coalesces).
  *
  * Requires a catalog (`saveAsTable`); pure path-based parquet cannot
  * carry bucket metadata — that is Spark's contract, not ours.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. Sorting
    * within buckets by the join key lets the merge join skip the
    * per-task sort as well. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, format: String = "parquet"): Unit = {
    require(bucketCols.nonEmpty && nBuckets > 0)
    df.write
      .mode("overwrite")
      .format(format)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides in from the
    * catalog automatically). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
