package graft.operators

/** Pins Dedup.spread's width sources: optimizer stats for file-backed
  * scans (no RDD conversion on the wide path), the RDD probe for
  * unknown-stats sources and as confirmation before any repartition. */
class SpreadSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("no-stats sources (RDD-backed) fall back to the partition probe " +
      "and spread to default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val rddDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(1L, "alpha beta"),
          org.apache.spark.sql.Row(2L, "gamma delta")), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    // LogicalRDD reports the unknown-size default -> probe path
    assert(rddDf.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(spark.sessionState.conf.defaultSizeInBytes))
    assert(Dedup.spread(rddDf).rdd.getNumPartitions == p)
  }

  test("small local relations spread via the stats estimate; an input " +
      "already wider than parallelism is left alone") {
    val p = spark.sparkContext.defaultParallelism
    val small = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Dedup.spread(small).rdd.getNumPartitions == p)
    // small stats but ALREADY 2p partitions: the confirmation probe
    // must leave it untouched — spread never reduces parallelism and
    // never inserts a redundant shuffle
    val wide = small.repartition(p * 2)
    assert(Dedup.spread(wide).rdd.getNumPartitions == p * 2)
  }

  test("width estimate sums LEAF sizes — an inflated post-join root " +
      "cannot fake a wide plan") {
    val p = spark.sparkContext.defaultParallelism
    val a = (1L to 200L).map(i => (i, "x" * 200)).toDF("id", "pad_a")
    val b = (1L to 200L).map(i => (i, "y" * 200)).toDF("id", "pad_b")
    val joined = a.join(b, "id")
    val rootStats = joined.queryExecution.optimizedPlan.stats.sizeInBytes
    val leafSum = PlanWidth.trustedScanBytes(joined)
    // the optimizer prices an inner join near the product of its
    // inputs — far above the leaves it actually scans
    assert(leafSum.isDefined)
    assert(rootStats > leafSum.get,
      s"fixture no longer inflates: root=$rootStats leaves=${leafSum.get}")
    // leaf-sum width says narrow -> the exact-partition check decides
    // (r6 advisory: root stats would have skipped both)
    assert(!PlanWidth.trustedWidthAtLeast(joined, p))
  }
}
