package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  private def withNoBroadcast[T](f: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-count bucketed tables join and aggregate with zero exchanges") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val lineitem = spark.read.parquet(sf() + "/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8)
    try withNoBroadcast {
      val bo = Bucketing.readBucketed(spark, "b_orders")
      val bl = Bucketing.readBucketed(spark, "b_lineitem")
      val joined = bo.join(bl, col("o_orderkey") === col("l_orderkey"))
      // the entire point: co-located layout -> merge join, NO shuffle
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      // correctness: identical to the plain (shuffled) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == plain.count())
      // aggregation on the bucket key is exchange-free too
      val agg = bl.groupBy("l_orderkey").agg(sum("l_quantity"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed agg must not shuffle:\n$ap")
      assert(agg.count() == lineitem.select("l_orderkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("incremental dedup probe never re-shuffles the signature store") {
    // the point of the persistent store: the corpus-sized band index
    // pays its shuffle once at write time; every future batch probe
    // shuffles only the (small) new batch to the store's layout
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val (bands, _) = graft.operators.Dedup.signatureStore(
      docs.filter(col("doc_id") <= 400), "doc_id", "text")
    Bucketing.writeBucketed(bands, "b_sig_bands", Seq("bucket"), 8)
    try withNoBroadcast {
      val store = Bucketing.readBucketed(spark, "b_sig_bands")
      val (probe, _) = graft.operators.Dedup.signatureStore(
        docs.filter(col("doc_id") > 400), "doc_id", "text")
      val j = probe.withColumnRenamed("id", "new_id")
        .join(store.withColumnRenamed("id", "dup_of"), Seq("bucket"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.linesIterator.exists(l =>
        l.contains("b_sig_bands") && l.contains("Bucketed: true")), p)
      // exactly ONE hash exchange: the probe batch moving to the
      // store's bucket layout; the store side reads exchange-free
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    } finally spark.sql("DROP TABLE IF EXISTS b_sig_bands")
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    Bucketing.writeBucketed(orders, "b_orders_prune", Seq("o_orderkey"), 8)
    // the auto-disable rule turns OFF bucketed scans when no operator
    // needs the distribution; hold it open so the pruning shows up
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = spark.conf.getOption(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      val key = orders.select("o_orderkey").head().getLong(0)
      val q = Bucketing.readBucketed(spark, "b_orders_prune")
        .filter(col("o_orderkey") === key)
      // SelectedBucketsCount appears when the scan prunes buckets
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
      assert(q.count() == orders.filter(col("o_orderkey") === key).count())
    } finally {
      prevAuto match {
        case Some(v) => spark.conf.set(autoKey, v)
        case None => spark.conf.unset(autoKey)
      }
      spark.sql("DROP TABLE IF EXISTS b_orders_prune")
    }
  }
}
