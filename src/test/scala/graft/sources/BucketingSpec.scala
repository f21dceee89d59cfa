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

class LayoutSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("interleaveBits: known Morton codes, masking, commutative-free positions") {
    val out = Seq((3L, 1L), (0L, 0L), (5L, 2L), (65536L + 3L, 1L))
      .toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out(0) == 7L)   // a bits at even: 1+4; b bit0 at pos1: 2
    assert(out(1) == 0L)
    assert(out(2) == 25L)  // a=101 -> 1+16; b=10 -> bit1 at pos3: 8
    assert(out(3) == 7L)   // bit 16 of a masked off at bits=16
  }

  test("hilbertKey: bijective over the grid, consecutive codes are neighbors") {
    val n = 16 // bits = 4
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val cells = Layout.hilbertKey(grid, "x", "y", bits = 4)
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
    // bijection: every code 0..255 exactly once
    assert(cells.map(_._1).sorted.toSeq == (0L until 256L))
    // THE Hilbert property (Morton lacks it): walking the codes in
    // order moves exactly one grid step each time — no seams
    val byCode = cells.sortBy(_._1).map(_._2)
    for (i <- 1 until byCode.length) {
      val ((ax, ay), (bx, by)) = (byCode(i - 1), byCode(i))
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1L,
        s"jump at d=$i: ($ax,$ay) -> ($bx,$by)")
    }
    // first cell is the origin
    assert(byCode.head == ((0L, 0L)))
  }

  test("scaleToBits maps min->0, max->top, degenerate column to 0") {
    val out = Layout.scaleToBits(Seq(10.0, 20.0, 30.0).toDF("v"), "v", 4, "s")
      .orderBy("v").collect().map(_.getLong(1)).toSeq
    assert(out.head == 0L && out.last == 15L && out(1) == 8L)
    val degen = Layout.scaleToBits(Seq(5.0, 5.0).toDF("v"), "v", 4, "s")
      .collect().map(_.getLong(1)).toSeq
    assert(degen == Seq(0L, 0L))
  }

  test("z-ordered files have min/max locality in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b").repartition(8) // scrambled input
    Layout.writeZOrdered(grid, dir, "a", "b", numFiles = 16, bits = 6)
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(
        (max("a") - min("a")).as("spanA"),
        (max("b") - min("b")).as("spanB"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.length == 16)
    // each file along the curve covers a tile: span far below the
    // global 63 in BOTH dims (an unordered layout spans ~63 in each)
    assert(perFile.forall(r => r.getLong(1) <= 31 && r.getLong(2) <= 31))
    assert(perFile.map(_.getLong(3)).sum == 64L * 64L)
  }
}

class ReadUnifiedSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("readUnified null-fills dropped and added columns across epochs") {
    val base = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, "a", 1.0)).toDF("k", "name", "bal")
      .write.parquet(base + "/e1")
    Seq((2L, "b", "gold")).toDF("k", "name", "tier")
      .write.parquet(base + "/e2")
    val out = FileConnector.readUnified(spark, Seq(base + "/e1", base + "/e2"))
    assert(out.columns.toSet == Set("k", "name", "bal", "tier"))
    val rows = out.orderBy("k").collect()
    assert(rows(0).getAs[Any]("tier") == null && rows(0).getAs[Double]("bal") == 1.0)
    assert(rows(1).getAs[Any]("bal") == null && rows(1).getAs[String]("tier") == "gold")
  }

  test("incompatible type drift fails loudly, not by silent coercion") {
    val base = java.nio.file.Files.createTempDirectory("drift2").toString
    Seq((1L, 10)).toDF("k", "v").write.parquet(base + "/e1")
    Seq((2L, "ten")).toDF("k", "v").write.parquet(base + "/e2")
    intercept[Exception] {
      FileConnector.readUnified(spark, Seq(base + "/e1", base + "/e2")).collect()
    }
  }
}
