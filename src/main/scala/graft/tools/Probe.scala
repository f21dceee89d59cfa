package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev-only probe main for plan/skew diagnostics (not part of the
  * library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // minhash LSH: bucket-size distribution + candidate count
    val sh = graft.operators.Dedup.shingles(col("text"), 3)
    val sigs = docs.select(col("doc_id").as("id"),
      graft.functions.TextExpressions.minhash_signature(sh, 64).as("sig"))
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",", transform(
          slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string"))), b)))
        .as(Seq("band", "bucket")))
    val buckets = banded.groupBy("band", "bucket").count()
    println("=== bucket size histogram")
    buckets.groupBy(col("count").as("bucket_size")).count()
      .orderBy(col("bucket_size").desc).show(10, false)
    val cand = buckets.filter(col("count") > 1)
      .agg(sum(col("count") * (col("count") - 1) / 2)).first()
    println(s"=== total in-bucket pairs (pre-dedup): $cand")

    def timed[T](label: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(s"=== $label: ${(System.nanoTime() - t) / 1e9}s"); r
    }
    timed("dd2 shingles only")(docs.select(
      graft.operators.Dedup.shingles(col("text"), 3).as("sh")).count())
    timed("dd2 sigs only")(sigs.count())
    timed("dd2 full")(graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", 3, 64, 16, 0.7).count())
    timed("dd2 full second run")(graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", 3, 64, 16, 0.7).count())

    spark.stop()
  }
}
