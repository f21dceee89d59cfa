package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ScratchQf9Spec extends SparkTestBase {
  test("scratch: qf9 convergence grid") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val junk = " 0123456789 0123456789 !!!??!! 0123456789 ,,;;::!! 0123456789"
    val aug = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(junk)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 5 === 0, lit(1.0)).otherwise(lit(0.0)).as("y"))
    val feats = Seq(
      lit(1.0),
      TextAnalysis.tokenCount(col("text")) / lit(64.0),
      TextAnalysis.digitCount(col("text")) / lit(256.0),
      TextAnalysis.punctCount(col("text")) / lit(256.0),
      TextAnalysis.charCount(col("text")) / lit(1024.0))
    val wgt = when(col("y") === 1.0, lit(4.0)).otherwise(lit(1.0))
    for ((it, lr) <- Seq((48, 2.0), (64, 2.0), (96, 2.0), (64, 1.0))) {
      val w = QualityFilters.trainQualityClassifier(aug, feats, col("y"),
        iters = it, lr = lr, sampleWeight = wgt)
      val scored = aug.select(col("y"),
        (QualityFilters.classifierScore(feats, w) >= 0.5).as("f"))
        .collect().map(r => (r.getDouble(0) == 1.0, r.getBoolean(1)))
      val acc = scored.count { case (y, f) => y == f }.toDouble / scored.length
      info(f"iters=$it lr=$lr acc=$acc%.3f w=${w.map(x => f"$x%.3f").mkString(",")}")
    }
  }
}
