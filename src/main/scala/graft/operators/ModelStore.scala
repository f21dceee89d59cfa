package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted trained-model artifacts — the production
  * train-once / persist / score-later lifecycle for the pipeline's
  * learned components (the qf9 quality classifier), generalizing the
  * signature-store generation guard ([[Dedup.requireSigAlgo]]) and
  * the IVF-PQ index-store pattern ([[Similarity.pqIndexStore]]) to
  * model WEIGHTS. Beyond-parity: the reference replicates data and
  * trains nothing (SURVEY.md §2.9).
  *
  * Store layout: one parquet row per weight dimension, every row
  * carrying the full provenance header — algorithm tag, feature
  * spec, training config, training-data fingerprint. The provenance
  * is DATA (self-describing rows), not metastore state: the artifact
  * survives process restarts, ships with the files, and any engine
  * can audit it — exactly how the LSH signature stores travel.
  *
  * Generation guard: scoring with weights trained under a different
  * feature extractor, config, or corpus silently misclassifies
  * everything (the same hazard [[Dedup.requireSigAlgo]] closes for
  * signature stores — a probe against a store built by other hash
  * functions "works" and returns garbage). [[load]] verifies
  * algorithm tag, feature spec, training config AND data fingerprint
  * against what the scorer expects and fails loudly with the retrain
  * instruction; [[loadIfValid]] is the soft form engines use to fall
  * back to retraining.
  *
  * Scale shape: a model artifact is O(feature dims) rows — driver-
  * bounded by construction; the one corpus-sized step (the data
  * fingerprint, see [[SparkEntry]]'s qf9 wiring) is a single
  * map-combined aggregate.
  */
object ModelStore {

  /** Algorithm tag of the linear-classifier family
    * ([[QualityFilters.trainQualityClassifier]]'s rational-squash /
    * integer-quantized-gradient trainer). BUMP when the trainer's
    * arithmetic changes: weights from an older trajectory are a
    * different model even under the same feature spec. */
  val ClassifierAlgo = "linear-classifier/fastsig-quantgrad/v1"

  /** Persist trained weights with their provenance header. Overwrite
    * semantics: a model store holds exactly one generation — history
    * belongs to the caller's path scheme, not to the artifact. */
  def save(spark: SparkSession, path: String, weights: Array[Double],
      featureSpec: String, iters: Int, lr: Double, dataHash: Long): Unit = {
    require(weights.nonEmpty, "cannot persist an empty weight vector")
    spark.createDataFrame(weights.toIndexedSeq.zipWithIndex.map {
        case (w, d) => (d, w)
      }).toDF("dim", "weight")
      .withColumn("sig_algo", lit(ClassifierAlgo))
      .withColumn("feature_spec", lit(featureSpec))
      .withColumn("train_iters", lit(iters))
      .withColumn("train_lr", lit(lr))
      .withColumn("data_hash", lit(dataHash))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a persisted classifier, verifying every provenance field
    * against what the scorer was built for. Throws with a specific,
    * actionable message on any mismatch — a wrong-generation model
    * must never score silently. */
  def load(spark: SparkSession, path: String, featureSpec: String,
      iters: Int, lr: Double, dataHash: Long): Array[Double] = {
    val rows = spark.read.parquet(path)
      .select("dim", "weight", "sig_algo", "feature_spec",
        "train_iters", "train_lr", "data_hash")
      .collect() // O(feature dims) rows by construction
    require(rows.nonEmpty, s"model store at $path is empty - retrain and save")
    def checkAll[T](what: String, actual: Row => T, expected: T): Unit = {
      val got = rows.toSeq.map(actual).distinct
      require(got.length == 1 && got.head == expected,
        s"model store at $path was trained under a different $what " +
          s"(stored: ${got.mkString(", ")}; expected: $expected) - " +
          "scoring with it would be silently wrong; retrain and save " +
          "under the current configuration")
    }
    checkAll("algorithm", _.getString(2), ClassifierAlgo)
    checkAll("feature spec", _.getString(3), featureSpec)
    checkAll("training config (iters)", _.getInt(4), iters)
    checkAll("training config (lr)", _.getDouble(5), lr)
    checkAll("training-data fingerprint", _.getLong(6), dataHash)
    val byDim = rows.map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    require(byDim.map(_._1).sameElements(byDim.indices),
      s"model store at $path has missing/duplicate weight dims: " +
        byDim.map(_._1).mkString(", "))
    byDim.map(_._2)
  }

  private type Row = org.apache.spark.sql.Row

  /** Soft load: Some(weights) when the store exists and every guard
    * passes, None otherwise (absent, unreadable, or any generation
    * mismatch) — the "load or fall back to retraining" form. */
  def loadIfValid(spark: SparkSession, path: String, featureSpec: String,
      iters: Int, lr: Double, dataHash: Long): Option[Array[Double]] = {
    val dir = new java.io.File(path)
    val hasData = dir.isDirectory && dir.listFiles() != null &&
      dir.listFiles().exists(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    if (!hasData) None
    else
      try Some(load(spark, path, featureSpec, iters, lr, dataHash))
      catch { case _: IllegalArgumentException => None }
  }
}
