package graft.operators

import graft.SparkTestBase

class ModelStoreSpec extends SparkTestBase {

  private val w = Array(0.25, -1.5, 3.0)
  private val spec = "bias,f1,f2|v1"

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"

  test("save/load roundtrip returns the exact weights in dim order") {
    val p = freshPath()
    ModelStore.save(spark, p, w, spec, iters = 8, lr = 0.5, dataHash = 42L)
    val back = ModelStore.load(spark, p, spec, iters = 8, lr = 0.5, dataHash = 42L)
    assert(back.toSeq == w.toSeq) // bit-exact, not approx: doubles roundtrip parquet
  }

  test("generation guard rejects a store trained under a different feature spec") {
    val p = freshPath()
    ModelStore.save(spark, p, w, spec, 8, 0.5, 42L)
    val e = intercept[IllegalArgumentException](
      ModelStore.load(spark, p, "bias,f1,f2,f3|v2", 8, 0.5, 42L))
    assert(e.getMessage.contains("feature spec"))
    assert(e.getMessage.contains("retrain"))
  }

  test("generation guard rejects mismatched training config and data fingerprint") {
    val p = freshPath()
    ModelStore.save(spark, p, w, spec, 8, 0.5, 42L)
    assert(intercept[IllegalArgumentException](
      ModelStore.load(spark, p, spec, 16, 0.5, 42L))
      .getMessage.contains("iters"))
    assert(intercept[IllegalArgumentException](
      ModelStore.load(spark, p, spec, 8, 2.0, 42L))
      .getMessage.contains("lr"))
    assert(intercept[IllegalArgumentException](
      ModelStore.load(spark, p, spec, 8, 0.5, 43L))
      .getMessage.contains("fingerprint"))
  }

  test("loadIfValid: None on absent store or any guard failure, Some on match") {
    val p = freshPath()
    assert(ModelStore.loadIfValid(spark, p, spec, 8, 0.5, 42L).isEmpty)
    // schema-incompatible store (an older artifact without the
    // provenance columns) degrades to retrain, never crashes
    spark.createDataFrame(Seq((0, 1.0))).toDF("dim", "weight")
      .write.mode("overwrite").parquet(p)
    assert(ModelStore.loadIfValid(spark, p, spec, 8, 0.5, 42L).isEmpty)
    ModelStore.save(spark, p, w, spec, 8, 0.5, 42L)
    assert(ModelStore.loadIfValid(spark, p, "other|v9", 8, 0.5, 42L).isEmpty)
    assert(ModelStore.loadIfValid(spark, p, spec, 8, 0.5, 7L).isEmpty)
    assert(ModelStore.loadIfValid(spark, p, spec, 8, 0.5, 42L)
      .map(_.toSeq).contains(w.toSeq))
  }

  test("overwrite replaces the generation; a stale-generation scorer is rejected") {
    val p = freshPath()
    ModelStore.save(spark, p, w, spec, 8, 0.5, 42L)
    // the corpus changed -> retrain under the new fingerprint
    val w2 = Array(1.0, 2.0, 3.0, 4.0)
    ModelStore.save(spark, p, w2, spec + "+f3", 8, 0.5, 99L)
    // old-generation scorer now fails loudly instead of scoring wrong
    assert(ModelStore.loadIfValid(spark, p, spec, 8, 0.5, 42L).isEmpty)
    assert(ModelStore.load(spark, p, spec + "+f3", 8, 0.5, 99L).toSeq == w2.toSeq)
  }

  test("roundtrip is bit-exact for adversarial doubles (subnormals, " +
      "extremes, negative zero)") {
    // parquet stores raw IEEE bits; the lifecycle must not launder
    // any value a trainer could emit (NaN/Inf excluded: the quantized
    // trainer cannot produce them, and a store holding them should be
    // caught by the trainer's own invariants, not silently persisted)
    val nasty = Array(0.0, -0.0, Double.MinPositiveValue,
      java.lang.Double.MIN_NORMAL, Double.MaxValue, -Double.MaxValue,
      1.0 / 3.0, math.nextAfter(1.0, 2.0), -1e-300, 2.220446049250313e-16)
    val p = freshPath()
    ModelStore.save(spark, p, nasty, spec, 8, 0.5, 42L)
    val back = ModelStore.load(spark, p, spec, 8, 0.5, 42L)
    assert(back.length == nasty.length)
    back.zip(nasty).zipWithIndex.foreach { case ((b, a), i) =>
      assert(java.lang.Double.doubleToRawLongBits(b) ==
        java.lang.Double.doubleToRawLongBits(a),
        s"dim $i: $a -> $b (bits moved)")
    }
  }

  test("tokenizer store: roundtrip keeps merge order; guards reject " +
      "other configs/corpora; rank gaps are caught") {
    val p = freshPath()
    val merges = Seq(("a", "b"), ("ab", "c"), ("é", "漢")) // unicode survives
    val vocab = Seq(("a", 1L), ("b", 2L), ("ab", 5L), ("abc", 9L))
    ModelStore.saveTokenizer(spark, p, merges, vocab, "bpe|m=3", 77L)
    val (m, v) = ModelStore.loadTokenizer(spark, p, "bpe|m=3", 77L)
    assert(m.toSeq == merges && v.toSeq == vocab.sortBy(_._2))
    assert(intercept[IllegalArgumentException](
      ModelStore.loadTokenizer(spark, p, "bpe|m=4", 77L))
      .getMessage.contains("config"))
    assert(intercept[IllegalArgumentException](
      ModelStore.loadTokenizer(spark, p, "bpe|m=3", 78L))
      .getMessage.contains("fingerprint"))
    // structural integrity: a rank gap (torn/partial write) is loud
    import org.apache.spark.sql.functions._
    spark.createDataFrame(Seq((0, "a", "b"), (2, "c", "d")))
      .toDF("rank", "left", "right")
      .withColumn("sig_algo", lit(ModelStore.BpeTokenizerAlgo))
      .withColumn("train_config", lit("bpe|m=3"))
      .withColumn("data_hash", lit(77L))
      .write.mode("overwrite").parquet(s"$p/merges")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadTokenizer(spark, p, "bpe|m=3", 77L))
      .getMessage.contains("ranks"))
  }

  test("corrupt dim sets (missing/duplicate) are rejected") {
    val p = freshPath()
    import org.apache.spark.sql.functions._
    spark.createDataFrame(Seq((0, 1.0), (2, 2.0))).toDF("dim", "weight")
      .withColumn("sig_algo", lit(ModelStore.ClassifierAlgo))
      .withColumn("feature_spec", lit(spec))
      .withColumn("train_iters", lit(8))
      .withColumn("train_lr", lit(0.5))
      .withColumn("data_hash", lit(42L))
      .write.mode("overwrite").parquet(p)
    assert(intercept[IllegalArgumentException](
      ModelStore.load(spark, p, spec, 8, 0.5, 42L))
      .getMessage.contains("dims"))
  }
}
