package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.TextExpressions

/** SparkSessionExtensions entry point: makes graft's native
  * expressions available as SQL functions in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.core.GraftExtensions")
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), so `spark.sql("SELECT
  * rolling_hash(text) ...")` works cluster-wide without imports. For
  * an existing session, `TextExpressions.registerAll(spark)` does the
  * same at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[TextExpressions.type].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (exprs: Seq[Expression]) => TextExpressions.RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of tokens"),
      (exprs: Seq[Expression]) => TextExpressions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(array<string>, k) - k-wise MinHash signature"),
      (exprs: Seq[Expression]) => TextExpressions.MinHashSignature(exprs.head,
        graft.functions.FunctionArgs.constInt(
          "minhash_signature", "k", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_buckets"),
      info("minhash_band_buckets",
        "minhash_band_buckets(array<string>, k, bands) - LSH band bucket ids"),
      (exprs: Seq[Expression]) => TextExpressions.MinHashBandBuckets(exprs.head,
        graft.functions.FunctionArgs.constInt(
          "minhash_band_buckets", "k", exprs(1)),
        graft.functions.FunctionArgs.constInt(
          "minhash_band_buckets", "bands", exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(array<bigint>, array<bigint>) - |A∩B| merge scan"),
      (exprs: Seq[Expression]) =>
        TextExpressions.SortedIntersectCount(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(str, form) - NFC/NFD/NFKC/NFKD normalization"),
      (exprs: Seq[Expression]) => TextExpressions.UnicodeNormalize(exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .toString)))
    ext.injectFunction((
      FunctionIdentifier("dedup_tokens_in_doc"),
      info("dedup_tokens_in_doc",
        "dedup_tokens_in_doc(str) - keep first occurrence of each token: " +
          "struct(clean_text, n_tokens, n_removed)"),
      (exprs: Seq[Expression]) => TextExpressions.DedupTokensInDoc(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(str, n) - n-gram repetition summary struct"),
      (exprs: Seq[Expression]) => TextExpressions.RepetitionStats(exprs.head,
        graft.functions.FunctionArgs.constInt(
          "repetition_stats", "n", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(array<numeric>, array<numeric>) - codegen dot product"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorExpressions.DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_argmin"),
      info("pq_argmin",
        "pq_argmin(array<double>, array<array<double>>) - nearest codebook " +
          "centroid id (PQ encode kernel; codebook must be foldable)"),
      (exprs: Seq[Expression]) => graft.functions.VectorExpressions.PqArgmin(
        exprs.head, graft.functions.VectorExpressions.foldCodebook(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch"),
      info("kll_sketch",
        "kll_sketch(x, k) - mergeable KLL quantile sketch (bytes)"),
      (exprs: Seq[Expression]) => graft.functions.KllExpressions.KllSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.DoubleType),
        graft.functions.FunctionArgs.constInt("kll_sketch", "k", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("kll_merge"),
      info("kll_merge",
        "kll_merge(sketch) - union KLL sketches (rollup without rescan)"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllExpressions.KllMergeAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("kll_quantile"),
      info("kll_quantile",
        "kll_quantile(sketch, q) - quantile element from a KLL sketch"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllExpressions.KllQuantile(exprs.head,
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.DoubleType))))
    ext.injectFunction((
      FunctionIdentifier("kll_count"),
      info("kll_count",
        "kll_count(sketch) - exact item count a KLL sketch absorbed"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllExpressions.KllCount(exprs.head)))
    // size(array_intersect(array_sort(array_distinct(x)), ...)) →
    // allocation-free merge scan; see graft.plans.IntersectCountRewrite
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
  }
}
