package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing (beyond-parity; SURVEY.md §7.3#7):
  * assign documents, in a stable global order, to fixed-token-budget
  * shards — the step that turns a curated corpus into training shards
  * ("fill each 2^k-token shard in doc order, documents spill across
  * shard boundaries").
  *
  * The core is a DISTRIBUTED PREFIX SUM. A naive
  * `Window.orderBy(id)` with no partition key funnels the whole
  * corpus through ONE task — the classic global-cumsum scale trap.
  * Instead:
  *
  *  1. bucket each row by range over the order column; boundaries
  *     come from `approxQuantile` (one cheap pass). The boundaries
  *     only shape the DISTRIBUTION — the result is exact for any
  *     boundary choice, so approximate quantiles are fine.
  *  2. local cumsum per bucket: `Window.partitionBy(bucket)
  *     .orderBy(id)` — parallel across buckets, one shuffle.
  *  3. bucket totals -> driver (one row per bucket — bounded,
  *     explicitly small), exclusive prefix-sum, broadcast-join the
  *     offsets back on the bucket key.
  *
  * global_cum(row) = local_cum(row) + offset(bucket). One real
  * shuffle, a vocabulary-of-buckets collect, no single-task stage.
  * ROWS frames + a required-unique order key keep ties impossible and
  * the result engine-portable.
  */
object Packing {

  /** `df` plus `cum` = inclusive prefix sum of `valueCol` in
    * `orderCol` order. `orderCol` must be numeric-castable and unique
    * (document ids); `valueCol` must be non-negative. */
  def cumulative(df: DataFrame, orderCol: String, valueCol: String,
      buckets: Int = 64): DataFrame =
    cumulativeMulti(df, orderCol, Seq(valueCol), buckets)
      .withColumnRenamed(s"cum_$valueCol", "cum")

  /** [[cumulative]] for several value columns sharing ONE bucket
    * assignment, window pass, and offsets collect — prefix sums that
    * must line up row-for-row (e.g. two samples' ECDF counts in a KS
    * test) pay one shuffle instead of one per column. Appends
    * `cum_<col>` per input column. */
  def cumulativeMulti(df: DataFrame, orderCol: String,
      valueCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    require(valueCols.nonEmpty, "need at least one value column")
    val spark = df.sparkSession
    // range boundaries over the order key; exactness does not depend
    // on them (they only balance the buckets)
    val probed = df.select(col(orderCol).cast("double").as("__ord"))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else probed.stat.approxQuantile("__ord", probs, 0.001)
    val bucket: Column = boundaries.distinct.foldLeft(lit(0)) {
      case (acc, b) => acc + when(col(orderCol).cast("double") > b, 1).otherwise(0)
    }
    val local = df.withColumn("__bucket", bucket)
    val w = Window.partitionBy("__bucket").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = valueCols.foldLeft(local) { (acc, c) =>
      acc.withColumn(s"__cl_$c", sum(col(c).cast("long")).over(w))
    }
    // per-bucket totals: tiny by construction (<= `buckets` rows)
    val totalAggs = valueCols.map(c => sum(col(c).cast("long")).as(s"__t_$c"))
    val totals = local.groupBy("__bucket")
      .agg(totalAggs.head, totalAggs.tail: _*)
      .orderBy("__bucket")
      .collect()
    val accs = Array.fill(valueCols.size)(0L)
    val offsetRows = totals.map { row =>
      // exclusive prefix: offset BEFORE this bucket, per column
      val r = org.apache.spark.sql.Row.fromSeq(
        row.getInt(0) +: accs.toSeq)
      valueCols.indices.foreach(i => accs(i) += row.getLong(i + 1))
      r
    }.toSeq
    val offsetSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        valueCols.map(c => org.apache.spark.sql.types.StructField(
          s"__off_$c", org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offsetSchema)
    val joined = withLocal.join(broadcast(offsetDf), "__bucket")
    valueCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"cum_$c", col(s"__cl_$c") + col(s"__off_$c"))
        .drop(s"__cl_$c", s"__off_$c")
    }.drop("__bucket")
  }

  /** Shard assignment under `budget` tokens per shard: a document
    * lands in the shard containing its FIRST token
    * (`shard = floor((cum - tokens) / budget)`), so documents spill
    * across shard boundaries instead of leaving per-shard slack —
    * the sequence-packing rule, exact and order-stable.
    * Output: input columns + `n_tokens`, `cum` (inclusive), `shard`.
    *
    * `tokenCounter` is the budget currency: whitespace tokens by
    * default; pass [[TextAnalysis.bpeishTokenCount]] to budget in
    * BPE-ish subword units — training shards are sized in tokenizer
    * tokens, not words, and the two differ 1.3-3x on real text. */
  def assignShards(df: DataFrame, orderCol: String, textCol: String,
      budget: Long, buckets: Int = 64,
      tokenCounter: Column => Column = TextAnalysis.tokenCount): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val withTokens = df.withColumn("n_tokens",
      tokenCounter(col(textCol)).cast("long"))
    cumulative(withTokens, orderCol, "n_tokens", buckets)
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
  }

  /** Per-shard roll-up: document count and token sum — the shard
    * manifest a training loader consumes. */
  def shardManifest(assigned: DataFrame): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .orderBy("shard")

  /** Character layout of each shard's packed file: docs concatenated
    * in `orderCol` order with `sep` between consecutive docs. Emits
    * the index map a loader needs to slice any doc back out of its
    * packed shard: (shard, doc, start_char 0-based, end_char
    * exclusive).
    *
    * Offsets count Unicode CODEPOINTS (what `length()` returns in
    * both Spark and SQL engines) — a JVM loader must slice with
    * `offsetByCodePoints`, not raw `String.substring`, or
    * supplementary-plane characters (emoji) shift every later doc in
    * the shard. A byte-oriented loader should recompute offsets in
    * bytes via `octet_length`.
    *
    * Scale shape: lengths are row-local; the cumulative window
    * partitions by shard (parallelism = shard count, and a shard is
    * budget-bounded by construction). The text itself never moves —
    * only its length enters the window.
    */
  def concatOffsets(assigned: DataFrame, orderCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val len = length(col(textCol)).cast("long")
    assigned
      .withColumn("__cum", sum(len + lit(sep.length.toLong)).over(w))
      .withColumn("start_char", col("__cum") - len - sep.length)
      .withColumn("end_char", col("start_char") + len)
      .select(col("shard"), col(orderCol), col("start_char"), col("end_char"))
  }

  /** Materialize each shard's packed file content: docs joined in
    * `orderCol` order by `sep`. One row per shard — safe because a
    * shard's size is budget-bounded by construction (assignShards),
    * so the aggregated string is a training-file-sized payload, not
    * an unbounded blob. Pair with [[concatOffsets]] for the slice
    * map; write with `.write.partitionBy("shard")` at scale. */
  def packShards(assigned: DataFrame, orderCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col(textCol).as("t")))),
            s => s.getField("t")),
          sep).as("packed_text"))
      .withColumn("packed_len", length(col("packed_text")).cast("long"))

  /** The token-ID payload per shard — the artifact a training
    * dataloader actually memmaps: each shard's documents' id streams
    * concatenated in `orderCol` order, with the doc and token tallies
    * a loader needs to size its reads. `assigned` is
    * [[assignShards]]' output (token-budgeted, BPE-count-aware via
    * its `tokenCounter`) carrying an `idsCol` string of
    * space-separated token ids per document
    * ([[Tokenizer.bpeIds]] joined to string).
    *
    * Same shape as [[packShards]]: one groupBy on the shard key, the
    * in-shard ordering done by `array_sort` over collected (order,
    * ids) structs — deterministic without a window, sized by the
    * shard budget (a few thousand tokens), never by the corpus. */
  def packTokenIds(assigned: DataFrame, orderCol: String,
      idsCol: String): DataFrame =
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col(idsCol).as("t")))),
            s => s.getField("t")),
          " ").as("ids_payload"))
}
