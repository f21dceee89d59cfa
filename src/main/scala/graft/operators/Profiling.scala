package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling for training-data pipelines (beyond-parity):
  * per-group size/length distributions and token frequencies — the
  * numbers a data curator looks at before and after every filter
  * stage.
  *
  * Scale: stats are one partial-aggregated shuffle per call. Exact
  * percentiles sort within groups — for monitoring at 100 TB swap in
  * `approx_percentile` (same call shape); exact is the default here
  * because it is independently verifiable.
  */
object Profiling {

  /** Cross-source gram-overlap matrix — the corpus-governance signal
    * behind mixture design and dedup planning: for every pair of
    * sources, how much word-`gramSize`-gram content they share.
    * Returns one row per source pair (source_a < source_b) with the
    * shared distinct-gram count, both totals, Jaccard, and
    * min-containment (shared / smaller side — the "is the small
    * source just a subset" signal Jaccard dilutes).
    *
    * Scale shape: each source collapses to its DISTINCT gram-hash set
    * (one pass through the codegen shingle kernel + one distinct),
    * then ONE keyed self-join on the gram hash — no doc×doc or
    * corpus×corpus shape anywhere. Per-gram fan-out is bounded by the
    * number of sources carrying it (≤ S²/2 pair rows per gram, with
    * governance-scale S in the dozens); the distinct set, not the
    * corpus, is what shuffles. */
  def sourceGramOverlap(docs: DataFrame, srcCol: String, textCol: String,
      gramSize: Int = 3, maxGramSources: Int = Int.MaxValue): DataFrame = {
    val g0 = docs.select(col(srcCol).as("src"),
        explode(graft.functions.TextExpressions.sorted_shingle_hashes(
          col(textCol), gramSize)).as("gram"))
      .distinct()
      .localCheckpoint() // consumed twice: totals + both join sides
    // ubiquitous-gram guard (dd21's df-cap shape): a gram present in
    // more than `maxGramSources` sources is shared boilerplate — it
    // inflates every pair's fan-out (S² pair rows per gram) while
    // carrying no pairwise signal. Capped grams leave the join and
    // surface as a count, so the cap is observable, never silent.
    // No broadcast hint on the anti-join: on boilerplate-heavy
    // corpora the capped set can be a large FRACTION of all distinct
    // grams (sf0.1 fixture: 22k of 27k at cap 5), so the planner/AQE
    // must stay free to pick a shuffled anti-join when it is big.
    val (g, nUbiq) =
      if (maxGramSources == Int.MaxValue) (g0, lit(0L))
      else {
        val dfreq = g0.groupBy("gram").agg(count(lit(1)).as("__df"))
        val ubiq = dfreq.filter(col("__df") > maxGramSources).select("gram")
          .localCheckpoint() // consumed twice: count + anti-join
        val kept = g0.join(ubiq, Seq("gram"), "left_anti")
          .localCheckpoint() // same 3-consumer role g0 plays uncapped
        val n = ubiq.count()
        (kept, lit(n))
      }
    val totals = g.groupBy("src").agg(count(lit(1)).as("n"))
    val shared = g.select(col("src").as("source_a"), col("gram"))
      .join(g.select(col("src").as("source_b"), col("gram")), Seq("gram"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_grams"))
    // EVERY pair gets a row — a fully disjoint pair (shared 0,
    // jaccard 0) is the governance signal most worth surfacing, so it
    // must not vanish into a missing row. The pair spine is a
    // broadcast loop over the S-row totals frame (bounded by the
    // source count, the sim19 pattern), never over data.
    val spine = totals.select(col("src").as("source_a"), col("n").as("grams_a"))
      .crossJoin(broadcast(
        totals.select(col("src").as("source_b"), col("n").as("grams_b"))))
      .filter(col("source_a") < col("source_b"))
    val sg = coalesce(col("shared_grams"), lit(0L))
    spine.join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), sg.as("shared_grams"),
        col("grams_a"), col("grams_b"),
        round(sg.cast("double") /
          (col("grams_a") + col("grams_b") - sg), 6).as("jaccard"),
        round(sg.cast("double") /
          least(col("grams_a"), col("grams_b")), 6).as("containment"),
        nUbiq.as("ubiquitous_grams"))
  }

  /** Per-group length distribution: count, min/max, mean, exact
    * median (linear interpolation, matching SQL quantile_cont). */
  def corpusStats(df: DataFrame, groupCols: Seq[String], lenCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        min(lenCol).as("min_len"),
        max(lenCol).as("max_len"),
        round(avg(lenCol), 4).as("mean_len"),
        round(expr(s"percentile($lenCol, 0.5)"), 4).as("median_len"),
        round(expr(s"percentile($lenCol, 0.95)"), 4).as("p95_len"))

  /** The 100 TB form of [[corpusStats]]: sketch aggregates instead of
    * exact ones. `percentile` holds every value per group in memory —
    * exact and fine at test scale, unbounded at corpus scale;
    * `approx_percentile` (t-digest, bounded state per group) and
    * `approx_count_distinct` (HyperLogLog++) keep the same one-pass
    * partial-agg shape with constant-size partial states. accuracy:
    * percentile rank error ≤ 1/`accuracy`; HLL relative sd ≈
    * 1.04/sqrt(2^p) at the default 5%.
    */
  def approxCorpusStats(df: DataFrame, groupCols: Seq[String],
      lenCol: String, accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(lenCol).as("approx_distinct_len"),
        min(lenCol).as("min_len"),
        max(lenCol).as("max_len"),
        round(avg(lenCol), 4).as("mean_len"),
        // approx_percentile preserves the input type (long-in ->
        // long-out); cast so the schema matches the exact form's
        // double percentiles
        round(expr(s"approx_percentile($lenCol, 0.5, $accuracy)").cast("double"), 4)
          .as("median_len"),
        round(expr(s"approx_percentile($lenCol, 0.95, $accuracy)").cast("double"), 4)
          .as("p95_len"))

  /** Top-k most frequent whitespace tokens per group, deterministic
    * tie-break by token. The explode→count→rank shape is the
    * inverted-index build; partial aggregation keeps the shuffle at
    * (group, token) cardinality, not token occurrences. */
  def tokenFrequencies(df: DataFrame, groupCols: Seq[String],
      textCol: String, k: Int): DataFrame = {
    val counts = df
      .select((groupCols.map(col) :+
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token")): _*)
      .filter(length(col("token")) > 0)
      .groupBy((groupCols.map(col) :+ col("token")): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Generic per-column profile — the ANALYZE-style table a data
    * engineer runs before trusting a new source: one output row per
    * column with (col_name, n_rows, n_nulls, n_distinct, min_num,
    * max_num); min/max are cast to double for numeric columns and
    * null otherwise.
    *
    * ONE pass: all measures for all columns aggregate together, then
    * a row-local stack unpivots the single result row. The exact
    * multi-column distinct makes Spark expand the input k ways —
    * verifiable and fine for table-sized profiling; pass
    * `approx = true` at corpus scale to swap in HyperLogLog distinct
    * counts (same single-pass shape, constant-size partials, no
    * expand).
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"columnProfile: column(s) not in schema: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
    // backtick-quoted input references + index-based internal aliases:
    // a user column name containing a dot must neither parse as a
    // struct path on read nor become one via the alias
    def in(c: String): Column = col("`" + c.replace("`", "``") + "`")
    def minMax(c: String, fn: Column => Column): Column =
      if (numeric(c)) fn(in(c)).cast("double") else lit(null).cast("double")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(when(in(c).isNull, 1)).as(s"__nn_$i"),
        (if (approx) approx_count_distinct(in(c)) else countDistinct(in(c)))
          .as(s"__nd_$i"),
        minMax(c, min).as(s"__mn_$i"),
        minMax(c, max).as(s"__mx_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      col(s"__nn_$i").as("n_nulls"),
      col(s"__nd_$i").as("n_distinct"),
      col(s"__mn_$i").as("min_num"),
      col(s"__mx_$i").as("max_num")) }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Vocabulary size (distinct tokens) and token count per group. */
  def vocabulary(df: DataFrame, groupCols: Seq[String], textCol: String): DataFrame =
    df.select((groupCols.map(col) :+
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token")): _*)
      .filter(length(col("token")) > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col("token")).as("vocab_size"),
        count(lit(1)).as("n_tokens"))

  /** REAGGREGATABLE vocabulary profile: per-group Datasketches-HLL
    * vocabulary estimates plus an "ALL" row computed by UNIONING the
    * group sketches — not by re-scanning. This is the rollup pattern
    * exact distinct counts cannot support (distincts don't sum): at
    * 100 TB you persist the per-group sketch column and answer any
    * coarser grouping by hll_union over it, never touching the corpus
    * again. Estimates are deterministic for given data; relative
    * error ~1.6% at the default lgConfigK=12 (spec-bounded against
    * the exact counts).
    *
    * `groupCol` must be a string column: the rollup row is emitted
    * with the sentinel value "ALL" in `groupCol` (a non-string group
    * would be silently coerced to string by the union, changing the
    * output schema). Contract: a real group literally named "ALL" is
    * indistinguishable from the rollup row — callers with such data
    * should rename the group or use [[vocabulary]] (no rollup row).
    */
  def vocabularySketched(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    require(df.schema(groupCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"vocabularySketched needs a string group column, got " +
        df.schema(groupCol).dataType.simpleString)
    val toks = df.select(col(groupCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val perGroup = toks.groupBy(groupCol)
      .agg(hll_sketch_agg(col("token")).as("__sk"),
        count(lit(1)).as("n_tokens"))
    val all = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("__sk"))).as("vocab_est"),
      sum("n_tokens").as("n_tokens"))
      .select(lit("ALL").as(groupCol), col("vocab_est"), col("n_tokens"))
    perGroup.select(col(groupCol),
        hll_sketch_estimate(col("__sk")).as("vocab_est"), col("n_tokens"))
      .unionByName(all)
  }

  /** Equal-frequency (percentile) binning: assign each row the bin
    * index counting how many of the n-1 exact interior percentile
    * cutoffs its value exceeds — length-curriculum ordering, balanced
    * batching, and quantile-bucketed sampling all start here.
    *
    * Scale shape: ONE exact-percentile aggregate (collected: n-1
    * doubles, bounded), cutoffs ride back in as literals, binning is
    * a row-local projection. Use an integer-valued column: interior
    * cutoffs then either land strictly between integers (engine FP
    * ulps cannot flip an integer comparison) or exactly ON an integer
    * (both engines agree by construction) — what makes the bin ids
    * verifiable across engines. Nulls get a null bin.
    */
  def percentileBins(df: DataFrame, idCol: String, valueCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val row = df
      .agg(percentile(col(valueCol), array(probs.map(lit): _*)).as("q"))
      .head()
    // empty input / all-null column: the percentile array is NULL —
    // fail loudly instead of an opaque NPE downstream
    require(!row.isNullAt(0),
      s"percentileBins: no non-null values in '$valueCol'")
    val cutoffs = row.getSeq[Double](0)
    val bin = cutoffs.map(c =>
      when(col(valueCol) > c, 1).otherwise(0)).reduce(_ + _)
    df.select(col(idCol), col(valueCol),
      when(col(valueCol).isNull, lit(null)).otherwise(bin).as("bin"))
  }

  /** EXACT heavy hitters — every value occurring in more than
    * `support` fraction of rows, with its exact count — found
    * without ever shuffling the long tail. Two phases:
    *
    *  1. CANDIDATES: a Misra-Gries summary per partition (bounded
    *     map of `capacity` counters — overflow decrements all, the
    *     streaming-classic bound), merged pairwise with the same
    *     decrement rule. MG guarantees any value with true frequency
    *     > n/(capacity+1) survives; `capacity` defaults to
    *     2/support, a 2× margin, so every true heavy hitter is a
    *     candidate. The collect is ≤ capacity rows — bounded by
    *     construction, like the vocab≤256 collects elsewhere.
    *  2. VERIFY: exact counts for candidate rows only (the `isin`
    *     prunes before the exchange; map-side combine leaves ≤
    *     capacity rows per task in the shuffle), filtered against
    *     the total ridden in as a broadcast 1-row frame. Exact
    *     counts kill MG's overestimates; the capacity margin rules
    *     out false negatives — so the output is exactly the
    *     HAVING-clause answer, which is what the hh1 oracle checks.
    *
    * The 100 TB contrast: `groupBy(value).count()` shuffles every
    * distinct value — a web corpus's token tail is billions of
    * groups that exist only to be discarded by the HAVING. This
    * never shuffles a non-candidate. `valueCol` must be a string
    * column (tokens, domains, keys). */
  def exactHeavyHitters(df: DataFrame, valueCol: String, support: Double,
      capacity: Int = 0): DataFrame = {
    require(support > 0 && support < 1, s"support in (0,1), got $support")
    val m = if (capacity > 0) capacity
      else math.max(16, math.ceil(2.0 / support).toInt)
    require(m + 1 > 1.0 / support,
      s"capacity $m cannot guarantee support $support (needs > ${1 / support - 1})")
    def shrink(c: scala.collection.mutable.HashMap[String, Long]): Unit =
      if (c.size > m) {
        // subtract the (m+1)-th largest count: ≤ m survivors, and
        // every count drops by at most what a decrement-loop would
        val cut = c.values.toArray.sorted(Ordering[Long].reverse).apply(m)
        c.filterInPlace((_, n) => n > cut)
        c.mapValuesInPlace((_, n) => n - cut)
      }
    // the row total rides along the MG pass (null rows count toward
    // the total but never enter the summary) — no separate count scan
    val summaries = df.select(col(valueCol).cast("string"))
      .rdd.mapPartitions { it =>
        val c = scala.collection.mutable.HashMap.empty[String, Long]
        var rows = 0L
        it.foreach { r =>
          rows += 1
          if (!r.isNullAt(0)) {
            c.updateWith(r.getString(0)) {
              case Some(n) => Some(n + 1); case None => Some(1L) }
            if (c.size > m) shrink(c)
          }
        }
        Iterator.single((c, rows))
      }
    val (candMap, total) = summaries.treeReduce { case ((a, na), (b, nb)) =>
      b.foreach { case (v, n) =>
        a.updateWith(v) { case Some(x) => Some(x + n); case None => Some(n) } }
      shrink(a); (a, na + nb)
    }
    val candidates = candMap.keys.toSeq
    val candidateRows = if (candidates.isEmpty) df.filter(lit(false))
      else df.filter(col(valueCol).isin(candidates: _*))
    candidateRows
      .groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
      .withColumn("n_total", lit(total))
      .filter(col("n") > col("n_total") * support)
  }

  /** Dense equi-width histogram: `nBuckets` buckets over [lo, hi)
    * plus an underflow (-1) and an overflow (`nBuckets`) bucket,
    * EVERY bucket present in the output (empty ones with n = 0 — a
    * dashboard histogram with silently missing bars misreads as a
    * different distribution). Output: (bucket, lo_bound, hi_bound, n)
    * with null bounds on the two out-of-range buckets.
    *
    * One map-side-combined aggregate over at most nBuckets+2 keys,
    * then a broadcast join against the tiny bucket spine — the data
    * pass is a single scan regardless of corpus size. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(hi > lo, s"empty histogram range [$lo, $hi)")
    val width = (hi - lo) / nBuckets
    val counts = df.select(
        when(col(valueCol).isNull, lit(null))
          .when(col(valueCol) < lo, lit(-1L))
          .when(col(valueCol) >= hi, lit(nBuckets.toLong))
          // least(): FP division can land an in-range value exactly on
          // nBuckets (e.g. v just below hi with width = range/n
          // rounding up) — clamp it into the top interior bucket
          .otherwise(least(floor((col(valueCol) - lo) / width),
            lit((nBuckets - 1).toLong)))
          .cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(-1L, nBuckets + 1L)
      .select(col("id").as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        when(col("bucket").between(0, nBuckets - 1),
          round(col("bucket") * width + lo, 4)).as("lo_bound"),
        when(col("bucket").between(0, nBuckets - 1),
          round((col("bucket") + 1) * width + lo, 4)).as("hi_bound"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Shannon entropy (nats) of a column's value distribution per
    * group, with cardinality context: high-entropy ≈ identifier-like,
    * near-zero ≈ constant — the profiling signal schema-inference and
    * feature-selection passes key on. Three map-side-combined
    * aggregates (value counts → count-of-counts → per-group fold);
    * −Σ p ln p is summed over DISTINCT VALUES, not rows. Null values
    * are excluded.
    *
    * Determinism: Σ n·ln n is NOT left to a float `sum` (partition
    * merge order would make the low bits — and round(…,6) at a half
    * boundary — run-dependent). Counts collapse to count-of-counts
    * (n → multiplicity m, both exact integers), and the double fold
    * Σ (m·n)·ln n runs over the SORTED bounded set in ascending n —
    * a sequential left fold, the same order DuckDB's
    * list_aggregate(list(… ORDER BY n), 'sum') uses, so the sum is
    * bit-identical run-to-run and engine-to-engine. The collected
    * set is count-of-counts, bounded by √(2T) entries per group
    * (distinct count values n₁<n₂<… satisfy Σnᵢ ≤ T). */
  def entropy(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val cc = counts.groupBy(groupCols.map(col) :+ col("__n"): _*)
      .agg(count(lit(1)).as("__m"))
    val g = cc.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__n") * col("__m")).as("__t"),
        sum("__m").as("n_distinct"),
        sort_array(collect_list(struct(col("__n"), col("__m")))).as("__cc"))
    val snln = aggregate(col("__cc"), lit(0.0), (acc, s) =>
      acc + (s.getField("__n") * s.getField("__m")).cast("double") *
        log(s.getField("__n").cast("double")))
    // H = ln(T) − (Σ n·ln n)/T: one pass, no second join for p = n/T
    g.select(groupCols.map(col) ++ Seq(
      col("__t").as("n_rows"), col("n_distinct"),
      round(log(col("__t").cast("double")) -
        snln / col("__t").cast("double"), 6).as("entropy_nats")): _*)
  }

  /** Pairwise vocabulary overlap between sources: Jaccard of each
    * source pair's distinct-token sets — the corpus-composition
    * readout that finds mirror/scraper sources before document-level
    * dedup pays to. Token sets collapse to (source, token-hash)
    * distincts first; the self-join is keyed by token and fans at
    * most |sources|² per token — sources are a bounded dimension, so
    * the join is corpus-linear. */
  def sourceOverlap(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val v = df.select(col(sourceCol).as("src"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("src"), xxhash64(col("w")).as("t"))
      .distinct()
      .localCheckpoint() // sizes + both join sides
    val sz = v.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = v.as("a").join(v.as("b"),
        col("a.t") === col("b.t") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(sz.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sz.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Count-min sketch over integer items, with per-item estimates
    * AND true counts side by side — the sketch-vs-exact readout that
    * shows where width collisions overestimate. The hash family is
    * the portable salted Knuth hash ([[Sampling.idHash]]), so bucket
    * assignment — and therefore every estimate — replays exactly in
    * any engine: the sketch itself is oracle-verifiable, not just
    * bounded.
    *
    * Scale shape: items collapse to exact (item, n) counts first (one
    * map-side-combined aggregate — the counters are identical whether
    * rows or per-item totals fold in, by sum associativity); the
    * depth-explode and the d·width counter table are DISTINCT-ITEM
    * sized, and estimates join items to the broadcast counter table.
    * A streaming ingest would fold rows straight into the same d·w
    * counters; this batch form prices its accuracy. */
  def countMinEstimates(df: DataFrame, itemCol: Column,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2, s"width >= 2: $width")
    val exact = df.select(itemCol.cast("long").as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_true"))
      .localCheckpoint() // feeds both the counters and the probes
    val exploded = exact
      .select(col("item"), col("n_true"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("d"))
      .withColumn("bucket", cmsBucket(col("item"), col("d"), width))
    val counters = exploded.groupBy("d", "bucket")
      .agg(sum("n_true").as("c"))
    cmsEstimates(exact, counters, depth, width)
  }

  /** The CMS hash family: salted portable Knuth hash → one of `width`
    * buckets for hash row `d`. Shared by the batch fold above and the
    * streaming fold ([[graft.streaming.EventStream.streamingCountMin]])
    * so their counter tables are identical by construction. */
  def cmsBucket(item: Column, d: Column, width: Int): Column =
    pmod(Sampling.idHash(item + d * 1000003L), lit(width.toLong))

  /** Estimates from a (d, bucket, c) counter table: each probe item
    * hashes into its `depth` buckets and takes the min counter.
    * `counters` is ≤ depth·width rows — broadcast. */
  def cmsEstimates(exact: DataFrame, counters: DataFrame,
      depth: Int, width: Int): DataFrame =
    exact
      .select(col("item"), col("n_true"),
        explode(sequence(lit(0L), lit(depth - 1L))).as("d"))
      .withColumn("bucket", cmsBucket(col("item"), col("d"), width))
      // LEFT join + 0: an empty bucket reads as count 0 — the CMS min
      // must include it, or a never-seen probe item gets a nonzero
      // estimate (and an all-empty item would vanish entirely)
      .join(broadcast(counters), Seq("d", "bucket"), "left")
      .groupBy("item", "n_true")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
      .select(col("item"), col("n_true"), col("cms_est"),
        (col("cms_est") - col("n_true")).as("overcount"))

  // ------------------------------------------------------------ KMV

  /** 2^64 / 2^63 as exact doubles (powers of two, representable
    * bit-for-bit) — the KMV estimator's scaling constants, written
    * once so the Spark tree and the SQL oracle combine the SAME
    * values. */
  private[graft] val Two64: Double = 18446744073709551616.0
  private[graft] val Two63: Double = 9223372036854775808.0

  /** k-minimum-values (bottom-k) distinct sketch: the k smallest
    * DISTINCT `token_hash64` values per group, as (group, rank, h)
    * rows. The deterministic, engine-portable complement to
    * [[vocabularySketched]]'s HLL: same mergeable-rollup use (persist
    * per-group sketches, answer coarser groupings by
    * [[kmvMerge]] without rescanning the corpus) but bit-reproducible
    * on any engine — and, unlike HLL, it supports INTERSECTION
    * estimates ([[kmvSetOps]]), because the sketch is a uniform
    * sample of the element space, not a register array.
    *
    * The hash is signed; ordering by the signed value is ordering by
    * `u XOR 2^63` of the unsigned uniform u — also uniform — so the
    * estimator just reads order statistics at the shifted position
    * (see [[kmvEstimate]]).
    *
    * Scale shape: only (group, hash) pairs shuffle, partial-
    * aggregated by the distinct; the rank≤k filter is pushed into
    * the sort as a per-partition group limit (Spark's
    * WindowGroupLimit — plan-pinned), so every map task forwards at
    * most k rows per group and no full per-group sort materializes.
    * State after the sketch is groups×k rows, corpus-size-free. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int): DataFrame = {
    require(k >= 16, s"KMV needs k >= 16 for a usable estimator: $k")
    val hashed = df.select(col(groupCol),
        graft.functions.TextExpressions.token_hash64(valueCol.cast("string"))
          .as("h"))
      // a NULL is not a value: its null hash would sort FIRST under
      // ascending null ordering and squat on rank 1 forever
      .filter(col("h").isNotNull)
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    hashed.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("int").as("rank"), col("h"))
  }

  /** Distinct-count estimates from a KMV sketch: with u_k the kth
    * smallest hash at its unsigned-uniform position (signed + 2^63),
    * D ≈ (k−1)·2^64/u_k; a group holding fewer than k distinct
    * values reports its EXACT count (the sketch saw everything).
    * Every arithmetic step is a mirrored IEEE op on exact inputs
    * (long→double, one add, one divide), so estimates are
    * bit-reproducible across engines. The Long.MinValue kth hash
    * (u_k = 0, probability 2^-64) reports null rather than divide. */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("sketch_n"), max(col("h")).as("kth_h"))
      .select(col(groupCol), col("sketch_n"), col("kth_h"),
        when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .when(col("kth_h") === Long.MinValue, lit(null).cast("double"))
          .otherwise(lit((k - 1).toDouble * Two64) /
            (col("kth_h").cast("double") + lit(Two63)))
          .as("est_distinct"))

  /** Merge sketch ROW SETS over the same group space back into a
    * valid k-min sketch: distinct union of hashes, re-ranked, k
    * smallest. The KMV merge is associative, commutative, and
    * IDEMPOTENT (re-merging the same rows is a no-op) — what makes
    * the streaming fold retry-safe under at-least-once micro-batch
    * delivery and lets persisted per-partition sketches roll up to
    * any coarser grouping without touching the corpus again.
    *
    * Contract (here and in [[kmvEstimate]]/[[kmvSetOps]]): `k` must
    * not exceed the k the input sketches were BUILT with — a sketch
    * only knows its bottom-k, so asking a larger k would fabricate
    * rank positions whose true occupants were never kept. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val all = a.select(col(groupCol), col("h"))
      .unionByName(b.select(col(groupCol), col("h"))).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    all.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("int").as("rank"), col("h"))
  }

  /** Pairwise set-operation estimates over the groups of one KMV
    * sketch — the audience-overlap / cross-corpus-overlap query HLL
    * cannot answer. For each group pair a<b: U = the k smallest
    * hashes of the merged sketches (a valid sketch of the UNION, by
    * the k-min recursion), est_union from U's kth value, Jaccard
    * ρ̂ = |U ∩ Kₐ ∩ K_b|/|U| (U is a uniform sample of A∪B, so
    * membership in both sketches estimates the overlap fraction),
    * est_intersect = ρ̂·est_union.
    *
    * Everything runs on sketch rows only — O(groups²·k), independent
    * of corpus size; the pair frame is a broadcast of the distinct
    * group list. Exactness below k: pairs whose union has fewer than
    * k distinct hashes report exact union counts and exact Jaccard. */
  def kmvSetOps(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val groups = sketch.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("group_a"))
      .join(groups.select(col(groupCol).as("group_b")),
        col("group_a") < col("group_b"))
    val members = pairs.select(col("group_a"), col("group_b"),
      explode(array(col("group_a"), col("group_b"))).as("__g"))
    val rows = members
      .join(sketch.select(col(groupCol).as("__g"), col("h")), Seq("__g"))
      .groupBy("group_a", "group_b", "h")
      .agg(max(when(col("__g") === col("group_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("__g") === col("group_b"), 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy("group_a", "group_b").orderBy(col("h").asc)
    val u = rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    u.groupBy("group_a", "group_b")
      .agg(count(lit(1)).cast("int").as("union_n"), max("h").as("kth"),
        sum(col("in_a") * col("in_b")).as("__both"))
      .select(col("group_a"), col("group_b"), col("union_n"),
        when(col("union_n") < k, col("union_n").cast("double"))
          .when(col("kth") === Long.MinValue, lit(null).cast("double"))
          .otherwise(lit((k - 1).toDouble * Two64) /
            (col("kth").cast("double") + lit(Two63)))
          .as("est_union"),
        (col("__both").cast("double") / col("union_n").cast("double"))
          .as("jaccard"))
      .withColumn("est_intersect", col("jaccard") * col("est_union"))
  }

  /** Content-addressed shard manifest — the reproducibility record a
    * training run pins next to its data: one row per shard with
    * counts, char/token totals, the id range, and an
    * order-independent content digest (the [[DataQuality.tableChecksum]]
    * md5-xor construction, engine-portable by design). Two corpus
    * generations are byte-identical iff their manifests are equal —
    * a manifest diff localizes WHICH shards changed without reading
    * either corpus (pair with `dq7`'s checksumCompare for the
    * verdict report).
    *
    * Sharding is `id % nShards` — deterministic and replayable by
    * any engine; swap a hash in via a derived column when ids are
    * not uniform. Scale shape: one map-combined aggregation, output
    * is nShards rows; the digest XOR is order-free so no sort and no
    * per-shard collection ever materializes. */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    // ONE digest convention engine-wide: DataQuality.rowDigest is the
    // same 0x1f/0x01 md5 fold dq7's checksums use
    val rowHash = DataQuality.rowDigest(Seq(col(idCol), col(textCol)))
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    df.select(pmod(col(idCol), lit(nShards)).cast("long").as("shard_id"),
        col(idCol).as("__id"), length(col(textCol)).as("__nc"),
        size(toks).as("__nt"), rowHash.as("__h"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("__nc").as("n_chars"),
        sum("__nt").as("n_tokens"),
        min("__id").as("min_id"),
        max("__id").as("max_id"),
        expr("bit_xor(__h)").as("digest"))
  }

  /** Diff two [[shardManifest]]s (corpus generations A and B): one
    * row per shard on either side, with both counts and the
    * count/digest verdicts. The whole comparison moves 2×nShards
    * manifest rows — never corpus data — which is what makes "did
    * anything change, and where" an O(shards) question at 100 TB.
    * A missing shard reports zero docs and a false digest_ok. */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("shard_id"), col("n_docs").as("n_docs_a"),
      col("digest").as("digest_a"))
    val r = b.select(col("shard_id"), col("n_docs").as("n_docs_b"),
      col("digest").as("digest_b"))
    l.join(r, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
        coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b"),
        (coalesce(col("n_docs_a"), lit(0L)) ===
          coalesce(col("n_docs_b"), lit(0L))).as("count_ok"),
        (col("digest_a") <=> col("digest_b")).as("digest_ok"))
  }
}
