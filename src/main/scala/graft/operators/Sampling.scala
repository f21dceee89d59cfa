package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training-data
  * pipelines (beyond-parity).
  *
  * Everything here is REPRODUCIBLE BY CONSTRUCTION: selection is a
  * pure function of the row's id (Knuth multiplicative hashing), not
  * of an RNG stream, partition layout, or row order. Re-running the
  * pipeline — or re-running it on a different cluster size — selects
  * the same rows. That property is what makes training mixtures
  * auditable, and it is also what lets these operators be verified
  * against an independent SQL engine.
  */
object Sampling {

  /** Knuth multiplicative hash of an integer id into [0, 2^32):
    * h(id) = (id * 2654435761) mod 2^32, computed with a 16-bit limb
    * split so no intermediate product exceeds 2^49 — the naive 64-bit
    * multiply overflows (and under Spark 4's default ANSI mode,
    * THROWS) for ids >= ~3.47e9, which snowflake-style ids exceed.
    * Same value as the naive formula wherever that one is defined;
    * still pure arithmetic, expressible in any SQL engine. */
  def idHash(id: Column): Column = {
    val c = 2654435761L
    val m = 4294967296L
    val lo = pmod(id.cast("long"), lit(m))       // only low 32 bits matter mod 2^32
    val l1 = (lo / 65536L).cast("long")          // high 16 of lo
    val l0 = pmod(lo, lit(65536L))               // low 16 of lo
    pmod(pmod(l1 * c, lit(m)) * 65536L + l0 * c, lit(m))
  }

  /** Deterministic fraction sample: keep rows whose id-hash falls
    * under fraction * 2^32. */
  def byFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(idHash(col(idCol)) < (fraction * 4294967296.0).toLong)
  }

  /** Exact-count stratified sample: the n rows with the smallest
    * id-hash per stratum (deterministic, order-independent).
    * One shuffle on the stratum keys. */
  def stratified(df: DataFrame, idCol: String, strataCols: Seq[String],
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(idHash(col(idCol)).asc, col(idCol).asc)
    // collision-safe temp name: withColumn would silently REPLACE a
    // user column of the same name
    var rn = "__rn"
    while (df.columns.contains(rn)) rn += "_"
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= perStratum)
      .drop(rn)
  }

  /** Weighted corpus mixture: per source key, keep the configured
    * fraction of rows (deterministic). The training-mix primitive:
    * `mixture(docs, "doc_id", "source", Map("src0" -> 1.0,
    * "src1" -> 0.25))` keeps all of src0, a quarter of src1, and
    * drops unlisted sources. */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1),
      "mixture weights are per-source keep fractions in [0,1]")
    val cutoff = weights.foldLeft(lit(-1L)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit((w * 4294967296.0).toLong)).otherwise(acc)
    }
    df.filter(idHash(col(idCol)) < cutoff)
  }

  /** Temperature-scaled mixture weights: per source s, weight
    * w_s = n_s^alpha / sum_t(n_t^alpha). alpha = 1 reproduces the
    * natural distribution, alpha = 0 is uniform over sources, and
    * the usual alpha in (0, 1) up-weights small sources — the
    * standard smoothing for multilingual / multi-source training
    * mixes. Returns (sourceCol, n_docs, weight), weight rounded to 6.
    *
    * Scale shape: one partial-aggregated count shuffle; the
    * normalizing window runs over ONE row per source — sources are a
    * small closed set by definition (languages, crawls, datasets), so
    * the single-partition window holds #sources rows, not data.
    * Compose with [[mixture]]: keep fraction for source s =
    * min(1, budget * w_s / n_s) turns the weights into per-source
    * sampling rates for a token/doc budget.
    */
  def temperatureWeights(df: DataFrame, sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val w = Window.partitionBy()
    df.groupBy(sourceCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight",
        round(pow(col("n_docs"), alpha) / sum(pow(col("n_docs"), alpha)).over(w), 6))
  }

  /** Deterministic epoch shuffle: a reproducible global training
    * order per epoch with no RNG state. Each (epoch, row) gets the
    * ordering key h(id·epochs + epoch) — a fresh pseudo-random
    * permutation per epoch, pure in (id, epoch) — then rows are
    * dealt into `shards` by key and positioned within their shard.
    * The global read order is (epoch, shard, position): exactly how
    * a training job consumes data (one file list per epoch, shards
    * read in parallel).
    *
    * Scale shape: the key is row-local arithmetic; the position
    * window partitions by (epoch, shard) — parallelism = epochs ×
    * shards, never a single global sort. In production shards ≈
    * output-file count, so each window partition is one writer task.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
      shards: Int): DataFrame = {
    require(epochs > 0 && shards > 0, s"epochs=$epochs shards=$shards")
    val withE = df.select(col(idCol),
      explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
    val keyed = withE.withColumn("__k",
      idHash(col(idCol) * epochs + col("epoch")))
    val w = Window
      .partitionBy(col("epoch"), pmod(col("__k"), lit(shards.toLong)))
      .orderBy(col("__k").asc, col(idCol).asc)
    keyed
      .withColumn("shard", pmod(col("__k"), lit(shards.toLong)).cast("int"))
      .withColumn("position", row_number().over(w))
      .select(col("epoch"), col("shard"), col("position"), col(idCol))
  }

  /** Embargoed temporal split — the time-series cross-validation
    * standard: train strictly before `trainEnd`, test at or after
    * `trainEnd` + `embargo`, and the embargo gap DROPPED — with
    * autocorrelated data, a test row seconds after the train cutoff
    * leaks the train period into the eval. Row-local filter +
    * label, shuffle-free; returns rows with a `split` column, embargo
    * rows excluded. */
  def temporalSplit(df: DataFrame, tsCol: String,
      trainEnd: Column, embargo: Column): DataFrame = {
    val ts = col(tsCol)
    val testStart = trainEnd + embargo
    df.filter(ts < trainEnd || ts >= testStart)
      .withColumn("split", when(ts < trainEnd, "train").otherwise("test"))
  }

  /** Leave-last-out holdout — the recsys evaluation standard: each
    * key's `lastN` most recent rows become test, everything earlier
    * train, so evaluation asks "predict what this user did NEXT", not
    * a random subset. Ties broken by the full orderCols list
    * (pass the event id last). One per-key window. */
  def leaveLastOut(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], lastN: Int = 1): DataFrame = {
    require(lastN >= 1, s"lastN must be >= 1: $lastN")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__r", row_number().over(w))
      .withColumn("split", when(col("__r") <= lastN, "test")
        .otherwise("train"))
      .drop("__r")
  }

  /** Curriculum ordering: a single global training order that walks
    * difficulty bands easiest-first while SHUFFLING deterministically
    * within each band — sort key (band, idHash(id), id). The rank is
    * global (epoch position over the whole corpus), produced WITHOUT
    * a global window: the composite key feeds
    * [[Packing.cumulative]]'s bucketed prefix sum, whose only global
    * pass touches ≤ `buckets` total rows.
    *
    * Key packing bounds (loud, not silent): band < 64, id < 2²⁶ —
    * the three fields pack into one ordered BIGINT (band·2⁵²
    * + h₂₆·2²⁶ + id), unique because the id occupies the low bits.
    * Larger id spaces re-pack with fewer shuffle bits. Output:
    * (idCol, band, rank) with rank 1..N in curriculum order. */
  def curriculumOrder(df: DataFrame, idCol: String, bandCol: Column,
      buckets: Int = 64): DataFrame = {
    val guarded = df.select(col(idCol), bandCol.cast("long").as("band"))
      .withColumn("band",
        when(col("band") >= 0 && col("band") < 64, col("band"))
          .otherwise(raise_error(concat(lit("curriculumOrder: band out of [0,64): "),
            col("band").cast("string")))))
      .withColumn("__id",
        when(col(idCol) >= 0 && col(idCol) < (1L << 26), col(idCol).cast("long"))
          .otherwise(raise_error(concat(lit("curriculumOrder: id out of [0,2^26): "),
            col(idCol).cast("string")))))
    val h26 = pmod(idHash(col("__id")), lit(1L << 26))
    val keyed = guarded
      .withColumn("__key",
        col("band") * (1L << 52) + h26 * (1L << 26) + col("__id"))
      .withColumn("__one", lit(1L))
    Packing.cumulative(keyed, "__key", "__one", buckets)
      .select(col(idCol), col("band"), col("cum").as("rank"))
  }

  /** Per-group nucleus (top-p) selection: within each group, rank
    * rows by `weightCol` descending (ties broken by `idCol` so the
    * boundary is engine-stable) and keep rows until the kept weight
    * reaches fraction `p` of the group total — i.e. keep every row
    * whose EXCLUSIVE running weight is still below p·total, so the
    * row that crosses the threshold is included (the top-p
    * convention: the nucleus always covers ≥ p mass, and at least
    * one row survives per group). The quality-mass curation rule:
    * "keep the best documents covering 90% of the score mass per
    * domain" instead of a fixed count or a fixed cutoff.
    *
    * Scale shape: one window partitioned by the group does both the
    * running sum and (via the same partitioning) the group total —
    * a single hash-partition pass, parallel in groups. */
  def nucleusByGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"p must be in (0,1], got $p")
    require(groupCols.nonEmpty, "nucleusByGroup needs group columns")
    val ordered = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(weightCol).desc, col(idCol).asc)
    val whole = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__before",
        coalesce(sum(col(weightCol))
          .over(ordered.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("__total", sum(col(weightCol)).over(whole))
      .filter(col("__before") < col("__total") * p)
      .drop("__before", "__total")
  }

  /** Per-source TOKEN-budget selection — the corpus-construction
    * rule behind Pile/Dolma-style mixes: "take (an unbiased,
    * reproducible sample of) source s up to B_s tokens". Docs are
    * ordered within each source by id-hash (a deterministic
    * pseudo-random priority, so the kept set is an unbiased sample
    * and stable across runs/reorderings) and kept while the
    * EXCLUSIVE running token count is below the source's budget —
    * the doc that crosses the budget is included (every source with
    * a positive budget keeps >= 1 doc; a zero budget keeps none).
    * Unlisted sources drop. Output: input columns + `cum_tokens`
    * (the inclusive per-source running total, an audit column).
    *
    * Scale shape: the per-source prefix sum is DISTRIBUTED — a bare
    * `Window.partitionBy(source)` would funnel each source (billions
    * of rows, #sources small) through one task. Instead the id-hash
    * order key is already uniform in [0, 2^32), so STATIC equal-width
    * hash ranges bucket each source with no quantile probe; local
    * cumsum per (source, bucket), per-bucket totals -> driver (<=
    * #sources x `buckets` rows — bounded), exclusive prefix within
    * each source, broadcast back. One data shuffle, parallelism =
    * #sources x buckets. Same exactness argument as
    * [[Packing.cumulative]]: bucket boundaries only shape the
    * distribution, never the result. */
  def tokenBudgetMixture(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budgets: Map[String, Long],
      buckets: Int = 64): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMixture needs at least one budget")
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0: $budgets")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val spark = df.sparkSession
    val m = 4294967296L
    val listed = df.filter(col(sourceCol).isin(budgets.keys.toSeq: _*))
      .withColumn("__h", idHash(col(idCol)))
      // h < 2^32 and buckets bounded, so h * buckets stays far from
      // long overflow; floor division gives exact equal-width ranges
      .withColumn("__b", (col("__h") * buckets / m).cast("int"))
    val w = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = listed.withColumn("__cl",
      sum(col(tokensCol).cast("long")).over(w))
    // per-(source, bucket) totals: bounded by #sources x buckets
    val totals = listed.groupBy(col(sourceCol), col("__b"))
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .collect()
    val offsets = totals
      .groupBy(_.getString(0)).toSeq
      .flatMap { case (src, rows) =>
        var acc = 0L
        rows.sortBy(_.getInt(1)).map { r =>
          val o = (src, r.getInt(1), acc) // offset BEFORE this bucket
          acc += r.getLong(2)
          o
        }
      }
    val offsetDf = spark.createDataFrame(offsets)
      .toDF(sourceCol, "__b", "__off")
    val budgetCol = budgets.foldLeft(lit(-1L)) { case (acc, (src, b)) =>
      when(col(sourceCol) === src, lit(b)).otherwise(acc)
    }
    local.join(broadcast(offsetDf), Seq(sourceCol, "__b"))
      .withColumn("cum_tokens", col("__cl") + col("__off"))
      .filter(col("cum_tokens") - col(tokensCol).cast("long") < budgetCol)
      .drop("__h", "__b", "__cl", "__off")
  }

  /** Leakage-safe train/valid/test assignment: split by NEAR-DUP
    * CLUSTER, not by document — a near-duplicate of a training doc
    * in the test set is evaluation leakage, and a plain id-hash
    * split plants exactly that. `pairs` is any near-dup pair frame
    * (`Dedup.ngramJaccardPairs`, `minhashLshPairs`, ...); every doc
    * gets the split of its connected-component root (unpaired docs
    * key on their own id, so with no pairs this degrades to
    * [[holdout]]'s assignment exactly). Returns df + a `split`
    * label column ("train" / "valid" / "test") — label, not filter,
    * so one pass audits the whole corpus.
    *
    * Scale shape: [[Dedup.clusters]] handles the component labeling
    * (contraction above the driver bound); the label join is
    * id-keyed; the split decision is row-local hash arithmetic. */
  def leakageSafeSplits(df: DataFrame, idCol: String, pairs: DataFrame,
      trainFrac: Double = 0.98, validFrac: Double = 0.01): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1,
      s"invalid split fractions: train=$trainFrac valid=$validFrac")
    val roots = Dedup.clusters(pairs)
      .select(col("id").as("__rid"), col("cluster").as("__cluster"))
    val trainCut = (trainFrac * 4294967296.0).toLong
    val validCut = ((trainFrac + validFrac) * 4294967296.0).toLong
    val h = idHash(coalesce(col("__cluster"), col(idCol)))
    df.join(roots, df(idCol) === col("__rid"), "left")
      .withColumn("split",
        when(h < trainCut, "train")
          .when(h < validCut, "valid")
          .otherwise("test"))
      .drop("__rid", "__cluster")
  }

  /** Split into train/validation/test by id-hash range — stable
    * across runs and immune to upstream reordering. Returns the
    * subset named by `split` given cumulative fractions. */
  def holdout(df: DataFrame, idCol: String, split: String,
      trainFrac: Double = 0.98, validFrac: Double = 0.01): DataFrame = {
    require(trainFrac >= 0 && validFrac >= 0 && trainFrac + validFrac <= 1,
      s"invalid split fractions: train=$trainFrac valid=$validFrac " +
        "(each >= 0, sum <= 1; test gets the remainder)")
    val h = idHash(col(idCol))
    val trainCut = (trainFrac * 4294967296.0).toLong
    val validCut = ((trainFrac + validFrac) * 4294967296.0).toLong
    split match {
      case "train" => df.filter(h < trainCut)
      case "valid" => df.filter(h >= trainCut && h < validCut)
      case "test" => df.filter(h >= validCut)
      case other => throw new IllegalArgumentException(s"unknown split: $other")
    }
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each row draws a deterministic uniform u from the MD5 of
    * (seed, id) — the dq7-proven engine-portable digest — and takes
    * priority ln(u)/w; the k LARGEST priorities are the sample.
    * Inclusion probability is weight-proportional (exactly the
    * w_i^(1/u) order statistic construction), yet the draw is a pure
    * function of (seed, id): rerunning — or re-verifying in another
    * engine — selects the same rows, which is what makes a training
    * mixture auditable. Rows with weight <= 0 or null never qualify.
    *
    * Scale shape: priority is a row-local codegen projection; the
    * top-k executes as a distributed TakeOrdered (per-partition heaps
    * + one k-row merge), never a global sort. Ties (impossible in
    * practice — 60-bit digests) break toward the smaller id.
    * Returns the sampled rows + `priority` (rounded, for audit).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, seed: String = "graft"): DataFrame = {
    require(k > 0, s"k=$k")
    val h = conv(substring(md5(
      concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    // (h + 0.5) / 2^60: strictly inside (0, 1) so ln never hits 0/-inf
    val u = (h.cast("double") + 0.5) / 1.152921504606847e18
    val w = weightCol.cast("double")
    // filter BEFORE the division: ANSI mode faults a zero divisor
    // even on rows the filter would drop from the same projection
    df.filter(w > 0.0)
      .withColumn("__priority", log(u) / w)
      .filter(col("__priority").isNotNull)
      .orderBy(col("__priority").desc, col(idCol).asc)
      .limit(k)
      .withColumn("priority", round(col("__priority"), 6))
      .drop("__priority")
  }
}
