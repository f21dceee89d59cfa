package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SketchExpressions, TextExpressions}

/** Gram-level corpus hygiene: benchmark decontamination with a Bloom
  * prefilter, and C4-style over-duplicated span detection.
  *
  * Both operate on word k-gram hashes from the fused
  * `sorted_shingle_hashes` kernel (distinct per doc, codegen'd) — doc
  * bodies never shuffle, only 8-byte gram hashes do.
  *
  * Short-doc contract (from the shingle kernel): a doc with fewer
  * than `gramSize` words contributes ONE gram — the whole text —
  * rather than zero, so identical short docs still collide. SQL
  * reimplementations that emit zero grams for short docs will
  * diverge on corpora containing them.
  */
object Decontaminate {

  /** The one eval-side gram pipeline every operator here shares:
    * distinct (optionally id-tagged) gram hashes, materialized once
    * (the Bloom build is an eager action and the exact-verify joins
    * replay the plan otherwise), plus the Bloom built from them. */
  private def evalGramsAndBloom(eval: DataFrame, textCol: String,
      gramSize: Int, expectedEvalGrams: Long, fpp: Double,
      idCol: Option[String]): (DataFrame, Array[Byte]) = {
    val gramCol = explode(
      TextExpressions.sorted_shingle_hashes(col(textCol), gramSize)).as("gram")
    val grams = (idCol match {
      // distinct() here only guards duplicate eval IDs (gram hashes
      // are already distinct per doc): a duplicated eval row would
      // emit duplicate (eval_id, gram) pairs and fragment the
      // gaps-and-islands run detection downstream
      case Some(id) => eval.select(col(id).as("eval_id"), gramCol).distinct()
      case None => eval.select(gramCol).distinct()
      // corpus-sized pin: reliable-checkpoint knob applies
      // (graft.core.Checkpoints — spark.graft.checkpointDir)
    }).transform(graft.core.Checkpoints.corpus(_, eager = true))
    val bloom = SketchExpressions.buildLongBloom(
      (if (idCol.isDefined) grams.select("gram").distinct() else grams),
      "gram", expectedEvalGrams, fpp)
    (grams, bloom)
  }

  /** Train docs sharing ≥1 word k-gram with an eval/benchmark corpus,
    * with the count of distinct shared grams per train doc — the
    * "is my training set contaminated by the test set" primitive.
    *
    * Scale shape (the reason this beats a plain join at 100 TB): the
    * eval side is small (benchmarks are); its distinct gram hashes
    * are collected into a Bloom filter in ONE pass (treeAggregate, no
    * shuffle). The train side — the 100 TB one — probes the filter
    * inside whole-stage codegen BEFORE any exchange, so only the
    * ~fpp·|train grams| + true hits ever shuffle for the exact
    * verify semi-join. False positives are removed by that join;
    * false negatives don't exist — the output is EXACTLY the join
    * result, which is what the DuckDB oracle (dd8) checks.
    */
  def bloomContaminatedDocs(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 3,
      expectedEvalGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    // localCheckpoint (inside the helper) materializes the eval grams
    // once — persist/unpersist can't work here because the caller
    // executes the returned plan after this function (and any
    // finally-unpersist) has run
    val (evalGrams, bloomBytes) = evalGramsAndBloom(
      eval, textCol, gramSize, expectedEvalGrams, fpp, idCol = None)
    train
      .select(col(idCol),
        explode(TextExpressions.sorted_shingle_hashes(col(textCol), gramSize))
          .as("gram"))
      .where(SketchExpressions.bloom_might_contain_long(bloomBytes, col("gram")))
      .join(evalGrams, "gram") // exact verify: kills false positives
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams")) // grams are distinct per doc already
  }

  /** Exact contaminated SPANS: for each (train doc, eval doc) pair
    * sharing word k-grams, the maximal runs of consecutive matching
    * gram positions in the train doc — so a pipeline can EXCISE the
    * contaminated bytes instead of dropping the whole document.
    * Returns (train_id, eval_id, span_start, span_words): span_start
    * is the 0-based word offset of the run's first gram; span_words =
    * run_length + k - 1 is the word count the run covers. Short-doc
    * contract: a train doc with fewer than k words contributes one
    * whole-text gram at position 0, so its span reports span_words =
    * k (an upper bound — the doc itself is shorter).
    *
    * Scale shape: same Bloom-prefilter skeleton as
    * [[bloomContaminatedDocs]] — eval grams collected once into a
    * broadcast Bloom (eval corpora are small), the 100 TB train side
    * probes it inside codegen BEFORE any exchange, and only surviving
    * (train_id, pos, gram) triples shuffle for the exact verify join.
    * The run-detection window partitions by (train_id, eval_id) —
    * only CONTAMINATED pairs ever reach it, and per-pair state is the
    * pair's matched gram count, so the window is skew-safe even when
    * the corpus is huge.
    */
  def contaminatedSpans(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 3,
      expectedEvalGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (eval_id, gram) pairs — distinct per doc by the sorted-shingle
    // kernel's contract
    val (evalGrams, bloomBytes) = evalGramsAndBloom(
      eval, textCol, gramSize, expectedEvalGrams, fpp, idCol = Some(idCol))
    val trainGrams = train
      .select(col(idCol).as("train_id"),
        posexplode(TextExpressions.positional_shingle_hashes(col(textCol), gramSize))
          .as(Seq("pos", "gram")))
      .where(SketchExpressions.bloom_might_contain_long(bloomBytes, col("gram")))
    // exact verify: one row per (train pos, eval doc containing gram)
    val matched = trainGrams.join(evalGrams, "gram")
      .select("train_id", "eval_id", "pos")
    // gaps-and-islands: consecutive positions share (pos - row_number)
    val w = Window.partitionBy("train_id", "eval_id").orderBy("pos")
    matched
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("train_id", "eval_id", "grp")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (count(lit(1)) + lit(gramSize - 1)).as("span_words"))
      .drop("grp")
  }

  /** Memorization / novelty audit (the Carlini-style regurgitation
    * check run over MODEL OUTPUTS): for each generated document,
    * what fraction of its word k-grams already exists ANYWHERE in
    * the training corpus, and how long is the longest contiguous
    * memorized span? `novelty` = 1 − hit fraction; a low-novelty
    * generation with a long `max_memorized_words` run is verbatim
    * training data leaking through the model — the audit a
    * responsible generation pipeline runs before shipping synthetic
    * data back into training.
    *
    * Scale shape = [[contaminatedSpans]] with the roles flipped and
    * the corpus side collapsed: the corpus contributes only its
    * DISTINCT gram-hash set (one pass + a Bloom built by
    * treeAggregate), the generation side streams through the Bloom
    * prefilter in codegen and exact-verifies survivors against the
    * distinct set via one keyed join — generations never shuffle
    * their text, the corpus never re-scans. Runs (gaps-and-islands
    * over hit positions) window per gen doc only. */
  def memorizationAudit(gen: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, gramSize: Int = 8,
      expectedCorpusGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val (corpusGrams, bloomBytes) = evalGramsAndBloom(
      corpus, textCol, gramSize, expectedCorpusGrams, fpp, idCol = None)
    memorizationAuditAgainst(gen, idCol, textCol, gramSize,
      corpusGrams, bloomBytes)
  }

  /** Build the reusable corpus reference for
    * [[memorizationAuditAgainst]]: the distinct gram-hash frame
    * (materialized) and the Bloom built over it — one corpus pass,
    * amortized across every later audit call or micro-batch. */
  def corpusReference(corpus: DataFrame, textCol: String, gramSize: Int,
      expectedCorpusGrams: Long = 1L << 20,
      fpp: Double = 0.01): (DataFrame, Array[Byte]) =
    evalGramsAndBloom(corpus, textCol, gramSize, expectedCorpusGrams,
      fpp, idCol = None)

  /** [[memorizationAudit]] against a PREBUILT corpus reference (the
    * distinct gram frame + its Bloom): every audit column is a
    * per-generation-independent function, so the same reference can
    * score batch after batch — the form the streaming ingestion gate
    * ([[graft.streaming.EventStream.streamingMemorizationAudit]])
    * folds over micro-batches, paying the corpus pass ONCE per
    * corpus generation instead of once per batch. */
  def memorizationAuditAgainst(gen: DataFrame,
      idCol: String, textCol: String, gramSize: Int,
      corpusGrams: DataFrame, bloomBytes: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val genG = gen.select(col(idCol).as("gen_id"),
      posexplode(TextExpressions.positional_shingle_hashes(col(textCol), gramSize))
        .as(Seq("pos", "gram")))
    val hits = genG
      .where(SketchExpressions.bloom_might_contain_long(bloomBytes, col("gram")))
      .join(corpusGrams, "gram") // corpusGrams is distinct: semi semantics
      .select("gen_id", "pos")
    val w = Window.partitionBy("gen_id").orderBy("pos")
    val runs = hits.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("gen_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("gen_id")
      .agg(max("run").as("__maxrun"), sum("run").as("__nhit"))
    val totals = gen.select(col(idCol).as("gen_id"),
      size(TextExpressions.positional_shingle_hashes(col(textCol), gramSize))
        .cast("long").as("n_grams"))
    totals.join(runs, Seq("gen_id"), "left")
      .select(col("gen_id"), col("n_grams"),
        coalesce(col("__nhit"), lit(0L)).as("n_memorized_grams"),
        when(col("n_grams") > 0,
          round(lit(1.0) -
            coalesce(col("__nhit"), lit(0L)).cast("double") / col("n_grams"), 6))
          .as("novelty"),
        when(coalesce(col("__maxrun"), lit(0L)) > 0,
          coalesce(col("__maxrun"), lit(0L)) + lit(gramSize - 1).cast("long"))
          .otherwise(lit(0L)).as("max_memorized_words"))
  }

  /** Edit-tolerant memorization audit (mem2) — the paraphrase-level
    * regurgitation [[memorizationAudit]] misses: mem1 counts VERBATIM
    * k-gram runs, so a generation that reproduces corpus text with a
    * word swapped every sentence or two sails through. This form
    * audits WINNOWED FINGERPRINTS (ta6's kernel: per window of `w`
    * consecutive word `gramSize`-grams, the lexicographic minimum —
    * the MOSS selection rule): an isolated edit destroys only the
    * ~gramSize grams overlapping it, so a 1-edit-per-20-words
    * near-verbatim copy still shares the large majority of its
    * fingerprints with the source, while genuinely novel text over
    * the same vocabulary shares almost none. Per generation:
    * fingerprint count, corpus-matched count, memorized fraction,
    * and a `near_verbatim` flag at the `flagNum/flagDen` threshold
    * (default the majority, 1/2) — decided by integer
    * cross-multiplication, never a double compare, so any rational
    * threshold stays engine-exact.
    *
    * Scale shape = [[memorizationAudit]]'s exactly, bucketed and
    * never all-pairs: the corpus collapses to its DISTINCT
    * fingerprint set — at ~2/(w+1) of full gram density, winnowing
    * is also a 60%+ state discount at w=4 — with a treeAggregate
    * Bloom over the fingerprint hashes; the generation side streams
    * through the Bloom prefilter in whole-stage codegen and
    * exact-verifies survivors via one keyed join on the fingerprint
    * string (false positives die in the join, false negatives don't
    * exist — the output is EXACTLY the join result, which is what
    * the DuckDB oracle checks). No pairwise doc×doc comparison ever
    * materializes. */
  def paraphraseAudit(gen: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      gramSize: Int = 3, window: Int = 4,
      flagNum: Int = 1, flagDen: Int = 2,
      expectedCorpusFps: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    require(flagNum >= 0 && flagDen > 0 && flagNum <= flagDen,
      s"flag threshold must be a fraction in [0, 1]: $flagNum/$flagDen")
    def fps(df: DataFrame, keyCols: Seq[Column]): DataFrame = {
      val exploded = df.select(keyCols :+ explode(
        TextExpressions.winnow_fingerprints(
          col(textCol), gramSize, window)).as("f"): _*)
      exploded.select(exploded.columns.dropRight(1).map(col) :+
        col("f.gram").as("gram"): _*)
        .distinct()
    }
    // the one corpus-sized pin in the audit: executor-loss semantics
    // are the reliable-checkpoint knob's to decide (Checkpoints)
    val corpusFps = graft.core.Checkpoints.corpus(fps(corpus, Nil))
    val bloomBytes = SketchExpressions.buildLongBloom(
      corpusFps.select(xxhash64(col("gram")).as("h")), "h",
      expectedCorpusFps, fpp)
    val genFps = fps(gen, Seq(col(idCol).as("gen_id"))).localCheckpoint()
    val totals = genFps.groupBy("gen_id")
      .agg(count(lit(1)).as("n_fingerprints"))
    val hits = genFps
      .where(SketchExpressions.bloom_might_contain_long(
        bloomBytes, xxhash64(col("gram"))))
      .join(corpusFps, "gram") // corpusFps is distinct: semi semantics
      .groupBy("gen_id").agg(count(lit(1)).as("n_matched"))
    totals.join(hits, Seq("gen_id"), "left")
      .select(col("gen_id"), col("n_fingerprints"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        round(coalesce(col("n_matched"), lit(0L)).cast("double") /
          col("n_fingerprints"), 6).as("memorized_frac"),
        (coalesce(col("n_matched"), lit(0L)) * flagDen >=
          col("n_fingerprints") * flagNum).as("near_verbatim"))
  }

  /** WHERE the near-verbatim material sits (mem3) — the span-level
    * sibling of [[paraphraseAudit]], as [[contaminatedSpans]] is to
    * [[bloomContaminatedDocs]]: per generation, maximal runs of
    * corpus-matched winnow fingerprints in gram-position order,
    * merged across holes of up to `gapTolerance` positions (an
    * isolated edit kills the ~gramSize grams overlapping it plus up
    * to a window's worth of selection drift, so tolerance defaults to
    * gramSize + 2·window), and reported only when at least `minFps`
    * fingerprints support the run (isolated single-fingerprint
    * matches are vocabulary coincidence, not lifting). Output:
    * (gen_id, span_start, span_end, n_fps, span_words) in word
    * coordinates of the whitespace-normalized text — span_words spans
    * first-matched-gram start to last-matched-gram end, the region an
    * excision or attribution step would slice.
    *
    * Scale shape identical to [[paraphraseAudit]]: corpus → distinct
    * fingerprint set + Bloom once; generations stream through the
    * codegen prefilter; the only per-gen state is a window over that
    * generation's MATCHED fingerprints (sparse: ~2/(w+1) of grams,
    * then only corpus hits). */
  def paraphraseSpans(gen: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      gramSize: Int = 5, window: Int = 4,
      gapTolerance: Int = -1, minFps: Int = 3,
      expectedCorpusFps: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tol = if (gapTolerance >= 0) gapTolerance else gramSize + 2 * window
    val fpCol = explode(TextExpressions.winnow_fingerprints(
      col(textCol), gramSize, window)).as("f")
    val corpusFps = corpus.select(fpCol)
      .select(col("f.gram").as("gram")).distinct().localCheckpoint()
    val bloomBytes = SketchExpressions.buildLongBloom(
      corpusFps.select(xxhash64(col("gram")).as("h")), "h",
      expectedCorpusFps, fpp)
    val genFps = gen.select(col(idCol).as("gen_id"), fpCol)
      .select(col("gen_id"), col("f.pos").as("pos"), col("f.gram").as("gram"))
      .distinct()
    val matched = genFps
      .where(SketchExpressions.bloom_might_contain_long(
        bloomBytes, xxhash64(col("gram"))))
      .join(corpusFps, "gram")
      .select("gen_id", "pos")
    val w = Window.partitionBy("gen_id").orderBy("pos")
    matched
      .withColumn("__gap",
        when(col("pos") - lag("pos", 1).over(w) > tol, 1).otherwise(0))
      .withColumn("__isl", sum("__gap").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("gen_id", "__isl")
      .agg(min("pos").as("span_start"), max("pos").as("span_end"),
        count(lit(1)).as("n_fps"))
      .filter(col("n_fps") >= minFps)
      .select(col("gen_id"), col("span_start"), col("span_end"),
        col("n_fps"),
        (col("span_end") - col("span_start") + gramSize).as("span_words"))
  }

  /** Character offsets for [[contaminatedSpans]] output — the form a
    * pipeline actually slices. Offsets are defined on the
    * WHITESPACE-NORMALIZED text (tokens joined by single spaces):
    * char_start = length of the first span_start tokens plus their
    * separators; char_len covers the span's tokens. Token boundaries
    * are case-insensitive-identical to the hashing kernels'
    * (lowercasing never moves whitespace), so the offsets line up
    * with the gram positions the spans came from. Row-local compute
    * joined doc-colocated — the spans frame is tiny relative to the
    * corpus, so Spark broadcasts it.
    */
  def spanCharOffsets(
      spans: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("train_id"),
      split(trim(col(textCol)), "\\s+").as("__toks"))
    spans.join(toks, "train_id")
      .withColumn("char_start",
        when(col("span_start") === 0, lit(0L)).otherwise(
          length(array_join(slice(col("__toks"), lit(1),
            col("span_start").cast("int")), " ")).cast("long") + 1L))
      .withColumn("char_len",
        length(array_join(slice(col("__toks"),
          col("span_start").cast("int") + 1,
          col("span_words").cast("int")), " ")).cast("long"))
      .drop("__toks")
  }

  /** The excision step [[contaminatedSpans]] / [[spanCharOffsets]]
    * set up: emit the CLEANED corpus with the contaminated spans cut
    * out, plus audit columns. Returns one row per doc in `docs`:
    * (idCol, clean_text, removed_chars, n_spans) — `clean_text` is
    * defined on the whitespace-normalized text (tokens joined by
    * single spaces, like [[spanCharOffsets]]' ruler), `removed_chars`
    * counts every normalized char cut (span bodies plus the one
    * separator each excised region consumes), `n_spans` counts
    * MERGED excised regions (overlapping/adjacent spans collapse).
    *
    * `spans` is [[contaminatedSpans]]' output (dd10/dd11 shape):
    * (train_id, span_start, span_words) in word coordinates; the same
    * span reported against several eval docs is excised once.
    *
    * Equivalence contract (what the DuckDB oracle checks): dropping
    * the covered TOKENS and re-joining on single spaces is exactly
    * the substring-stitch of the normalized text over the merged
    * char-offset regions, where each interior region also consumes
    * its trailing separator and a doc-final region its leading one —
    * so the cleaned text never carries doubled or dangling spaces.
    *
    * Scale shape: the spans frame is sized by CONTAMINATION (tiny
    * relative to the corpus); it aggregates to one interval-array row
    * per affected doc, joins on the doc key (AQE broadcasts it), and
    * everything else — interval merge, token filter, audit counts —
    * is row-local inside the doc's task. The corpus text never
    * shuffles, span-free docs never join anything.
    */
  def excise(
      docs: DataFrame,
      spans: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val ivs = spans.select(col("train_id"),
        struct(col("span_start").cast("long").as("s"),
          (col("span_start") + col("span_words")).cast("long").as("e"))
          .as("__iv"))
      .groupBy("train_id")
      .agg(array_sort(collect_set(col("__iv"))).as("__ivs"))
    val toks = split(trim(col(textCol)), "\\s+")
    val norm = array_join(toks, " ")
    val kept = array_join(
      filter(toks, (_, i) => !exists(col("__ivs"), iv =>
        i.cast("long") >= iv.getField("s") &&
          i.cast("long") < iv.getField("e"))), " ")
    // merged-region count: fold sorted intervals, new region iff the
    // interval starts past the running max end (touching merges —
    // adjacent spans leave no token between them)
    val nSpans = aggregate(col("__ivs"),
      struct(lit(-1L).as("mx"), lit(0L).as("n")),
      (acc, iv) => struct(
        greatest(acc.getField("mx"), iv.getField("e")).as("mx"),
        (acc.getField("n") + when(iv.getField("s") > acc.getField("mx"),
          lit(1L)).otherwise(lit(0L))).as("n")),
      acc => acc.getField("n"))
    docs.join(ivs, docs(idCol) === ivs("train_id"), "left")
      .withColumn("clean_text",
        when(col("__ivs").isNull, norm).otherwise(kept))
      .withColumn("removed_chars",
        when(col("__ivs").isNull, lit(0L))
          .otherwise((length(norm) - length(col("clean_text"))).cast("long")))
      .withColumn("n_spans",
        when(col("__ivs").isNull, lit(0L)).otherwise(nSpans))
      .select(col(idCol), col("clean_text"), col("removed_chars"),
        col("n_spans"))
  }

  /** Ingestion-time decontamination gate: keep only docs sharing NO
    * word k-gram with the eval corpus, decided ROW-LOCALLY against a
    * broadcast Bloom filter — so the same call runs unchanged on a
    * STREAMING DataFrame (append mode, no state, no join), which is
    * where a production pipeline wants this check: before the doc
    * ever lands. The filter is CONSERVATIVE: a Bloom false positive
    * drops a clean doc (P ≈ 1-(1-fpp)^grams per doc), never the
    * reverse — contaminated docs cannot slip through. For the exact
    * post-hoc accounting (which docs, how many grams) use the batch
    * [[bloomContaminatedDocs]].
    */
  def bloomCleanDocs(
      docs: DataFrame,
      eval: DataFrame,
      textCol: String,
      gramSize: Int = 3,
      expectedEvalGrams: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val (_, bloomBytes) = evalGramsAndBloom(
      eval, textCol, gramSize, expectedEvalGrams, fpp, idCol = None)
    docs.where(!exists(
      TextExpressions.sorted_shingle_hashes(col(textCol), gramSize),
      g => SketchExpressions.bloom_might_contain_long(bloomBytes, g)))
  }

  /** Docs containing "hot" spans — word k-grams occurring in ≥
    * `minDocs` distinct documents corpus-wide (C4-style boilerplate /
    * over-duplication signal). Returns (id, n_hot_spans) for affected
    * docs.
    *
    * One shuffle of 8-byte gram hashes to count doc-frequency
    * (partial aggregation applies map-side), one gram-colocated join
    * back. Doc text itself never moves.
    */
  def hotSpanDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 5,
      minDocs: Int = 10): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(TextExpressions.sorted_shingle_hashes(col(textCol), gramSize))
        .as("gram"))
    // distinct per doc by construction -> count(*) = doc frequency
    val hot = grams.groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("gram")
    grams.join(hot, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hot_spans"))
  }

  /** The removal rule [[hotSpanDocs]] only detects: C4-style
    * corpus-internal duplicated-span EXCISION. Word k-grams occurring
    * in ≥ `minDocs` distinct documents are "hot"; the doc with the
    * MINIMUM id keeps its text untouched (the canonical first
    * occurrence), every other doc has its maximal runs of consecutive
    * hot-gram positions cut out. Returns the [[excise]] shape — one
    * row per doc: (idCol, clean_text, removed_chars, n_spans) on the
    * whitespace-normalized text.
    *
    * Hot-gram identity is 64-bit gram-hash equality (the corpus-wide
    * convention — see `Dedup.exact`); a cross-doc hash collision
    * would excise a non-duplicated span.
    *
    * Scale shape: only 8-byte (id, pos, gram-hash) triples shuffle to
    * count doc-frequency; the hot set is tiny by construction (df ≥
    * minDocs survivors of a HAVING), so the join back is
    * gram-colocated on the same exchange, the islands window
    * partitions per doc over MATCHED positions only (sized by
    * duplication, not doc length), and [[excise]] aggregates spans to
    * one interval-array row per affected doc — corpus text never
    * shuffles, clean docs never join anything.
    */
  /** Exact duplicate-substring dedup (VERDICT r5 #2 — the
    * deduplicate-text-datasets operator, suffix-array semantics
    * re-expressed with gram anchors): every maximal run of ≥
    * `anchorWords` consecutive words shared VERBATIM with at least
    * one other document, whose normalized text is at least `minChars`
    * characters long, is excised from every document except the
    * min-id owner of each anchor gram. Where a suffix array finds
    * "any duplicate substring ≥ L bytes" by sorting all suffixes,
    * anchors find the same spans positionally: a duplicated region of
    * w ≥ anchorWords words contains exactly w − anchorWords + 1
    * duplicated anchor grams at CONSECUTIVE positions, so the
    * gaps-and-islands merge reconstructs the maximal region without
    * any pairwise extension step — extension is what consecutive
    * anchors already encode. `minChars` is the L-chars floor applied
    * to each maximal consecutive-anchor run (PER ISLAND, BEFORE any
    * overlapping islands merge inside [[excise]] — two sub-floor
    * islands whose merged extent would pass the floor both stay;
    * measured on the whitespace-normalized text, the same ruler
    * [[spanCharOffsets]] uses); runs below it are organic short
    * overlaps, not boilerplate, and stay.
    *
    * Word resolution is deliberate: excision must not split a word,
    * and the corpus convention normalizes whitespace anyway — a
    * byte-exact tool dedups at byte resolution, this dedups at the
    * resolution the corpus is actually compared at everywhere else
    * (gram-hash identity, see [[hotSpanExcision]]'s collision note).
    *
    * Scale shape: one (id, pos, gram-hash) triple shuffles PER WORD —
    * the same 8-bytes-per-unit budget a suffix array pays per byte,
    * an order less. df/owner is one map-side-combined aggregation;
    * the dup set joins back gram-colocated on the same exchange; the
    * char gate joins span rows (contamination-sized) against doc
    * tokens broadcast-free on the doc key; [[excise]] finishes
    * row-local. Corpus text never shuffles.
    */
  def duplicateSubstringExcision(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      anchorWords: Int = 8,
      minChars: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(anchorWords >= 2, s"anchorWords >= 2: $anchorWords")
    require(minChars >= 1, s"minChars >= 1: $minChars")
    val grams = docs.select(col(idCol).as("train_id"),
      posexplode(
        TextExpressions.positional_shingle_hashes(col(textCol), anchorWords))
        .as(Seq("pos", "gram")))
    val dup = grams.groupBy("gram")
      .agg(countDistinct(col("train_id")).as("df"),
        min(col("train_id")).as("owner"))
      .filter(col("df") >= 2)
      .select("gram", "owner")
    val marked = grams.join(dup, "gram")
      .filter(col("train_id") =!= col("owner"))
      .select("train_id", "pos")
    val w = Window.partitionBy("train_id").orderBy("pos")
    val spans = marked
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("train_id", "grp")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (count(lit(1)) + lit(anchorWords - 1)).as("span_words"))
      .drop("grp")
    val sized = spanCharOffsets(spans, docs, idCol, textCol)
      .filter(col("char_len") >= minChars)
      .select("train_id", "span_start", "span_words")
    excise(docs, sized, idCol, textCol)
  }

  def hotSpanExcision(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 3,
      minDocs: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol).as("train_id"),
      posexplode(
        TextExpressions.positional_shingle_hashes(col(textCol), gramSize))
        .as(Seq("pos", "gram")))
    // positional grams repeat within a doc; df is distinct-doc count
    val hot = grams.groupBy("gram")
      .agg(countDistinct(col("train_id")).as("df"),
        min(col("train_id")).as("owner"))
      .filter(col("df") >= minDocs)
      .select("gram", "owner")
    val matched = grams.join(hot, "gram")
      .filter(col("train_id") =!= col("owner"))
      .select("train_id", "pos")
    // gaps-and-islands per doc: consecutive hot positions merge into
    // one span (same shape as contaminatedSpans, keyed by doc alone)
    val w = Window.partitionBy("train_id").orderBy("pos")
    val spans = matched
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("train_id", "grp")
      .agg(min(col("pos")).cast("long").as("span_start"),
        (count(lit(1)) + lit(gramSize - 1)).as("span_words"))
      .drop("grp")
    excise(docs, spans, idCol, textCol)
  }
}
