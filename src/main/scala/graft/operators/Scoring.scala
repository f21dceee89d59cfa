package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative term scoring (beyond-parity; SURVEY.md §7.3#7):
  * TF-IDF — the classic relevance/keyword weight a curation pipeline
  * uses for topic filtering and near-duplicate triage.
  *
  * Scale shape (the standard two-aggregate layout):
  *  1. explode tokens -> count(doc, term): ONE shuffle keyed by
  *     (doc, term), map-side partial aggregation.
  *  2. document frequency: re-aggregate the (doc, term) counts by
  *     term — input is already distinct per (doc, term), so df(term)
  *     is a count, not a count-distinct. Second shuffle is
  *     vocabulary-sized.
  *  3. join tf with df on term. The df side is |vocabulary| rows —
  *     AQE broadcasts it when small; at web scale it hash-joins on
  *     term, which is the correct co-location anyway.
  *  4. per-doc top-k by a window over doc_id (state bounded by k via
  *     WindowGroupLimit pushdown).
  * No driver-side collect anywhere; every stage is a partial-agg
  * shuffle or a key-colocated join.
  */
object Scoring {

  /** Per-(doc, term) TF-IDF over whitespace tokens:
    * tf = occurrences in doc, idf = ln(N / df(term)),
    * score = tf * idf. Plain ln (no smoothing) keeps the formula
    * verifiable in any SQL engine; terms present in every document
    * score exactly 0.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // N rides in as a broadcast 1-row frame (same pattern as
    // ngramLogProb's corpus total): no driver-side count, the whole
    // operator stays one lazy plan. N counts ALL documents — including
    // token-free ones — so it cannot be derived from the termCounts
    // tree; the count(*) subtree is column-pruned to metadata.
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val termCounts = df
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val docFreq = termCounts.groupBy("term")
      .agg(count(lit(1)).as("df"))
    termCounts.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n_docs") / col("df")))
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** Top-k highest-TF-IDF terms per document, rank 1..k,
    * deterministic tie-break by term text. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val scored = tfidf(df, idCol, textCol)
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Corpus-unigram language-model score: mean token ln-probability
    * per document (the cheap perplexity proxy curation pipelines use
    * to rank "how typical is this document of the corpus" — low
    * scorers are gibberish or off-distribution).
    *
    * Scale shape: token counting reuses the (doc, term) partial-agg
    * layout, so the model join runs on DISTINCT terms per doc, not
    * every token occurrence; the corpus total rides in as a broadcast
    * 1-row frame (no driver collect, no scalar subquery recompute).
    * Unsmoothed by design — every scored token exists in the model
    * because the model IS the corpus; score with a different corpus
    * needs smoothing first.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ngramLogProb(df, idCol, textCol, n = 1)

  /** [[unigramLogProb]] generalized to word n-grams: the model is the
    * corpus n-gram distribution, the score the mean n-gram
    * ln-probability — higher-order context makes the "how typical"
    * signal sharper (a bigram model penalizes scrambled word order
    * that a unigram model cannot see). Same scale shape; docs with
    * fewer than `n` words produce no row (they have no n-grams).
    */
  def ngramLogProb(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1)
    val units =
      if (n == 1) TextAnalysis.tokens(lower(col(textCol)))
      else QualityFilters.wordNgrams(col(textCol), n)
    // termCounts feeds three subtrees (the join probe, the model, and
    // the corpus total): localCheckpoint materializes the heavy
    // tokenize+explode+count pass ONCE. Same pattern as
    // Decontaminate.bloomContaminatedDocs — persist/unpersist can't
    // work because the caller executes the returned plan after this
    // function (and any finally-unpersist) has run.
    val termCounts = df
      .select(col(idCol).as("id"), explode(units).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val model = termCounts.groupBy("term").agg(sum("tf").as("tc"))
    val total = model.agg(sum("tc").as("total"))
    termCounts
      .join(model, "term")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"),
        (sum(col("tf") * log(col("tc").cast("double") / col("total"))) /
          sum("tf")).as("avg_logprob"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("avg_logprob"), 4).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram log-probability per document —
    * the smoothing the production perplexity filters actually use
    * (CCNet/KenLM are KN-smoothed; [[ngramLogProb]]'s unsmoothed MLE
    * is the yardstick, this is the literature-faithful scorer):
    *
    *   P_KN(w2|w1) = max(c(w1w2) − d, 0)/c(w1·)
    *               + d · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * with the standard d = 0.75: absolute discounting backed off to
    * the CONTINUATION probability (how many distinct histories w2
    * follows — "francisco" is frequent but only ever follows "san",
    * so its continuation mass is tiny; raw-frequency backoff gets
    * this wrong, the whole point of KN). The model is trained on the
    * scored corpus itself, like ta4/ta5.
    *
    * Every model quantity is an exact integer count; P_KN is a fixed
    * double expression over them (two divides, one multiply chain)
    * and the per-doc score the same tf-weighted mean as
    * [[ngramLogProb]] — engine-replayable throughout.
    *
    * Scale shape: the distinct-bigram model table feeds three
    * map-combined aggregates (history totals, continuation counts,
    * type count — each over MODEL rows, not corpus rows) and joins
    * back term-colocated; the corpus shuffles once into (id, bg, tf).
    */
  def knBigramLogProb(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount in (0,1): $discount")
    val termCounts = df
      .select(col(idCol).as("id"),
        explode(QualityFilters.wordNgrams(col(textCol), 2)).as("bg"))
      .filter(col("bg") =!= "")
      .groupBy("id", "bg").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val model0 = termCounts.groupBy("bg").agg(sum("tf").as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .localCheckpoint()
    val hist = model0.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p_fwd"))
    val cont = model0.groupBy("w2").agg(count(lit(1)).as("n1p_bwd"))
    val types = model0.agg(count(lit(1)).as("n_types"))
    val p =
      greatest(col("c12").cast("double") - discount, lit(0.0)) /
        col("c1").cast("double") +
      lit(discount) * col("n1p_fwd").cast("double") /
        col("c1").cast("double") *
        (col("n1p_bwd").cast("double") / col("n_types").cast("double"))
    val model = model0.join(hist, "w1").join(cont, "w2")
      .crossJoin(broadcast(types))
      .select(col("bg"), p.as("p"))
    termCounts.join(model, "bg")
      .groupBy("id")
      .agg(sum("tf").as("n_bigrams"),
        (sum(col("tf") * log(col("p"))) / sum("tf")).as("avg_logprob"))
      .select(col("id").as(idCol), col("n_bigrams"),
        round(col("avg_logprob"), 4).as("avg_logprob"))
  }

  /** Trained quality classifier, Naive-Bayes log-odds form (the
    * fastText-tier "cheap linear classifier" of data-curation
    * pipelines — e.g. the GPT-3/CCNet quality filters score web docs
    * against a curated-positive vs crawl-negative seed set; public
    * papers: Brown et al. 2020 §A, Wenzek et al. 2020).
    *
    * Train = two aggregation passes over the labeled seed set:
    * per-term occurrence counts by class (multinomial NB) and the
    * class totals. Score = add-one-smoothed log odds
    * `ln P(doc|pos)/P(doc|neg) + ln P(pos)/P(neg)`, decomposed so
    * UNSEEN terms cost nothing: with add-one smoothing a term's
    * weight is `[ln(np+1) − ln(nn+1)] + [ln(N+V) − ln(P+V)]`, and
    * the second bracket is term-independent — it rides on the
    * document's token COUNT, so the model join touches only
    * model-seen terms (the klDrift trick). No vocab-sized expansion
    * per doc, no driver action; the model is vocab-sized (broadcast
    * or term-colocated join), totals/priors are broadcast 1-row
    * frames.
    *
    * Output: (idCol, n_tokens, log_odds, predicted) for every doc
    * with ≥1 token; `predicted` compares the ROUNDED score to 0 so
    * the verdict is engine-portable. Both classes must be non-empty
    * in `train` (a one-class prior is ±∞).
    */
  def nbLogOdds(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    val pos = col(labelCol)
    val trainToks = train
      .select(pos.as("__y"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    // model feeds the score join AND the totals: one materialization
    val model = trainToks.groupBy("term")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("nn"))
      .localCheckpoint()
    val totals = model.agg(sum("np").as("p_tot"), sum("nn").as("n_tot"),
      count(lit(1)).as("v"))
    val priors = train.agg(
      sum(when(pos, 1L).otherwise(0L)).as("dp"),
      sum(when(!pos, 1L).otherwise(0L)).as("dn"))
    val tc = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val docTotals = tc.groupBy("id").agg(sum("tf").as("n_tokens"))
    val seen = tc.join(model, "term")
      .groupBy("id")
      .agg(sum(col("tf").cast("double") *
        (log(col("np").cast("double") + 1) - log(col("nn").cast("double") + 1)))
        .as("__seen"))
    val score = round(
      log(col("dp").cast("double") / col("dn")) +
        col("n_tokens").cast("double") *
          (log((col("n_tot") + col("v")).cast("double")) -
            log((col("p_tot") + col("v")).cast("double"))) +
        coalesce(col("__seen"), lit(0.0)), 4)
    docTotals.join(seen, Seq("id"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(priors))
      .select(col("id").as(idCol), col("n_tokens"),
        score.as("log_odds"), (score > 0).as("predicted"))
  }

  /** CCNet-style perplexity banding (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" — public paper): score every doc by [[unigramLogProb]]
    * (the LM-perplexity proxy), cut the corpus at the `lo`/`hi`
    * score quantiles, and label each doc `head` (most typical —
    * lowest perplexity), `middle`, or `tail`. CCNet trains on
    * head+middle and drops the tail; emitting the LABEL (not a
    * filtered frame) keeps that policy a trivial downstream filter
    * and the whole corpus auditable.
    *
    * Band rule: tail < q(lo) <= middle < q(hi) <= head, evaluated on
    * the ROUNDED score both engines agree on bit-for-bit. The
    * cutoffs themselves are rounded onto the scores' own 4-decimal
    * grid: interpolated quantiles differ across engines in the last
    * float bits EVEN BETWEEN EQUAL neighbors ((1-t)a + tb vs
    * a + t(b-a)), and an epsilon above a populated grid value would
    * flip every doc sitting exactly on it.
    *
    * Scale shape: the tokenize pass is [[ngramLogProb]]'s
    * (checkpointed once); the cutoffs are ONE exact-percentile
    * aggregate over per-doc scores riding back as a broadcast 1-row
    * frame (the [[DataQuality.winsorize]] convention — swap
    * approx_percentile in at corpus scale, where a 1e-4 quantile
    * error moves the boundary by a handful of docs). */
  def perplexityBands(df: DataFrame, idCol: String, textCol: String,
      lo: Double = 0.3, hi: Double = 0.7): DataFrame = {
    require(0 < lo && lo < hi && hi < 1, s"need 0 < lo < hi < 1: $lo, $hi")
    val scored = unigramLogProb(df, idCol, textCol)
    val cuts = scored.agg(
      round(expr(s"percentile(avg_logprob, $lo)"), 4).as("__lo"),
      round(expr(s"percentile(avg_logprob, $hi)"), 4).as("__hi"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("band",
        when(col("avg_logprob") < col("__lo"), "tail")
          .when(col("avg_logprob") >= col("__hi"), "head")
          .otherwise("middle"))
      .drop("__lo", "__hi")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public paper):
    * score every corpus document by how much more likely its tokens
    * are under a TARGET domain's unigram model than under the
    * corpus's own model —
    * avg_log_ratio = mean over token occurrences of
    * ln p_target(tok) - ln p_corpus(tok), with add-one smoothing over
    * the JOINT vocabulary so both models cover every scored token.
    * High scorers look like the target domain; selection = take the
    * top fraction ([[selectByImportance]]).
    *
    * Scale shape: the corpus tokenize+count pass is the same
    * (doc, term) partial-agg layout as [[ngramLogProb]], checkpointed
    * once; the two models full-outer-join on term (vocabulary-sized);
    * totals ride in as a broadcast 1-row frame. No driver collect.
    * The target is typically tiny (a quality sample); its model
    * aggregate is a no-op next to the corpus pass.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val corpusTc = corpus
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val corpusModel = corpusTc.groupBy("term").agg(sum("tf").as("cc"))
    val targetModel = target
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("tc"))
    // joint vocabulary feeds both the totals and the probe join:
    // checkpoint so the model join builds once
    val vocab = corpusModel.join(targetModel, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("cc"), lit(0L)).as("cc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
      .localCheckpoint()
    val totals = vocab.agg(sum("cc").as("nc"), sum("tc").as("nt"),
      count(lit(1)).cast("double").as("v"))
    corpusTc.join(vocab, "term")
      .crossJoin(broadcast(totals))
      .groupBy("id")
      .agg(sum("tf").as("n_tokens"),
        (sum(col("tf") *
          (log((col("tc") + 1).cast("double") / (col("nt") + col("v"))) -
           log((col("cc") + 1).cast("double") / (col("nc") + col("v"))))) /
          sum("tf")).as("avg_log_ratio"))
      .select(col("id").as(idCol), col("n_tokens"),
        round(col("avg_log_ratio"), 4).as("avg_log_ratio"))
  }

  /** Domain-targeted selection: the `topN` corpus documents most
    * like the target domain by [[importanceWeights]]. Ordered by the
    * ROUNDED ratio with an id tie-break so the cutoff is stable
    * across engines and runs; executes as a distributed
    * TakeOrdered, never a single-partition window. */
  def selectByImportance(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN=$topN")
    importanceWeights(corpus, target, idCol, textCol)
      .orderBy(col("avg_log_ratio").desc, col(idCol).asc)
      .limit(topN)
  }

  /** Per-group token-distribution drift vs the whole corpus:
    * KL(P_g || Q) with add-one smoothing over the corpus vocabulary,
    * where P_g is group g's unigram distribution and Q the corpus's —
    * the text counterpart of `DataQuality.psiDrift`'s numeric-column
    * monitoring (which source's language shifted, is a new snapshot's
    * mix drifting). Returns (groupCol, n_tokens, vocab_seen,
    * kl_vs_corpus).
    *
    * The sum over vocabulary terms ABSENT from a group is never
    * expanded: for those terms p is the constant 1/(N_g+V), so their
    * contribution folds to (V-V_g)·p₀·ln p₀ − p₀·(L − L_g) with
    * L = Σ_V ln q a corpus scalar and L_g the group's seen-term
    * partial — algebra pinned against the naive expansion in
    * ScoringSpec. So the plan touches only SEEN (group, term) rows:
    * one corpus-wide tokenize shuffle to count them, vocab-sized
    * re-aggregations, broadcast 1-row scalar frames, and a
    * group-keyed join of two tiny aggregates. At 1000 sources × 10M
    * vocab the expanded form is 10B rows; this is bounded by the
    * nonzero count matrix — the same reason sparse representations
    * exist.
    */
  def klDrift(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val cst = docs
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("grp", "t").agg(count(lit(1)).as("c_st"))
      .localCheckpoint()
    val ct = cst.groupBy("t").agg(sum("c_st").as("c_t"))
    val nv = ct.agg(count(lit(1)).as("v"), sum("c_t").as("n"))
    val ctS = ct.crossJoin(broadcast(nv))
      .withColumn("ln_q",
        log((col("c_t") + lit(1.0)) / (col("n") + col("v"))))
      .localCheckpoint()
    val lAll = ctS.agg(sum("ln_q").as("l_all"))
    val nsF = cst.groupBy("grp")
      .agg(sum("c_st").as("n_s"), count(lit(1)).as("v_s"))
    val p = (col("c_st") + lit(1.0)) / (col("n_s") + col("v"))
    val direct = cst
      .join(ctS.select("t", "ln_q", "v"), "t")
      .join(broadcast(nsF.select("grp", "n_s")), "grp")
      .withColumn("term", p * (log(p) - col("ln_q")))
      .groupBy("grp")
      .agg(sum("term").as("direct"), sum("ln_q").as("l_s"))
    val p0 = lit(1.0) / (col("n_s") + col("v"))
    nsF.join(direct, "grp")
      .crossJoin(broadcast(lAll))
      .crossJoin(broadcast(nv))
      .select(col("grp").as(groupCol),
        col("n_s").as("n_tokens"),
        col("v_s").as("vocab_seen"),
        round(col("direct") +
          (col("v") - col("v_s")) * p0 * log(p0) -
          p0 * (col("l_all") - col("l_s")), 4).as("kl_vs_corpus"))
  }

  /** Clipped n-gram overlap sufficient statistics between candidate
    * and reference text pairs — the shared core of BLEU and ROUGE-N.
    * One long-form row per (pair, n): `matches` = Σ_g min(count_cand,
    * count_ref) (the CLIPPED match count both metrics define),
    * `cand_total`/`ref_total` = n-gram counts. All integers — exactly
    * engine-replayable.
    *
    * Scale shape: explode each side to (id, n, gram) and count —
    * two map-combined shuffles keyed by (id, n, gram) — then one
    * co-located full-outer join of the two count tables and a
    * re-aggregate to (id, n). Cost is tokens-linear × |ns|; no
    * driver state, no quadratic term (the per-gram join is keyed,
    * never all-pairs). Pairs with an empty side still emit rows
    * (zero totals) so downstream metrics see every pair. */
  def ngramOverlapStats(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String,
      ns: Seq[Int] = Seq(1, 2, 3, 4)): DataFrame =
    overlapStatsCore(pairs, idCol, candCol, refCol, ns,
      c => filter(split(lower(trim(c)), "\\s+"), x => x =!= ""), " ")

  /** [[ngramOverlapStats]] over CHARACTER n-grams: the text is
    * lowercased and whitespace is REMOVED entirely (the chrF
    * convention — word boundaries carry no signal at char level),
    * then n-grams slide over the remaining character sequence. */
  def charNgramOverlapStats(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String,
      ns: Seq[Int] = (1 to 6)): DataFrame =
    overlapStatsCore(pairs, idCol, candCol, refCol, ns,
      c => filter(split(regexp_replace(lower(c), "\\s+", ""), ""),
        x => x =!= ""), "")

  private def overlapStatsCore(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String, ns: Seq[Int],
      toks: Column => Column, joiner: String): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"invalid n list: $ns")
    // sequence(1, 0) runs DESCENDING in Spark (the BPE trainer's
    // guard) — texts shorter than n emit an empty gram list explicitly
    def gramsAllN(c: Column): Column = flatten(array(ns.map { n =>
      when(size(toks(c)) >= n,
        transform(sequence(lit(1), size(toks(c)) - (n - 1)),
          i => struct(lit(n).as("n"),
            array_join(slice(toks(c), i, lit(n)), joiner).as("gram"))))
        .otherwise(expr("array()").cast("array<struct<n:int,gram:string>>"))
    }: _*))
    def sideCounts(textCol2: Column, cntAs: String): DataFrame =
      pairs.select(col(idCol), explode(gramsAllN(textCol2)).as("g"))
        .groupBy(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as(cntAs))
    val cc = sideCounts(col(candCol), "cc")
    val rc = sideCounts(col(refCol), "rc")
    val matched = cc.join(rc, Seq(idCol, "n", "gram"), "full_outer")
      .groupBy(col(idCol), col("n"))
      .agg(
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("rc"), lit(0L))))
          .as("matches"),
        sum(coalesce(col("cc"), lit(0L))).as("cand_total"),
        sum(coalesce(col("rc"), lit(0L))).as("ref_total"))
    // every (pair, n) emits a row even when both sides are too short
    val base = pairs.select(col(idCol),
      explode(array(ns.map(n => lit(n)): _*)).as("n"))
    base.join(matched, Seq(idCol, "n"), "left")
      .select(col(idCol), col("n"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        coalesce(col("cand_total"), lit(0L)).as("cand_total"),
        coalesce(col("ref_total"), lit(0L)).as("ref_total"))
  }

  /** Corpus-standard BLEU-4 per candidate/reference pair (Papineni
    * et al. 2002, single reference): geometric mean of the clipped
    * n-gram precisions p1..p4 times the brevity penalty
    * exp(1 − r/c) when c < r. Zero when ANY pn is zero or the
    * candidate is empty (the strict unsmoothed definition — the
    * score everyone reports for corpus-level evaluation; smoothing
    * variants change only this zero case). ln/exp on clean integer
    * ratios, rounded to 4 — the ta4 log-parity envelope. */
  def bleuPairs(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String): DataFrame = {
    val stats = ngramOverlapStats(pairs, idCol, candCol, refCol, Seq(1, 2, 3, 4))
    def mAt(n: Int) = sum(when(col("n") === n, col("matches"))).as(s"m$n")
    def tAt(n: Int) = sum(when(col("n") === n, col("cand_total"))).as(s"t$n")
    val wide = stats.groupBy(col(idCol))
      .agg(mAt(1), tAt(1), mAt(2), tAt(2), mAt(3), tAt(3), mAt(4), tAt(4),
        // unigram totals ARE the token lengths
        sum(when(col("n") === 1, col("cand_total"))).as("c_len"),
        sum(when(col("n") === 1, col("ref_total"))).as("r_len"))
    val allPos = (1 to 4).map(n => col(s"m$n") > 0 && col(s"t$n") > 0)
      .reduce(_ && _)
    val logSum = (1 to 4).map(n =>
      log(col(s"m$n").cast("double") / col(s"t$n"))).reduce(_ + _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") / col("c_len")))
    wide.select(col(idCol),
      col("c_len"), col("r_len"),
      col("m1"), col("m2"), col("m3"), col("m4"),
      when(col("c_len") === 0 || !allPos, lit(0.0))
        .otherwise(round(bp * exp(logSum / 4), 4)).as("bleu"))
  }

  /** Word error rate per pair — the ASR/transcription eval metric:
    * token-level Levenshtein distance (insert/delete/substitute at
    * unit cost over WORDS) divided by the reference token count.
    *
    * No token-level edit-distance kernel exists in either engine, so
    * the operator builds one out of the CHAR-level `levenshtein` both
    * ship: the pair's distinct tokens become a per-row dictionary and
    * each side is re-encoded as one CJK code point per token, indexed
    * out of a constant 4096-char alphabet (base U+4E00; NOT Spark's
    * `char(n)`, which wraps mod 256 and would collide). Pairs with
    * more than 4096 distinct tokens emit NULL rather than a wrong
    * distance. Char distance over the encodings IS the token
    * distance — Levenshtein is invariant under any injective
    * relabeling — computed row-locally in codegen with no shuffle,
    * and the oracle replays an equivalent injective encoding, so the
    * integer distances hash-match.
    *
    * `wer` is NULL when the reference is empty (0/0 is undefined;
    * emitting 0 would grade an insertion-only hypothesis as perfect). */
  def werPairs(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String): DataFrame = {
    def toks(c: Column): Column =
      filter(split(lower(trim(c)), "\\s+"), x => x =!= "")
    val ct = toks(col(candCol))
    val rt = toks(col(refCol))
    val dict = array_distinct(concat(ct, rt))
    // constant-foldable alphabet: split of a literal happens once at
    // optimization, each row only indexes into it
    val alphabet = (0x4E00 until 0x4E00 + 4096).map(_.toChar).mkString
    val alphaArr = split(lit(alphabet), "")
    def enc(a: Column): Column = concat_ws("",
      transform(a, t =>
        element_at(alphaArr, array_position(dict, t).cast("int"))))
    val dist = when(size(dict) <= 4096, levenshtein(enc(ct), enc(rt)))
    pairs.select(col(idCol),
      size(ct).as("cand_len"), size(rt).as("ref_len"),
      dist.as("distance"),
      when(size(rt) > 0,
        round(dist.cast("double") / size(rt), 6)).as("wer"))
  }

  /** ROUGE-N per pair (Lin 2004): recall = clipped matches /
    * reference n-grams, precision = clipped matches / candidate
    * n-grams, F1 = 2pr/(p+r) — zero where the denominator is zero.
    * Pure integer ratios rounded to 6; long-form (one row per pair
    * per n) so any n list rides one schema. */
  def rougeN(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String,
      ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    val stats = ngramOverlapStats(pairs, idCol, candCol, refCol, ns)
    val m = col("matches").cast("double")
    val p = when(col("cand_total") > 0, m / col("cand_total")).otherwise(lit(0.0))
    val r = when(col("ref_total") > 0, m / col("ref_total")).otherwise(lit(0.0))
    stats.select(col(idCol), col("n"),
      col("matches"), col("cand_total"), col("ref_total"),
      round(p, 6).as("precision"),
      round(r, 6).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0)), 6)
        .as("f1"))
  }

  /** Unbiased pass@k (Chen et al. 2021, the Codex estimator) per
    * task: given `n` samples of which `c` passed,
    * pass@k = 1 − C(n−c, k) / C(n, k) — the probability that at
    * least one of k samples drawn WITHOUT replacement passes. The
    * binomial ratio telescopes to Π_{i<k} (n−c−i)/(n−i); both
    * products are computed as EXACT integer products while n^k fits
    * a long (n ≤ 2^(62/k), enforced per row) and divided once, so
    * the estimate is bit-identical across engines; larger n degrades
    * explicitly to double products. n−c < k short-circuits to 1.0
    * (can't fill k samples with failures). Row-local codegen, no
    * shuffle — the estimator a code-eval harness folds over millions
    * of (task, sample) rows after one groupBy. */
  def passAtK(tasks: DataFrame, idCol: String,
      nCol: String, cCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val n = col(nCol).cast("long")
    val c = col(cCol).cast("long")
    val idxs = sequence(lit(0L), lit(k - 1L))
    def prodFrom(base: Column): Column =
      aggregate(idxs, lit(1L), (acc, i) => acc * (base - i))
    // The exact-integer product Π(n−i) only fits a Long while
    // n^k < 2^62; past that the Long multiply would WRAP silently
    // and report a wrong estimate. Rows beyond the per-k bound
    // degrade EXPLICITLY to the telescoped PER-FACTOR double ratio
    // Π (n−c−i)/(n−i): every factor is in [0, 1], so the running
    // product can neither overflow nor underflow to a wrong sign —
    // unlike two separate double products, which hit Infinity/NaN
    // near n^k > ~1e308 (IEEE rounding ~1 ulp per factor is
    // invisible after round(.,6)). A code-eval harness with n ~ 10^5
    // samples stays correct, it just loses bit-exactness it never
    // needed.
    val safeN = math.floor(math.pow(2.0, 62.0 / k)).toLong
    val ratioD = aggregate(idxs, lit(1.0), (acc, i) =>
      acc * ((n - c - i).cast("double") / (n - i).cast("double")))
    val ratio = when(n <= safeN,
      prodFrom(n - c).cast("double") / prodFrom(n).cast("double"))
      .otherwise(ratioD)
    tasks.select(col(idCol), n.as("n_samples"), c.as("n_correct"),
      when(c > n || n < k, lit(null).cast("double")) // malformed / k > n
        .when(n - c < k, lit(1.0))                   // failures can't fill k
        .otherwise(round(lit(1.0) - ratio, 6))
        .as(s"pass_at_$k"))
  }

  /** chrF per pair (Popović 2015; sacreBLEU's other default metric):
    * character n-grams of order 1..`maxN` over whitespace-stripped
    * lowercase text, clipped matches, per-pair precision/recall =
    * the MEAN over orders of m_n/total_n — orders whose denominator
    * is zero are skipped on that side (the "effective order" rule,
    * so short references don't zero the score) — and
    * chrF = (1+β²)·P·R / (β²·P + R) with the standard β = 2
    * (recall-weighted). Zero when P+R is zero. Rides the same
    * clipped-overlap core as BLEU/ROUGE: tokens-linear, keyed joins
    * only. */
  def chrF(pairs: DataFrame, idCol: String,
      candCol: String, refCol: String,
      maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && beta > 0, s"invalid chrF params: $maxN, $beta")
    val stats = charNgramOverlapStats(pairs, idCol, candCol, refCol, 1 to maxN)
    val m = col("matches").cast("double")
    val wide = stats.groupBy(col(idCol)).agg(
      avg(when(col("cand_total") > 0, m / col("cand_total"))).as("__p"),
      avg(when(col("ref_total") > 0, m / col("ref_total"))).as("__r"),
      sum(col("matches")).as("total_matches"),
      sum(col("cand_total")).as("cand_grams"),
      sum(col("ref_total")).as("ref_grams"))
    val p = coalesce(col("__p"), lit(0.0))
    val r = coalesce(col("__r"), lit(0.0))
    val b2 = beta * beta
    wide.select(col(idCol),
      col("total_matches"), col("cand_grams"), col("ref_grams"),
      round(p, 6).as("chr_precision"),
      round(r, 6).as("chr_recall"),
      round(when(p + r > 0,
        lit(1 + b2) * p * r / (lit(b2) * p + r)).otherwise(lit(0.0)), 6)
        .as("chrf"))
  }
}
