package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-quality gating in the C4 / Gopher style (beyond-parity;
  * SURVEY.md §7.3#7): per-document signals plus a keep/drop verdict —
  * the filter stage a pretraining corpus passes before dedup.
  *
  * Two cost tiers, deliberately separated:
  *  - [[signals]] / [[gate]]: pure per-row codegen'd projections
  *    (split/regexp/length built-ins) — fuse into the scan, no
  *    shuffle, linear at any scale.
  *  - [[repetitionSignals]]: needs per-(doc, n-gram) counts, so it is
  *    relational — explode n-grams, two-level aggregate. One shuffle
  *    keyed by doc_id, partial aggregation map-side; n-gram strings
  *    shuffle once per doc (bounded by corpus token count). At 100 TB
  *    this is the same shape as the shingle stages in Dedup, which is
  *    the proven one.
  */
object QualityFilters {

  /** Gopher-style per-document bounds. Defaults follow the published
    * heuristics scaled down for short-document corpora. */
  final case class Thresholds(
      minWords: Int = 5,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1,
      minStopwordHits: Int = 1,
      maxTopGramFrac: Double = 0.30,
      minDistinctWordFrac: Double = 0.30)

  val stopwords: Seq[String] = TextAnalysis.langMarkers("en")

  /** Per-row quality signals, one projection. Formulas chosen to be
    * engine-portable (verifiable in plain SQL):
    * mean word length = non-whitespace chars / words. */
  def signals(text: Column): Seq[(String, Column)] = {
    val words = TextAnalysis.tokens(text)
    val nWords = size(words).cast("long")
    val nCharsNoWs = length(regexp_replace(text, "\\s", ""))
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> round(nCharsNoWs.cast("double") /
        greatest(nWords, lit(1L)), 4),
      "max_word_len" -> coalesce(array_max(transform(words, w => length(w))),
        lit(0)).cast("long"),
      "symbol_ratio" -> round(
        regexp_count(text, lit("[#@{}<>\\\\|~^]")).cast("double") /
          greatest(length(text), lit(1)).cast("double"), 4),
      "stopword_hits" -> TextAnalysis.markerHits(text, stopwords).cast("long"))
  }

  /** Append [[signals]] plus the row-local part of the keep verdict
    * (everything except repetition, which needs aggregation). */
  def gate(df: DataFrame, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val annotated = signals(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    annotated.withColumn("keep",
      col("n_words").between(t.minWords, t.maxWords) &&
        col("mean_word_len").between(t.minMeanWordLen, t.maxMeanWordLen) &&
        col("symbol_ratio") <= t.maxSymbolRatio &&
        col("stopword_hits") >= t.minStopwordHits)
  }

  /** URL surface for C4-style provenance filtering: every
    * `http(s)://` URL in the text, exploded to one row per URL with
    * its lowercased registrable host (scheme/port/path/query
    * stripped). Trailing prose punctuation is trimmed off the match —
    * in natural text URLs overwhelmingly end at a sentence boundary
    * ("see http://x.example.") and keeping the '.' would defeat the
    * blocklist's exact host match. Pure codegen'd regexp projection +
    * generate — no shuffle, linear at any scale. */
  def extractUrls(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(col(textCol),
          lit("https?://[^\\s]+"), lit(0))).as("raw"))
      .select(col(idCol),
        regexp_replace(col("raw"), "[.,;:!?)\\]'\"]+$", "").as("url"))
      .withColumn("domain",
        lower(regexp_extract(col("url"), "^https?://([^/:?#\\s]+)", 1)))

  /** Canonical URL: the dedup key for "is this the same page" — the
    * raw string differs on case, tracking params, fragments, default
    * ports, and trailing slashes while the resource doesn't. Steps
    * (each one regex, row-local, portable constructs only):
    * lowercase scheme+host, drop the fragment, strip utm_-prefixed /
    * fbclid / gclid tracking params, strip default :80/:443 ports,
    * drop a trailing `?` or `&`, and a trailing
    * slash after a path. Semantic-equivalence judgment calls beyond
    * these (param ORDER, %-encoding case) are deliberately out —
    * reordering params can change dynamic pages. */
  def canonicalUrl(url: Column): Column = {
    // lowercase only scheme://host (path and query stay case-significant)
    val head = regexp_extract(url, "^[^/]*//[^/]*", 0)
    val lowered = concat(lower(head),
      url.substr(length(head) + 1, length(url)))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // tracking params in three ordered, non-interacting passes:
    // non-leading (&utm=...), leading-with-successor (?utm=...& -> ?),
    // leading-and-only (?utm=... -> '')
    val track = "(utm_[A-Za-z]+|fbclid|gclid)"
    val p1 = regexp_replace(noFrag, s"&$track=[^&#]*", "")
    val p2 = regexp_replace(p1, s"\\?$track=[^&#]*&", "?")
    val p3 = regexp_replace(p2, s"\\?$track=[^&#]*$$", "")
    // default-port strip ANCHORED to the authority (an unanchored
    // `:80/` would also fire inside a path or query value) and
    // SCHEME-MATCHED (r6 review: :80 on https is a real non-default
    // port — stripping it would merge distinct origins)
    val noPort = regexp_replace(
      regexp_replace(p3, "^(http://[^/?#]*):80([/?]|$)", "$1$2"),
      "^(https://[^/?#]*):443([/?]|$)", "$1$2")
    val noTail = regexp_replace(noPort, "[?&]$", "")
    regexp_replace(noTail, "(//[^/]+/.*[^/])/$", "$1")
  }

  /** Drop documents that cite any blocklisted domain (the C4
    * bad-domain gate). The blocklist is a DataFrame so a real
    * deployment can read it from a table; it broadcasts into a semi
    * join — the corpus never shuffles, only the (id, domain) pairs
    * do, and only to prune ids. */
  def domainGate(df: DataFrame, idCol: String, textCol: String,
      blocked: DataFrame): DataFrame = {
    val bad = extractUrls(df, idCol, textCol)
      .join(broadcast(blocked.select(lower(col("domain")).as("domain"))),
        Seq("domain"), "left_semi")
      .select(col(idCol))
    df.join(bad, Seq(idCol), "left_anti")
  }

  /** Blocklist / keyword-taxonomy scan: one Aho–Corasick pass over
    * each document matches EVERY pattern simultaneously
    * ([[graft.functions.MultiPattern]]) — O(|text| + matches) per row
    * instead of O(|patterns|·|text|) per-keyword `contains` columns.
    * Output per doc: total occurrence count (per-pattern leftmost
    * non-overlapping — the `replace`-trick-replayable definition),
    * the distinct matched patterns sorted, and the keep verdict
    * (`n_matches == 0`). Row-local codegen projection: fuses into the
    * scan, nothing shuffles. */
  def blocklist(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val mp = graft.functions.MultiPattern.multi_pattern_scan(patterns, col(textCol))
    df.select(col(idCol), mp.as("__mp"))
      .select(col(idCol),
        col("__mp.n_matches").as("n_matches"),
        col("__mp.matched").as("matched"),
        (col("__mp.n_matches") === 0).as("keep"))
  }

  /** Word n-grams of the lowercased whitespace tokens as space-joined
    * strings ("the quick", "quick fox", ...) — the fused codegen
    * expression; FunctionsSpec pins it value-identical to the HOF
    * `filter(transform(tokens, slice+concat_ws))` composition it
    * replaced. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.TextExpressions.word_ngrams(text, n)

  /** Gopher repetition signals per document:
    *  - `top_gram_frac`: occurrences of the single most frequent
    *    n-gram / total n-grams (tie-broken by gram text so the count
    *    is deterministic);
    *  - `distinct_word_frac`: distinct words / total words.
    * Output: (idCol, n_grams, top_gram, top_gram_frac,
    * distinct_word_frac), one row per input document with >= 1 gram.
    *
    * Shape: explode -> count(doc, gram) [one shuffle, map-side
    * partial] -> max_by/sum per doc [second aggregate over the
    * already doc-keyed counts]. No collect, no window over the whole
    * corpus.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    // One fused row-local kernel (codegen RepetitionStats) instead of
    // explode -> groupBy(doc, gram) -> groupBy(doc): the statistics
    // never leave the row, so shuffling every gram string corpus-wide
    // twice was pure waste — measured 9.7 s -> sub-second at sf0.1.
    // The null filter mirrors the explode form, which dropped docs
    // with fewer than n words.
    df.select(col(idCol),
        graft.functions.TextExpressions.repetition_stats(col(textCol), n).as("s"))
      .filter(col("s").isNotNull)
      .select(
        col(idCol),
        col("s.n_grams").as("n_grams"),
        col("s.top_gram").as("top_gram"),
        round(col("s.top_count").cast("double") /
          greatest(col("s.n_grams"), lit(1L)), 4).as("top_gram_frac"),
        round(col("s.n_distinct_words").cast("double") /
          greatest(col("s.n_words"), lit(1L)), 4).as("distinct_word_frac"))
  }

  /** Gopher's LINE-level repetition signals — the companions of
    * [[repetitionSignals]]'s n-gram fractions (Rae et al. 2021,
    * Table A1 measures both families): per document,
    *  - `dup_line_frac`: fraction of non-empty lines that are
    *    repeats of an earlier line = (lines − distinct lines)/lines;
    *  - `dup_line_char_frac`: fraction of characters sitting in
    *    those repeated occurrences = (Σ chars − Σ distinct-line
    *    chars)/Σ chars — the weighted form that catches a doc whose
    *    one duplicated line is half its content.
    * Lines split on `sep` (literal, not regex), trimmed; empty lines
    * never count. Docs with zero non-empty lines emit zero fractions.
    *
    * Shape: entirely ROW-LOCAL array algebra (split → trim/filter →
    * array_distinct + two in-row length folds) — no explode, no
    * shuffle, the fractions are one integer divide each. */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), java.util.regex.Pattern.quote(sep)),
        l => trim(l)),
      l => length(l) > 0)
    val nLines = size(col("__lines")).cast("long")
    val nDistinct = size(array_distinct(col("__lines"))).cast("long")
    val chars = aggregate(col("__lines"), lit(0L),
      (acc, x) => acc + length(x))
    val distinctChars = aggregate(array_distinct(col("__lines")), lit(0L),
      (acc, x) => acc + length(x))
    df.select(col(idCol), lines.as("__lines"))
      .select(col(idCol),
        nLines.as("n_lines"),
        when(nLines > 0, round((nLines - nDistinct).cast("double") /
          nLines.cast("double"), 6)).otherwise(0.0).as("dup_line_frac"),
        when(chars > 0, round((chars - distinctChars).cast("double") /
          chars.cast("double"), 6)).otherwise(0.0).as("dup_line_char_frac"))
  }

  /** IN-ENGINE trained quality classifier — the learned counterpart
    * of the heuristic [[gate]]: a linear model trained by FULL-BATCH
    * gradient descent where each iteration is ONE map-combined
    * aggregation to `dim` values and the weights live on the driver
    * (`dim` doubles) — the same bounded-iteration shape as the
    * k-means/BPE trainers, linear in corpus size per iteration at
    * any scale.
    *
    * Two deliberate exactness choices make the TRAINED WEIGHTS
    * bit-reproducible across engines and partitionings (so the
    * qf9 oracle can replay the whole trajectory):
    *  - a RATIONAL squashing function `0.5 + 0.5·z/(1+|z|)` (the
    *    "fast sigmoid") instead of the logistic — division/abs are
    *    correctly-rounded IEEE ops, libm `exp` is not;
    *  - INTEGER-QUANTIZED gradients: each row contributes
    *    `floor(term·2^20 + 0.5)` as a LONG, so the per-dimension
    *    gradient is an EXACT integer sum — invariant to partial-
    *    aggregation order, where a raw double sum is not (the same
    *    trick as gradient quantization in distributed training,
    *    applied here for determinism rather than bandwidth).
    *
    * Caller supplies feature columns (make them exact — dyadic
    * scalings of integer counts survive any engine) and a 0/1 label
    * column. Returns the learned weights, one per feature. */
  def trainQualityClassifier(docs: DataFrame, features: Seq[Column],
      label: Column, iters: Int = 16, lr: Double = 0.5,
      quant: Long = 1L << 20,
      sampleWeight: Column = lit(1.0)): Array[Double] = {
    require(features.nonEmpty && iters >= 1)
    // Materialize the numeric feature/label/weight projection ONCE:
    // every iteration then aggregates a tiny all-double frame instead
    // of re-running the text feature kernels over the corpus (at 64
    // iterations that re-extraction dominated training wall — 22 s →
    // ~3 s at sf0.1). The integer-quantized gradients are partition-
    // and layout-invariant, so this cannot move a bit of the
    // trajectory the oracle replays.
    val numeric = docs.select(
      features.zipWithIndex.map { case (f, d) =>
        f.cast("double").as(s"__f$d") } ++
        Seq(label.cast("double").as("__y"),
          sampleWeight.cast("double").as("__sw")): _*)
      // few wide tasks beat 32 empty ones: each iteration is one tiny
      // job over k+2 doubles/row, so scheduling, not compute, is the
      // floor; invariance (above) makes the layout free to choose
      .coalesce(8)
      .localCheckpoint()
    val n = numeric.count()
    require(n > 0, "empty training frame")
    val fcols = features.indices.map(d => col(s"__f$d"))
    var w = Array.fill(features.size)(0.0)
    var it = 0
    while (it < iters) {
      val z = fcols.zip(w).map { case (f, wi) => f * wi }.reduce(_ + _)
      val p = lit(0.5) + (z / (lit(1.0) + abs(z))) * 0.5
      // class weighting (e.g. minority junk upweighted) folds into
      // the per-row error before quantization
      val err = (p - col("__y")) * col("__sw")
      val gs = fcols.zipWithIndex.map { case (f, d) =>
        sum(floor(err * f * quant.toDouble + 0.5).cast("long")).as(s"g$d")
      }
      val row = numeric.agg(gs.head, gs.tail: _*).collect()(0)
      w = w.zipWithIndex.map { case (wi, d) =>
        wi - lr * row.getLong(d) / (quant.toDouble * n)
      }
      it += 1
    }
    w
  }

  /** Score a frame with [[trainQualityClassifier]] weights: the same
    * rational squash of the same left-folded dot product — a pure
    * projection (train offline, score at ingestion, batch or
    * streaming). */
  def classifierScore(features: Seq[Column], w: Array[Double]): Column = {
    val z = features.zip(w).map { case (f, wi) => f * wi }.reduce(_ + _)
    lit(0.5) + (z / (lit(1.0) + abs(z))) * 0.5
  }

  /** Quantile mapping (CDF matching): rewrite each row's score so its
    * WITHIN-SOURCE rank lands on the reference source's value at the
    * same rank — after mapping, every source's score distribution IS
    * the reference's, so downstream thresholds and mixtures compare
    * like with like (the cross-SCORER harmonization [[calibratedGate]]
    * does for one threshold). Nearest-rank-DOWN lookup
    * (floor(rank·(n_ref−1)) + 1): floor, not round — a .5 boundary
    * rounds differently across engines, a floor never does.
    *
    * Scale shape: target ranks come from per-source windows (parallel
    * in sources); the reference index is a window over the reference
    * source's rows ONLY — a calibration reference is a bounded sample
    * by design (same class of bounded global window as the resample
    * grid), and the lookup is one join on the integer index. */
  def quantileMap(df: DataFrame, idCol: String, sourceCol: String,
      scoreCol: Column, referenceSource: String): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(scoreCol.asc, col(idCol).asc)
    val ranked = df.withColumn("__r", percent_rank().over(wSrc))
    val ref = ranked.filter(col(sourceCol) === referenceSource)
      .select(scoreCol.as("__ref_score"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy(scoreCol.asc, col(idCol).asc))
          .cast("long").as("__idx"))
    // fail LOUDLY if the reference source has no rows: with n_ref = 0
    // every __idx would be non-matching and the inner join would
    // silently collapse the whole output to zero rows
    val nRef = broadcast(ref.agg(count(lit(1)).as("__n0"))
      .select(when(col("__n0") > 0, col("__n0"))
        .otherwise(raise_error(lit(
          s"quantileMap: reference source '$referenceSource' has no rows")))
        .as("__n")))
    ranked.crossJoin(nRef)
      .withColumn("__idx",
        floor(col("__r") * (col("__n") - 1L).cast("double")).cast("long") + 1L)
      .join(broadcast(ref), Seq("__idx"))
      .select(col(idCol), col(sourceCol), scoreCol.as("score"),
        col("__ref_score").as("mapped_score"))
  }

  /** Cross-source score calibration: replace each document's raw
    * quality score with its empirical-CDF position WITHIN ITS SOURCE
    * (percent_rank, ties share a rank, id tiebreak for engine-stable
    * ordering), then gate on the calibrated score. Why: raw scores
    * are not comparable across sources (a mid-tier web page outscores
    * a top-tier forum post on absolute signals), so a single global
    * threshold silently empties some sources and passes others whole —
    * calibrating first keeps the best `keepFrac` of EVERY source.
    * One window per source; score computation stays row-local. */
  def calibratedGate(df: DataFrame, idCol: String, sourceCol: String,
      scoreCol: Column, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac in (0,1]: $keepFrac")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(scoreCol.asc, col(idCol).asc)
    df.withColumn("calibrated", round(percent_rank().over(w), 6))
      .withColumn("keep", col("calibrated") >= round(lit(1.0 - keepFrac), 6))
  }

  /** Perplexity-style quality gate from the ENGINE-TRAINED unigram
    * LM (tok10): each document's Viterbi piece sequence is scored by
    * the vocabulary's quantized log₂-probs (units of 1/1024 bit —
    * the trainer's integer quantization, so every sum is exact and
    * engine-replayable); OOV pieces (the segmenter's code-point
    * fallback outside the vocab) pay the `oovQ` penalty. A document
    * is flagged when its MEAN piece score falls below
    * `meanThresholdQ` — compared in the cross-multiplied integer
    * form `q_logprob < thr·n_pieces`, so the gate involves no
    * division and no floats at all. This is the qf3-style
    * perplexity filter with the LM trained in-engine rather than
    * imported.
    *
    * Scale shape: segmentation and scoring are one codegen'd
    * row-local projection over the scan (the vocab rides in as
    * literals); no shuffle, no join, no state. */
  def unigramLmGate(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)], oovQ: Long,
      meanThresholdQ: Long): DataFrame = {
    require(vocab.nonEmpty, "empty unigram vocabulary")
    val vmap = map(vocab.flatMap { case (p, q) =>
      Seq(lit(p), lit(q)) }: _*)
    df.select(col(idCol),
        graft.operators.Tokenizer.unigramTokens(col(textCol), vocab)
          .as("__pieces"))
      .select(col(idCol),
        size(col("__pieces")).cast("long").as("n_pieces"),
        aggregate(transform(col("__pieces"),
            p => coalesce(element_at(vmap, p), lit(oovQ))),
          lit(0L), (acc, s) => acc + s).as("q_logprob"))
      .withColumn("flagged",
        col("q_logprob") < lit(meanThresholdQ) * col("n_pieces"))
  }

  /** Reliability/calibration report for a probabilistic gate (the
    * closing loop on [[trainQualityClassifier]]): scores bin into
    * `bins` equal-width confidence buckets (the top bucket absorbs
    * score == 1.0), and each bucket compares its mean predicted
    * positive-class probability against its observed positive rate.
    * `ece_term` = (bucket mass) x |gap| — summing the column gives
    * the expected calibration error, the number that decides whether
    * a gate\'s threshold can be trusted or the scores need
    * recalibration (Platt/isotonic) before thresholding. Gap and ECE
    * terms are computed from the ROUNDED bucket means, so the report
    * is exactly engine-replayable. One groupBy over the scored
    * frame + a broadcast 1-row total: profiling-aggregate cost. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val b = least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1))
    val tot = scored.agg(count(lit(1)).as("__N"))
    scored.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(scoreCol)), 6).as("avg_score"),
        round(avg(col(labelCol).cast("double")), 6).as("frac_pos"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("avg_score"), col("frac_pos"),
        round(abs(col("avg_score") - col("frac_pos")), 6).as("abs_gap"),
        round(col("n_docs").cast("double") / col("__N") *
          round(abs(col("avg_score") - col("frac_pos")), 6), 6).as("ece_term"))
  }
}
