package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions

/** Text-analysis operators for training-data pipelines (beyond-parity;
  * SURVEY.md §7.3#7). All column-level, codegen'd built-ins — no UDFs —
  * so they fuse into the scan stage and scale linearly with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text -> single empty
    * token, mirroring SQL regexp-split semantics). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** BPE-ish subword count: letter runs, single digits, single
    * punctuation marks — the shape of a byte-pair tokenizer's input
    * segmentation, as a cheap token-budget estimator. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  def digitCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", ""))

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))

  /** Stopword hits for a marker-word list, used by both quality
    * scoring and language ID. `boundaries=false` for scripts without
    * word separators (CJK): \b is ASCII-word-based in both Java and
    * RE2 regexes, so it would never match inside CJK runs. */
  def markerHits(text: Column, markers: Seq[String], boundaries: Boolean = true): Column = {
    val core = "(" + markers.mkString("|") + ")"
    val pattern = if (boundaries) "\\b" + core + "\\b" else core
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))
  }

  /** Language marker lists (tiny n-gram-free heuristic: function words
    * are the highest-frequency tokens of each language). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "que", "por"),
    "zh" -> Seq("的", "是", "在", "了", "和", "不", "有", "我"))

  /** Best-scoring language by marker hits; deterministic tie-break by
    * language code order; "und" (undetermined) when no marker hits. */
  def langId(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(markerHits(text, words, boundaries = lang != "zh").as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on struct(hits, lang) orders by hits then lang — but we
    // want ties to pick the *first* lang code, so invert: take max hits,
    // then the first lang achieving it.
    val arr = array(scored: _*)
    val maxHits = array_max(arr.getField("hits"))
    val winner = filter(arr, s => s.getField("hits") === maxHits)(0).getField("lang")
    when(maxHits > 0, winner).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * digit/punct density, and missing stopwords. Weights are the usual
    * C4/Gopher-style heuristics, normalized. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = charCount(text).cast("double")
    val lenOk = when(nTok.between(5, 10000), lit(1.0)).otherwise(lit(0.0))
    val meanTokLen = nChar / greatest(nTok, lit(1.0))
    val tokLenOk = when(meanTokLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val digitFrac = digitCount(text).cast("double") / greatest(nChar, lit(1.0))
    val punctFrac = punctCount(text).cast("double") / greatest(nChar, lit(1.0))
    val stopFrac = markerHits(text, langMarkers("en")).cast("double") / greatest(nTok, lit(1.0))
    (lenOk * 0.25 + tokLenOk * 0.25
      + (lit(1.0) - least(digitFrac * 5.0, lit(1.0))) * 0.2
      + (lit(1.0) - least(punctFrac * 5.0, lit(1.0))) * 0.2
      + least(stopFrac * 5.0, lit(1.0)) * 0.1)
  }

  /** 64-bit rolling-hash fingerprint of whitespace-normalized text
    * (custom codegen Expression — graft.functions.TextExpressions). */
  def fingerprint(text: Column): Column =
    TextExpressions.rolling_hash(regexp_replace(trim(text), "\\s+", " "))

  /** DEFLATE compression ratio (compressed/raw bytes): the classic
    * redundancy signal — template/boilerplate text compresses far
    * below natural prose. Row-local codegen expression; a signal for
    * thresholds and ordering, not a portable hash (see
    * [[TextExpressions.DeflateRatio]]). */
  def compressionRatio(text: Column, level: Int = 6): Column =
    TextExpressions.deflate_ratio(text, level)

  /** Paragraph-level language routing (the CCNet/mC4 shape: web
    * documents are routinely mixed-language, and language filters
    * that score the WHOLE document either drop good majority content
    * or keep foreign boilerplate). Splits each doc on `sep`, language-
    * IDs every paragraph with the [[langId]] marker heuristic, elects
    * the document's majority language (ties → smallest language code,
    * same order as langId's own tie-break), and flags minority
    * paragraphs — the excision/routing coordinates.
    *
    * Output: one row per non-empty paragraph — (idCol, pos,
    * para_lang, doc_lang, is_minority). Scale shape: the split +
    * per-paragraph scoring is a row-local codegen generate; only the
    * (doc, lang) counts aggregate (bounded by docs × languages), and
    * the majority label joins back on the doc key. Paragraph text
    * never shuffles.
    */
  def paragraphLangRoute(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
      .withColumn("para_lang", langId(col("para")))
    val counts = paras.groupBy(col(idCol), col("para_lang"))
      .agg(count(lit(1)).as("cnt"))
    // argmax (cnt desc, lang asc) via struct-min on (-cnt, lang)
    val docLang = counts.groupBy(col(idCol))
      .agg(min(struct((-col("cnt")).as("nc"), col("para_lang").as("l")))
        .getField("l").as("doc_lang"))
    paras.join(docLang, idCol)
      .select(col(idCol), col("pos"), col("para_lang"), col("doc_lang"),
        (col("para_lang") =!= col("doc_lang")).as("is_minority"))
  }

  /** Winnowing fingerprints (MOSS): one row per selected fingerprint
    * — (idCol, pos, gram), the lexicographic-minimum word k-gram of
    * every w-gram window, deduped. Any two docs sharing a run of
    * w + k - 1 tokens share a fingerprint (recall-complete blocking
    * for long shared substrings at ~2/(w+1) the full gram density);
    * see [[TextExpressions.WinnowFingerprints]] for the selection
    * contract. The kernel is row-local full codegen; only the
    * selected ~m·2/(w+1) fingerprints ever leave the scan, which is
    * what makes winnowing the 100 TB substring-blocking tool — the
    * downstream join carries a fraction of the gram traffic dd4-style
    * full-gram blocking would.
    */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 3,
      window: Int = 4): DataFrame =
    docs.select(col(idCol),
      explode(TextExpressions.winnow_fingerprints(col(textCol), gramSize, window))
        .as("fp"))
      .select(col(idCol), col("fp.pos").as("pos"), col("fp.gram").as("gram"))

  /** Candidate near-dup pairs by winnowing-fingerprint collision:
    * docs sharing ≥1 selected fingerprint, with the shared count —
    * the blocking stage a substring-level dedup verifies afterwards
    * (recall-complete for runs of window+gramSize-1 tokens, per the
    * winnowing guarantee). Fingerprints occurring in more than
    * `maxBucketSize` docs are dropped before pair generation: a hot
    * fingerprint is corpus boilerplate (the dd9/dd18 signal), and its
    * m² pairs are the blowup the cap bounds — the df filter is
    * deterministic, so the cap is part of the operator's contract,
    * not a silent truncation. One fingerprint-keyed shuffle sized by
    * the winnowed density (~2/(window+1) of the gram stream), then a
    * bucket-keyed self-join that streams pairs through codegen.
    */
  def winnowCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramSize: Int = 3,
      window: Int = 4,
      maxBucketSize: Int = 10000): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, gramSize, window)
      .select(col(idCol).as("id"), col("gram")).distinct()
    val sized = fps.join(
      fps.groupBy("gram").agg(count(lit(1)).as("__df")), "gram")
    val small = sized.filter(col("__df") <= maxBucketSize)
    small.select(col("gram"), col("id").as("id_a"))
      .join(small.select(col("gram"), col("id").as("id_b")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared_fps"))
  }

  /** One-stop annotation: append the standard stats columns. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_calc", charCount(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("n_digits", digitCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("lang_guess", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Flesch reading-ease estimate from portable proxies: sentences =
    * terminal-punctuation runs (min 1), syllables = vowel-group runs
    * (the standard heuristic — no dictionary needed, and every term
    * is a regexp count any engine reproduces). Exact integer counts
    * feed one fixed double formula, rounded(4). Row-local. */
  def readability(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("double")
    val syllables =
      size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
        .cast("double")
    round(lit(206.835) - lit(1.015) * words / sentences
      - lit(84.6) * syllables / words, 4)
  }

  /** Lexical richness per document: token count, type (distinct
    * lowercased word) count, type–token ratio, and the hapax
    * fraction (types occurring exactly once / types) — the
    * vocabulary-diversity quality signals (low TTR = templated or
    * repetitive text; high hapax on long docs = OCR noise or
    * gibberish). Documents with zero tokens emit no row.
    *
    * Scale shape: explode → (doc, word) counts → per-doc reduce, the
    * [[QualityFilters.repetitionSignals]] aggregation shape — both
    * aggregates map-side combined on the same doc keying. */
  def lexicalRichness(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tw = df.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__n"))
    tw.groupBy(idCol)
      .agg(sum("__n").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("n_hapax").cast("double") /
          col("n_types").cast("double"), 6).as("hapax_frac"))
  }
}
