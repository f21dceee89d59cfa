package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Context-window chunking for training-data preparation
  * (beyond-parity; the step between document curation and sequence
  * packing): split each document into fixed-token windows with
  * overlap, one output row per chunk.
  *
  * Scale shape: entirely row-local — the fused [[TextExpressions.ChunkTokens]]
  * codegen kernel emits all chunks of a doc in one pass, `posexplode`
  * flattens them, and NOTHING shuffles. At 100 TB this is a map-only
  * stage whose output feeds [[Packing.assignShards]] (which does the
  * one bounded-state distribution pass).
  */
object Chunking {

  /** Fill-in-the-middle training triples (Bavarian et al. 2022 — the
    * infilling transform code models are pretrained with): each doc's
    * token list splits at two cut points into (prefix, middle,
    * suffix), emitted both as parts and as the PSM-ordered training
    * string `<PRE> prefix <SUF> suffix <MID> middle` (the model learns
    * to generate the middle conditioned on both sides). Cut points
    * derive from [[Sampling.idHash]] of the doc id — deterministic
    * and SQL-replayable, reproducible shard-by-shard like every
    * sampling decision here, yet uniform across docs; both cuts are
    * interior, so all three parts are nonempty. Docs under 3 tokens
    * pass through unsplit (`fim_applied = false`, whole text in
    * `prefix`) — a real pipeline mixes those in as plain
    * left-to-right examples. Token = whitespace split of trim(text),
    * case preserved (this output feeds the model, not a hash).
    *
    * Scale shape: pure row-local projection (split, two hashes,
    * three slices) — map-only at any corpus size. */
  def fimSplits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // idHash is integer arithmetic: a non-numeric id would cast to
    // null (or throw under ANSI) and silently corrupt every triple —
    // fail at construction instead; hash string ids to a long first
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"fimSplits needs a numeric id column for its deterministic cut " +
        s"points; '$idCol' is ${df.schema(idCol).dataType.catalogString} - " +
        "derive one (e.g. xxhash64(id)) first")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // widen BEFORE the *2 (+1): an IntegerType id >= 2^30 would wrap
    // in 32-bit first and diverge from the 64-bit arithmetic the fim1
    // oracle replays
    val id64 = col(idCol).cast("long")
    val cut1 = (Sampling.idHash(id64 * 2) % (n - 2) + 1).cast("int")
    val cut2 = (cut1 + 1 +
      Sampling.idHash(id64 * 2 + 1) % (n - cut1 - 1)).cast("int")
    val applied = n >= 3
    val prefix = when(applied, array_join(slice(toks, lit(1), cut1), " "))
      .otherwise(array_join(toks, " "))
    val middle = when(applied,
      array_join(slice(toks, cut1 + 1, cut2 - cut1), " ")).otherwise(lit(""))
    val suffix = when(applied,
      array_join(slice(toks, cut2 + 1, n - cut2), " ")).otherwise(lit(""))
    df.select(col(idCol), applied.as("fim_applied"),
      n.cast("long").as("n_tokens"),
      prefix.as("prefix"), middle.as("middle"), suffix.as("suffix"),
      when(applied, concat(lit("<PRE> "), prefix, lit(" <SUF> "), suffix,
        lit(" <MID> "), middle)).as("psm"))
  }

  /** Prompt/completion pair construction (the SFT-data shape): each
    * doc's token list splits at ONE deterministic boundary into
    * (prompt, completion), with the loss boundary reported as a token
    * index so a packing stage can mask prompt tokens out of the loss.
    * The boundary lands in the middle [lo, hi] fraction band of the
    * doc (default 20–80%) at an [[Sampling.idHash]]-derived offset —
    * reproducible, SQL-replayable, uniform across docs. Docs under 2
    * tokens pass through whole-as-prompt (`pair_applied = false`,
    * empty completion) — there is nothing to complete.
    *
    * Scale shape: pure row-local projection, map-only at any corpus
    * size (fim1's class). */
  def promptCompletionPairs(df: DataFrame, idCol: String, textCol: String,
      loFrac: Double = 0.2, hiFrac: Double = 0.8): DataFrame = {
    require(loFrac > 0 && hiFrac < 1 && loFrac <= hiFrac,
      s"need 0 < loFrac <= hiFrac < 1, got ($loFrac, $hiFrac)")
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"promptCompletionPairs needs a numeric id column; '$idCol' is " +
        s"${df.schema(idCol).dataType.catalogString} - derive one " +
        "(e.g. xxhash64(id)) first")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // integer band bounds: lo = max(1, floor(n*loFrac)),
    // hi = min(n-1, ceil(n*hiFrac)) — both ends keep prompt and
    // completion nonempty; floor/ceil on exact doubles replay in SQL
    val lo = greatest(lit(1), floor(n * lit(loFrac)).cast("int"))
    val hi = least(n - 1, ceil(n * lit(hiFrac)).cast("int"))
    val cut = (lo + Sampling.idHash(col(idCol)) % (hi - lo + 1)).cast("int")
    val applied = n >= 2
    df.select(col(idCol), applied.as("pair_applied"),
      n.cast("long").as("n_tokens"),
      when(applied, cut.cast("long")).otherwise(n.cast("long"))
        .as("boundary_tokens"),
      when(applied, array_join(slice(toks, lit(1), cut), " "))
        .otherwise(array_join(toks, " ")).as("prompt"),
      when(applied, array_join(slice(toks, cut + 1, n - cut), " "))
        .otherwise(lit("")).as("completion"))
  }

  /** One row per (doc, chunk): (idCol, chunk_idx, chunk_text,
    * n_tokens). Chunk c starts at token c*(maxTokens-overlap);
    * consecutive chunks share `overlap` tokens; every token of the
    * doc is covered and the final chunk always contains at least one
    * token beyond the overlap. Token = whitespace split of
    * trim(text), case preserved (this output feeds the model, not a
    * hash).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame =
    df.select(col(idCol),
      posexplode(TextExpressions.chunk_tokens(col(textCol), maxTokens, overlap))
        .as(Seq("chunk_idx", "c")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").cast("long").as("n_tokens"))

  /** Maximal sentence runs: each match either ends in a terminator
    * run (`[.!?]+`, greedy — "Hi!!" is one sentence) or is the
    * terminator-less tail of the document. Deliberately
    * lookaround-free and backreference-free so ANY regex engine
    * (including RE2, which lacks lookbehind) replays it identically. */
  private val SentencePattern = "[^.!?]*[.!?]+|[^.!?]+$"

  /** RAG-style SENTENCE-boundary chunking: split each doc into
    * sentences, then assign consecutive sentences to chunks of
    * `maxTokens` whitespace tokens by the first-token rule
    * ([[Packing.assignShards]]'s convention: a sentence lands in the
    * chunk containing its first token, so chunks never split a
    * sentence and may spill past the budget by at most one
    * sentence). Output: (idCol, chunk_idx, n_sentences, n_tokens,
    * chunk_text) with sentences joined by a single space
    * (inter-sentence whitespace is normalized, sentence-internal
    * whitespace preserved). Empty documents emit no chunks.
    *
    * Scale shape: sentence extraction is row-local regex; the only
    * shuffle is the per-DOC window + the (doc, chunk) aggregate on
    * the same key — parallelism = documents, partition size = one
    * document's sentences (bounded by doc length). */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    val sents = df.select(col(idCol).as("__id"),
        posexplode(regexp_extract_all(col(textCol),
          lit(SentencePattern), lit(0))).as(Seq("__si", "__raw")))
      .select(col("__id"), col("__si"), trim(col("__raw")).as("__sent"))
      .withColumn("__n", TextAnalysis.tokenCount(col("__sent")).cast("long"))
    val w = Window.partitionBy("__id").orderBy("__si")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sents.withColumn("__cum", sum("__n").over(w))
      .withColumn("chunk_idx",
        floor((col("__cum") - col("__n")) / maxTokens).cast("long"))
      .groupBy(col("__id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_sentences"),
        sum("__n").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__si"), col("__sent").as("s")))),
          s => s.getField("s"))).as("chunk_text"))
      .select(col("__id").as(idCol), col("chunk_idx"),
        col("n_sentences"), col("n_tokens"), col("chunk_text"))
  }
}
