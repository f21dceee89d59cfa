package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-trained subword tokenization (beyond-parity; the fidelity
  * gap VERDICT r4 ranked #2): a deterministic frequency-ranked
  * vocabulary learned from the corpus by `operators.Tokenizer`, applied
  * by GREEDY LONGEST-MATCH inside whole-stage codegen — so shard
  * budgets ([[graft.operators.Packing]]) and context windows
  * ([[graft.operators.Chunking]]) can be denominated in trained
  * tokenizer units instead of whitespace or regex heuristics.
  *
  * Application contract (mirrored exactly by the DuckDB oracles):
  * text is lowercased and whitespace-split; within each word, the
  * longest vocabulary entry prefixing the remaining suffix is taken
  * (ties impossible — lengths differ), single characters always
  * advance (the trained vocab contains every corpus character; an
  * out-of-vocab character passes through as its own token). Greedy
  * longest-match is WordPiece-style decoding: deterministic, stateless
  * per row, one pass.
  */
object SubwordExpressions {

  /** Shared matcher: HashSet probe from min(maxLen, remaining) down to
    * 2, then the single-char fallback. maxLen derives from the vocab
    * itself, so probing never exceeds the longest trained token. */
  final class Matcher(vocab: Seq[String]) extends Serializable {
    private val set = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    private val maxLen = if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

    /** Tokens of ONE already-lowercased word, appended to `out`
      * (pass null to only count). Returns the token count. The
      * fallback advances by a full CODE POINT, not a UTF-16 unit — an
      * out-of-vocab non-BMP character (emoji in a batch the vocab was
      * not trained on) must pass through as ONE intact token, never
      * as two unpaired-surrogate fragments. */
    def word(w: String, out: java.util.ArrayList[AnyRef]): Int = {
      var pos = 0
      var n = 0
      while (pos < w.length) {
        var l = math.min(maxLen, w.length - pos)
        while (l > 1 && !set.contains(w.substring(pos, pos + l))) l -= 1
        if (l == 1) l = Character.charCount(w.codePointAt(pos))
        if (out != null) out.add(UTF8String.fromString(w.substring(pos, pos + l)))
        pos += l
        n += 1
      }
      n
    }

    def count(text: UTF8String): Int = {
      val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
      var n = 0
      var i = 0
      while (i < toks.length) { n += word(toks(i), null); i += 1 }
      n
    }

    def tokens(text: UTF8String): ArrayData = {
      val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
      val out = new java.util.ArrayList[AnyRef]
      var i = 0
      while (i < toks.length) { word(toks(i), out); i += 1 }
      new GenericArrayData(out.toArray)
    }
  }

  /** Subword tokens of the text, in order (array<string>). */
  case class SubwordTokens(child: Expression, vocab: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "subword_tokens"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_tokens requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val matcher = new Matcher(vocab)

    /** Instance kernel (holds the vocab set); generated code calls it
      * through a plan reference object. */
    def kernel(text: UTF8String): ArrayData = matcher.tokens(text)

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("subwordTokens", this, classOf[SubwordTokens].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): SubwordTokens =
      copy(child = newChild)
  }

  /** Subword token COUNT of the text (int) — the budget currency for
    * packing/chunking; counts without materializing the token array. */
  case class SubwordCount(child: Expression, vocab: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "subword_count"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_count requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val matcher = new Matcher(vocab)

    def kernel(text: UTF8String): Int = matcher.count(text)

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("subwordCount", this, classOf[SubwordCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): SubwordCount =
      copy(child = newChild)
  }

  /** Context-window chunking budgeted in SUBWORD units at word
    * boundaries — `ChunkTokens`' trained-tokenizer sibling. Words keep
    * their original case (chunk text feeds the model); costs are
    * computed on the lowercased word (the tokenizer's alphabet). A
    * word lands in the chunk containing its FIRST subword
    * (`floor(cumBefore / maxTokens)` — the same spill rule as shard
    * packing), so chunk indexes are monotone and a boundary-straddling
    * word charges the earlier chunk. Emits
    * array<struct<chunk_idx, chunk_text, n_tokens>>; indexes can skip
    * only when a single word costs more than `maxTokens`.
    */
  case class SubwordChunks(child: Expression, vocab: Seq[String], maxTokens: Int)
      extends UnaryExpression {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("chunk_text", StringType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "subword_chunks"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_chunks requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val matcher = new Matcher(vocab)

    def kernel(text: UTF8String): ArrayData = {
      val trimmed = text.trim()
      val toks = trimmed.toString.split("\\s+", -1)
      // lowercase ONCE per row (UTF8String: locale-independent, like
      // the trained vocabulary's normalization); lowercasing never
      // turns a non-space char into whitespace, so the two splits are
      // index-aligned — no per-word allocation in the hot kernel
      val lowToks = trimmed.toLowerCase.toString.split("\\s+", -1)
      val out = new java.util.ArrayList[AnyRef]
      var sb: java.lang.StringBuilder = null
      var curIdx = -1
      var curTokens = 0
      var cum = 0L
      def flush(): Unit = if (curIdx >= 0) {
        out.add(new GenericInternalRow(Array[Any](
          curIdx, UTF8String.fromString(sb.toString), curTokens)))
      }
      var i = 0
      while (i < toks.length) {
        val w = toks(i)
        if (w.nonEmpty) {
          val cost = matcher.word(lowToks(i), null)
          val idx = (cum / maxTokens).toInt
          if (idx != curIdx) {
            flush()
            curIdx = idx
            curTokens = 0
            sb = new java.lang.StringBuilder
          }
          if (sb.length > 0) sb.append(' ')
          sb.append(w)
          curTokens += cost
          cum += cost
        }
        i += 1
      }
      flush()
      new GenericArrayData(out.toArray)
    }

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("subwordChunks", this, classOf[SubwordChunks].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): SubwordChunks =
      copy(child = newChild)
  }

  def subword_tokens(c: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(SubwordTokens(ExpressionUtils.expression(c), vocab))

  def subword_count(c: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(SubwordCount(ExpressionUtils.expression(c), vocab))

  def subword_chunks(c: Column, vocab: Seq[String], maxTokens: Int): Column =
    ExpressionUtils.column(SubwordChunks(ExpressionUtils.expression(c), vocab, maxTokens))
}
