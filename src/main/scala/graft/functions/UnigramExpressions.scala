package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenization (beyond-parity) —
  * the probabilistic companion to [[SubwordExpressions]]'s greedy
  * WordPiece decoding: each word is segmented into the VITERBI-best
  * piece sequence under a trained scored vocabulary
  * (`operators.Tokenizer.trainUnigramLm`), applied inside
  * whole-stage codegen via a plan reference object.
  *
  * Scores are INTEGER fixed-point log2 probabilities (see
  * `Tokenizer.qlog2`), so the per-path sums are exact and the argmax
  * is engine-reproducible; ties (same total score — e.g. the same
  * piece multiset split differently) resolve to the
  * lexicographically smallest separator-joined path, the one total
  * order a brute-force enumeration (the DuckDB oracle) and the DP
  * here agree on. The tie-break is DP-safe: two partial paths
  * covering the same prefix can never be prefixes of each other
  * (at their first difference one has the 0x1F separator where the
  * other has a word character), so their order survives appending a
  * common suffix.
  *
  * Application contract (mirrored by the oracle): text is
  * lowercased and whitespace-split; every trained vocabulary
  * contains all corpus characters, so in-corpus words always
  * segment; a word containing an out-of-vocab character falls back
  * to per-code-point pass-through for that word (same contract as
  * the greedy matcher's single-char fallback).
  */
object UnigramExpressions {

  private val Sep = '\u001f'

  /** Code-point lexicographic comparison — the order SQL engines use
    * for UTF-8 strings. Java's String.compareTo orders by UTF-16
    * code UNIT, which ranks supplementary characters (surrogates,
    * 0xD800+) BELOW U+E000..U+FFFF; comparing by code point keeps the
    * tie-break identical to the oracle's `path ASC` on any text. */
  private[graft] def codePointLt(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** Viterbi segmenter over a scored piece vocabulary — one DP pass
    * per word, O(len · maxPieceLen) probes. */
  final class Segmenter(vocab: Seq[(String, Long)]) extends Serializable {
    private val score = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, s) => m.put(p, s) }
      m
    }
    private val maxLen =
      if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max

    /** Best segmentation of one already-lowercased word, or null when
      * some character is out-of-vocab (caller falls back). The 0x1F
      * separator is RESERVED: a word containing it would corrupt the
      * path encoding (its piece would merge with the separators), so
      * such words take the fallback too — binary-contaminated tokens
      * are not meaningful unigram units anyway. */
    def segment(w: String): Array[String] = {
      if (w.indexOf(Sep.toInt) >= 0) return null
      // pathological unsplit blobs (base64, mega-URLs) would pay the
      // DP's O(len²) path building on one row — cap at the training
      // bound (256 code points ≤ 512 UTF-16 units) and fall back;
      // trainUnigramLm rejects such corpora loudly, so in-corpus
      // words never hit this
      if (w.length > 512) return null
      val n = w.length
      val best = new Array[Long](n + 1)
      val bestPath = new Array[String](n + 1)
      java.util.Arrays.fill(best, Long.MinValue)
      best(0) = 0L
      bestPath(0) = ""
      var i = 1
      while (i <= n) {
        val lmax = math.min(maxLen, i)
        var l = 1
        while (l <= lmax) {
          val j = i - l
          if (best(j) != Long.MinValue) {
            val s = score.get(w.substring(j, i))
            if (s != null) {
              val cand = best(j) + s.longValue()
              if (cand > best(i)) {
                best(i) = cand
                bestPath(i) = bestPath(j) + w.substring(j, i) + Sep
              } else if (cand == best(i)) {
                val candPath = bestPath(j) + w.substring(j, i) + Sep
                if (codePointLt(candPath, bestPath(i))) bestPath(i) = candPath
              }
            }
          }
          l += 1
        }
        i += 1
      }
      if (best(n) == Long.MinValue) null
      else {
        val p = bestPath(n)
        // drop the trailing separator, split on the rest
        p.substring(0, p.length - 1).split(Sep)
      }
    }

    /** Pieces of one word with the out-of-vocab code-point fallback. */
    def word(w: String, out: java.util.ArrayList[AnyRef]): Int = {
      val seg = segment(w)
      if (seg != null) {
        if (out != null) { var i = 0; while (i < seg.length) { out.add(UTF8String.fromString(seg(i))); i += 1 } }
        seg.length
      } else {
        var pos = 0
        var n = 0
        while (pos < w.length) {
          val l = Character.charCount(w.codePointAt(pos))
          if (out != null) out.add(UTF8String.fromString(w.substring(pos, pos + l)))
          pos += l
          n += 1
        }
        n
      }
    }

    def tokens(text: UTF8String): ArrayData = {
      val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
      val out = new java.util.ArrayList[AnyRef]
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) word(toks(i), out)
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    def count(text: UTF8String): Int = {
      val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
      var n = 0
      var i = 0
      while (i < toks.length) {
        if (toks(i).nonEmpty) n += word(toks(i), null)
        i += 1
      }
      n
    }
  }

  /** Viterbi-best unigram tokens of the text (array<string>). */
  case class UnigramTokens(child: Expression, vocab: Seq[(String, Long)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "unigram_tokens"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_tokens requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val segmenter = new Segmenter(vocab)

    def kernel(text: UTF8String): ArrayData = segmenter.tokens(text)

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTokens", this, classOf[UnigramTokens].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramTokens =
      copy(child = newChild)
  }

  /** Viterbi unigram token COUNT (int) — the packing/chunking budget
    * currency in unigram units. */
  case class UnigramCount(child: Expression, vocab: Seq[(String, Long)])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "unigram_count"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_count requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val segmenter = new Segmenter(vocab)

    def kernel(text: UTF8String): Int = segmenter.count(text)

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramCount", this, classOf[UnigramCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramCount =
      copy(child = newChild)
  }

  // ---- Column-level API ----

  def unigram_tokens(text: Column, vocab: Seq[(String, Long)]): Column =
    ExpressionUtils.column(UnigramTokens(ExpressionUtils.expression(text), vocab))

  def unigram_count(text: Column, vocab: Seq[(String, Long)]): Column =
    ExpressionUtils.column(UnigramCount(ExpressionUtils.expression(text), vocab))
}
