package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern literal matching (blocklists, keyword taxonomies,
  * phrase filters) in ONE text pass.
  *
  * The scale problem: data-curation blocklists run to thousands of
  * phrases. `contains(text, kw)` per keyword is O(|patterns|·|text|)
  * and |patterns| projection columns; a regex alternation
  * `(kw1|kw2|…)` degrades the same way (and explodes the regex
  * compiler first). An Aho–Corasick automaton matches EVERY pattern
  * simultaneously in O(|text| + matches): the byte-level trie +
  * failure links are built once on the driver and ride to each task
  * as a plan-referenced object — per-row cost is the single scan.
  *
  * Matching semantics are chosen to be SQL-replayable: occurrences
  * are counted per pattern INDEPENDENTLY, leftmost non-overlapping —
  * exactly what `regexp_extract_all(text, kw)` or the
  * `(len(t) − len(replace(t, kw, ''))) / len(kw)` replace-trick
  * computes — so an external engine can verify the count without an
  * automaton. Different patterns may overlap each other freely (each
  * is scanned "independently"); a pattern that is a substring of
  * another counts on its own.
  */
object MultiPattern {

  /** Byte-level Aho–Corasick automaton. Built once (driver), scanned
    * per row (executor). Byte-level means UTF-8 text needs no
    * decoding: patterns are matched on their UTF-8 byte encoding and
    * a multi-byte character can never partially match an ASCII
    * pattern (UTF-8 continuation bytes are disjoint from ASCII).
    *
    * Memory: trie nodes ≈ total pattern bytes; the root's transition
    * row is dense (the hot path — most text bytes fall back to root),
    * inner nodes keep sparse maps.
    */
  final class AhoCorasick(patternStrings: Array[String]) extends Serializable {
    require(patternStrings.nonEmpty, "at least one pattern required")
    require(patternStrings.forall(_.nonEmpty), "empty patterns are not allowed")
    require(patternStrings.distinct.length == patternStrings.length,
      "duplicate patterns are not allowed")

    private val patterns: Array[Array[Byte]] =
      patternStrings.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    private val patLen: Array[Int] = patterns.map(_.length)
    /** patterns as UTF8Strings, for emission */
    @transient private lazy val patUtf8: Array[UTF8String] =
      patternStrings.map(UTF8String.fromString)
    /** rank[p] = position of pattern p in byte-lexicographic (UTF-8)
      * order — what Spark and DuckDB string sorts use, NOT Java's
      * UTF-16 code-unit order */
    private val rank: Array[Int] = {
      val order = patternStrings.indices.sortWith((a, b) =>
        UTF8String.fromString(patternStrings(a)).compareTo(
          UTF8String.fromString(patternStrings(b))) < 0)
      val r = new Array[Int](patterns.length)
      order.zipWithIndex.foreach { case (pid, i) => r(pid) = i }
      r
    }

    // --- trie build ----------------------------------------------------
    private val trans = new scala.collection.mutable.ArrayBuffer[java.util.HashMap[Integer, Integer]]()
    private val fail = new scala.collection.mutable.ArrayBuffer[Int]()
    private val ownOut = new scala.collection.mutable.ArrayBuffer[List[Int]]()
    private def newNode(): Int = {
      trans += new java.util.HashMap[Integer, Integer]()
      fail += 0
      ownOut += Nil
      trans.length - 1
    }
    newNode() // root = 0
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        val nxt = trans(s).get(b)
        s = if (nxt != null) nxt.intValue() else {
          val n = newNode(); trans(s).put(b, n); n
        }
        i += 1
      }
      ownOut(s) = pid :: ownOut(s)
    }
    // BFS failure links + transitively merged outputs
    private val mergedOut: Array[Array[Int]] = {
      val out = Array.fill[List[Int]](trans.length)(Nil)
      val queue = new java.util.ArrayDeque[Integer]()
      val rootIt = trans(0).entrySet().iterator()
      while (rootIt.hasNext) { queue.add(rootIt.next().getValue) }
      (0 until trans.length).foreach(v => out(v) = ownOut(v))
      while (!queue.isEmpty) {
        val v = queue.poll().intValue()
        val it = trans(v).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val b = e.getKey.intValue()
          val u = e.getValue.intValue()
          var f = fail(v)
          while (f != 0 && trans(f).get(b) == null) f = fail(f)
          val fNext = trans(f).get(b)
          fail(u) = if (fNext != null && fNext.intValue() != u) fNext.intValue() else 0
          out(u) = out(u) ++ out(fail(u))
          queue.add(u)
        }
      }
      out.map(_.toArray)
    }
    /** dense root transitions: rootGoto(b) = next state from root */
    private val rootGoto: Array[Int] = {
      val g = new Array[Int](256)
      var b = 0
      while (b < 256) {
        val n = trans(0).get(b)
        g(b) = if (n != null) n.intValue() else 0
        b += 1
      }
      g
    }
    private val failArr: Array[Int] = fail.toArray
    private val transArr: Array[java.util.HashMap[Integer, Integer]] = trans.toArray

    /** One pass over `text`: total leftmost-non-overlapping
      * occurrences summed over patterns, plus the distinct matched
      * patterns in byte-lexicographic order. Returns an InternalRow
      * `(n_matches BIGINT, matched ARRAY<STRING>)`. */
    def scanRow(text: UTF8String): InternalRow = {
      val n = text.numBytes()
      var state = 0
      var total = 0L
      // lazily allocated: only rows with matches pay for it
      var lastEnd: java.util.HashMap[Integer, Integer] = null
      var i = 0
      while (i < n) {
        val b = text.getByte(i) & 0xff
        if (state == 0) {
          state = rootGoto(b)
        } else {
          var s = state
          var nxt = transArr(s).get(b)
          while (nxt == null && s != 0) {
            s = failArr(s)
            nxt = if (s == 0) null else transArr(s).get(b)
          }
          state = if (nxt != null) nxt.intValue() else rootGoto(b)
        }
        val outs = mergedOut(state)
        if (outs.length > 0) {
          if (lastEnd == null) lastEnd = new java.util.HashMap[Integer, Integer]()
          var k = 0
          while (k < outs.length) {
            val pid = outs(k)
            val start = i - patLen(pid) + 1
            val prev = lastEnd.get(pid)
            if (prev == null || start >= prev.intValue()) {
              total += 1L
              lastEnd.put(pid, i + 1)
            }
            k += 1
          }
        }
        i += 1
      }
      val matched: Array[AnyRef] =
        if (lastEnd == null) Array.empty[AnyRef]
        else {
          val ids = new Array[Integer](lastEnd.size())
          lastEnd.keySet().toArray(ids)
          java.util.Arrays.sort(ids, (a: Integer, b: Integer) =>
            Integer.compare(rank(a.intValue()), rank(b.intValue())))
          ids.map(id => patUtf8(id.intValue()): AnyRef)
        }
      val row = new GenericInternalRow(2)
      row.update(0, total)
      row.update(1, new GenericArrayData(matched))
      row
    }
  }

  /** `multi_pattern_scan(text)` over a fixed pattern list: struct of
    * `n_matches` (total per-pattern leftmost-non-overlapping
    * occurrences) and `matched` (distinct matched patterns, sorted).
    * Null text → null. Participates in whole-stage codegen; the
    * automaton is one plan-referenced object per operator instance. */
  case class MultiPatternScan(patternList: Seq[String], child: Expression)
      extends UnaryExpression {
    @transient private lazy val automaton = new AhoCorasick(patternList.toArray)

    override def dataType: DataType = StructType(Seq(
      StructField("n_matches", LongType, nullable = false),
      StructField("matched", ArrayType(StringType, containsNull = false),
        nullable = false)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "multi_pattern_scan"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_pattern_scan requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      automaton.scanRow(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ac = ctx.addReferenceObj("graftAhoCorasick", automaton,
        classOf[AhoCorasick].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (InternalRow) $ac.scanRow($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): MultiPatternScan =
      copy(child = newChild)
  }

  def multi_pattern_scan(patterns: Seq[String], c: Column): Column =
    ExpressionUtils.column(MultiPatternScan(patterns,
      ExpressionUtils.expression(c)))
}
