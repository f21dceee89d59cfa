package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.MultiPattern._

class MultiPatternSpec extends SparkTestBase {
  import spark.implicits._

  private def scan(patterns: Seq[String], texts: String*): Seq[(Long, Seq[String])] =
    texts.toDF("t")
      .select(multi_pattern_scan(patterns, col("t")).as("mp"))
      .select(col("mp.n_matches"), col("mp.matched"))
      .as[(Long, Seq[String])].collect().toSeq

  test("counts are per-pattern leftmost non-overlapping (the replace-trick definition)") {
    // "aa" in "aaaa": greedy from the left takes [0,2) and [2,4) -> 2
    assert(scan(Seq("aa"), "aaaa") == Seq((2L, Seq("aa"))))
    // "batch batch" in "batch batch batch": the second candidate
    // (starting at 6) overlaps the taken [0,11) match -> 1
    assert(scan(Seq("batch batch"), "batch batch batch").head._1 == 1L)
    // exactly the replace-trick count: (len - len(replace))/len(k)
    val t = "batch batch batch"
    assert((t.length - t.replace("batch batch", "").length) / "batch batch".length == 1)
  }

  test("a pattern that is a substring of another counts independently") {
    val out = scan(Seq("merge", "merge data"), "merge data merge")
    // "merge" occurs twice, "merge data" once
    assert(out == Seq((3L, Seq("merge", "merge data"))))
  }

  test("matched list is distinct and byte-lexicographically sorted") {
    val out = scan(Seq("zebra", "apple", "mango"), "mango zebra apple zebra")
    assert(out == Seq((4L, Seq("apple", "mango", "zebra"))))
  }

  test("no matches -> zero count and empty array; empty text scans clean") {
    assert(scan(Seq("xyz"), "nothing here", "") ==
      Seq((0L, Nil), (0L, Nil)))
  }

  test("null text -> null struct") {
    val out = Seq[Option[String]](None, Some("merge")).toDF("t")
      .select(multi_pattern_scan(Seq("merge"), col("t")).as("mp"))
      .select(col("mp"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }

  test("utf-8 multi-byte text cannot phantom-match ascii patterns") {
    // é is 0xC3 0xA9; a pattern 'Ã' (0xC3 0x83) shares the lead byte
    // with é's encoding but must not match inside it
    assert(scan(Seq("a"), "é a é") == Seq((1L, Seq("a"))))
    assert(scan(Seq("é"), "é a é") == Seq((2L, Seq("é"))))
  }

  test("interpreted eval equals the codegen result") {
    val pats = Seq("merge", "merge data", "aa")
    val text = "aaaa merge data"
    val e = MultiPatternScan(pats,
      org.apache.spark.sql.catalyst.expressions.Literal(text))
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val viaDf = scan(pats, text).head
    assert(interpreted.getLong(0) == viaDf._1)
    val arr = interpreted.getArray(1)
    val interpMatched = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    assert(interpMatched == viaDf._2)
  }

  test("reference model: random texts agree with a per-pattern scan loop") {
    // independent reference: for each pattern, walk the text taking
    // leftmost non-overlapping matches
    def refCount(text: String, p: String): Int = {
      var i = 0; var c = 0
      while ({ val j = text.indexOf(p, i); j >= 0 && { c += 1; i = j + p.length; true } }) ()
      c
    }
    val pats = Seq("ab", "aba", "ba", "b")
    val rnd = new scala.util.Random(7)
    val texts = (1 to 50).map(_ => (1 to 40).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
    val out = scan(pats, texts: _*)
    texts.zip(out).foreach { case (t, (n, matched)) =>
      val exp = pats.map(p => refCount(t, p)).sum
      assert(n == exp, s"text=$t")
      val expMatched = pats.filter(p => refCount(t, p) > 0).sorted
      assert(matched == expMatched, s"text=$t")
    }
  }

  test("empty, duplicate, and blank pattern lists are rejected") {
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty[String]))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "a")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "")))
  }
}
