package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.SubwordExpressions

class TokenizerSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "quickly the foxes jump over lazy dogs again and again"),
    (3L, "Mixed CASE text  with   odd   spacing"),
    (4L, "short"),
    (5L, "a bb ccc dddd eeeee")
  ).toDF("doc_id", "text")

  private lazy val vocab =
    Tokenizer.trainVocab(docs, "text", vocabSize = 32, maxTokenLen = 6)

  test("training is deterministic and bounded by vocabSize") {
    val again = Tokenizer.trainVocab(docs, "text", vocabSize = 32, maxTokenLen = 6)
    assert(vocab.toSeq == again.toSeq)
    assert(vocab.length <= 32)
    assert(vocab.distinct.length == vocab.length)
    assert(vocab.forall(t => t.length >= 1 && t.length <= 6))
  }

  test("vocabulary contains every corpus character (total coverage)") {
    val chars = docs.select(explode(split(lower(trim(col("text"))), "")).as("c"))
      .filter(col("c") =!= " " && col("c") =!= "")
      .distinct().as[String].collect().toSet
    assert(chars.subsetOf(vocab.toSet))
  }

  test("round trip: concatenated subword tokens reconstruct each word") {
    val got = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("words"),
        Tokenizer.subwordTokens(col("text"), vocab).as("toks"))
      .as[(Long, Seq[String], Seq[String])].collect()
    got.foreach { case (_, words, toks) =>
      // tokens, consumed in order, must re-join into the words exactly
      var rest = toks.toList
      words.filter(_.nonEmpty).foreach { w =>
        var acc = new StringBuilder
        while (acc.length < w.length) {
          assert(rest.nonEmpty, s"ran out of tokens rebuilding '$w'")
          acc ++= rest.head
          rest = rest.tail
        }
        assert(acc.toString == w, s"tokens do not reassemble '$w'")
      }
      assert(rest.isEmpty, "tokenizer emitted extra tokens")
    }
  }

  test("greedy longest-match: the first token is the longest vocab prefix") {
    val toks = docs.select(Tokenizer.subwordTokens(col("text"), vocab).as("t"))
      .as[Seq[String]].collect().flatten
    val vset = vocab.toSet
    // every emitted multi-char token is in the vocab; single chars may
    // be fallbacks
    assert(toks.filter(_.length > 1).forall(vset.contains))
    // and the match is GREEDY, not just valid: with "ab" and "abc"
    // both in vocab, "abc" must come out whole, and "abd" must fall
    // back to the longest prefix "ab" + "d" — a shortest-match
    // regression would emit "ab" + "c" / "a" + "b" + "d"
    val greedy = Seq((1L, "abc abd")).toDF("doc_id", "text")
      .select(SubwordExpressions.subword_tokens(col("text"),
        Seq("a", "b", "c", "d", "ab", "abc")))
      .as[Seq[String]].head()
    assert(greedy == Seq("abc", "ab", "d"))
  }

  test("subwordCount equals the token array size") {
    val rows = docs.select(
        Tokenizer.subwordCount(vocab)(col("text")).as("n"),
        size(Tokenizer.subwordTokens(col("text"), vocab)).as("m"))
      .as[(Int, Int)].collect()
    rows.foreach { case (n, m) => assert(n == m) }
  }

  test("an out-of-vocab character passes through as its own token") {
    val tiny = Seq((1L, "abc")).toDF("doc_id", "text")
    // vocab without 'c': greedy must still terminate, emitting 'c'
    val toks = tiny.select(
        SubwordExpressions.subword_tokens(col("text"), Seq("a", "b", "ab")))
      .as[Seq[String]].head()
    assert(toks == Seq("ab", "c"))
  }

  test("chunking by subwords: chunks reassemble the doc, budgets respected") {
    val out = Tokenizer.chunkBySubwords(docs, "doc_id", "text", vocab,
        maxTokens = 8)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect()
    // reassembly: concatenating chunk texts per doc restores the
    // whitespace-normalized doc
    val rebuilt = out.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString(" ")).toMap
    val expected = docs.select(col("doc_id"),
        array_join(split(trim(col("text")), "\\s+"), " "))
      .as[(Long, String)].collect().toMap
    assert(rebuilt == expected)
    // each chunk starts within budget (first-subword rule): its first
    // word begins before the next budget boundary; chunk token sums
    // are positive
    assert(out.forall(_._4 > 0))
    // per doc, chunk indexes are strictly increasing
    out.groupBy(_._1).foreach { case (_, rows) =>
      val idxs = rows.sortBy(_._2).map(_._2).toSeq
      assert(idxs == idxs.distinct.sorted)
    }
  }

  test("token counts land between word count and char count") {
    val rows = docs.select(
        Tokenizer.subwordCount(vocab)(col("text")).cast("long").as("n"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("w"),
        length(regexp_replace(trim(col("text")), "\\s+", "")).cast("long").as("c"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (n, w, c) =>
      assert(n >= w, "a word is at least one token")
      assert(n <= c, "a token is at least one char")
    }
  }
}
