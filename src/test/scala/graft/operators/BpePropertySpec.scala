package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.functions.BpeExpressions.BpeMatcher

/** Property checks for the two equivalences the BPE oracle design
  * rests on:
  *
  *  1. the codegen kernel's scan-and-skip merge walk equals the
  *     delimited-string `replace` formulation the DuckDB oracle
  *     replays (pure-JVM check, hundreds of random cases);
  *  2. the DISTRIBUTED trainer (per-iteration Spark aggregation +
  *     argmax collect) learns exactly the merges a naive sequential
  *     in-memory BPE trainer learns (full Spark jobs, a handful of
  *     fixed-seed random corpora).
  */
class BpePropertySpec extends SparkTestBase {
  import spark.implicits._

  /** The oracle's formulation: wrap every symbol in RS on both sides,
    * apply each merge as a non-overlapping left-to-right string
    * replace of the delimited pair. */
  private def replayViaReplace(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rs = 30.toChar.toString
    var seg = word.map(ch => s"$rs$ch$rs").mkString
    merges.foreach { case (l, r) =>
      seg = seg.replace(s"$rs$l$rs$rs$r$rs", s"$rs$l$r$rs")
    }
    if (seg.isEmpty) Seq.empty
    else seg.substring(1, seg.length - 1).split(s"$rs$rs", -1).toSeq
  }

  /** Naive sequential reference trainer: exactly Sennrich's loop on a
    * driver-side word-frequency map. */
  private def naiveTrain(words: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var segs: Map[List[String], Long] =
      words.map { case (w, f) => w.toList.map(_.toString) -> f }
    val out = Seq.newBuilder[(String, String)]
    var done = false
    var iter = 0
    while (iter < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val (l, r) = eligible.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head._1
        out += ((l, r))
        segs = segs.groupMapReduce { case (s, _) =>
          val b = List.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
        iter += 1
      }
    }
    out.result()
  }

  test("kernel merge walk == delimited-replace replay for arbitrary " +
      "words and merge lists") {
    val genWord = Gen.stringOfN(8, Gen.oneOf('a', 'b', 'c'))
      .flatMap(s => Gen.choose(0, 8).map(s.take))
    // merges over the tiny alphabet, chained so multi-char symbols
    // appear as left/right parts of later merges
    val genMerges = Gen.listOfN(6,
      Gen.zip(Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "aa"),
        Gen.oneOf("a", "b", "c", "ab", "bc", "cb")))
    val prop = Prop.forAll(genWord, genMerges) { (w, ms) =>
      val kernel = new BpeMatcher(ms).symbols(w).toSeq
      kernel == replayViaReplace(w, ms)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed trainer == naive sequential trainer on random corpora") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 5).foreach { trial =>
      // small vocabulary + skewed repetition so merges are meaningful
      val lexicon = Vector("cat", "cata", "atac", "dog", "dodo", "god",
        "catalog", "tac", "aa", "aaa", "abab")
      val docs = (1 to 40).map { i =>
        val n = 3 + rnd.nextInt(6)
        (i.toLong, Seq.fill(n)(lexicon(rnd.nextInt(lexicon.length)))
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      // default entry (local-exact tier since r7)
      val got = Tokenizer.trainBpeMerges(df, "text", numMerges = 10).toSeq
      val freq = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val want = naiveTrain(freq, 10)
      assert(got == want,
        s"trial $trial: local-exact $got != sequential $want")
      // the distributed tier and its strict-prefix batching must give
      // the SAME trajectory (maxLocalWords = 0 forces them)
      val dist = Tokenizer.trainBpeMerges(df, "text", numMerges = 10,
        maxLocalWords = 0).toSeq
      assert(dist == want, s"trial $trial: distributed $dist != $want")
      val batched = Tokenizer.trainBpeMergesBatched(df, "text",
        numMerges = 10, batchSize = 4, maxLocalWords = 0).toSeq
      assert(batched == want, s"trial $trial: batched $batched != $want")
      // and the kernel applied to each distinct word equals the naive
      // trainer's implied segmentation (training == application)
      val m = new BpeMatcher(got)
      freq.keys.foreach { w =>
        assert(m.symbols(w).toSeq == replayViaReplace(w, got),
          s"trial $trial word '$w'")
      }
    }
  }

  /** Naive sequential WordPiece reference: Sennrich's loop with the
    * likelihood ranking count(l,r)/(count(l)·count(r)). */
  private def naiveWordPiece(words: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var segs: Map[List[String], Long] =
      words.groupBy(w => w._1.map(_.toString).toList)
        .map { case (k, g) => k -> g.values.sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < numMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sy = scala.collection.mutable.Map.empty[String, Long]
      segs.foreach { case (s, f) =>
        s.foreach(x => sy.update(x, sy.getOrElse(x, 0L) + f))
        s.zip(s.drop(1)).foreach(p => pc.update(p, pc.getOrElse(p, 0L) + f))
      }
      val eligible = pc.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        // max score; among max-score pairs the (l, r)-ascending one
        val maxScore = eligible.map { case ((a, b), c) =>
          c.toDouble / (sy(a) * sy(b)) }.max
        val (bl, br) = eligible.collect { case ((a, b), c)
          if c.toDouble / (sy(a) * sy(b)) == maxScore => (a, b) }
          .toSeq.min
        out += ((bl, br))
        segs = segs.groupBy { case (s, _) =>
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == bl && s(j + 1) == br) {
              buf += bl + br; j += 2
            } else { buf += s(j); j += 1 }
          }
          buf.toList
        }.map { case (k, g) => k -> g.values.sum }
      }
    }
    out.toSeq
  }

  test("WordPiece trainer == naive likelihood-ranked reference; local == distributed") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val lexicon = Vector("cat", "cata", "atac", "dog", "dodo", "god",
        "catalog", "tac", "aa", "aaa", "abab", "zq", "zqzq")
      val docs = (1 to 40).map { i =>
        val n = 3 + rnd.nextInt(6)
        (i.toLong, Seq.fill(n)(lexicon(rnd.nextInt(lexicon.length)))
          .mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val freq = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      val want = naiveWordPiece(freq, 8)
      val local = Tokenizer.trainWordPieceMerges(df, "text", numMerges = 8).toSeq
      assert(local == want, s"trial $trial: local $local != reference $want")
      val dist = Tokenizer.trainWordPieceMerges(df, "text", numMerges = 8,
        maxLocalWords = 0).toSeq
      assert(dist == want, s"trial $trial: distributed $dist != $want")
      // the likelihood ranking genuinely diverges from raw-count BPE
      // on corpora with a strongly-bound rare pair ("zq" always
      // co-occurs; frequent letters pair often but bind weakly)
      val bpe = Tokenizer.trainBpeMerges(df, "text", numMerges = 8).toSeq
      assert(bpe != want || trial > 1,
        s"trial $trial: WordPiece never diverged from BPE — fixture too weak")
    }
  }
}
