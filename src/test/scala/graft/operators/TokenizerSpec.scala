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

  // ---- true BPE (pair-merge training + merge-order application) ----

  test("BPE: hand-computed merge trajectory on a micro corpus") {
    // words: aaab f=2, aab f=1
    //   iter1: (a,a)=2*2+1=5  (a,b)=2+1=3            -> merge (a,a)
    //   iter2: (aa,a)=2 (a,b)=2 (aa,b)=1; tie 2-2,
    //          l ASC breaks: "a" < "aa"              -> merge (a,b)
    //   iter3: (aa,ab)=2 (aa,b)=1                    -> merge (aa,ab)
    //   iter4: best count 1 < 2                      -> stop early
    val tiny = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = Tokenizer.trainBpeMerges(tiny, "text", numMerges = 10)
    assert(merges.toSeq == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val counts = tiny.select(
      Tokenizer.bpeCount(merges.toSeq)(col("text"))).as[Int].collect()
    assert(counts.toSeq == Seq(1 + 1 + 2)) // [aaab][aaab][aa,b]
  }

  test("BPE: training is deterministic across runs") {
    val m1 = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12)
    val m2 = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.nonEmpty)
    // every merged symbol is the concat of parts already derivable
    // from earlier merges or single chars (well-formed order)
    val known = scala.collection.mutable.Set[String]()
    m1.foreach { case (l, r) =>
      assert(l.length == 1 || known.contains(l), s"left '$l' unknown")
      assert(r.length == 1 || known.contains(r), s"right '$r' unknown")
      known += (l + r)
    }
  }

  test("BPE: local-exact tier == distributed loop == strict-prefix batch, " +
      "with the local tier doing 96 merges in ONE round") {
    // production-shaped (Zipfian) corpus: 600 docs over a ~200-word
    // synthetic vocabulary, deterministic — the r6 verdict's regime
    val zipf = spark.range(600L).toDF("doc_id")
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(1), lit(12)),
          i => concat(lit("w"), pmod(xxhash64(col("doc_id") % 37, i), lit(200))))))
    val nMerges = 96
    // ground truth: the distributed one-merge-per-round loop
    val seqM = Tokenizer.trainBpeMerges(zipf, "text", numMerges = nMerges,
      maxLocalWords = 0).toSeq
    assert(seqM.size == nMerges)
    // LOCAL tier: identical merge list, ONE driver round instead of
    // 96 (>= 5x fewer is the r6 bar; this is 96x)
    val (locM, locRounds) = Tokenizer.trainBpeMergesBatchedWithRounds(
      zipf, "text", numMerges = nMerges, batchSize = 1)
    assert(locRounds == 1, s"expected the local-exact tier, rounds=$locRounds")
    assert(locM.toSeq == seqM)
    // DISTRIBUTED strict-prefix batching: merge list IDENTICAL to
    // sequential (the exactness proof in the scaladoc), never more
    // rounds than merges
    val (batM, batRounds) = Tokenizer.trainBpeMergesBatchedWithRounds(
      zipf, "text", numMerges = nMerges, batchSize = 8, maxLocalWords = 0)
    assert(batM.toSeq == seqM)
    assert(batRounds <= nMerges)
    // and the default entry point (local tier) agrees end-to-end
    assert(Tokenizer.trainBpeMerges(zipf, "text", numMerges = nMerges)
      .toSeq == seqM)
  }

  test("BPE: local-exact tier matches the distributed loop on the " +
      "natural-text fixture, byte-level included") {
    val charSeq = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12,
      maxLocalWords = 0).toSeq
    assert(Tokenizer.trainBpeMerges(docs, "text", numMerges = 12)
      .toSeq == charSeq)
    // byte-level: local tier == distributed trajectory too
    val byteSeq = Tokenizer.trainBpeBytes(docs, "text", numMerges = 12).toSeq
    assert(byteSeq == Tokenizer.trainBpeBytes(docs, "text", numMerges = 12,
      maxLocalWords = 0).toSeq)
    byteSeq.foreach { case (l, r) =>
      assert(l.length % 2 == 0 && r.length % 2 == 0)
      assert((l + r).forall(c => c.isDigit || ('A' to 'F').contains(c)))
    }
    assert(byteSeq.nonEmpty)
  }

  test("BPE: concatenated tokens reconstruct each word (round trip)") {
    val merges = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12).toSeq
    val got = docs.select(
        split(lower(trim(col("text"))), "\\s+").as("words"),
        Tokenizer.bpeTokens(col("text"), merges).as("toks"))
      .as[(Seq[String], Seq[String])].collect()
    got.foreach { case (words, toks) =>
      var rest = toks.toList
      words.filter(_.nonEmpty).foreach { w =>
        val acc = new StringBuilder
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

  test("BPE: merge-order application differs from greedy longest-match " +
      "(the fidelity gap the kernel closes)") {
    // corpus learns (b,c) BEFORE (a,b): bc f=3, ab f=2, abc f=1
    //   iter1: (b,c)=3+1=4 > (a,b)=2+1=3 -> merge (b,c)
    //   iter2: (a,b)=2 > (a,bc)=1        -> merge (a,b)
    val corpus = Seq((1L, "bc bc bc ab ab abc")).toDF("doc_id", "text")
    val merges = Tokenizer.trainBpeMerges(corpus, "text", numMerges = 10)
    assert(merges.toSeq == Seq(("b", "c"), ("a", "b")))
    val probe = Seq((1L, "abc")).toDF("doc_id", "text")
    val bpe = probe.select(
      Tokenizer.bpeTokens(col("text"), merges.toSeq)).as[Seq[String]].head()
    // merge order: (b,c) fires first -> [a, bc]; (a,b) then has no site
    assert(bpe == Seq("a", "bc"))
    // greedy longest-match over the SAME final vocabulary takes the
    // longest prefix instead -> [ab, c]: provably different tokens
    val vocabFromMerges = Seq("a", "b", "c") ++ merges.map { case (l, r) => l + r }
    val greedy = probe.select(
      Tokenizer.subwordTokens(col("text"), vocabFromMerges)).as[Seq[String]].head()
    assert(greedy == Seq("ab", "c"))
    assert(bpe != greedy)
  }

  test("BPE: chunking by BPE units reconstructs the doc and respects " +
      "the first-token spill rule") {
    val merges = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12).toSeq
    val out = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().flatMap { case (id, _) => Seq(id) }
    val chunks = Tokenizer.chunkByBpe(docs, "doc_id", "text", merges, maxTokens = 5)
      .as[(Long, Long, String, Long)].collect()
    assert(chunks.map(_._1).toSet == out.toSet)
    val rebuilt = chunks.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).mkString(" ")).toMap
    val expected = docs.select(col("doc_id"),
        array_join(split(trim(col("text")), "\\s+"), " "))
      .as[(Long, String)].collect().toMap
    assert(rebuilt == expected)
    chunks.groupBy(_._1).foreach { case (_, rows) =>
      val idxs = rows.sortBy(_._2).map(_._2).toSeq
      assert(idxs == idxs.distinct.sorted)
      rows.foreach(r => assert(r._4 > 0))
    }
  }

  test("BPE: vocab table ids cover every emitted token; duplicate " +
      "merged strings keep their first id") {
    val merges = Tokenizer.trainBpeMerges(docs, "text", numMerges = 12).toSeq
    val vocab = Tokenizer.bpeVocabTable(docs, "text", merges)
    // one row per distinct token string
    assert(vocab.map(_._1).distinct.length == vocab.length)
    // ids strictly increasing in appearance order (gaps allowed)
    assert(vocab.map(_._2) == vocab.map(_._2).sorted)
    // duplicate-string policy: synthetic merges with a colliding
    // product — ("a","bc") and ("ab","c") both make "abc"
    val dupMerges = Seq(("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c"))
    val v2 = Tokenizer.bpeVocabTable(
      Seq((1L, "abc cab")).toDF("doc_id", "text"), "text", dupMerges)
    val abcIds = v2.filter(_._1 == "abc")
    assert(abcIds.length == 1, s"expected one 'abc' row: $v2")
    // chars a,b,c take ids 1..3; merges bc=4, ab=5, abc(first)=6
    assert(abcIds.head._2 == 6L)
    // every token the kernel emits on the corpus has an id
    val idMap = vocab.toMap
    val toks = docs.select(Tokenizer.bpeTokens(col("text"), merges))
      .as[Seq[String]].collect().flatten.toSet
    toks.foreach(t => assert(idMap.contains(t), s"token '$t' has no id"))
    // and the encoding round-trips: ids map back to the same tokens
    val rev = vocab.map { case (t, i) => i -> t }.toMap
    val enc = docs.select(col("doc_id"),
        Tokenizer.bpeIds(col("text"), merges, vocab).as("ids"),
        Tokenizer.bpeTokens(col("text"), merges).as("toks"))
      .as[(Long, Seq[Long], Seq[String])].collect()
    enc.foreach { case (_, ids, ts) =>
      assert(ids.map(rev) == ts)
    }
  }

  test("BPE: out-of-corpus characters in fresh text map to null ids " +
      "(loud, never renumbered)") {
    val merges = Tokenizer.trainBpeMerges(docs, "text", numMerges = 6).toSeq
    val vocab = Tokenizer.bpeVocabTable(docs, "text", merges)
    val fresh = Seq((1L, "quick zebra £ fox")).toDF("doc_id", "text")
    val ids = fresh.select(
      Tokenizer.bpeIds(col("text"), merges, vocab)).as[Seq[Option[Long]]].head()
    // '£' never appeared in the training corpus: its token has no id
    assert(ids.contains(None), s"expected a null id for the OOV char: $ids")
    // every other token still resolves
    assert(ids.count(_.isEmpty) == 1)
  }

  test("byte-level BPE: symbols are UTF-8 bytes, budgets diverge from " +
      "char level exactly on multibyte text") {
    // no merges: raw unit counts — char level sees code points, byte
    // level sees UTF-8 bytes
    val probe = Seq((1L, "café 😀 abc")).toDF("doc_id", "text")
    val noMerges = Seq.empty[(String, String)]
    val (charN, byteN) = probe.select(
        Tokenizer.bpeCount(noMerges)(col("text")),
        Tokenizer.bpeByteCount(noMerges)(col("text")))
      .as[(Int, Int)].head()
    assert(charN == 4 + 1 + 3)      // café=4 cps, emoji=1 cp, abc=3
    assert(byteN == 5 + 4 + 3)      // café=5 bytes, emoji=4, abc=3
    // byte tokens round-trip through unhex to the exact UTF-8 bytes
    val toks = probe.select(
      Tokenizer.bpeByteTokens(col("text"), noMerges)).as[Seq[String]].head()
    assert(toks.mkString.grouped(2).map(Integer.parseInt(_, 16).toByte)
      .toArray.sameElements("café😀abc".getBytes("UTF-8")))
    // trained byte merges produce hex-pair-concatenated symbols whose
    // unhex is a real substring of a corpus word
    val merges = Tokenizer.trainBpeBytes(docs, "text", numMerges = 8)
    assert(merges.nonEmpty)
    merges.foreach { case (l, r) =>
      assert((l + r).length % 2 == 0)
      assert((l + r).forall(c => "0123456789ABCDEF".contains(c)))
    }
    val corpusText = docs.select(lower(trim(col("text"))))
      .as[String].collect().mkString(" ")
    merges.take(3).foreach { case (l, r) =>
      val bytes = (l + r).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      assert(corpusText.contains(s), s"merged '$s' not in corpus")
    }
  }

  test("byte-level ids are TOTAL: any input encodes, no OOV possible") {
    val merges = Tokenizer.trainBpeBytes(docs, "text", numMerges = 8).toSeq
    val vocab = Tokenizer.bpeByteVocabTable(merges)
    assert(vocab.length >= 256)
    assert(vocab.take(256).map(_._2) == (1L to 256L))
    // text full of characters the corpus never saw — still encodes
    // with zero nulls (contrast the char-level OOV-null contract)
    val fresh = Seq((1L, "Ωμέγα 😀 § 中文 zebra £")).toDF("doc_id", "text")
    val ids = fresh.select(
      Tokenizer.bpeByteIds(col("text"), merges, vocab)).as[Seq[Long]].head()
    assert(ids.nonEmpty && ids.forall(_ >= 1L))
    // and round-trips: ids -> hex symbols -> bytes == the UTF-8 bytes
    val rev = vocab.map { case (t, i) => i -> t }.toMap
    val bytes = ids.map(rev).mkString.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(bytes.sameElements(
      "ωμέγα 😀 § 中文 zebra £".filter(_ != ' ').mkString
        .getBytes("UTF-8")) ||
      new String(bytes, "UTF-8") == "ωμέγα😀§中文zebra£")
  }

  test("BPE: non-BMP characters stay single symbols (no surrogate splits)") {
    val emoji = Seq((1L, "ab 😀😀 ab")).toDF("doc_id", "text")
    val merges = Seq(("a", "b")) // emoji never merged
    val toks = emoji.select(
      Tokenizer.bpeTokens(col("text"), merges)).as[Seq[String]].head()
    assert(toks == Seq("ab", "😀", "😀", "ab"))
  }

  test("unigram Viterbi equals brute-force (score DESC, path ASC) argmax, " +
      "including exact-tie and OOV-fallback cases") {
    import graft.functions.UnigramExpressions.Segmenter
    // brute-force reference: enumerate every segmentation
    def brute(w: String, vocab: Map[String, Long]): Option[Seq[String]] = {
      val maxLen = if (vocab.isEmpty) 1 else vocab.keys.map(_.length).max
      def all(pos: Int): Seq[List[String]] =
        if (pos == w.length) Seq(Nil)
        else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
          val p = w.substring(pos, pos + l)
          if (vocab.contains(p)) all(pos + l).map(p :: _) else Nil
        }
      val segs = all(0)
      if (segs.isEmpty) None
      else Some(segs.map(s => (s.map(vocab).sum, s.mkString("\u001f") + "\u001f", s))
        .minBy { case (sc, path, _) => (-sc, path) }._3.toSeq)
    }
    // exact tie: ["a","b"] and ["ab"] both score -10; path ASC picks
    // the separator-earlier split
    val tieVocab = Map("ab" -> -10L, "a" -> -5L, "b" -> -5L, "c" -> -3L)
    val segTie = new Segmenter(tieVocab.toSeq)
    assert(segTie.segment("ab").toSeq == Seq("a", "b"))
    assert(brute("ab", tieVocab).get == Seq("a", "b"))
    // preference flips when the fused piece scores strictly better
    val segBig = new Segmenter((tieVocab + ("ab" -> -9L)).toSeq)
    assert(segBig.segment("ab").toSeq == Seq("ab"))
    // randomized cross-check on a fixed-seed word set
    val rnd = new scala.util.Random(17L)
    val alphabet = "abc"
    val pieces = (for (l <- 1 to 3; s <- Seq.fill(6)(
      (0 until l).map(_ => alphabet(rnd.nextInt(3))).mkString)) yield s).distinct
    val vocab = (pieces.map(p => p -> (-(rnd.nextInt(8) + 1).toLong * p.length)) ++
      alphabet.map(c => c.toString -> -9L)).toMap
    val seg = new Segmenter(vocab.toSeq)
    for (_ <- 1 to 200) {
      val w = (0 until (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      assert(seg.segment(w).toSeq == brute(w, vocab).get,
        s"word $w: DP ${seg.segment(w).toSeq} != brute ${brute(w, vocab).get}")
    }
    // OOV char -> per-code-point fallback for that word
    val out = new java.util.ArrayList[AnyRef]
    assert(segTie.segment("axb") == null)
    assert(segTie.word("axb", out) == 3)
  }

  test("trainUnigramLm: chars always kept, vocab bounded, multi-char " +
      "pieces compress the corpus, encode count matches tokens") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val vocab = Tokenizer.trainUnigramLm(docs, "text",
      vocabSize = 48, seedSize = 96, maxPieceLen = 6)
    assert(vocab.length <= 48)
    val pieces = vocab.map(_._1).toSet
    val corpusChars = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().flatMap(_.getString(0).toSeq).map(_.toString).toSet
    assert(corpusChars.subsetOf(pieces))
    assert(vocab.exists(_._1.length > 1), "no multi-char piece learned")
    assert(vocab.forall(_._3 < 0), "scores are log-probs, must be negative")
    val scored = vocab.map(v => (v._1, v._3)).toSeq
    // Viterbi encode beats char-split: strictly fewer pieces than chars
    val stats = docs.select(
      Tokenizer.unigramCount(scored)(col("text")).cast("long").as("n"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nw"),
      length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).cast("long").as("nc"))
      .agg(sum("n"), sum("nw"), sum("nc")).head()
    assert(stats.getLong(0) < stats.getLong(2),
      s"unigram pieces ${stats.getLong(0)} not compressing chars ${stats.getLong(2)}")
    assert(stats.getLong(0) >= stats.getLong(1),
      "cannot have fewer pieces than words")
    // count agrees with the materialized tokens
    val agree = docs.select(
      (Tokenizer.unigramCount(scored)(col("text")) ===
        size(Tokenizer.unigramTokens(col("text"), scored))).as("ok"))
      .agg(min("ok")).head().getBoolean(0)
    assert(agree)
  }

  test("oovStats: unseen CHARS are OOV, unseen WORDS of known chars are covered") {
    import spark.implicits._
    val vocab = Seq("a", "b", "c", "ab")
    val df = Seq((1L, "ab c"),   // fully covered
      (2L, "abz"),               // [ab, z]: z outside the alphabet
      (3L, ""),                  // empty -> zero tokens, rate 0
      (4L, "xyz"),               // all three singles OOV
      (5L, "ba cab"))            // unseen words, known chars: covered
      .toDF("id", "text")
    val out = Tokenizer.oovStats(df, "id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((0L, 0L, 0.0)))
    assert(out(4L) == ((3L, 3L, 1.0)))
    assert(out(5L) == ((4L, 0L, 0.0)))  // [b, a] + [c, ab], all in-vocab
  }

  test("sampled-corpus training tracks full-corpus training: nested " +
      "deterministic sample, top-N merge overlap, token drift (r11 #4)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val total = docs.count()
    // the sample is a pure function of (text, seed): identical across
    // re-runs, and thresholds NEST — sample(0.2) is a strict subset of
    // sample(0.5) under one seed, so growing the budget only ADDS text
    val s50a = Tokenizer.sampleForTraining(docs, "text", 0.5)
    val s50b = Tokenizer.sampleForTraining(docs, "text", 0.5)
    val s20 = Tokenizer.sampleForTraining(docs, "text", 0.2)
    assert(s50a.count() == s50b.count())
    assert(s20.join(s50a, Seq("doc_id"), "left_anti").count() == 0,
      "smaller fraction must select a subset of the larger one")
    val frac = s50a.count().toDouble / total
    assert(frac > 0.35 && frac < 0.65, s"0.5 sample selected $frac")
    // a different seed picks a different subset (content-keyed, not
    // row-position-keyed)
    val other = Tokenizer.sampleForTraining(docs, "text", 0.5, seed = 7L)
    assert(other.join(s50a, Seq("doc_id"), "left_anti").count() > 0)

    // merge agreement: the sampled vocabulary must largely rediscover
    // the full-corpus merges...
    val N = 64
    val full = Tokenizer.trainBpeMerges(docs, "text", numMerges = N).toSeq
    val sampled = Tokenizer.trainBpeMerges(s50a, "text", numMerges = N).toSeq
    val overlap = full.toSet.intersect(sampled.toSet).size.toDouble / N
    assert(overlap >= 0.70, s"top-$N merge overlap $overlap < 0.70")
    // ...and the tokenization it induces must hold the corpus-wide
    // token count (the budget everything downstream is priced in)
    val fullTok = docs.select(
      sum(Tokenizer.bpeCount(full)(col("text")))).head.getLong(0)
    val sampTok = docs.select(
      sum(Tokenizer.bpeCount(sampled)(col("text")))).head.getLong(0)
    val drift = math.abs(fullTok - sampTok).toDouble / fullTok
    assert(drift <= 0.02, s"token-count drift $drift > 2% " +
      s"(full=$fullTok sampled=$sampTok)")
  }
}
