package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{SketchExpressions, TextExpressions}

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  // planted corpus: t100 shares the eval doc's exact text, t101 shares
  // one 3-gram span ("over the lazy"), t102 shares nothing
  private val evalDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
    .toDF("doc_id", "text")
  private val trainDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "a cat stepped over the lazy dog yesterday"),
    (102L, "completely disjoint vocabulary sentence here now"))
    .toDF("doc_id", "text")

  test("bloom decontamination finds exactly the exact-overlap result") {
    val out = Decontaminate.bloomContaminatedDocs(
      trainDocs, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 100: 7 distinct 3-grams, all shared; doc 101 shares
    // "over the lazy" and "the lazy dog"; doc 102 absent
    assert(out == Map(100L -> 7L, 101L -> 2L))
  }

  test("bloom prefilter output stays exact even at absurd fpp") {
    // fpp ~50%: the Bloom passes many false positives; the verify
    // join must still reduce to the exact overlap
    val loose = Decontaminate.bloomContaminatedDocs(
      trainDocs, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 10, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose == Map(100L -> 7L, 101L -> 2L))
  }

  test("bloom expression: members always hit; interpreted equals codegen") {
    val grams = evalDocs.select(
      explode(TextExpressions.sorted_shingle_hashes(col("text"), 3)).as("g"))
    val bytes = SketchExpressions.buildLongBloom(grams, "g", 100)
    // no false negatives: every inserted hash must probe true
    val hits = grams
      .filter(SketchExpressions.bloom_might_contain_long(bytes, col("g")))
      .count()
    assert(hits == grams.count())
    // interpreted eval agrees with the DataFrame (codegen) path
    val sample = grams.limit(3).as[Long].collect()
    sample.foreach { h =>
      val e = SketchExpressions.BloomMightContainLong(bytes,
        org.apache.spark.sql.catalyst.expressions.Literal(h))
      assert(e.eval(null) == true)
    }
  }

  test("bloom expression survives java serialization (how plans ship to executors)") {
    import java.io._
    val grams = evalDocs.select(
      explode(TextExpressions.sorted_shingle_hashes(col("text"), 3)).as("g"))
    val bytes = SketchExpressions.buildLongBloom(grams, "g", 100)
    val h = grams.limit(1).as[Long].collect().head
    val e = SketchExpressions.BloomMightContainLong(bytes,
      org.apache.spark.sql.catalyst.expressions.Literal(h))
    val buf = new ByteArrayOutputStream()
    new ObjectOutputStream(buf).writeObject(e)
    val back = new ObjectInputStream(new ByteArrayInputStream(buf.toByteArray))
      .readObject().asInstanceOf[SketchExpressions.BloomMightContainLong]
    assert(back.eval(null) == true)
  }

  test("hot spans: corpus-wide frequent grams counted per doc") {
    // "over the lazy" + "the lazy dog" appear in eval1, t100, t101 ->
    // df=3 with a combined corpus; threshold 3 flags exactly those
    val corpus = evalDocs.unionByName(trainDocs)
    val out = Decontaminate.hotSpanDocs(corpus, "doc_id", "text",
      gramSize = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 100L, 101L))
    // each of the three docs contains both hot grams, and doc 1/100
    // share the rest of the sentence only pairwise (df=2, below bar)
    assert(out.values.toSet == Set(2L))
  }

  test("contaminated spans: maximal runs with correct offsets and widths") {
    val out = Decontaminate.contaminatedSpans(
      trainDocs, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 1024)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // t100 == eval1: one run over all 7 gram positions -> 9 words;
    // t101 matches "over the lazy"+"the lazy dog" at pos 3,4 -> 4 words
    assert(out == Set((100L, 1L, 0, 9L), (101L, 1L, 3, 4L)))
  }

  test("contaminated spans: disjoint runs yield separate spans") {
    val train = Seq((200L, "the quick brown fox QQ ZZ WW over the lazy dog"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminatedSpans(
      train, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 1024)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // "the quick brown"+"quick brown fox" at pos 0,1 -> 4 words;
    // "over the lazy"+"the lazy dog" at pos 7,8 -> 4 words
    assert(out == Set((200L, 1L, 0, 4L), (200L, 1L, 7, 4L)))
  }

  test("contaminated spans: short-doc whole-text gram reports the k-bound span") {
    val shortEval = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val shortTrain = Seq((100L, "tiny doc"), (101L, "other text"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminatedSpans(
      shortTrain, shortEval, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // one whole-text gram at pos 0; span_words = k by the documented
    // upper-bound contract (the doc has only 2 words)
    assert(out == Set((100L, 1L, 0, 3L)))
  }

  test("span char offsets slice exactly the contaminated tokens") {
    val spans = Decontaminate.contaminatedSpans(
      trainDocs, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 1024)
    val out = Decontaminate.spanCharOffsets(spans, trainDocs, "doc_id", "text")
      .collect()
    val texts = trainDocs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.split("\\s+").toSeq).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val toks = texts(r.getAs[Long]("train_id"))
      val normalized = toks.mkString(" ")
      val start = r.getAs[Long]("span_start").toInt
      val words = r.getAs[Long]("span_words").toInt
      val sliced = normalized.substring(r.getAs[Long]("char_start").toInt,
        r.getAs[Long]("char_start").toInt + r.getAs[Long]("char_len").toInt)
      assert(sliced == toks.slice(start, start + words).mkString(" "),
        s"bad slice for $r")
    }
  }

  test("excise cuts merged spans, keeps clean docs, and audits the cut") {
    val spans = Decontaminate.contaminatedSpans(
      trainDocs, evalDocs, "doc_id", "text", gramSize = 3,
      expectedEvalGrams = 1024)
    val out = Decontaminate.excise(trainDocs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 100 is wholly contaminated (exact copy of eval doc 1): the
    // single merged span covers everything -> empty cleaned text
    assert(out(100L) == (("",
      "the quick brown fox jumps over the lazy dog".length, 1L)))
    // doc 101 shares the run "over the lazy dog": those four tokens
    // (one merged region) disappear, the rest survives single-spaced
    assert(out(101L) == (("a cat stepped yesterday",
      "over the lazy dog ".length, 1L)))
    // doc 102 shares nothing: normalized text intact, zero audit
    assert(out(102L) ==
      (("completely disjoint vocabulary sentence here now", 0L, 0L)))
  }

  test("excise merges overlapping spans from different eval docs") {
    // two eval docs overlap the same train region at offset 1: spans
    // [1,4) and [2,5) in gram coords -> token intervals [1,6) and
    // [2,7) merge into ONE region covering tokens 1..6
    val ev = Seq(
      (1L, "b c d e f"),
      (2L, "c d e f g")).toDF("doc_id", "text")
    val tr = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val spans = Decontaminate.contaminatedSpans(tr, ev, "doc_id", "text",
      gramSize = 3, expectedEvalGrams = 1024)
    val out = Decontaminate.excise(tr, spans, "doc_id", "text").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(1) == "a h")
    assert(r.getLong(3) == 1L, "overlapping spans must merge to one region")
    assert(r.getLong(2) == "a b c d e f g h".length - "a h".length)
  }

  test("hot-span excision keeps the min-id owner, cuts every other copy") {
    // the 3-gram "x y z" appears in docs 1,2,3 (minDocs=3 -> hot);
    // doc 1 is the owner and keeps it; docs 2 and 3 lose the run.
    // "p q r" appears only twice -> below threshold, never cut.
    val docs = Seq(
      (1L, "x y z alpha beta"),
      (2L, "gamma x y z delta"),
      (3L, "x y z p q r"),
      (4L, "p q r epsilon zeta"),
      (5L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Decontaminate.hotSpanExcision(docs, "doc_id", "text",
      gramSize = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("x y z alpha beta", 0L, 0L)), "owner untouched")
    assert(out(2L) == (("gamma delta", "x y z ".length.toLong, 1L)))
    assert(out(3L) == (("p q r", "x y z ".length.toLong, 1L)))
    assert(out(4L) == (("p q r epsilon zeta", 0L, 0L)),
      "below-threshold gram never cut")
    assert(out(5L) == (("nothing shared here at all", 0L, 0L)))
  }

  test("hot-span excision merges runs of consecutive hot grams") {
    // docs 1..3 share the 5-token run "a b c d e": grams [a b c],
    // [b c d], [c d e] are all hot; in non-owner docs the three
    // consecutive positions merge into ONE five-word span
    val docs = Seq(
      (10L, "a b c d e tail1 tail2"),
      (11L, "head1 a b c d e tail3"),
      (12L, "head2 head3 a b c d e")).toDF("doc_id", "text")
    val out = Decontaminate.hotSpanExcision(docs, "doc_id", "text",
      gramSize = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) == (("a b c d e tail1 tail2", 0L, 0L)))
    assert(out(11L) == (("head1 tail3", "a b c d e ".length.toLong, 1L)))
    assert(out(12L) == (("head2 head3", " a b c d e".length.toLong, 1L)))
  }

  test("bloom clean gate: conservative, and identical on batch and stream") {
    // batch: doc 102 is the only one sharing no gram with eval
    val kept = Decontaminate.bloomCleanDocs(trainDocs, evalDocs, "text",
      gramSize = 3, expectedEvalGrams = 1024)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(102L))
    // stream: same call on a MemoryStream, append mode, no state
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Decontaminate.bloomCleanDocs(
        mem.toDF().toDF("doc_id", "text"), evalDocs, "text",
        gramSize = 3, expectedEvalGrams = 1024)
      .writeStream.format("memory").queryName("clean_out")
      .outputMode("append").start()
    mem.addData((100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "a cat stepped over the lazy dog yesterday"),
      (102L, "completely disjoint vocabulary sentence here now"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("clean_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(102L))
  }

  test("hot spans: nothing flagged below the doc-frequency bar") {
    // within trainDocs alone the most shared gram sits in 2 docs
    val out = Decontaminate.hotSpanDocs(trainDocs, "doc_id", "text",
      gramSize = 3, minDocs = 3)
    assert(out.count() == 0)
  }

  // ---- exact duplicate-substring dedup (dd23) ----------------------

  private val boiler =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("duplicateSubstringExcision cuts a long shared run everywhere " +
      "but the min-id owner") {
    val corpus = Seq(
      (10L, s"unique opening words here $boiler and a unique ten tail"),
      (11L, s"different lead in tokens $boiler plus another closing run"),
      (12L, s"third document begins offbeat $boiler ends on its own")
    ).toDF("doc_id", "text")
    val out = Decontaminate.duplicateSubstringExcision(
        corpus, "doc_id", "text", anchorWords = 4, minChars = 40)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // owner (min id 10) keeps its text whole
    assert(out(10L)._3 == 0L && out(10L)._4 == 0L)
    assert(out(10L)._2.contains(boiler))
    // every other doc loses exactly the boilerplate span (plus its
    // separator) and keeps its own head/tail words
    Seq(11L, 12L).foreach { id =>
      val (_, clean, removed, n) = out(id)
      assert(n == 1L, s"doc $id spans: $n")
      assert(!clean.contains("alpha"), s"doc $id kept boilerplate")
      assert(removed == boiler.length + 1, s"doc $id removed $removed")
    }
    assert(out(11L)._2 == "different lead in tokens plus another closing run")
    assert(out(12L)._2 == "third document begins offbeat ends on its own")
  }

  test("duplicateSubstringExcision leaves short overlaps and " +
      "within-doc repeats alone") {
    val corpus = Seq(
      // docs 20/21 share only "over the lazy dog" (17 chars < 40)
      (20L, "the quick brown fox jumps over the lazy dog in one corpus"),
      (21L, "a cat stepped over the lazy dog while nobody was watching it"),
      // doc 22 repeats its own long phrase — within-doc only, df = 1
      (22L, s"$boiler then some middle padding words then $boiler again")
    ).toDF("doc_id", "text")
    val out = Decontaminate.duplicateSubstringExcision(
        corpus, "doc_id", "text", anchorWords = 4, minChars = 40)
      .as[(Long, String, Long, Long)].collect()
    out.foreach { case (id, _, removed, n) =>
      assert(removed == 0L && n == 0L, s"doc $id was cut: $removed chars")
    }
  }

  test("duplicateSubstringExcision merges adjacent qualifying spans " +
      "and counts them once") {
    val b2 = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (30L, s"owner doc one holds $boiler bridge $b2 closing words here"),
      // same two long spans with the SAME one-word bridge: anchors
      // chain straight through the bridge into ONE island
      (31L, s"second doc leads with $boiler bridge $b2 then wraps up"),
      (32L, s"owner of nothing at all with fully distinct text body")
    ).toDF("doc_id", "text")
    val out = Decontaminate.duplicateSubstringExcision(
        corpus, "doc_id", "text", anchorWords = 4, minChars = 40)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(30L)._3 == 0L)
    val (_, clean, removed, n) = out(31L)
    assert(n == 1L, s"expected one merged span, got $n")
    assert(removed == (boiler.length + "bridge".length + b2.length + 3))
    assert(clean == "second doc leads with then wraps up")
  }

  test("memorizationAudit: planted verbatim span, fully novel doc, hit counts") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five")).toDF("doc_id", "text")
    val gen = Seq(
      // 6 verbatim corpus words inside novel context: 3-grams at
      // positions 2..5 hit -> run 4, span = 4 + 2 = 6 words
      (1L, "novel words beta gamma delta epsilon zeta eta fresh tail"),
      // nothing shared
      (2L, "completely unseen vocabulary everywhere here"),
      // the whole doc IS a corpus line: every gram hits, novelty 0
      (3L, "one two three four five")).toDF("doc_id", "text")
    val out = graft.operators.Decontaminate
      .memorizationAudit(gen, corpus, "doc_id", "text", gramSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out(1L) == ((8L, 4L, 0.5, 6L)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 1.0, 0L)))
    assert(out(3L) == ((3L, 3L, 0.0, 5L)))
  }

  test("paraphraseAudit flags a 1-edit-per-20-words copy that the " +
      "verbatim audit under-counts; novel text stays unflagged") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i")
    val corpus = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    // near-verbatim: words 20, 40, 60 edited (1 edit per 20 words)
    val edited = words.zipWithIndex.map { case (w, i) =>
      if ((i + 1) % 20 == 0) "zzz" else w }.mkString(" ")
    // novel: same vocabulary, order destroyed
    val novel = words.reverse.mkString(" ")
    val gen = Seq((1L, edited), (2L, novel)).toDF("doc_id", "text")
    val out = Decontaminate
      .paraphraseAudit(gen, corpus, "doc_id", "text", gramSize = 5, window = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val (nFp, nHit, frac, flagged) = out(1L)
    assert(flagged && frac >= 0.5 && nHit > 0 && nHit < nFp,
      s"paraphrase should flag with partial overlap, got ${out(1L)}")
    val (_, novHit, novFrac, novFlag) = out(2L)
    assert(!novFlag && novHit == 0L && novFrac == 0.0, s"got ${out(2L)}")
    // the contrast that motivates mem2: the VERBATIM audit sees only
    // the between-edit runs (max 19-word span over 60 words), while
    // the fingerprint audit attributes the doc as majority-memorized
    val verbatim = Decontaminate
      .memorizationAudit(gen, corpus, "doc_id", "text", gramSize = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(verbatim(1L) <= 19L,
      s"verbatim max span should stop at the edits, got ${verbatim(1L)}")
  }

  test("paraphraseSpans merges across edit holes into one span; " +
      "isolated matches die under the support filter") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i")
    val corpus = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val edited = words.zipWithIndex.map { case (w, i) =>
      if ((i + 1) % 20 == 0) "zzz" else w }.mkString(" ")
    // one corpus 5-gram planted inside otherwise-novel text: a single
    // fingerprint's worth of support, below minFps
    val isolated = "a1 b2 c3 " + words.slice(5, 10).mkString(" ") +
      " d4 e5 f6 g7 h8 i9 j0 k1 l2 m3"
    val gen = Seq((1L, edited), (2L, isolated)).toDF("doc_id", "text")
    val spans = Decontaminate.paraphraseSpans(gen, corpus, "doc_id", "text",
      gramSize = 5, window = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // the edits punch holes <= tolerance, so the paraphrase reports
    // ONE span covering (nearly) the whole doc, not three fragments
    val g1 = spans.filter(_._1 == 1L)
    assert(g1.length == 1, s"expected one merged span, got ${g1.toSeq}")
    assert(g1(0)._2 <= 5 && g1(0)._3 >= 45, s"span too narrow: ${g1(0)}")
    // the isolated hit has < minFps fingerprints -> no span at all
    assert(!spans.exists(_._1 == 2L), spans.toSeq.toString)
  }

  test("paraphraseAudit flag threshold is a rational knob, compared in integers") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i")
    val corpus = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val edited = words.zipWithIndex.map { case (w, i) =>
      if ((i + 1) % 20 == 0) "zzz" else w }.mkString(" ")
    val gen = Seq((1L, edited)).toDF("doc_id", "text")
    def flagged(num: Int, den: Int): Boolean =
      Decontaminate.paraphraseAudit(gen, corpus, "doc_id", "text",
        gramSize = 5, window = 4, flagNum = num, flagDen = den)
        .collect()(0).getBoolean(4)
    assert(flagged(1, 2))    // majority: the paraphrase flags
    assert(!flagged(99, 100)) // near-exact bar: 3 edits keep it under 99%
    assert(intercept[IllegalArgumentException](flagged(3, 2))
      .getMessage.contains("threshold"))
  }

  test("promptCompletionPairs: banded deterministic boundary, lossless parts") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = graft.operators.Chunking.promptCompletionPairs(
      Seq((7L, doc), (8L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    val (app, n, cut, prompt, completion) = out(7L)
    assert(app && n == 10 && cut >= 2 && cut <= 8) // the 20-80% band
    assert(prompt.split(" ").length.toLong == cut) // boundary == prompt tokens
    assert(s"$prompt $completion" == doc)          // lossless split
    val (app1, _, cut1, p1, c1) = out(8L)
    assert(!app1 && cut1 == 1 && p1 == "solo" && c1.isEmpty)
    // non-numeric id fails at construction, not with null rows
    assert(intercept[IllegalArgumentException](
      graft.operators.Chunking.promptCompletionPairs(
        Seq(("u1", doc)).toDF("doc_id", "text"), "doc_id", "text"))
      .getMessage.contains("numeric"))
  }
}
