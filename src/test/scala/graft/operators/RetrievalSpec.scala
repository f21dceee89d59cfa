package graft.operators

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (4L, "banana banana banana"))
    .toDF("doc_id", "text")

  test("invertedIndex: exact df/total_tf, postings capped at the smallest ids") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(idx("apple") == ((2L, 3L, "1,3")))
    assert(idx("banana") == ((3L, 5L, "1,2"))) // df=3 but postings capped to 2
    assert(idx("cherry") == ((2L, 3L, "2,3")))
    assert(idx("date") == ((1L, 1L, "3")))
  }

  test("bm25: rare terms outrank common ones; term-free docs absent") {
    // 'date' is rare (df=1), 'banana' common (df=3)
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("date", "banana"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // every doc has a term here
    // doc 3 holds the rare term once; doc 2 the common term once, and
    // doc 2 is SHORTER — rarity must still dominate the length boost
    assert(out(3L)._1 > out(2L)._1)
    assert(out(3L)._2 == 1L && out(4L)._2 == 1L)
    val none = Retrieval.bm25(docs.filter($"doc_id" === 2L), "doc_id", "text",
      Seq("date"))
    assert(none.count() == 0)
  }

  test("bm25 rejects un-normalized query terms") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(docs, "doc_id", "text", Seq("Apple "))
    }
  }

  test("pmiPairs: collocation scores above independent pair; window honored") {
    // "new york" always adjacent; "the" twice as frequent as either, so
    // (york, the) co-occurs just as often but with half the PMI
    val corpus = Seq.tabulate(20)(i =>
      (i.toLong, s"new york the p$i q$i the"))
      .toDF("id", "text")
    val out = Retrieval.pmiPairs(corpus, "text", window = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("new", "york"))._1 == 20L)
    assert(!out.contains(("the", "the"))) // 3 positions apart, window 2
    assert(!out.contains(("york", "new"))) // directed: a strictly before b
    // perfect collocation beats the common-word pair: exact PMIs are
    // ln 4 vs ln 2 (n_tok=120, n_pairs=180, n_the = 2 * n_york)
    assert(out(("new", "york"))._2 > out(("york", "the"))._2)
    assert(math.abs(out(("new", "york"))._2 - math.log(4)) < 1e-3)
    assert(math.abs(out(("york", "the"))._2 - math.log(2)) < 1e-3)
  }

  test("rrfFuse: agreement across retrievers beats a single #1; " +
      "singleton lists fuse; ties break by doc id") {
    // retriever A: doc 10 first, doc 20 second, doc 30 third
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    // retriever B: doc 20 first, doc 30 second; never saw doc 10
    val b = Seq((1L, 20L, 1), (1L, 30L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // doc 20: 1/62 + 1/61 beats doc 10's lone 1/61; doc 30: 1/63 + 1/62
    assert(fused.map(_._1).toSeq == Seq(20L, 30L, 10L))
    assert(math.abs(fused(0)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(math.abs(fused(2)._2 - 1.0 / 61) < 1e-6)
    // exact tie (same ranks from both retrievers) -> smaller doc id
    val c = Seq((7L, 5L, 1), (7L, 3L, 2)).toDF("query_id", "neighbor_id", "rank")
    val d = Seq((7L, 3L, 1), (7L, 5L, 2)).toDF("query_id", "neighbor_id", "rank")
    val tied = Retrieval.rrfFuse(Seq(c, d), k0 = 60, topK = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(tied == Seq(3L, 5L))
  }

  test("rankingMetrics: MRR from first hit, binary nDCG, zero-hit queries") {
    val ranking = Seq(
      (1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), (1L, 14L, 4), (1L, 15L, 5),
      (2L, 21L, 1), (2L, 22L, 2),
      (3L, 31L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val rel = Seq(
      (1L, 12L), (1L, 14L), (1L, 99L),   // hits at ranks 2 and 4; one outside
      (2L, 77L))                          // q2: relevant exists, none retrieved
      .toDF("query_id", "neighbor_id")   // q3: no relevance rows -> absent
    val out = Retrieval.rankingMetrics(ranking, rel, k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel") == 3L)
    assert(q1.getAs[Long]("first_rel_rank") == 2L)
    assert(q1.getAs[Double]("mrr") == 0.5)
    val dcg = 1.0 / log2(3.0) + 1.0 / log2(5.0)
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(q1.getAs[Double]("ndcg") == r6(dcg / idcg))
    val q2 = out(2L)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Double]("mrr") == 0.0 && q2.getAs[Double]("ndcg") == 0.0)
    assert(!out.contains(3L))
  }

  test("phraseMatch: consecutive only, overlaps counted, short docs safe") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),          // one match at pos 2
      (2L, "cat on sat"),                      // words present, NOT consecutive
      (3L, "a cat sat then cat sat again"),    // two matches, first at 2
      (4L, "cat sat"),                         // exact-length doc
      (5L, "x x x CAT  SAT x"),                // case + multi-space normalize
      (6L, "cat"),                             // shorter than the phrase
      (7L, ""))                                // empty
      .toDF("doc_id", "text")
    val out = Retrieval.phraseMatch(docs, "doc_id", "text", Seq("cat", "sat"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((1L, 2L)), 3L -> ((2L, 2L)),
      4L -> ((1L, 1L)), 5L -> ((1L, 4L))))
    // self-overlapping phrase: "a a a" has "a a" at 1 and 2
    val ov = Retrieval.phraseMatch(Seq((9L, "a a a")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a", "a")).collect()(0)
    assert(ov.getLong(1) == 2L && ov.getLong(2) == 1L)
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatch(docs, "doc_id", "text", Seq("Cat"))
    }
  }
}
