package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("fraction sampling is deterministic and approximately sized") {
    val a = Sampling.byFraction(docs, "doc_id", 0.3).select("doc_id").collect().toSet
    val b = Sampling.byFraction(docs, "doc_id", 0.3).select("doc_id").collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 150) < 40) // 500 docs * 0.3 ± sampling noise
    // nested property: smaller fraction is a subset of larger
    val c = Sampling.byFraction(docs, "doc_id", 0.1).select("doc_id").collect().toSet
    assert(c.subsetOf(a))
  }

  test("stratified sampling returns exactly n per stratum") {
    val out = Sampling.stratified(docs, "doc_id", Seq("lang"), 5)
    val counts = out.groupBy("lang").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5))
    // deterministic: same rows each run
    assert(out.select("doc_id").collect().toSet ==
      Sampling.stratified(docs, "doc_id", Seq("lang"), 5).select("doc_id").collect().toSet)
  }

  test("mixture keeps configured per-source fractions and drops unlisted") {
    val out = Sampling.mixture(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5))
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0Total = docs.filter("source = 'src0'").count()
    assert(bySource("src0") == src0Total)
    assert(bySource.get("src2").isEmpty)
    assert(bySource("src1") > 0 && bySource("src1") < docs.filter("source = 'src1'").count())
  }

  test("temperature weights: alpha interpolates natural -> uniform") {
    // skewed corpus (the sf corpora are uniform per source, which
    // would make the interpolation degenerate): 80/16/4
    val skewed = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 96).map(i => (i.toLong, "mid")) ++
      (97 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    def weights(alpha: Double) =
      Sampling.temperatureWeights(skewed, "source", alpha)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val natural = weights(1.0)
    val uniform = weights(0.0)
    val smoothed = weights(0.5)
    // alpha=1 reproduces the corpus distribution; alpha=0 is uniform
    assert(natural("big") == ((80L, 0.8)))
    assert(natural("small") == ((4L, 0.04)))
    uniform.values.foreach { case (_, w) =>
      assert(math.abs(w - 1.0 / 3) < 1e-5) }
    // every alpha normalizes to 1
    Seq(natural, uniform, smoothed).foreach { ws =>
      assert(math.abs(ws.values.map(_._2).sum - 1.0) < 1e-4) }
    // 0 < alpha < 1 up-weights small sources, down-weights large ones
    assert(smoothed("small")._2 > natural("small")._2)
    assert(smoothed("big")._2 < natural("big")._2)
    // sqrt weights exactly: sqrt(80)/(sqrt(80)+sqrt(16)+sqrt(4)) etc.
    val denom = math.sqrt(80) + 4 + 2
    assert(math.abs(smoothed("big")._2 - math.sqrt(80) / denom) < 1e-5)
  }

  test("token budgets: exclusive cutoff, supply cap, zero budget, bucket invariance") {
    // 10 docs x 10 tokens per source; text of i repeated tokens
    val corpus = (for {
      src <- Seq("A", "B", "C", "D"); i <- 1 to 10
    } yield (src.hashCode.toLong * 100 + i, src, 10L))
      .toDF("doc_id", "source", "n_tokens")
    def run(buckets: Int) = Sampling.tokenBudgetMixture(corpus, "doc_id",
      "source", "n_tokens", Map("A" -> 35L, "B" -> 9999L, "C" -> 0L),
      buckets = buckets)
    val out = run(buckets = 7)
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // budget 35 with 10-token docs: exclusive cums 0,10,20,30 pass ->
    // 4 docs / 40 tokens (the crossing doc is included)
    assert(bySrc("A") == ((4L, 40L)))
    assert(bySrc("B") == ((10L, 100L))) // budget exceeds supply: all kept
    assert(!bySrc.contains("C")) // zero budget keeps nothing
    assert(!bySrc.contains("D")) // unlisted source drops
    // bucketing never changes the result (exactness is boundary-free)
    assert(out.select("doc_id", "cum_tokens").collect().toSet ==
      run(buckets = 1).select("doc_id", "cum_tokens").collect().toSet)
    // kept set is the hash-order prefix: the kept A-docs are exactly
    // the 4 smallest by (idHash, id)
    val keptA = out.filter($"source" === "A").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val orderedA = corpus.filter($"source" === "A")
      .withColumn("__h", Sampling.idHash($"doc_id"))
      .orderBy($"__h", $"doc_id").select("doc_id")
      .collect().map(_.getLong(0)).take(4).toSet
    assert(keptA == orderedA)
  }

  test("leakage-safe splits keep every near-dup cluster on one side") {
    val corpus = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components {1,2,3} and {40,41}; everything else unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (40L, 41L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplits(corpus, "doc_id", pairs, 0.5, 0.25)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    assert(Set(out(1L), out(2L), out(3L)).size == 1) // one side, whole cluster
    assert(out(40L) == out(41L))
    // unpaired docs follow the plain holdout assignment exactly
    val train = Sampling.holdout(corpus, "doc_id", "train", 0.5, 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val unpaired = out.keySet -- Set(1L, 2L, 3L, 40L, 41L)
    unpaired.foreach { id =>
      assert((out(id) == "train") == train.contains(id), s"id=$id") }
    // cluster members take the ROOT's split: root 1 drives 2 and 3
    assert(out(2L) == out(1L) && out(3L) == out(1L))
  }

  test("weighted sample equals the A-ES reference model; zero weights excluded") {
    import java.security.MessageDigest
    val rows = (1 to 200).map(i => (i.toLong, if (i % 50 == 0) 0L else i.toLong))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), k = 20)
      .collect().map(_.getLong(0)).toSeq
    // reference: same md5 draw, same priority, top 20
    def priority(id: Long, w: Long): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"graft:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1.152921504606847e18
      math.log(u) / w
    }
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) => (priority(id, w), id) }
      .sortBy { case (p, id) => (-p, id) }.take(20).map(_._2)
    assert(got == want)
    assert(!got.exists(_ % 50 == 0), "zero-weight rows can never be drawn")
    // determinism under repartition
    val again = Sampling.weightedSample(df.repartition(7), "id", col("w"), 20)
      .collect().map(_.getLong(0)).toSeq
    assert(again == got)
  }

  test("holdout splits partition the corpus without overlap") {
    val train = Sampling.holdout(docs, "doc_id", "train", 0.8, 0.1).select("doc_id").collect().toSet
    val valid = Sampling.holdout(docs, "doc_id", "valid", 0.8, 0.1).select("doc_id").collect().toSet
    val test0 = Sampling.holdout(docs, "doc_id", "test", 0.8, 0.1).select("doc_id").collect().toSet
    assert(train.intersect(valid).isEmpty && valid.intersect(test0).isEmpty)
    assert(train.size + valid.size + test0.size == docs.count())
    assertThrows[IllegalArgumentException](Sampling.holdout(docs, "doc_id", "dev"))
  }

  test("temporalSplit drops the embargo window entirely") {
    import org.apache.spark.sql.functions.{expr, lit}
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-10 00:00:00")), // train
      (2L, ts("2024-01-20 00:00:00")), // embargo (at cutoff) -> dropped
      (3L, ts("2024-01-21 23:59:59")), // embargo -> dropped
      (4L, ts("2024-01-22 00:00:00"))) // test (gap boundary inclusive)
      .toDF("id", "ts")
    val out = Sampling.temporalSplit(df, "ts",
      lit("2024-01-20").cast("timestamp"), expr("INTERVAL 2 DAYS"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(out == Map(1L -> "train", 4L -> "test"))
  }

  test("leaveLastOut holds out each key's most recent rows") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 9L))
      .toDF("u", "ord")
    val out = Sampling.leaveLastOut(df, Seq("u"), Seq("ord"), lastN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out((1L, 3L)) == "test" && out((1L, 1L)) == "train"
      && out((1L, 2L)) == "train")
    assert(out((2L, 9L)) == "test") // a 1-row key is all test at lastN=1
  }

  test("curriculumOrder: bands are contiguous easiest-first, ranks are a permutation") {
    val df = (0L until 200L).map(i => (i, (i % 4) * 100 + 50)).toDF("doc_id", "n_chars")
    val out = Sampling.curriculumOrder(df, "doc_id",
      org.apache.spark.sql.functions.expr("n_chars div 100"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq == (1L to 200L))
    // band blocks: all band-0 ranks precede all band-1 ranks, etc.
    val byBand = out.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    for (b <- 0L to 2L)
      assert(byBand(b).max < byBand(b + 1).min, s"band $b not before ${b + 1}")
    // within a band the order is the id-hash shuffle, not id order
    val b0ByRank = out.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(b0ByRank != b0ByRank.sorted)
  }

  test("curriculumOrder rejects out-of-range bands and ids loudly") {
    val bad = Seq((1L, 999L)).toDF("doc_id", "band")
    intercept[Exception] {
      Sampling.curriculumOrder(bad, "doc_id",
        org.apache.spark.sql.functions.col("band")).collect()
    }
    val badId = Seq(((1L << 26) + 5L, 1L)).toDF("doc_id", "band")
    intercept[Exception] {
      Sampling.curriculumOrder(badId, "doc_id",
        org.apache.spark.sql.functions.col("band")).collect()
    }
  }
}

class EpochShuffleSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("every epoch is a complete permutation, dealt into shards") {
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
    val n = docs.count()
    // each epoch holds every doc exactly once
    val perEpoch = out.groupBy("epoch").agg(
      count(lit(1)).as("n"), countDistinct("doc_id").as("d")).collect()
    assert(perEpoch.length == 2)
    perEpoch.foreach(r => assert(r.getLong(1) == n && r.getLong(2) == n))
    // positions are contiguous 1..len within each (epoch, shard)
    val bad = out.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), max("position").as("mx"), min("position").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
  }

  test("epochs get genuinely different orders; runs are identical") {
    val out = Sampling.epochShuffle(docs, "doc_id", 2, 1)
    val order0 = out.filter("epoch = 0").orderBy("position")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val order1 = out.filter("epoch = 1").orderBy("position")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order0 != order1)            // reshuffled between epochs
    assert(order0.toSet == order1.toSet) // same membership
    val again = Sampling.epochShuffle(docs, "doc_id", 2, 1)
      .filter("epoch = 0").orderBy("position")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order0 == again)             // reproducible
  }
}

class TextNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("canonical form: lowercase, punctuation-free, collapsed whitespace") {
    val out = Seq("  Héllo,   WORLD!!  (graft) \t 42 ", "中文，测试。")
      .toDF("t").select(TextNormalize.canonical(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "héllo world graft 42")
    assert(out(1) == "中文测试")
  }

  test("stripControl deletes control chars; canonical turns them into separators") {
    val out = Seq("a\u0000b\u001fc").toDF("t")
      .select(TextNormalize.stripControl(col("t"))).first().getString(0)
    assert(out == "abc")
    val can = Seq("line one\nline two\u0000three").toDF("t")
      .select(TextNormalize.canonical(col("t"))).first().getString(0)
    assert(can == "line one line two three")
  }

  test("unicodeNormalize composes combining marks (NFC) and folds compatibility forms (NFKC)") {
    val df = Seq("e\u0301 A\u030A").toDF("t")
    val nfc = df.select(TextNormalize.unicodeNormalize(col("t"))).first().getString(0)
    assert(nfc == "\u00e9 \u00c5")   // composed forms
    assert(nfc.length == 3)             // 5 codepoints -> 3
    // NFKC additionally folds compatibility characters (ﬁ -> fi)
    val nfkc = Seq("ﬁle").toDF("t")
      .select(TextNormalize.unicodeNormalize(col("t"), "NFKC")).first().getString(0)
    assert(nfkc == "file")
    // NFC leaves the ligature alone
    val nfcLig = Seq("ﬁle").toDF("t")
      .select(TextNormalize.unicodeNormalize(col("t"))).first().getString(0)
    assert(nfcLig == "ﬁle")
    // nulls stay null
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextNormalize.unicodeNormalize(col("t"))).first()
    assert(n.isNullAt(0))
  }

  test("extractText: drops code blocks, breaks words at tags, decodes entities once") {
    val html = "<html><head><script>if(1<2&&3>0){x('</div>');}</script>" +
      "<style>p{color:red}</style></head><body><!-- hidden -->" +
      "<p>a</p><p>b</p>R&amp;D &lt;tag&gt; &amp;amp; &quot;q&quot;&nbsp;&#39;s&#39;</body></html>"
    val out = Seq(html).toDF("t")
      .select(TextNormalize.extractText(col("t"))).first().getString(0)
    // script content (incl. its < > operators and fake close tag) gone;
    // adjacent <p> blocks don't fuse; &amp;amp; decodes exactly once
    assert(out == "a b R&D <tag> &amp; \"q\" 's'")
    // plain text untouched beyond whitespace collapse
    val plain = Seq("no   markup here").toDF("t")
      .select(TextNormalize.extractText(col("t"))).first().getString(0)
    assert(plain == "no markup here")
    // nulls stay null
    assert(Seq(Option.empty[String]).toDF("t")
      .select(TextNormalize.extractText(col("t"))).first().isNullAt(0))
  }

  test("extractLinks: order, quote styles, case-blind attr, kind classes") {
    val html = "<a href=\"https://Ex.com/A\">1</a><A HREF='/rel/b'>2</A>" +
      "<a title=\"x\" href=\"#frag\">3</a><a href=\"//cdn.ex/l.js\">4</a>" +
      "<a href=\"mailto:x@y.z\">5</a><p>no links here</p>"
    val out = TextNormalize.extractLinks(
      Seq((7L, html), (8L, "<p>none</p>")).toDF("id", "h"), "id", "h")
      .orderBy("doc", "link_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (7L, 1L, "https://Ex.com/A", "absolute"),
      (7L, 2L, "/rel/b", "relative"),
      (7L, 3L, "#frag", "fragment"),
      (7L, 4L, "//cdn.ex/l.js", "protocol-relative"),
      (7L, 5L, "mailto:x@y.z", "relative")))   // no-links doc absent
  }

  test("word-boundary truncation never splits words") {
    val df = Seq("the quick brown fox", "supercalifragilistic", "short")
      .toDF("t").select(TextNormalize.truncateAtWord(col("t"), 12).as("o"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "the quick")       // cut at last space within 12
    val exact = Seq("hi bye now").toDF("t")
      .select(TextNormalize.truncateAtWord(col("t"), 6)).first().getString(0)
    assert(exact == "hi bye")           // boundary exactly at n: keep the word
    assert(out(1) == "supercalifra")    // single overlong token: hard cut
    assert(out(2) == "short")           // under limit: untouched
  }
}
