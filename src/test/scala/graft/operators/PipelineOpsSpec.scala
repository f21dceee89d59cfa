package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the round-3 pipeline operators: PII scrubbing, quality
  * gating, repetition signals, TF-IDF, and token-budget packing. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("detects and redacts every PII category, leaves clean text alone") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.254 rebooted"),
      (3L, "ssn 123-45-6789 card 4111 1111 1111 1111"),
      (4L, "call (555) 867-5309 or +1 555.867.5309"),
      (5L, "perfectly clean sentence with numbers 12345 and 3.14"))
      .toDF("id", "text")
    val out = Privacy.scrub(rows, "text").orderBy("id").collect()
    def counts(i: Int) = (out(i).getAs[Int]("pii_email"), out(i).getAs[Int]("pii_ip"),
      out(i).getAs[Int]("pii_ssn"), out(i).getAs[Int]("pii_card"),
      out(i).getAs[Int]("pii_phone"))
    assert(counts(0) == ((1, 0, 0, 0, 0)))
    assert(counts(1) == ((0, 2, 0, 0, 0)))
    assert(counts(2) == ((0, 0, 1, 1, 0)))
    assert(counts(3) == ((0, 0, 0, 0, 2)))
    assert(counts(4) == ((0, 0, 0, 0, 0)))
    val redacted = out.map(_.getAs[String]("text_redacted"))
    assert(redacted(0) == "reach me at <EMAIL> thanks")
    assert(redacted(1) == "server <IP> and <IP> rebooted")
    assert(redacted(2) == "ssn <SSN> card <CARD>")
    assert(redacted(3).contains("<PHONE>") && !redacted(3).exists(_.isDigit))
    assert(redacted(4) == "perfectly clean sentence with numbers 12345 and 3.14")
    assert(out.map(_.getAs[Long]("pii_total")).toSeq == Seq(1L, 2L, 2L, 2L, 0L))
  }

  test("redaction order resolves SSN/phone overlap deterministically") {
    // a dashed SSN must become <SSN>, never half a phone match
    val out = Privacy.scrub(Seq((1L, "id 123-45-6789 end")).toDF("id", "text"), "text")
      .head()
    assert(out.getAs[String]("text_redacted") == "id <SSN> end")
  }

  test("kAnonymize suppresses quasi-identifiers only below k, keeps rows") {
    val df = Seq(
      (1L, "US", 30), (2L, "US", 30), (3L, "US", 30), // class of 3: kept
      (4L, "DE", 30), (5L, "DE", 40))                 // two singletons
      .toDF("id", "country", "age")
    val out = Privacy.kAnonymize(df, Seq("country", "age"), k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5) // suppression never drops rows
    assert(out(1L).getString(1) == "US" && !out(1L).getAs[Boolean]("suppressed"))
    assert(out(1L).getAs[Long]("class_size") == 3L)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2))
    assert(out(4L).getAs[Boolean]("suppressed")
      && out(4L).getAs[Long]("class_size") == 1L)
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq("age"), 1))
  }

  test("dpCounts: seeded noise is reproducible, seed-sensitive, clamped " +
      "at zero, and calibrated to epsilon") {
    import org.apache.spark.sql.functions._
    // 200 groups of 10 rows each: enough groups to see the noise
    // distribution, a true count small enough to exercise the clamp
    val df = spark.range(2000L)
      .select((col("id") % 200).cast("string").as("grp"))
    def run(eps: Double, seed: Long) =
      Privacy.dpCounts(df, "grp", eps, seed)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(0.5, 42L)
    assert(a == run(0.5, 42L))       // bit-reproducible release
    assert(a != run(0.5, 43L))       // a fresh seed re-draws the noise
    assert(a.values.forall(_ >= 0L)) // post-processing clamp
    // noise actually perturbs: most groups differ from the true 10
    val moved = a.values.count(_ != 10L)
    assert(moved > 100, s"only $moved/200 groups perturbed at eps=0.5")
    // mean |noise| for the two-sided geometric is 2p/(1-p^2) ~ 1.54
    // at eps=0.5; allow generous slack for the 200-draw sample
    val meanAbs = a.values.map(v => math.abs(v - 10L)).sum.toDouble / 200
    assert(meanAbs > 0.8 && meanAbs < 3.0, s"mean |noise| $meanAbs")
    // near-zero privacy budget spent the other way: eps = 20 makes
    // P(noise = 0) ~ 1 - 4e-9 — every count comes back exact
    val tight = run(20.0, 42L)
    assert(tight.values.forall(_ == 10L))
    intercept[IllegalArgumentException](Privacy.geometricCdf(0.0, 8))
    // public group DOMAIN: one row per domain value — an absent group
    // releases noise-only (clamped), an out-of-domain data group is
    // withheld — so the row SET reveals nothing about presence
    val small = spark.range(30L)
      .select(concat(lit("g"), (col("id") % 3).cast("string")).as("grp"))
    val dom = Privacy.dpCounts(small, "grp", 0.5, 42L,
        domain = Some(Seq("g0", "g1", "g9")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dom.keySet == Set("g0", "g1", "g9")) // g2 withheld, g9 released
    assert(dom("g9") >= 0L)                     // absent group: noise-only
  }

  test("dpSum: clipping bounds any unit's influence; tight budget recovers " +
      "quantized truth; disjointness guard fires") {
    import org.apache.spark.sql.functions._
    // two groups, 8 units each, every unit contributes 2 rows of 300
    // cents (clip 800, steps 8, grain 100 -> 6 steps per unit)
    def mk(whale: Long) = (
      (0 until 8).flatMap(u => Seq(("a", s"au$u", 300L), ("a", s"au$u", 300L))) ++
      (0 until 7).flatMap(u => Seq(("b", s"bu$u", 300L), ("b", s"bu$u", 300L))) :+
      (("b", "bu7", whale))).toDF("g", "unit", "cents")
    def run(df: org.apache.spark.sql.DataFrame, eps: Double, seed: Long) =
      Privacy.dpSum(df, "unit", "g", col("cents"), clipCents = 800L,
          steps = 8, epsilon = eps, seed = seed, noiseBound = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a whale at 10^9 cents and one at exactly the clip release
    // IDENTICALLY — the whale's influence is bounded by construction
    assert(run(mk(1000000000L), 0.5, 42L) == run(mk(800L), 0.5, 42L))
    // huge budget -> zero noise: exact clipped+quantized truth
    // (a: 8 units * 6 steps * 100 = 4800; b: 7*600 + clip 800 = 5000)
    val tight = run(mk(1000000000L), 320.0, 42L)
    assert(tight == Map("a" -> 4800L, "b" -> 5000L), tight.toString)
    // reproducible, seed-sensitive, non-negative
    val a = run(mk(400L), 0.5, 42L)
    assert(a == run(mk(400L), 0.5, 42L) && a != run(mk(400L), 0.5, 43L))
    assert(a.values.forall(_ >= 0L))
    // a unit spread over two groups breaks the epsilon accounting: loud
    val leaky = Seq(("a", "u0", 100L), ("b", "u0", 100L)).toDF("g", "unit", "cents")
    intercept[IllegalArgumentException](run(leaky, 0.5, 42L))
  }

  test("dpMean releases a composable (count, sum, quotient) triple with " +
      "independent noise draws") {
    import org.apache.spark.sql.functions._
    val df = (0 until 40).map(u => ("a", s"u$u", 500L)).toDF("g", "unit", "cents")
    val out = Privacy.dpMean(df, "unit", "g", col("cents"),
        clipCents = 800L, steps = 8, epsSum = 0.5, epsCnt = 0.5,
        seed = 42L, noiseBound = 64).collect()
    assert(out.length == 1)
    val r = out(0)
    val (n, s, m) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n >= 0L && s >= 0L)
    assert(m == s.toDouble / math.max(n, 1L).toDouble) // quotient is derived
    // the sum and count mechanisms must walk INDEPENDENT uniforms:
    // with a shared key their noises would be a deterministic pair;
    // across seeds the (sum-noise, count-noise) offsets decorrelate
    val draws = (0 until 24).map { sd =>
      val rr = Privacy.dpMean(df, "unit", "g", col("cents"), 800L, 8,
        0.5, 0.5, sd.toLong, 64).collect()(0)
      (rr.getLong(1) - 40L, rr.getLong(2) / 100L - 240L)
    }
    assert(draws.map(_._1).distinct.size > 3)
    assert(draws.map(_._2).distinct.size > 3)
    assert(draws.distinct.size > draws.map(_._1).distinct.size,
      "sum noise must not be a function of count noise")
  }

  test("lDiversify: homogeneous class suppressed, null quasi is a class, " +
      "null sensitive never counts") {
    val df = Seq(
      (1L, Some("a"), Some("s1")), (2L, Some("a"), Some("s2")),
      (3L, Some("a"), Some("s1")),                   // 2 distinct: keep
      (4L, Some("b"), Some("s1")), (5L, Some("b"), Some("s1")), // homogeneous
      (6L, Option.empty[String], Some("s1")),
      (7L, Option.empty[String], Some("s2")),        // NULL class, diverse
      (8L, Some("c"), Option.empty[String]),
      (9L, Some("c"), Some("s1")))                   // null s out: 1 distinct
      .toDF("id", "q", "s")
    val out = Privacy.lDiversify(df, Seq("q"), "s", l = 2).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((Some("a"), 2L, false)))
    assert(out(4L) == ((None, 1L, true)))            // quasi masked
    assert(out(6L) == ((None, 2L, false)))           // kept, q was null
    assert(out(8L) == ((None, 1L, true)))
    assert(out.size == 9)                            // null-safe join kept all
  }
}

class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  test("unigram LM gate: exact Viterbi piece scores, OOV penalty, " +
      "division-free flag") {
    import org.apache.spark.sql.functions.col
    // hand-built scored vocab: "ab" beats the a+b split (-100 vs
    // -900); z is out-of-vocab entirely
    val vocab = Seq("ab" -> -100L, "a" -> -500L, "b" -> -400L, "c" -> -50L)
    val docs = Seq(
      (1L, "ab c"),   // pieces [ab, c]        -> q = -150, n = 2
      (2L, "a b"),    // pieces [a, b]         -> q = -900, n = 2
      (3L, "az ab"),  // az is OOV -> fallback [a, z] + [ab]
      (4L, " ")       // no words -> 0 pieces, unflagged
    ).toDF("doc_id", "text")
    val out = QualityFilters.unigramLmGate(docs, "doc_id", "text",
        vocab, oovQ = -2000L, meanThresholdQ = -300L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, -150L, false)))  // mean -75 >= -300
    // mean -450 < -300: flagged
    assert(out(2L) == ((2L, -900L, true)))
    // fallback pieces score a=-500, z=oovQ=-2000, plus ab=-100
    assert(out(3L) == ((3L, -2600L, true)))
    assert(out(4L) == ((0L, 0L, false)))     // empty: never flagged
  }

  test("trained quality classifier separates planted junk and is " +
      "bit-deterministic across runs") {
    import org.apache.spark.sql.functions.{abs => _, _}
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val junk = " 0123456789 0123456789 !!!??!! 0123456789 ,,;;::!! 0123456789"
    val aug = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(col("text"), lit(junk)))
        .otherwise(col("text")).as("text"),
      when(col("doc_id") % 5 === 0, lit(1.0)).otherwise(lit(0.0)).as("y"))
    val feats = Seq(
      lit(1.0),
      TextAnalysis.tokenCount(col("text")) / lit(64.0),
      TextAnalysis.digitCount(col("text")) / lit(256.0),
      TextAnalysis.punctCount(col("text")) / lit(256.0),
      TextAnalysis.charCount(col("text")) / lit(1024.0))
    // converged config (r7 grid): 64 iters, lr 2.0, 4x junk upweight
    val wgt = when(col("y") === 1.0, lit(4.0)).otherwise(lit(1.0))
    val w1 = QualityFilters.trainQualityClassifier(aug, feats, col("y"),
      iters = 64, lr = 2.0, sampleWeight = wgt)
    val w2 = QualityFilters.trainQualityClassifier(aug, feats, col("y"),
      iters = 64, lr = 2.0, sampleWeight = wgt)
    // quantized integer gradients make training bit-deterministic
    // regardless of partial-aggregation order
    assert(w1.toSeq == w2.toSeq)
    // the model must actually separate the planted junk
    val scored = aug.select(col("y"),
      (QualityFilters.classifierScore(feats, w1) >= 0.5).as("flagged"))
      .collect().map(r => (r.getDouble(0) == 1.0, r.getBoolean(1)))
    val acc = scored.count { case (y, f) => y == f }.toDouble / scored.length
    assert(acc >= 0.95, s"classifier accuracy too low: $acc")
    // more iterations only refines — weights are finite and nonzero
    assert(w1.exists(_ != 0.0))
    assert(w1.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("gate computes Gopher-style signals and the keep verdict") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"), // keeps
      (2L, "no"),                                                // too short
      (3L, "the " + "#@{}<>" * 50),                              // symbol soup
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbbbb " * 3 + "the end here now"))
      .toDF("doc_id", "text")
    val out = QualityFilters.gate(rows, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("keep"))
    assert(out(0).getAs[Long]("n_words") == 10)
    assert(!out(1).getAs[Boolean]("keep"))       // n_words < 5
    assert(!out(2).getAs[Boolean]("keep"))       // symbol_ratio
    assert(out(2).getAs[Double]("symbol_ratio") > 0.1)
    // doc 4: mean word length pushed past 12 by the letter runs
    assert(!out(3).getAs[Boolean]("keep"))
    assert(out(3).getAs[Double]("mean_word_len") > 12.0)
  }

  test("url extraction explodes normalized domains; gate drops blocklisted docs") {
    val rows = Seq(
      (1L, "see http://Ads.Example/banner and https://good.example/a?x=1"),
      (2L, "plain text with no links at all"),
      (3L, "dup http://good.example/1 http://good.example/2 https://t.co:443/z"),
      (4L, "ends a sentence (http://spam.example), then http://paren.example."))
      .toDF("doc_id", "text")
    val urls = QualityFilters.extractUrls(rows, "doc_id", "text")
      .orderBy("doc_id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(urls.map(u => (u._1, u._3)).toSeq == Seq(
      (1L, "ads.example"), (1L, "good.example"),
      (3L, "good.example"), (3L, "good.example"), (3L, "t.co"),
      (4L, "paren.example"), (4L, "spam.example")))
    // trailing prose punctuation never survives into the url
    assert(urls.filter(_._1 == 4L).map(_._2).toSeq ==
      Seq("http://paren.example", "http://spam.example"))
    val blocked = Seq("ads.example", "spam.example").toDF("domain")
    val kept = QualityFilters.domainGate(rows, "doc_id", "text", blocked)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // docs 1 and 4 cite blocked domains
  }

  test("repetition signals flag the boilerplate document") {
    val rows = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = QualityFilters.repetitionSignals(rows, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // doc 1: 9 bigrams, "buy now" occurs 5 times
    assert(out(0).getAs[Long]("n_grams") == 9)
    assert(out(0).getAs[String]("top_gram") == "buy now")
    assert(out(0).getAs[Double]("top_gram_frac") == 0.5556)
    assert(out(0).getAs[Double]("distinct_word_frac") == 0.2)
    // doc 2: all bigrams unique
    assert(out(1).getAs[Double]("top_gram_frac") == 0.1111)
    assert(out(1).getAs[Double]("distinct_word_frac") == 1.0)
  }

  test("gopherRepetition: line + char-weighted fractions, blank lines out") {
    val rows = Seq(
      (1L, "aa\naa\nbb"),            // one repeat: 1/3 lines, 2/6 chars
      (2L, "aa\n   \naa"),           // whitespace-only line never counts
      (3L, "x\nyy\nzzz"),            // all distinct
      (4L, "longline\nlongline\nz"), // char fraction >> line fraction
      (5L, ""))                      // no non-empty lines
      .toDF("doc_id", "text")
    val out = QualityFilters.gopherRepetition(rows, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == ((3L, r6(1.0 / 3), r6(2.0 / 6))))
    assert(out(1) == ((2L, 0.5, 0.5)))
    assert(out(2) == ((3L, 0.0, 0.0)))
    assert(out(3) == ((3L, r6(1.0 / 3), r6(8.0 / 17))))
    assert(out(4) == ((0L, 0.0, 0.0)))
  }

  test("single-word and empty documents yield no repetition rows") {
    val rows = Seq((1L, "lonely"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = QualityFilters.repetitionSignals(rows, "doc_id", "text", n = 2)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
  }

  test("deflate ratio separates boilerplate from varied text, deterministically") {
    val docs = Seq(
      (1L, Seq.fill(200)("the same line repeated forever").mkString(" ")),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 1013}x${i * 104729 % 997}").mkString(" ")),
      (3L, ""))
      .toDF("doc_id", "text")
    def run() = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = run()
    // repetitive text compresses an order of magnitude harder
    assert(a(1L) < 0.1, s"boilerplate ratio ${a(1L)}")
    assert(a(2L) > 0.3, s"varied ratio ${a(2L)}")
    assert(a(1L) < a(2L))
    assert(a(3L) == 1.0)            // empty-input contract
    assert(a.values.forall(_ > 0))
    assert(run() == a)              // deterministic across plans/runs
  }

  test("fused repetition kernel == the relational explode form on random docs") {
    import org.apache.spark.sql.functions._
    // seeded random docs over a small vocab (forces ties and heavy
    // repetition), plus edge shapes
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "cc", "ddd", "Buy", "NOW")
    val docs = ((1 to 200).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((998L, ""), (999L, "  padded   whitespace  "))).toDF("doc_id", "text")

    val fused = QualityFilters.repetitionSignals(docs, "doc_id", "text", n = 2)

    // the pre-fusion relational reference, inlined
    val grams = docs.select(col("doc_id"),
      explode(QualityFilters.wordNgrams(col("text"), 2)).as("gram"),
      size(TextAnalysis.tokens(lower(col("text")))).cast("long").as("n_words"),
      size(array_distinct(TextAnalysis.tokens(lower(col("text")))))
        .cast("long").as("n_distinct_words"))
    val reference = grams
      .groupBy("doc_id", "n_words", "n_distinct_words", "gram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_words", "n_distinct_words")
      .agg(sum("c").as("n_grams"),
        min_by(col("gram"), struct((col("c") * -1).as("nc"), col("gram").as("g")))
          .as("top_gram"),
        max("c").as("top_gram_count"))
      .select(col("doc_id"), col("n_grams"), col("top_gram"),
        round(col("top_gram_count").cast("double") /
          greatest(col("n_grams"), lit(1L)), 4).as("top_gram_frac"),
        round(col("n_distinct_words").cast("double") /
          greatest(col("n_words"), lit(1L)), 4).as("distinct_word_frac"))

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(key(fused) == key(reference))
  }

  test("canonicalUrl: trackers, fragments, default ports, case, slashes") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("http://Track.Example:80/p/1?utm_source=a&q=5&fbclid=z#x",
        "http://track.example/p/1?q=5"),
      ("https://A.B:443/x/", "https://a.b/x"),          // default TLS port
      ("https://a.b:8443/x?q=1", "https://a.b:8443/x?q=1"), // real port kept
      ("http://a.b/?utm_source=only", "http://a.b/"),   // lone tracker; root
      ("http://a.b/Path/MixedCase", "http://a.b/Path/MixedCase"), // path case
      ("http://a.b/p?utm_a=1&utm_b=2&q=3", "http://a.b/p?q=3"),
      // r6 advisory regression: a :80/ deep in a query value must NOT
      // be stripped — only the authority's own default port is
      ("http://a.b/r?next=host:80/x", "http://a.b/r?next=host:80/x"),
      ("http://a.b:80/r?next=host:443/x", "http://a.b/r?next=host:443/x"),
      // r6 review: the strip is SCHEME-MATCHED — :80 on https and
      // :443 on http are real non-default ports, distinct origins
      ("https://a.b:80/x", "https://a.b:80/x"),
      ("http://a.b:443/x", "http://a.b:443/x"))
      .toDF("url", "expect")
    val bad = cases
      .withColumn("got", QualityFilters.canonicalUrl(col("url")))
      .filter(col("got") =!= col("expect"))
      .collect()
    assert(bad.isEmpty, bad.map(r =>
      s"${r.getString(0)} -> ${r.getString(2)} (want ${r.getString(1)})")
      .mkString("; "))
  }

  test("quantileMap rewrites a shifted source onto the reference exactly") {
    import org.apache.spark.sql.functions.col
    val df = (Seq((1L, "ref", 10L), (2L, "ref", 20L), (3L, "ref", 30L),
      (4L, "ref", 40L)) ++
      // same shape, 100x scale: maps back onto ref value-for-value
      Seq((11L, "big", 1000L), (12L, "big", 2000L), (13L, "big", 3000L),
        (14L, "big", 4000L)) ++
      // two rows: extremes land on ref's min and max
      Seq((21L, "tiny", 7L), (22L, "tiny", 9L)))
      .toDF("id", "src", "score")
    val out = QualityFilters.quantileMap(df, "id", "src", col("score"), "ref")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(11L) == 10L && out(12L) == 20L
      && out(13L) == 30L && out(14L) == 40L)
    assert(out(21L) == 10L && out(22L) == 40L)
    // the reference maps onto itself
    assert(Seq(1L, 2L, 3L, 4L).forall(i => out(i) == (i * 10)))
  }

  test("calibratedGate keeps the top fraction of EVERY source") {
    import org.apache.spark.sql.functions.col
    // source A scores 10x source B's: a raw global threshold would
    // keep all of A and none of B; calibration keeps half of each
    val df = ((1L to 10L).map(i => (i, "A", i * 100)) ++
      (11L to 20L).map(i => (i, "B", i))).toDF("id", "src", "score")
    val out = QualityFilters.calibratedGate(df, "id", "src",
      col("score"), keepFrac = 0.5)
    val kept = out.filter(col("keep")).groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("A" -> 5L, "B" -> 5L))
    // calibrated is a within-source CDF: extremes at 0 and 1
    val a = out.filter(col("src") === "A").orderBy("score")
      .select("calibrated").collect().map(_.getDouble(0))
    assert(a.head == 0.0 && a.last == 1.0)
  }
}

class ScoringSpec extends SparkTestBase {
  import spark.implicits._

  test("tfidf: corpus-wide terms score zero, rare terms dominate") {
    val rows = Seq(
      (1L, "shared shared unique1"),
      (2L, "shared unique2 unique2"),
      (3L, "shared other"))
      .toDF("doc_id", "text")
    val scored = Scoring.tfidf(rows, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // "shared" appears in every doc: idf = ln(3/3) = 0
    assert(scored((1L, "shared")) == 0.0)
    // unique2: tf=2, idf=ln(3/1)
    assert(math.abs(scored((2L, "unique2")) - 2 * math.log(3.0)) < 1e-12)
    assert(math.abs(scored((1L, "unique1")) - math.log(3.0)) < 1e-12)
  }

  test("importance weights rank target-like docs above off-domain docs") {
    // corpus: 4 "english" docs + 2 "latin" docs; target = the latin ones
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ran in the park"),
      (3L, "a bird flew over the lake"),
      (4L, "the fish swam in the sea"),
      (5L, "lorem ipsum dolor sit amet"),
      (6L, "ipsum lorem amet consectetur")).toDF("doc_id", "text")
    val target = corpus.filter("doc_id >= 5")
    val w = Scoring.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 6)
    // every latin doc outranks every english doc
    val latin = Seq(5L, 6L).map(w)
    val english = Seq(1L, 2L, 3L, 4L).map(w)
    assert(latin.min > english.max,
      s"latin=$latin english=$english")
    // selection takes exactly the latin docs first
    val top = Scoring.selectByImportance(corpus, target, "doc_id", "text", 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(5L, 6L))
    // smoothing: a target token absent from the corpus must not blow
    // up any score (all finite)
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("klDrift: closed-form absent-term mass equals the naive full-vocab sum") {
    val docs = Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the dog and the cat"),
      (3L, "b", "lorem ipsum dolor sit amet"),
      (4L, "b", "ipsum lorem the"),
      (5L, "c", "the the the the")).toDF("doc_id", "src", "text")
    val out = Scoring.klDrift(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // naive reference: expand every (group, vocab-term) pair
    val toks = Seq(
      "a" -> "the cat sat on the mat the dog and the cat",
      "b" -> "lorem ipsum dolor sit amet ipsum lorem the",
      "c" -> "the the the the").map { case (g, t) => g -> t.split(" ").toSeq }
    val vocab = toks.flatMap(_._2).distinct
    val v = vocab.size
    val corpusCounts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val n = corpusCounts.values.sum
    toks.foreach { case (g, ts) =>
      val c = ts.groupBy(identity).view.mapValues(_.size).toMap
      val ns = ts.size
      val naive = vocab.map { t =>
        val p = (c.getOrElse(t, 0) + 1.0) / (ns + v)
        val q = (corpusCounts(t) + 1.0) / (n + v)
        p * math.log(p / q)
      }.sum
      val (nTok, vSeen, kl) = out(g)
      assert(nTok == ns && vSeen == c.size)
      assert(math.abs(kl - naive) < 5e-5,
        s"group $g: decomposed $kl vs naive $naive")
    }
    // the off-vocabulary group (latin) diverges more than the
    // corpus-typical one; the 4-token group c is NOT asserted against
    // — add-one smoothing flattens tiny groups toward uniform, which
    // is the correct regularized behavior, not a drift signal
    assert(out("b")._3 > out("a")._3)
  }

  test("perplexity bands: typical docs head, anomalous tail, every doc labeled") {
    // 8 template-y docs share a vocabulary; 2 outliers use words seen
    // nowhere else (low unigram prob -> highest perplexity -> tail)
    val corpus = (
      (1 to 8).map(i => (i.toLong, "the quick brown fox jumps " + (
        if (i % 2 == 0) "over the lazy dog" else "over the quick dog"))) ++
        Seq((9L, "zyx wvu tsr qpo nml"), (10L, "abc def ghi jkl mno")))
      .toDF("doc_id", "text")
    val out = Scoring.perplexityBands(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.size == 10) // labeled, not filtered
    assert(out(9L) == "tail" && out(10L) == "tail")
    assert(Set("head", "middle", "tail") == out.values.toSet)
    // band boundaries partition: heads outscore middles outscore tails
    val scores = Scoring.perplexityBands(corpus, "doc_id", "text")
      .collect().map(r => r.getString(3) -> r.getDouble(2))
    def band(b: String) = scores.collect { case (`b`, s) => s }
    assert(band("head").min >= band("middle").max)
    assert(band("middle").min >= band("tail").max)
  }

  test("topTerms ranks per doc with deterministic tie-break") {
    val rows = Seq(
      (1L, "zz aa zz aa bb"),
      (2L, "cc cc cc dd"))
      .toDF("doc_id", "text")
    val out = Scoring.topTerms(rows, "doc_id", "text", 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: aa and zz tie (tf=2, same df) -> term order breaks the tie
    assert(out(0).getString(2) == "aa" && out(0).getInt(1) == 1)
    assert(out(1).getString(2) == "zz" && out(1).getInt(1) == 2)
    assert(out(2).getString(2) == "cc")
    assert(out.length == 4)
  }

  test("knBigramLogProb matches the hand-computed KN model; per-history " +
      "mass sums to 1") {
    // corpus: [a b a b], [b c] -> model "a b":2, "b a":1, "b c":1
    // c1(a)=2 N1+(a.)=1; c1(b)=2 N1+(b.)=2; N1+(.b)=N1+(.a)=N1+(.c)=1; T=3
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Scoring.knBigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val pAB = (2.0 - 0.75) / 2 + 0.75 * 1 / 2.0 * (1.0 / 3)  // 0.75
    val pBA = (1.0 - 0.75) / 2 + 0.75 * 2 / 2.0 * (1.0 / 3)  // 0.375
    val pBC = pBA
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L,
      r4((2 * math.log(pAB) + math.log(pBA)) / 3))))
    assert(out(2L) == ((1L, r4(math.log(pBC)))))
    // interpolated KN is a proper distribution: seen mass for history
    // 'b' (0.375 + 0.375) plus its unseen-continuation mass
    // lambda(b) * Pcont(b) = 0.75 * (2/2) * (1/3) = 0.25 totals 1.0
    assert(math.abs((pBA + pBC + 0.25) - 1.0) < 1e-12)
  }

  test("nbLogOdds matches a hand-computed reference model and separates classes") {
    val train = Seq(
      (1L, "good clean prose text", true),
      (2L, "good text well written", true),
      (3L, "spam spam buy now", false),
      (4L, "buy spam click now", false)).toDF("doc_id", "text", "y")
    val held = Seq(
      (10L, "clean prose text"),       // positive-looking
      (11L, "spam buy now"),           // negative-looking
      (12L, "unseen words only zzz")   // all-unseen -> prior + count term
    ).toDF("doc_id", "text")
    val out = Scoring.nbLogOdds(train, held, "doc_id", "text", "y")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap

    // reference model, computed independently
    val posToks = "good clean prose text good text well written".split(" ")
    val negToks = "spam spam buy now buy spam click now".split(" ")
    val np = posToks.groupBy(identity).view.mapValues(_.length).toMap
    val nn = negToks.groupBy(identity).view.mapValues(_.length).toMap
    val vocab = (np.keySet ++ nn.keySet)
    val (p, n, v) = (posToks.length, negToks.length, vocab.size)
    def score(text: String): Double = {
      val toks = text.split(" ")
      val seen = toks.filter(vocab).map(tk =>
        math.log(np.getOrElse(tk, 0) + 1.0) - math.log(nn.getOrElse(tk, 0) + 1.0)).sum
      val raw = math.log(2.0 / 2.0) +
        toks.length * (math.log(n + v.toDouble) - math.log(p + v.toDouble)) + seen
      math.rint(raw * 10000) / 10000
    }
    assert(out(10L)._1 == 3 && math.abs(out(10L)._2 - score("clean prose text")) < 1e-9)
    assert(out(11L)._1 == 3 && math.abs(out(11L)._2 - score("spam buy now")) < 1e-9)
    assert(out(12L)._1 == 4 && math.abs(out(12L)._2 - score("unseen words only zzz")) < 1e-9)
    // classifier verdicts
    assert(out(10L)._3 && !out(11L)._3)
    // all-unseen doc: the smoothing term decides, never NaN/Inf
    assert(!out(12L)._2.isNaN && !out(12L)._2.isInfinite)
  }
}

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed prefix sum equals the single-partition reference") {
    val rows = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("id", "v")
      .repartition(13) // scatter the input; result must not care
    val got = Packing.cumulative(rows, "id", "v", buckets = 8)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    var acc = 0L
    (1L to 1000L).foreach { i =>
      acc += i % 7 + 1
      assert(got(i) == acc, s"cum mismatch at id=$i")
    }
  }

  test("prefix sum is exact for any bucket count, including 1") {
    val rows = Seq((10L, 5L), (20L, 7L), (30L, 1L)).toDF("id", "v")
    for (b <- Seq(1, 2, 64)) {
      val got = Packing.cumulative(rows, "id", "v", buckets = b)
        .orderBy("id").select("cum").as[Long].collect().toSeq
      assert(got == Seq(5L, 12L, 13L), s"buckets=$b")
    }
  }

  test("shard assignment follows the first-token rule and fills budgets") {
    // 10 docs x 4 tokens, budget 10 -> cum 4,8,12,... doc3 starts at
    // token 8 -> shard 0; doc4 starts at 12 -> shard 1
    val rows = (1L to 10L).map(i => (i, "t t t t")).toDF("doc_id", "text")
    val out = Packing.assignShards(rows, "doc_id", "text", budget = 10L)
      .orderBy("doc_id").select("shard").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
    val manifest = Packing.shardManifest(
      Packing.assignShards(rows, "doc_id", "text", budget = 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(manifest.map(_._3).sum == 40L)
    assert(manifest.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("concat offsets slice every doc back out of its packed shard") {
    // doc 1 carries a supplementary-plane emoji: offsets count
    // CODEPOINTS, so the slice must use offsetByCodePoints — raw
    // String.substring would shift every doc after it
    val rows = Seq((1L, "alpha 😀 beta"), (2L, "gamma"),
      (3L, "delta eps zeta"),
      (4L, "longer document here to roll the shard"), (5L, "tail"))
      .toDF("doc_id", "text")
    val assigned = Packing.assignShards(rows, "doc_id", "text", budget = 6L)
    val packed = Packing.packShards(assigned, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val offsets = Packing.concatOffsets(assigned, "doc_id", "text").collect()
    val texts = rows.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def cpSlice(s: String, start: Int, end: Int): String =
      s.substring(s.offsetByCodePoints(0, start), s.offsetByCodePoints(0, end))
    // THE contract: codepoint-slice(packed, start, end) == original doc
    offsets.foreach { r =>
      val (shard, id, s, e) =
        (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt)
      assert(cpSlice(packed(shard), s, e) == texts(id),
        s"doc $id mis-sliced from shard $shard")
    }
    // offsets are dense: doc k+1 starts sep-width after doc k ends
    offsets.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) == a.getLong(3) + 2)
        case _ =>
      }
      assert(sorted.head.getLong(2) == 0L)
    }
    // packed_len agrees with the last end offset (both in codepoints)
    val lastEnd = offsets.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).max).toMap
    packed.foreach { case (shard, text) =>
      assert(text.codePointCount(0, text.length).toLong == lastEnd(shard)) }
  }

  test("token-id payloads: counts reconcile and docs reassemble in order") {
    val rows = Seq((1L, "cat cata cat"), (2L, "dog dodo"),
      (3L, "cata cata dog cat"), (4L, "god dodo god"), (5L, "cat"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.trainBpeMerges(rows, "text", numMerges = 6).toSeq
    val vocab = Tokenizer.bpeVocabTable(rows, "text", merges)
    val assigned = Packing.assignShards(rows, "doc_id", "text",
        budget = 8L, tokenCounter = Tokenizer.bpeCount(merges))
      .withColumn("ids", array_join(transform(
        Tokenizer.bpeIds(col("text"), merges, vocab),
        _.cast("string")), " "))
    val packed = Packing.packTokenIds(assigned, "doc_id", "ids")
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val perDoc = assigned.select("doc_id", "shard", "ids", "n_tokens")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // payload token count == total_tokens == sum of member doc counts
    packed.foreach { case (shard, (nDocs, total, payload)) =>
      val members = perDoc.filter(_._2 == shard)
      assert(members.length.toLong == nDocs)
      assert(members.map(_._4).sum == total)
      assert(payload.split(" ").length.toLong == total)
      // and the payload IS the member id streams in doc_id order
      assert(payload == members.sortBy(_._1).map(_._3).mkString(" "))
    }
    // every doc landed in exactly one shard
    assert(perDoc.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }
}

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def chunksOf(text: String, maxTokens: Int, overlap: Int) =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens, overlap)
      .orderBy("chunk_idx")
      .select("chunk_text", "n_tokens").as[(String, Long)].collect().toSeq

  test("overlapping windows cover every token with the shared prefix") {
    // 10 tokens, window 4, overlap 1 -> starts 0,3,6: t6..t9 closes it
    val got = chunksOf("a b c d e f g h i j", 4, 1)
    assert(got == Seq(("a b c d", 4L), ("d e f g", 4L), ("g h i j", 4L)))
  }

  test("ragged tail keeps at least one token beyond the overlap") {
    // 11 tokens, window 4, stride 3 -> starts 0,3,6,9; last chunk 2 toks
    val got = chunksOf("a b c d e f g h i j k", 4, 1)
    assert(got.map(_._2) == Seq(4L, 4L, 4L, 2L))
    assert(got.last._1 == "j k")
  }

  test("short and empty docs yield exactly one chunk, case preserved") {
    assert(chunksOf("Hello World", 32, 8) == Seq(("Hello World", 2L)))
    assert(chunksOf("   ", 32, 8) == Seq(("", 1L)))
  }

  test("property: dropping each chunk's overlap prefix reconstructs the doc") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 5, 24, 25, 40, 100); overlap <- Seq(0, 3)) {
      val toks = Vector.fill(n)("w" + rnd.nextInt(50))
      val got = chunksOf(toks.mkString(" "), 25, overlap)
      val rebuilt = got.head._1.split(" ").toVector ++
        got.tail.flatMap(_._1.split(" ").drop(overlap))
      assert(rebuilt == toks, s"n=$n overlap=$overlap")
      assert(got.map(_._2).sum ==
        n + overlap.toLong * (got.size - 1), s"token accounting n=$n")
    }
  }

  test("sentence chunks never split a sentence; first-token rule spills") {
    // sentences of 3/3/3/4 tokens, budget 5: cums 3,6,9,13 ->
    // exclusive starts 0,3,6,9 -> chunks 0,0,1,1
    val doc = "One two three. Four five six! Seven eight nine? Ten el tw th"
    val out = Chunking.chunkBySentences(
      Seq((1L, doc), (2L, "")).toDF("doc_id", "text"), "doc_id", "text", 5)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(out.forall(_.getLong(0) == 1L)) // empty doc: no chunks
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4))).toSeq == Seq(
      (0L, 2L, 6L, "One two three. Four five six!"),
      (1L, 2L, 7L, "Seven eight nine? Ten el tw th")))
    // terminator-less text is one sentence; "Hi!!" keeps its run
    val tail = Chunking.chunkBySentences(
      Seq((3L, "Hi!! no terminator tail")).toDF("doc_id", "text"),
      "doc_id", "text", 50).head()
    assert(tail.getLong(2) == 2L && tail.getString(4) == "Hi!! no terminator tail")
  }

  test("BLEU: hand-computed clipped precisions, brevity penalty, zero cases") {
    val pairs = Seq(
      // (5/6 * 3/5 * 2/4 * 1/3)^(1/4) = 0.0833..^0.25 ~= 0.5373, BP 1
      (1L, "a b c d e f", "a b c d x f"),
      (2L, "same text here ok more words", "same text here ok more words"), // 1.0
      (3L, "the cat sat on the mat", "the cat is on the mat"), // no 4-gram: 0
      (4L, "", "a b c d e"), // empty candidate: 0
      // BP case: cand is a strict prefix (4 tokens) of a 6-token ref:
      // all pn = 1, bleu = exp(1 - 6/4) ~= 0.6065
      (5L, "a b c d", "a b c d e f"))
      .toDF("pair_id", "cand", "ref")
    val out = graft.operators.Scoring.bleuPairs(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getDouble(7)).toMap
    assert(math.abs(out(1L) - 0.5373) < 1e-9, s"got ${out(1L)}")
    assert(out(2L) == 1.0)
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.0)
    assert(math.abs(out(5L) - BigDecimal(math.exp(-0.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("calibration report: bins, gaps, ECE terms on a planted mix") {
    import org.apache.spark.sql.functions._
    // bin 0: scores {0.0, 0.05}, labels {0,1} -> avg 0.025 vs 0.5, gap 0.475
    // bin 9: scores {0.95, 1.0}, labels {1,1} -> avg 0.975 vs 1.0, gap 0.025
    // (score 1.0 must land in the TOP bin, not a phantom bin 10)
    val scored = Seq(
      (1L, 0.0, false), (2L, 0.05, true),
      (3L, 0.95, true), (4L, 1.0, true))
      .toDF("id", "score", "label")
    val out = graft.operators.QualityFilters
      .calibrationReport(scored, "score", "label", bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 9))
    val b0 = out(0); val b9 = out(1)
    assert(b0.getLong(1) == 2 && b0.getDouble(2) == 0.025 &&
      b0.getDouble(3) == 0.5 && b0.getDouble(4) == 0.475)
    assert(b9.getLong(1) == 2 && b9.getDouble(4) == 0.025)
    // ece = sum of terms = 0.5*0.475 + 0.5*0.025 = 0.25
    assert(math.abs(out.map(_.getDouble(5)).sum - 0.25) < 1e-9)
  }

  test("pass@k: exact telescoped binomial, short-circuits, malformed rows") {
    val tasks = Seq(
      (1L, 10, 3),  // 1 - (7*6*5*4*3)/(10*9*8*7*6) = 1 - 1/12 = 0.916667
      (2L, 10, 6),  // n-c = 4 < 5: certain pass -> 1.0
      (3L, 10, 0),  // no correct samples -> 0.0
      (4L, 3, 1),   // k > n: undefined -> null
      (5L, 10, 11)) // c > n: malformed -> null
      .toDF("task_id", "n", "c")
    val out = graft.operators.Scoring.passAtK(tasks, "task_id", "n", "c", k = 5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) == Some(0.916667))
    assert(out(2L) == Some(1.0))
    assert(out(3L) == Some(0.0))
    assert(out(4L).isEmpty && out(5L).isEmpty)
  }

  test("pass@k: past the Long-safe bound the per-factor ratio stays finite " +
      "and correct") {
    // n = 10^6, k = 20: n^k ~ 10^120 — the old two-product double
    // fallback hits Infinity/Infinity = NaN; the telescoped
    // per-factor ratio multiplies 20 values in [0,1]
    val n = 1000000
    val c = 100000 // 10% pass rate
    val out = graft.operators.Scoring.passAtK(
      Seq((1L, n, c)).toDF("task_id", "n", "c"), "task_id", "n", "c", k = 20)
      .collect()(0).getDouble(3)
    // expected 1 - prod_{i<20} (n-c-i)/(n-i), computed independently
    val expected = 1.0 - (0 until 20)
      .map(i => (n - c - i).toDouble / (n - i)).product
    assert(!out.isNaN && math.abs(out - expected) < 1e-6, s"got $out")
    // and a 0%-pass task at huge n stays exactly 0, not NaN
    val zero = graft.operators.Scoring.passAtK(
      Seq((2L, n, 0)).toDF("task_id", "n", "c"), "task_id", "n", "c", k = 20)
      .collect()(0).getDouble(3)
    assert(zero == 0.0)
  }

  test("chrF: effective-order means, beta=2, whitespace stripped") {
    val pairs = Seq(
      // "ab" vs "ba": 1-grams P=R=1; 2-grams no match P=R=0; orders
      // 3..6 skipped (no grams either side) -> P=R=0.5, chrF=0.5
      (1L, "a b", "ba"), // whitespace stripping makes cand "ab"
      (2L, "same thing", "same thing"), // 1.0
      (3L, "xyz", "abc")) // disjoint alphabets: 0
      .toDF("pair_id", "cand", "ref")
    val out = graft.operators.Scoring.chrF(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(out(1L) == 0.5, s"got ${out(1L)}")
    assert(out(2L) == 1.0)
    assert(out(3L) == 0.0)
  }

  test("WER: token-level edit distance via injective char relabeling") {
    val pairs = Seq(
      (1L, "a b c d", "a x c d y"),       // 1 sub + 1 ins = 2 / 5 refs
      (2L, "the cat sat", "the cat sat"), // identical: 0
      (3L, "", "a b"),                    // empty cand: 2 deletions / 2
      (4L, "a b", ""),                    // empty ref: wer NULL (0/0 class)
      // repeated tokens must NOT collapse: "a a a" vs "a" is 2 edits
      (5L, "a a a", "a"))
      .toDF("pair_id", "cand", "ref")
    val out = graft.operators.Scoring.werPairs(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out(1L) == ((2, Some(0.4))))
    assert(out(2L) == ((0, Some(0.0))))
    assert(out(3L) == ((2, Some(1.0))))
    assert(out(4L)._2.isEmpty)
    assert(out(5L) == ((2, Some(2.0)))) // WER can exceed 1 on insertions
  }

  test("ROUGE-N: clipped recall/precision/F1 with repeated grams") {
    // cand repeats "the" 3x, ref has it 2x: clipped unigram match
    // counts min(3, 2) = 2 for "the"
    val pairs = Seq((1L, "the the the cat", "the cat the")).toDF("pair_id", "cand", "ref")
    val out = graft.operators.Scoring.rougeN(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // unigrams: the(min(3,2)=2) + cat(1) = 3 of cand 4 / ref 3
    assert(out(1) == ((3L, 4L, 3L, 0.75, 1.0)))
    // bigrams: cand {the the, the the, the cat}, ref {the cat, cat the}
    // -> only "the cat" matches once: 1 of 3 / 2
    assert(out(2)._1 == 1L && out(2)._2 == 3L && out(2)._3 == 2L)
  }
}
