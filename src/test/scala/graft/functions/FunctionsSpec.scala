package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ConversionsSpec extends SparkTestBase {
  import spark.implicits._

  test("epoch day/milli/micro conversions round-trip") {
    val df = Seq(0L, 86400000L, 1704067200000L).toDF("ms")
      .withColumn("ts", Conversions.epochMillisToTimestamp(col("ms")))
      .withColumn("back", Conversions.timestampToEpochMillis(col("ts")))
      .withColumn("day", Conversions.dateToEpochDay(col("ts").cast("date")))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(2)))
    assert(rows.map(_.getInt(3)).toSeq == Seq(0, 1, 19723))
  }

  test("ISO-8601 UTC serialization matches the Kafka sink contract") {
    val iso = Seq(1704067200123L).toDF("ms")
      .select(Conversions.toIso8601Utc(Conversions.epochMillisToTimestamp(col("ms"))))
      .first().getString(0)
    assert(iso == "2024-01-01T00:00:00.123Z")
  }

  test("pg hex literal and bulk-text escaping") {
    val r = Seq(("ab", "a\\b\nc")).toDF("bin", "txt")
      .select(
        Conversions.toPgHexLiteral(col("bin").cast("binary")),
        Conversions.escapeBulkText(col("txt")))
      .first()
    assert(r.getString(0) == "\\x6162")
    assert(r.getString(1) == "a\\\\b\\nc")
  }

  test("lenient boolean coercion accepts the reference's truthy forms") {
    val vals = Seq("1", "yes", "ON", " t ", "Y", "true", "0", "no", "x")
    val out = vals.toDF("v").select(Conversions.lenientBoolean(col("v"))).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, true, true, true, true, true, false, false, false))
  }
}

class TextExpressionsSpec extends SparkTestBase {
  import spark.implicits._
  import TextExpressions._

  test("rolling_hash matches a reference implementation and is stable") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val inputs = Seq("", "a", "hello world", "héllo ✓")
    val out = inputs.toDF("s").select(rolling_hash(col("s"))).collect().map(_.getLong(0))
    assert(out.toSeq == inputs.map(ref))
  }

  test("rolling_hash interpreted eval equals codegen result") {
    val e = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("graft"))
    val interpreted = e.eval(null)
    val viaDf = Seq("graft").toDF("s").select(rolling_hash(col("s"))).first().getLong(0)
    assert(interpreted == viaDf)
  }

  test("winnow_fingerprints selects the per-window lexicographic min gram") {
    // tokens: m z a q b -> 3-grams: ["m z a"@0, "z a q"@1, "a q b"@2];
    // w=2 windows {0,1} and {1,2}: "a q b" < "m z a" < "z a q"
    // -> window0 selects pos 0, window1 selects pos 2
    val out = Seq("m z a q b").toDF("s")
      .select(explode(winnow_fingerprints(col("s"), 3, 2)).as("fp"))
      .select("fp.pos", "fp.gram").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "m z a"), (2, "a q b")))
  }

  test("winnow_fingerprints: short docs yield the whole-text gram; few grams the global min") {
    val short = Seq("Only two").toDF("s")
      .select(explode(winnow_fingerprints(col("s"), 3, 4)).as("fp"))
      .select("fp.pos", "fp.gram").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(short == Seq((0, "only two")))
    // 4 tokens -> 2 grams < w=4 -> single global minimum
    val few = Seq("d c b a").toDF("s")
      .select(explode(winnow_fingerprints(col("s"), 3, 4)).as("fp"))
      .select("fp.pos", "fp.gram").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(few == Seq((1, "c b a")))
  }

  test("winnowing guarantee: docs sharing w+k-1 tokens share a fingerprint") {
    // property over a word-salad corpus: any shared run of w+k-1 = 6
    // tokens must produce at least one common (pos-independent) gram
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val shared = Vector.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 20).map { i =>
      val pre = Vector.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val post = Vector.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, s"$pre $shared $post".trim)
    }
    val fps = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(winnow_fingerprints(col("text"), 3, 4)).as("fp"))
      .select(col("doc_id"), col("fp.gram").as("gram"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    val common = fps.values.reduce(_ intersect _)
    assert(common.nonEmpty,
      "every doc embeds the same 6-token run; winnowing must select a shared gram")
  }

  test("winnow candidate pairs: sharing docs pair up, hot fingerprints capped out") {
    // docs 1 and 2 share a 6-token run (w+k-1) -> must pair; doc 3 is
    // disjoint vocabulary -> never pairs
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "xx yy aa bb cc dd ee ff zz"),
      (3L, "qq rr ss tt uu vv ww")).toDF("doc_id", "text")
    val pairs = graft.operators.TextAnalysis.winnowCandidatePairs(
      docs, "doc_id", "text", gramSize = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // cap: with maxBucketSize = 1 every fingerprint shared by both
    // docs is boilerplate-dropped -> no pairs survive
    val capped = graft.operators.TextAnalysis.winnowCandidatePairs(
      docs, "doc_id", "text", gramSize = 3, window = 4, maxBucketSize = 1)
      .count()
    assert(capped == 0L)
  }

  test("winnow_fingerprints interpreted eval equals the codegen result") {
    val text = "the quick brown fox jumps over the lazy dog the quick brown fox"
    val e = WinnowFingerprints(
      org.apache.spark.sql.catalyst.expressions.Literal(text), 3, 4)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaDf = Seq(text).toDF("s")
      .select(explode(winnow_fingerprints(col("s"), 3, 4)).as("fp"))
      .select("fp.pos", "fp.gram").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    val interpSeq = (0 until interpreted.numElements()).map { i =>
      val row = interpreted.getStruct(i, 2)
      (row.getInt(0), row.getUTF8String(1).toString)
    }
    assert(interpSeq == viaDf)
  }

  test("simhash64: identical token sets collide, disjoint sets differ") {
    val df = Seq(
      ("a", Seq("x", "y", "z", "w")),
      ("b", Seq("x", "y", "z", "w")),
      ("c", Seq("q", "r", "s", "t"))).toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("simhash64 near-identical sets land within small hamming distance") {
    val base = (1 to 50).map("tok" + _)
    val df = Seq(("a", base), ("b", base.updated(0, "CHANGED"))).toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(m("a") ^ m("b")) <= 8)
  }

  test("minhash_signature equals the naive per-seed minimum") {
    val shingles = Seq("aa bb", "bb cc", "cc dd")
    val sig = Seq(shingles).toDF("sh")
      .select(minhash_signature(col("sh"), 8)).first()
      .getSeq[Long](0)
    val xxh = (s: String, seed: Long) =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), seed)
    val naive = (0 until 8).map(j => shingles.map(xxh(_, j.toLong)).min)
    assert(sig == naive)
  }

  test("null inputs propagate as null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(rolling_hash(col("s"))).first()
    assert(r.isNullAt(0))
  }

  test("minhash_band_buckets_text equals the shingle-array composition") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and more words here",
      "  short  ", "one two", "x")
    for (k <- Seq(2, 3); t <- texts) {
      val df = Seq(t).toDF("text")
      val fused = df.select(minhash_band_buckets_text(col("text"), k, 32, 8))
        .first().getSeq[Long](0)
      val composed = df.select(minhash_band_buckets(
          graft.operators.Dedup.shingles(col("text"), k), 32, 8))
        .first().getSeq[Long](0)
      assert(fused == composed, s"k=$k text=$t")
    }
    assert(Seq(Option.empty[String]).toDF("text")
      .select(minhash_band_buckets_text(col("text"), 3, 32, 8)).first().isNullAt(0))
  }

  test("sorted_shingle_hashes equals the HOF composition it replaces") {
    // tricky tokenization: repeated shingles, mixed case, interior
    // newlines/tabs, leading/trailing spaces, short text (n <= k)
    val texts = Seq(
      "The quick  brown fox the quick brown fox",
      "  padded   with spaces  ",
      "line\nbreak\tand tab",
      "one",
      "TwO ToKeNs")
    for (k <- Seq(1, 2, 3); t <- texts) {
      val df = Seq(t).toDF("text")
      val fused = df.select(sorted_shingle_hashes(col("text"), k))
        .first().getSeq[Long](0)
      val hof = df.select(array_sort(transform(
          graft.operators.Dedup.shingles(col("text"), k), s => xxhash64(s))))
        .first().getSeq[Long](0)
      assert(fused == hof, s"k=$k text=$t")
    }
    // null propagates
    assert(Seq(Option.empty[String]).toDF("text")
      .select(sorted_shingle_hashes(col("text"), 2)).first().isNullAt(0))
    // interpreted eval equals the DataFrame (codegen) result
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = SortedShingleHashes(Literal("a b c a"), 2).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    val viaDf = Seq("a b c a").toDF("text")
      .select(sorted_shingle_hashes(col("text"), 2)).first().getSeq[Long](0)
    assert(interp == viaDf)
    // non-string input rejected at analysis
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(sorted_shingle_hashes(col("x"), 2)).collect()
    }
  }

  test("SQL registration exposes the functions to spark.sql") {
    registerAll(spark)
    val r = spark.sql("SELECT rolling_hash('x'), simhash64(array('a','b')), " +
      "minhash_signature(array('a','b'), 4)").first()
    assert(!r.isNullAt(0) && !r.isNullAt(1) && r.getSeq[Long](2).size == 4)
  }
}

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._
  import VectorExpressions._

  test("dot_product equals the HOF composition it replaces (float × double)") {
    val df = Seq((Seq(1.5f, -2f, 3f), Seq(2.0, 4.0, 0.5))).toDF("a", "b")
    val viaExpr = df.select(dot_product(col("a"), col("b"))).first().getDouble(0)
    val viaHof = df.select(
      aggregate(zip_with(col("a").cast("array<double>"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).first().getDouble(0)
    assert(viaExpr == viaHof)
    assert(viaExpr == -3.5)
  }

  test("dot_product interpreted eval equals the codegen (DataFrame) result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = Literal.create(Seq(0.25, -1.0, 8.0), ArrayType(DoubleType))
    val b = Literal.create(Seq(4.0, 3.0, 0.5), ArrayType(DoubleType))
    val interpreted = DotProduct(a, b).eval(null)
    val viaDf = Seq((Seq(0.25, -1.0, 8.0), Seq(4.0, 3.0, 0.5))).toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).first().getDouble(0)
    assert(interpreted == viaDf)
    assert(viaDf == 0.25 * 4.0 + -1.0 * 3.0 + 8.0 * 0.5)
  }

  test("length mismatch walks the shorter side; null elements contribute zero") {
    val r = Seq((Seq(Some(2.0), None, Some(5.0)), Seq(3.0, 9.0, 9.0, 9.0)))
      .toDF("a", "b").select(dot_product(col("a"), col("b"))).first().getDouble(0)
    assert(r == 2.0 * 3.0 + 5.0 * 9.0)
  }

  test("null array propagates null; integer arrays accumulate exactly") {
    val nullRow = Seq((Option.empty[Seq[Double]], Seq(1.0)))
      .toDF("a", "b").select(dot_product(col("a"), col("b"))).first()
    assert(nullRow.isNullAt(0))
    val ints = Seq((Seq(1000000L, -3L), Seq(1000000L, 2L))).toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).first().getDouble(0)
    assert(ints == 1e12 - 6)
  }

  test("SQL registration exposes dot_product to spark.sql") {
    registerAll(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .first().getDouble(0)
    assert(r == 11.0)
  }

  test("non-numeric array input is rejected at analysis") {
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
        .select(dot_product(col("a"), col("b"))).collect()
    }
  }

  test("word_ngrams fused kernel == the HOF composition it replaced") {
    import org.apache.spark.sql.functions._
    val docs = Seq("the quick brown fox", "one", "", "  padded  text ",
      "a a a a a", "MiXeD CaSe Words Here").toDF("text")
    for (n <- Seq(1, 2, 3)) {
      val toks = split(trim(lower(col("text"))), "\\s+")
      val hof =
        if (n == 1) toks
        else filter(
          transform(toks, (_, i) =>
            when(i + n <= size(toks),
              concat_ws(" ", slice(toks, i + lit(1), lit(n))))),
          g => g.isNotNull)
      val got = docs.select(
        TextExpressions.word_ngrams(col("text"), n).as("a"), hof.as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$r")
      }
    }
  }
}

class DedupTokensSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("dedup_tokens_in_doc keeps first occurrences in order") {
    val out = Seq("a b a c b a", "x", "", "  pad  pad x ", "A a A")
      .toDF("text")
      .select(TextExpressions.dedup_tokens_in_doc(col("text")).as("d"))
      .select($"d.clean_text", $"d.n_tokens", $"d.n_removed")
      .collect()
    assert(out(0).getString(0) == "a b c" && out(0).getLong(1) == 6L
      && out(0).getLong(2) == 3L)
    assert(out(1).getString(0) == "x" && out(1).getLong(2) == 0L)
    // empty text tokenizes to one empty token, nothing removed
    assert(out(2).getString(0) == "" && out(2).getLong(1) == 1L
      && out(2).getLong(2) == 0L)
    // inner runs of whitespace collapse; dedup identity is the exact
    // (case-sensitive) token
    assert(out(3).getString(0) == "pad x" && out(3).getLong(2) == 1L)
    assert(out(4).getString(0) == "A a" && out(4).getLong(2) == 1L)
  }

  test("dedup_tokens_in_doc is null-intolerant and idempotent") {
    val df = Seq(Some("b b a b"), None).toDF("text")
      .select(TextExpressions.dedup_tokens_in_doc(col("text")).as("d"))
    val rows = df.collect()
    assert(rows(1).isNullAt(0))
    val once = rows(0).getStruct(0).getString(0)
    val twice = Seq(once).toDF("text")
      .select(TextExpressions.dedup_tokens_in_doc(col("text")).as("d"))
      .select($"d.clean_text").as[String].collect()(0)
    assert(once == "b a" && twice == once)
  }
}
