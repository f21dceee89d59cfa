package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketching hot path.
  *
  * These are beyond-parity operators (the reference has no text
  * analysis; SURVEY.md §7.3#7): document fingerprinting and
  * dedup sketches. They are implemented as `Expression`s, not UDFs,
  * so they stay inside whole-stage codegen and evaluate in a single
  * pass over the token array — at 100 TB the difference between one
  * fused loop per row and k materialized intermediate arrays per row
  * is the whole game.
  */
object TextExpressions {

  /** Polynomial rolling hash (Rabin-Karp style) over a string's UTF-8
    * bytes: h = h * 31 + byte, 64-bit wrapping. Deterministic document
    * fingerprint; full codegen.
    */
  case class RollingHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "rolling_hash"

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
           |byte[] $bytes = $c.getBytes();
           |long $h = 0L;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $h = $h * 31L + ($bytes[$i] & 0xffL);
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  /** [[tokenHash64]] (rolling-31 + fmix64 avalanche) as a standalone
    * expression — the portable SEEDABLE hash for anything that needs
    * uniform 64-bit values from short strings (the bare polynomial
    * leaves high bits zero on short input; see [[tokenHash64]]'s
    * scaladoc for why xxhash64 has no SQL replay). Full codegen. */
  case class TokenHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "token_hash64"

    override protected def nullSafeEval(input: Any): Any =
      tokenHash64(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.tokenHash64($c);")

    override protected def withNewChildInternal(newChild: Expression): TokenHash64Expr =
      copy(child = newChild)
  }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) via `java.text
    * .Normalizer`, as a codegen expression: the canonicalization
    * every dedup/fingerprint pass should run first, since visually
    * identical strings with different codepoint sequences (composed
    * vs combining accents, compatibility forms) otherwise hash
    * apart. The form is resolved at plan time; the generated code
    * calls the JDK normalizer directly — no UDF, no fallback.
    */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    private val resolvedForm = java.text.Normalizer.Form.valueOf(form)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "unicode_normalize"

    override protected def nullSafeEval(input: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString, resolvedForm))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  java.text.Normalizer.normalize($c.toString(),
           |    java.text.Normalizer.Form.${resolvedForm.name()}));
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
      copy(child = newChild)
  }

  /** Replayable 64-bit token hash for [[SimHash64]]: the rolling-31
    * polynomial over UTF-8 bytes ([[RollingHash]]'s fold) finished
    * with the Murmur3 fmix64 avalanche. Every step is 64-bit wrapping
    * multiply / xor / logical shift, so an engine with 128-bit
    * integers replays it exactly in SQL (the dd3 oracle unrolls the
    * fold with a HUGEINT list_reduce and the finalizer with split
    * 32-bit multiplies) — unlike xxhash64, whose striped internal
    * state has no portable SQL form. fmix64 restores the bit
    * uniformity the bare polynomial lacks: short ASCII tokens leave
    * the high hash bits zero, which would freeze the upper simhash
    * chunks and collapse the pigeonhole blocking. */
  def tokenHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** 64-bit SimHash over an array of tokens. Each token is hashed
    * with [[tokenHash64]] (SQL-replayable, see the dd3 oracle); per
    * bit position the +1/-1 votes are summed and the sign becomes the
    * output bit. Near-duplicate documents land within small Hamming
    * distance. Single pass; full codegen.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash64"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = tokenHash64(arr.getUTF8String(i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val counts = ctx.freshName("counts")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val b = ctx.freshName("b")
        val out = ctx.freshName("out")
        s"""
           |int[] $counts = new int[64];
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    long $h = graft.functions.TextExpressions.tokenHash64($c.getUTF8String($i));
           |    for (int $b = 0; $b < 64; $b++) {
           |      $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $out = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] > 0) $out |= (1L << $b);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the input shingle set. One pass over
    * the shingles; k running minima; no intermediate arrays.
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_signature"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          var j = 0
          while (j < numHashes) {
            val h = XXH64.hashUTF8String(s, j.toLong)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val mins = ctx.freshName("mins")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val s = ctx.freshName("s")
        val xxh = classOf[XXH64].getName
        val gad = classOf[GenericArrayData].getName
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
           |    for (int $j = 0; $j < $numHashes; $j++) {
           |      long $h = $xxh.hashUTF8String($s, (long) $j);
           |      if ($h < $mins[$j]) $mins[$j] = $h;
           |    }
           |  }
           |}
           |${ev.value} = new $gad($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** LSH band buckets straight from the shingle set: the MinHash
    * running minima AND the per-band bucket hashes in ONE codegen
    * pass, returning array<long> of `numBands` bucket ids. Exists
    * because composing minhash_signature with slice/concat_ws/xxhash64
    * per band builds the buckets out of higher-order functions, which
    * are CodegenFallback — measured as the dominant cost of the whole
    * LSH pipeline at sf0.1 (~3.4 s interpreted vs ~0.2 s here).
    * Bucket id = XXH64 chain over the band's minima seeded by the
    * band index, so bucket equality ⟺ band-slice equality exactly as
    * with the composed form.
    */
  case class MinHashBandBuckets(child: Expression, numHashes: Int, numBands: Int)
      extends UnaryExpression {
    require(numHashes % numBands == 0, "numHashes must be divisible by numBands")
    private def rowsPerBand = numHashes / numBands
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_band_buckets"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_buckets requires array<string>, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          var j = 0
          while (j < numHashes) {
            val h = XXH64.hashUTF8String(s, j.toLong)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
        i += 1
      }
      val out = new Array[Long](numBands)
      var b = 0
      while (b < numBands) {
        var h = b.toLong
        var j = b * rowsPerBand
        while (j < (b + 1) * rowsPerBand) { h = XXH64.hashLong(mins(j), h); j += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val mins = ctx.freshName("mins")
        val out = ctx.freshName("out")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val s = ctx.freshName("s")
        val xxh = classOf[XXH64].getName
        val gad = classOf[GenericArrayData].getName
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |int $n = $c.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$c.isNullAt($i)) {
           |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
           |    for (int $j = 0; $j < $numHashes; $j++) {
           |      long $h = $xxh.hashUTF8String($s, (long) $j);
           |      if ($h < $mins[$j]) $mins[$j] = $h;
           |    }
           |  }
           |}
           |long[] $out = new long[$numBands];
           |for (int $b = 0; $b < $numBands; $b++) {
           |  long $h = (long) $b;
           |  for (int $j = $b * $rowsPerBand; $j < ($b + 1) * $rowsPerBand; $j++) {
           |    $h = $xxh.hashLong($mins[$j], $h);
           |  }
           |  $out[$b] = $h;
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
      copy(child = newChild)
  }

  /** |A ∩ B| for two SORTED long arrays via a single merge scan — the
    * inner loop of pairwise Jaccard at millions of pairs. No hash-set
    * allocation per call (unlike array_intersect); full codegen.
    * Inputs must be sorted ascending and duplicate-free (array_sort ∘
    * array_distinct), which the dedup operators guarantee.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sorted_intersect_count"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires (array<bigint>, array<bigint>), got $other")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0
      val nx = x.numElements(); val ny = y.numElements()
      while (i < nx && j < ny) {
        val vx = x.getLong(i); val vy = y.getLong(j)
        if (vx == vy) { n += 1; i += 1; j += 1 }
        else if (vx < vy) i += 1
        else j += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val vx = ctx.freshName("vx"); val vy = ctx.freshName("vy")
        s"""
           |int $i = 0, $j = 0, $n = 0;
           |int $nx = $a.numElements(), $ny = $b.numElements();
           |while ($i < $nx && $j < $ny) {
           |  long $vx = $a.getLong($i); long $vy = $b.getLong($j);
           |  if ($vx == $vy) { $n++; $i++; $j++; }
           |  else if ($vx < $vy) { $i++; }
           |  else { $j++; }
           |}
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** The per-row kernel of [[SortedShingleHashes]], shared verbatim by
    * interpreted eval and generated code (the generated Java calls the
    * static forwarder — one virtual call per ROW is noise next to the
    * tokenization itself, and it keeps the two paths identical by
    * construction).
    *
    * Tokenization replicates `split(lower(trim(text)), "\\s+")` at
    * UTF8String level (Spark's trim strips spaces only; split keeps a
    * leading empty token) so the hash values are EXACTLY those of
    * `array_sort(transform(shingles(text, k), xxhash64))` — Spark's
    * `xxhash64` is XXH64 with seed 42 — with duplicates removed after
    * hashing instead of before (same set, collisions ~2^-64).
    */
  def shingleHashKernel(text: UTF8String, k: Int, seed: Long): ArrayData = {
    // ONE tokenize/gram/hash contract: the positional kernel produces
    // the hashes in document order; this form is exactly its output
    // sorted and deduplicated (so the two can never drift apart —
    // dd8/dd10 oracle parity depends on them agreeing)
    val hashes = positionalHashArray(text, k, seed)
    java.util.Arrays.sort(hashes)
    var w = 0
    var i = 0
    while (i < hashes.length) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  /** The per-row kernel of [[MinHashBandBucketsFromText]]: tokenize →
    * k-gram → per-seed minima → band-bucket chain, one pass, no
    * intermediate shingle array. Hash values identical to
    * `minhash_band_buckets(shingles(text, k), H, B)`: min-hash over
    * the k-gram MULTISET equals min-hash over the distinct set, so
    * skipping the distinct changes nothing. */
  def minHashBandKernel(text: UTF8String, k: Int,
      numHashes: Int, numBands: Int): ArrayData = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    def update(s: String): Unit = {
      val u = UTF8String.fromString(s)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashUTF8String(u, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    if (toks.length <= k) update(toks.mkString(" "))
    else {
      val m = toks.length - k + 1
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        update(sb.toString)
        i += 1
      }
    }
    val rowsPerBand = numHashes / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = b.toLong
      var j = b * rowsPerBand
      while (j < (b + 1) * rowsPerBand) { h = XXH64.hashLong(mins(j), h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** [[MinHashBandBuckets]] fused with the shingling itself: takes the
    * raw TEXT column so the interpreted `transform`/`concat_ws`
    * shingle-array construction disappears from the LSH signature
    * stage. Values are identical to the composition it replaces. */
  case class MinHashBandBucketsFromText(
      child: Expression, k: Int, numHashes: Int, numBands: Int)
      extends UnaryExpression {
    require(numHashes % numBands == 0, "numHashes must be divisible by numBands")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_band_buckets_text"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_buckets_text requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      minHashBandKernel(input.asInstanceOf[UTF8String], k, numHashes, numBands)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.minHashBandKernel(" +
          s"$c, $k, $numHashes, $numBands);")

    override protected def withNewChildInternal(
        newChild: Expression): MinHashBandBucketsFromText =
      copy(child = newChild)
  }

  /** Fixed-width bitmask of a document's word k-shingles over a CLOSED
    * vocabulary, in one fused pass over the text: tokenize → k-gram →
    * vocab index lookup → set bit. Replaces the relational encode
    * (explode + broadcast vocab join + `bit_or` aggregate) with a
    * single projection — the per-call vocabulary map lives in the
    * expression (broadcast with the serialized plan; vocab is capped
    * at ~1K entries) and builds once per task. Tokens outside the
    * vocabulary are ignored, which is exactly the closed-vocab
    * CONTRACT the bitset Jaccard paths document; the matched-set size
    * needed for |union| is the mask's popcount, so no separate count
    * survives either.
    */
  case class BitsetShingleMask(child: Expression, k: Int, vocab: Seq[String])
      extends UnaryExpression {
    private val words = (vocab.size + 63) / 64
    require(words <= 16, s"bitset mask needs |vocab| <= 1024, got ${vocab.size}")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bitset_shingle_mask"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitset_shingle_mask requires a string column, got ${other.catalogString}")
      }

    @transient private lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.zipWithIndex.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
      m
    }

    /** Instance kernel (needs the vocab map); generated code calls it
      * through a plan reference object. */
    def kernel(text: UTF8String): ArrayData = {
      val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
      val mask = new Array[Long](words)
      def set(s: String): Unit = {
        val idx = index.get(s)
        if (idx != null) mask(idx >> 6) |= (1L << (idx & 63))
      }
      if (toks.length <= k) set(toks.mkString(" "))
      else {
        val m = toks.length - k + 1
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          set(sb.toString)
          i += 1
        }
      }
      new GenericArrayData(mask)
    }

    override protected def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bitsetMask", this, classOf[BitsetShingleMask].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): BitsetShingleMask =
      copy(child = newChild)
  }

  /** Sorted distinct XXH64 hashes of a document's word k-shingles in
    * ONE fused pass over the text. The composition it replaces —
    * `array_sort(transform(array_distinct(<k-gram transform>),
    * xxhash64))` — stacks three `ArrayTransform`-family higher-order
    * functions, every one CodegenFallback (interpreted, one
    * intermediate array each); worse, as a PROJECTION it can be
    * collapsed by Catalyst into downstream joins and re-evaluated per
    * join-output row. This expression is the base of every hashed
    * Jaccard path (prefix, all-pairs, bipartite).
    */
  case class SortedShingleHashes(child: Expression, k: Int, seed: Long = 42L)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "sorted_shingle_hashes"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_shingle_hashes requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      shingleHashKernel(input.asInstanceOf[UTF8String], k, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.shingleHashKernel($c, $k, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): SortedShingleHashes =
      copy(child = newChild)
  }

  /** Word k-gram hashes in POSITION order — the span-aware sibling of
    * [[SortedShingleHashes]]: element i is the hash of the gram
    * starting at word i, NOT sorted and NOT deduplicated, so
    * `posexplode` recovers (word_offset, gram_hash) pairs. Same
    * tokenization, same short-doc contract (a doc with fewer than `k`
    * words yields ONE whole-text gram at position 0), same hash values
    * as the sorted form — only the ordering differs. Used by
    * span-level decontamination, where WHERE a gram matched matters.
    */
  case class PositionalShingleHashes(child: Expression, k: Int, seed: Long = 42L)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "positional_shingle_hashes"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_shingle_hashes requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      positionalShingleHashKernel(input.asInstanceOf[UTF8String], k, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.positionalShingleHashKernel($c, $k, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): PositionalShingleHashes =
      copy(child = newChild)
  }

  /** Kernel of [[PositionalShingleHashes]] — [[shingleHashKernel]]
    * without the sort/dedup tail, preserving gram order. */
  def positionalShingleHashKernel(text: UTF8String, k: Int, seed: Long): ArrayData =
    new GenericArrayData(positionalHashArray(text, k, seed))

  /** The single tokenize→k-gram→hash loop both shingle kernels share:
    * element i is the hash of the gram starting at word i; a doc with
    * fewer than k words yields one whole-text gram. */
  private def positionalHashArray(text: UTF8String, k: Int, seed: Long): Array[Long] = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (toks.length <= k)
      Array(XXH64.hashUTF8String(UTF8String.fromString(toks.mkString(" ")), seed))
    else {
      val m = toks.length - k + 1
      val out = new Array[Long](m)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), seed)
        i += 1
      }
      out
    }
  }

  /** Word n-grams of the lowercased whitespace tokens as space-joined
    * strings, NON-distinct, in one fused codegen pass. Replaces the
    * `filter(transform(tokens, slice+concat_ws))` HOF stack
    * (CodegenFallback, per-element slice allocation) everywhere a
    * gram LIST is needed — measured 2x+ on the bigram-LM corpus pass.
    */
  case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "n-gram size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "word_ngrams"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      wordNgramsKernel(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.wordNgramsKernel($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): WordNgrams =
      copy(child = newChild)
  }

  /** Kernel of [[WordNgrams]]; tokenization matches
    * `split(trim(lower(text)), "\\s+")` like every kernel here (for
    * n=1 this is exactly the token list, empty-string token for empty
    * input included). */
  def wordNgramsKernel(text: UTF8String, n: Int): ArrayData = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fixed-token-window chunks with overlap — the context-window
    * splitting step of a training-data pipeline. Element c is the
    * chunk starting at token c*(maxTokens-overlap), covering up to
    * `maxTokens` whitespace tokens; consecutive chunks share
    * `overlap` tokens. Chunk starts run while start <
    * max(nTokens - overlap, 1), so every token is covered, the final
    * chunk always carries at least one token beyond the overlap, and
    * a doc with <= maxTokens tokens yields exactly one chunk.
    * Case-PRESERVING (chunks feed training; only trim, no lower),
    * unlike the hashing kernels above. One fused pass, full codegen.
    * Returns array<struct<chunk_text: string, n_tokens: int>>.
    */
  case class ChunkTokens(child: Expression, maxTokens: Int, overlap: Int)
      extends UnaryExpression {
    require(maxTokens >= 1 && overlap >= 0 && overlap < maxTokens,
      s"need maxTokens >= 1 and 0 <= overlap < maxTokens, got ($maxTokens, $overlap)")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("chunk_text", StringType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "chunk_tokens"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_tokens requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      chunkTokensKernel(input.asInstanceOf[UTF8String], maxTokens, overlap)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.chunkTokensKernel($c, $maxTokens, $overlap);")

    override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
      copy(child = newChild)
  }

  /** Kernel of [[ChunkTokens]]; tokenization is `split(trim(text),
    * "\\s+")` — NOT lowercased (the one kernel here that feeds model
    * input rather than a hash). */
  def chunkTokensKernel(text: UTF8String, maxTokens: Int, overlap: Int): ArrayData = {
    val toks = text.trim().toString.split("\\s+", -1)
    val n = toks.length
    val stride = maxTokens - overlap
    val bound = math.max(n - overlap, 1) // starts: 0, stride, ... < bound
    val nChunks = (bound + stride - 1) / stride
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      val start = c * stride
      val end = math.min(start + maxTokens, n)
      sb.setLength(0)
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(c) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(sb.toString), end - start))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): over the doc's word k-gram sequence, every window of
    * `w` consecutive grams selects its minimum, and the distinct
    * selections are the doc's fingerprints. Guarantee: any two docs
    * sharing a run of `w + k - 1` tokens share at least one
    * fingerprint — so fingerprint equality is a RECALL-complete
    * blocking key for long shared substrings, at ~2/(w+1) the density
    * of the full gram set.
    *
    * The selection order is (gram text, position) — lexicographic by
    * UTF-8 byte order, earliest occurrence winning ties — rather than
    * classic hash order, so an external SQL engine can replay the
    * selection exactly (document-identical in DuckDB's default binary
    * collation). Tokenization matches the hashing kernels
    * (lowercased whitespace split); a doc with <= k words yields its
    * whole text as the single gram, and fewer grams than `w` winnow
    * to the single global minimum. Selected positions are
    * non-decreasing across windows, so consecutive-duplicate removal
    * in the fused loop is a full dedup. Row-local, full codegen.
    * Returns array<struct<pos: int, gram: string>>.
    */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got ($k, $w)")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "winnow_fingerprints"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      winnowFingerprintsKernel(input.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.winnowFingerprintsKernel($c, $k, $w);")

    override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
      copy(child = newChild)
  }

  /** Kernel of [[WinnowFingerprints]]. O(m·w) compares with small
    * constant (w is single-digit in practice); the min candidate is
    * re-scanned only when it falls out of the window. */
  def winnowFingerprintsKernel(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val grams: Array[UTF8String] =
      if (toks.length <= k)
        Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val m = toks.length - k + 1
        val out = new Array[UTF8String](m)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        out
      }
    val m = grams.length
    val nWin = math.max(m - w + 1, 1)
    val sel = new java.util.ArrayList[Any](nWin)
    var minPos = -1
    var lastSel = -1
    var i = 0
    while (i < nWin) {
      val end = math.min(i + w, m)
      if (minPos < i) {
        // previous minimum left the window: full re-scan
        minPos = i
        var p = i + 1
        while (p < end) {
          if (grams(p).compareTo(grams(minPos)) < 0) minPos = p
          p += 1
        }
      } else {
        // only the incoming gram can displace the current minimum
        val in = end - 1
        if (in > minPos && grams(in).compareTo(grams(minPos)) < 0) minPos = in
      }
      if (minPos != lastSel) {
        sel.add(new GenericInternalRow(Array[Any](minPos, grams(minPos))))
        lastSel = minPos
      }
      i += 1
    }
    new GenericArrayData(sel.toArray)
  }

  /** DEFLATE compression ratio of the UTF-8 text:
    * compressed_size / raw_size, the classic redundancy signal for
    * boilerplate/template detection (highly repetitive text
    * compresses far below ~0.4; natural prose sits higher). Empty
    * input reports 1.0. Row-local, full codegen; the Deflater is
    * allocated per call (no shared native state across rows — plan
    * re-evaluation and task retries stay safe). Deterministic for a
    * given JDK's bundled zlib; treat it as a SIGNAL (thresholds,
    * ordering), not a portable hash — different zlib builds may
    * differ by a byte or two.
    */
  case class DeflateRatio(child: Expression, level: Int = 6)
      extends UnaryExpression {
    require(level >= 1 && level <= 9, s"deflate level in [1,9], got $level")
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "deflate_ratio"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_ratio requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      deflateRatioKernel(input.asInstanceOf[UTF8String], level)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextExpressions.deflateRatioKernel($c, $level);")

    override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
      copy(child = newChild)
  }

  /** Kernel of [[DeflateRatio]]. */
  def deflateRatioKernel(text: UTF8String, level: Int): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  /** Per-document repetition statistics in ONE fused row-local pass:
    * tokenize -> word n-grams -> in-row hash-count -> top gram. The
    * relational form (explode grams -> groupBy(doc, gram) -> groupBy
    * doc) shuffles every gram STRING corpus-wide twice to compute a
    * quantity that never leaves the row — at 100 TB that is two
    * exchanges of the whole corpus re-keyed, for a per-row loop.
    * Returns null when the doc has fewer than `n` words (mirroring
    * the explode form, which drops such docs).
    *
    * Struct fields: n_words, n_distinct_words, n_grams, top_gram
    * (most frequent n-gram, ties -> lexicographically smallest),
    * top_count.
    */
  case class RepetitionStats(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "n-gram size must be >= 1")
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_distinct_words", LongType, nullable = false),
      StructField("n_grams", LongType, nullable = false),
      StructField("top_gram", StringType, nullable = false),
      StructField("top_count", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "repetition_stats"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      repetitionKernel(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.TextExpressions.repetitionKernel($c, $n);
        ${ev.isNull} = ${ev.value} == null;""")

    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
  }

  /** The per-row kernel of [[RepetitionStats]]; tokenization matches
    * `split(trim(lower(text)), "\\s+")` like every kernel here. */
  def repetitionKernel(text: UTF8String, n: Int): InternalRow = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (toks.length < n) return null
    val distinct = new java.util.HashSet[String]()
    var t = 0
    while (t < toks.length) { distinct.add(toks(t)); t += 1 }
    val nGrams = toks.length - n + 1
    val counts = new java.util.HashMap[String, Long](nGrams * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var topGram: String = null
    var topCount = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      // tie-break in UTF-8 byte order (what Spark/DuckDB string
      // comparison uses), not UTF-16 code-unit order
      if (c > topCount ||
          (c == topCount && (topGram == null ||
            UTF8String.fromString(e.getKey).compareTo(
              UTF8String.fromString(topGram)) < 0))) {
        topCount = c
        topGram = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, distinct.size.toLong, nGrams.toLong,
      UTF8String.fromString(topGram), topCount))
  }

  /** Intra-document repeated-token removal (Gopher-style repetition
    * hygiene at token granularity): keep the FIRST occurrence of each
    * exact whitespace token, in order, and report how many were cut.
    * Row-local single pass over an insertion-ordered hash set — O(n)
    * per document (the higher-order-function formulation with
    * array_position is O(n²) and falls out of whole-stage codegen);
    * no shuffle, streams as-is.
    */
  case class DedupTokensInDoc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("clean_text", StringType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_removed", LongType, nullable = false)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "dedup_tokens_in_doc"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dedup_tokens_in_doc requires a string column, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      dedupTokensKernel(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.TextExpressions.dedupTokensKernel($c);""")

    override protected def withNewChildInternal(newChild: Expression): DedupTokensInDoc =
      copy(child = newChild)
  }

  /** Per-row kernel of [[DedupTokensInDoc]]: tokenization matches
    * `split(trim(text), "\\s+")` (case-preserving — dedup identity is
    * the exact token), reassembly single-spaced. */
  def dedupTokensKernel(text: UTF8String): InternalRow = {
    val toks = text.trim().toString.split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val sb = new java.lang.StringBuilder
    val it = seen.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(' ')
      sb.append(it.next()); first = false
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      toks.length.toLong, (toks.length - seen.size).toLong))
  }

  // ---- Column-level API ----

  def dedup_tokens_in_doc(c: Column): Column =
    ExpressionUtils.column(DedupTokensInDoc(ExpressionUtils.expression(c)))

  def rolling_hash(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))

  def token_hash64(c: Column): Column =
    ExpressionUtils.column(TokenHash64Expr(ExpressionUtils.expression(c)))

  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))

  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))

  def minhash_signature(c: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(c), numHashes))

  def minhash_band_buckets(c: Column, numHashes: Int, numBands: Int): Column =
    ExpressionUtils.column(MinHashBandBuckets(ExpressionUtils.expression(c), numHashes, numBands))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sorted_shingle_hashes(c: Column, k: Int): Column =
    ExpressionUtils.column(SortedShingleHashes(ExpressionUtils.expression(c), k))

  def minhash_band_buckets_text(c: Column, k: Int, numHashes: Int, numBands: Int): Column =
    ExpressionUtils.column(MinHashBandBucketsFromText(
      ExpressionUtils.expression(c), k, numHashes, numBands))

  def bitset_shingle_mask(c: Column, k: Int, vocab: Seq[String]): Column =
    ExpressionUtils.column(BitsetShingleMask(ExpressionUtils.expression(c), k, vocab))

  def repetition_stats(c: Column, n: Int): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c), n))

  def word_ngrams(c: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(c), n))

  def positional_shingle_hashes(c: Column, k: Int): Column =
    ExpressionUtils.column(PositionalShingleHashes(ExpressionUtils.expression(c), k))

  def chunk_tokens(c: Column, maxTokens: Int, overlap: Int): Column =
    ExpressionUtils.column(ChunkTokens(ExpressionUtils.expression(c), maxTokens, overlap))

  def deflate_ratio(c: Column, level: Int = 6): Column =
    ExpressionUtils.column(DeflateRatio(ExpressionUtils.expression(c), level))

  def winnow_fingerprints(c: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(c), k, w))

  /** Register the SQL forms (`rolling_hash`, `simhash64`,
    * `minhash_signature`) in a session's function registry. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignature(exprs.head,
        FunctionArgs.constInt("minhash_signature", "k", exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_band_buckets",
      exprs => MinHashBandBuckets(exprs.head,
        FunctionArgs.constInt("minhash_band_buckets", "k", exprs(1)),
        FunctionArgs.constInt("minhash_band_buckets", "bands", exprs(2))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => UnicodeNormalize(exprs.head,
        exprs(1).eval(InternalRow.empty).toString), "scala_udf")
    reg.createOrReplaceTempFunction(
      "dedup_tokens_in_doc",
      exprs => DedupTokensInDoc(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "repetition_stats",
      exprs => RepetitionStats(exprs.head,
        FunctionArgs.constInt("repetition_stats", "n", exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.VectorExpressions.DotProduct(
        exprs.head, exprs(1)), "scala_udf")
  }
}
