package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Test => SCTest, Prop}

import graft.SparkTestBase
import graft.functions.TextExpressions.SortedIntersectCount
import graft.operators.Dedup

/** Property-based checks. The expression-level properties eval the
  * Catalyst expression directly (no Spark jobs), so scalacheck can
  * afford hundreds of cases; the graph property runs full Spark jobs
  * and uses a handful of fixed-seed random graphs instead.
  */
class PropertySpec extends SparkTestBase {

  private def longArrayLit(xs: Array[Long]) =
    Literal.create(xs, ArrayType(LongType, containsNull = false))

  test("sorted_intersect_count == |A ∩ B| for arbitrary long sets") {
    val genSet = Gen.containerOf[Set, Long](Gen.chooseNum(-50L, 50L))
    val prop = Prop.forAll(genSet, genSet) { (sa: Set[Long], sb: Set[Long]) =>
      val a = sa.toArray.sorted
      val b = sb.toArray.sorted
      val got = SortedIntersectCount(longArrayLit(a), longArrayLit(b))
        .eval(null).asInstanceOf[Int]
      got == (sa intersect sb).size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("KLL rank bound holds for arbitrary streams and merge orders") {
    // the qsk/st26 contract, property-checked off-Spark: for ANY
    // value distribution (duplicates, constants, adversarial order)
    // and ANY chunking/merge order, every quantile's true rank sits
    // within eps*n of target, count is lossless, and serde is exact
    val genVals = Gen.chooseNum(1, 4000).flatMap(n =>
      Gen.containerOfN[List, Double](n, Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.chooseNum(-5.0, 5.0),
        Gen.const(42.0)))) // heavy duplicate mass
    val genChunk = Gen.chooseNum(1, 7)
    val prop = Prop.forAll(genVals, genChunk) { (vs: List[Double], c: Int) =>
      val chunks = vs.grouped(math.max(1, vs.size / c)).toVector
      val parts = chunks.map { ch =>
        val s = new KllSketch.State(128)
        ch.foreach(KllSketch.update(s, _))
        s
      }
      // deterministic scrambled fold order
      val order = parts.indices.sortBy(i => (i * 131 + 17) % parts.size)
      val merged0 = order.map(parts).reduceLeft(KllSketch.merge)
      val merged = KllSketch.deserialize(KllSketch.serialize(merged0))
      val n = vs.size
      val sorted = vs.sorted
      val eps = 0.05 // 128-capacity sketch: expected error ~0.013
      merged.count == n.toLong && Seq(0.1, 0.5, 0.9).forall { q =>
        val est = KllSketch.quantile(merged, q)
        val lo = sorted.count(_ < est)
        val hi = sorted.count(_ <= est)
        val target = math.max(1L, math.ceil(q * n).toLong)
        vs.contains(est) &&
          target >= lo + 1 - eps * n && target <= hi + eps * n
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("positional and sorted shingle kernels agree for arbitrary text") {
    // the documented contract dd8/dd10 parity rests on: the sorted
    // kernel IS the positional kernel's output sorted + deduplicated,
    // including the short-doc whole-text gram and whitespace edge cases
    import org.apache.spark.unsafe.types.UTF8String
    val genText = Gen.listOf(Gen.oneOf(
      Gen.oneOf("a", "b", "word", "XY", "", " ", "  ", "\t"),
      Gen.alphaNumStr.map(_.take(6)))).map(_.mkString(" "))
    val genK = Gen.chooseNum(1, 4)
    val prop = Prop.forAll(genText, genK) { (text: String, k: Int) =>
      val u = UTF8String.fromString(text)
      val pos = TextExpressions.positionalShingleHashKernel(u, k, 42L).toLongArray()
      val sorted = TextExpressions.shingleHashKernel(u, k, 42L).toLongArray()
      pos.toSet == sorted.toSet &&
        sorted.toSeq == sorted.distinct.sorted.toSeq &&
        pos.nonEmpty // short-doc contract: never zero grams
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed star contraction collapses a 60-node chain (diameter >> rounds)") {
    import spark.implicits._
    // plain label propagation needs diameter rounds (59 > default
    // maxIter); large-star/small-star must converge in ~log rounds
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusters(chain, driverCcMaxEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 60)
    assert(labels.values.toSet == Set(1L))
  }

  test("driver union-find and distributed propagation agree on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val edges = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val pairs = edges.toDF("id_a", "id_b")
        val fast = Dedup.clusters(pairs).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Dedup.clusters(pairs, driverCcMaxEdges = 0L).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist == fast, s"edges=$edges")
      }
    }
  }
}
