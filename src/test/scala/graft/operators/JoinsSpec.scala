package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // --- intervalOverlapJoin --------------------------------------------

  private val leftIv = Seq(
    (1L, d("2024-01-01"), d("2024-01-10")),  // long interval
    (2L, d("2024-01-05"), d("2024-01-06")),  // short, inside A's window
    (3L, d("2024-02-01"), d("2024-02-02")),  // far away
    (4L, d("2024-01-10"), d("2024-01-05"))   // inverted -> never matches
  ).toDF("l_id", "l_start", "l_end")

  private val rightIv = Seq(
    (10L, d("2024-01-04"), d("2024-01-07")),  // overlaps 1 and 2
    (20L, d("2024-01-09"), d("2024-01-12")),  // overlaps 1 only (tail)
    (30L, d("2024-01-10"), d("2024-01-11")),  // touches 1's end -> half-open, no overlap
    (40L, d("2023-12-20"), d("2024-01-02"))   // overlaps 1's head across a bin edge
  ).toDF("r_id", "r_start", "r_end")

  private def overlapPairs(binWidth: String): Set[(Long, Long)] =
    Joins.intervalOverlapJoin(leftIv, rightIv,
        "l_start", "l_end", "r_start", "r_end", binWidth = binWidth)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

  private val expectedPairs = Set((1L, 10L), (2L, 10L), (1L, 20L), (1L, 40L))

  test("interval overlap finds exactly the overlapping pairs, half-open") {
    assert(overlapPairs("7 days") == expectedPairs)
  }

  test("interval overlap emits each pair EXACTLY once regardless of bin width") {
    // a 1-day width makes every pair share many bins — the ownership
    // rule must still emit one row per pair
    for (w <- Seq("1 day", "2 days", "30 days")) {
      val rows = Joins.intervalOverlapJoin(leftIv, rightIv,
          "l_start", "l_end", "r_start", "r_end", binWidth = w)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(rows.toSet == expectedPairs, s"wrong pair set at binWidth=$w")
    }
  }

  test("interval overlap with keys restricts to matching key pairs") {
    val lk = leftIv.withColumn("l_grp", ($"l_id" % 2).cast("int"))
    val rk = rightIv.withColumn("r_grp", lit(1))
    val out = Joins.intervalOverlapJoin(lk, rk,
        "l_start", "l_end", "r_start", "r_end", binWidth = "7 days",
        keys = Seq("l_grp" -> "r_grp"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // only odd l_ids carry grp=1
    assert(out == expectedPairs.filter(_._1 % 2 == 1))
  }

  test("degenerate interval past the bin cap fails loudly") {
    val wide = Seq((9L, d("1970-01-01"), d("2024-01-01"))).toDF("l_id", "l_start", "l_end")
    val ex = intercept[Exception] {
      Joins.intervalOverlapJoin(wide, rightIv,
        "l_start", "l_end", "r_start", "r_end",
        binWidth = "1 day", maxBinsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("intervalOverlapJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("intervalOverlapJoin")))
  }

  // --- bloomPrefilteredJoin -------------------------------------------

  private val fact = (1L to 1000L).map(i => (i, i % 97)).toDF("f_key", "f_val")
  private val dim = Seq((5L, "a"), (700L, "b"), (999L, "c"), (4000L, "d"))
    .toDF("d_key", "d_tag")

  test("bloom-prefiltered inner join equals the plain join") {
    val out = Joins.bloomPrefilteredJoin(fact, dim, "f_key", "d_key",
        expectedDimKeys = 10)
      .select("f_key", "d_tag").as[(Long, String)].collect().toSet
    val plain = fact.join(dim, $"f_key" === $"d_key")
      .select("f_key", "d_tag").as[(Long, String)].collect().toSet
    assert(out == plain)
    assert(out == Set((5L, "a"), (700L, "b"), (999L, "c")))
  }

  test("bloom-prefiltered left_semi keeps fact columns only, exact rows") {
    val out = Joins.bloomPrefilteredJoin(fact, dim, "f_key", "d_key",
        expectedDimKeys = 10, joinType = "left_semi")
    assert(out.columns.toSeq == Seq("f_key", "f_val"))
    assert(out.select("f_key").as[Long].collect().toSet == Set(5L, 700L, 999L))
  }

  test("prefilter-unsafe join types are rejected") {
    for (t <- Seq("left_outer", "full_outer", "left_anti")) {
      val ex = intercept[IllegalArgumentException] {
        Joins.bloomPrefilteredJoin(fact, dim, "f_key", "d_key", 10, joinType = t)
      }
      assert(ex.getMessage.contains("prefilter-safe"))
    }
  }

  test("an undersized filter still returns the exact result (fpp up, rows never lost)") {
    val out = Joins.bloomPrefilteredJoin(fact, dim, "f_key", "d_key",
        expectedDimKeys = 1, fpp = 0.5)
      .select("f_key").as[Long].collect().toSet
    assert(out == Set(5L, 700L, 999L))
  }
}
