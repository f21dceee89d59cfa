package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.{lit, when}

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "e1"),
    (1L, ts("2024-01-01 11:00:00"), "e2"),
    (1L, ts("2024-01-01 12:00:00"), "e3"),
    (2L, ts("2024-01-01 10:30:00"), "e4")).toDF("user_id", "ts", "tag")

  private val right = Seq(
    (1L, ts("2024-01-01 09:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 200.0),   // tie with e2 -> matches
    (2L, ts("2024-01-01 11:00:00"), 300.0)    // after e4 -> no match
  ).toDF("user_id", "ts", "v")

  test("backward as-of picks the latest right row at-or-before each left ts") {
    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("e1").contains(100.0))   // 09:00 is latest <= 10:00
    assert(out("e2").contains(200.0))   // tie at 11:00 matches
    assert(out("e3").contains(200.0))   // carries forward
    assert(out("e4").isEmpty)           // no right row <= 10:30 for user 2
  }

  test("NULL in the latest right row is carried as NULL, not resurrected from older rows") {
    // right rows: (09:00, v=100, w=7) then (11:00, v=NULL, w=8) — the
    // most recent row at 12:00 has v NULL; a per-column carry would
    // stitch v=100 (from 09:00) with w=8 (from 11:00)
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(100.0), Some(7L)),
      (1L, ts("2024-01-01 11:00:00"), None, Some(8L)))
      .toDF("user_id", "ts", "v", "w")
    val out = AsOfJoin.asofBackward(left.filter($"user_id" === 1L), r,
      Seq("user_id"), "ts", "ts", Seq("v", "w"))
      .collect().map(x => x.getString(2) -> (Option(x.get(3)), Option(x.get(4)))).toMap
    assert(out("e1") == (Some(100.0), Some(7L)))  // 09:00 row whole
    assert(out("e2") == (None, Some(8L)))         // 11:00 row whole: v stays NULL
    assert(out("e3") == (None, Some(8L)))
  }

  test("forward as-of picks the earliest right row at-or-after each left ts") {
    val out = AsOfJoin.asofForward(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("e1").contains(200.0))   // next at-or-after 10:00 is 11:00
    assert(out("e2").contains(200.0))   // tie at 11:00 matches
    assert(out("e3").isEmpty)           // nothing after 12:00
    assert(out("e4").contains(300.0))   // user 2's 11:00 purchase is ahead
  }

  test("nearest as-of minimizes distance, tie goes backward") {
    // e1 10:00: back 09:00 (60m) vs fwd 11:00 (60m) -> TIE -> backward
    // e2 11:00: exact tie both directions -> same row either way
    // e3 12:00: back 11:00 (60m), no fwd -> backward
    // e4 10:30: no back, fwd 11:00 -> forward
    val out = AsOfJoin.asofNearest(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("e1").contains(100.0))
    assert(out("e2").contains(200.0))
    assert(out("e3").contains(200.0))
    assert(out("e4").contains(300.0))
    // asymmetric distances choose the closer side
    val l2 = Seq((1L, ts("2024-01-01 10:45:00"), "x")).toDF("user_id", "ts", "tag")
    val near = AsOfJoin.asofNearest(l2, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().head
    assert(Option(near.get(3)).contains(200.0)) // 11:00 (15m) beats 09:00 (105m)
  }

  test("nearest as-of keeps a single exchange (two sorts, no join)") {
    val df = AsOfJoin.asofNearest(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // union shuffle only (+AQE read)
  }

  test("as-of join is one shuffle: no cartesian/broadcast-nested-loop in the plan") {
    val df = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("range join matches rows into [start, end) intervals per key") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"), "window_a"))
      .toDF("user_id", "start", "end", "label")
    val out = AsOfJoin.rangeJoin(left, intervals, Seq("user_id"), "ts", "start", "end")
      .select("tag", "label").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("e2", "window_a")))
  }

  private val points = Seq(
    (ts("2024-01-01 10:00:00"), "p1"),
    (ts("2024-01-01 10:59:59"), "p2"),
    (ts("2024-01-01 11:00:00"), "p3"),   // exactly at iv_a's end -> excluded
    (ts("2024-01-03 00:00:00"), "p4"),
    (ts("2024-01-09 12:00:00"), "p5")    // matches nothing
  ).toDF("pt", "ptag")

  private val ivs = Seq(
    (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "iv_a"),
    // multi-bin interval (2 days wide at 1-day bins), overlaps p3, p4
    (ts("2024-01-01 10:30:00"), ts("2024-01-03 12:00:00"), "iv_b"))
    .toDF("lo", "hi", "itag")

  test("binned range join equals the naive non-equi join, each pair once") {
    val binned = AsOfJoin.binnedRangeJoin(points, ivs, "pt", "lo", "hi",
        binWidth = "1 day")
      .select("ptag", "itag").as[(String, String)].collect().sorted
    val naive = points.join(ivs, $"pt" >= $"lo" && $"pt" < $"hi")
      .select("ptag", "itag").as[(String, String)].collect().sorted
    assert(binned.toSeq == naive.toSeq)
    assert(binned.toSeq == Seq(("p1", "iv_a"), ("p2", "iv_a"), ("p2", "iv_b"),
      ("p3", "iv_b"), ("p4", "iv_b")))
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val df = AsOfJoin.binnedRangeJoin(points, ivs, "pt", "lo", "hi", "1 day")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("binned range join == naive join on seeded random data incl. degenerate intervals") {
    val rnd = new scala.util.Random(42)
    def tsAt(minutes: Int) = new Timestamp(1704067200000L + minutes * 60000L)
    val ps = (1 to 400).map(i => (tsAt(rnd.nextInt(10000)), s"p$i")).toDF("pt", "ptag")
    // interval lengths 0..5h, some inverted (hi < lo) — both must
    // yield no pairs rather than errors
    val is = (1 to 120).map { i =>
      val lo = rnd.nextInt(10000)
      val len = rnd.nextInt(300) - 30
      (tsAt(lo), tsAt(lo + len), s"i$i")
    }.toDF("lo", "hi", "itag")
    val binned = AsOfJoin.binnedRangeJoin(ps, is, "pt", "lo", "hi", "2 hours")
      .select("ptag", "itag").as[(String, String)].collect().sorted.toSeq
    val naive = ps.join(is, $"pt" >= $"lo" && $"pt" < $"hi")
      .select("ptag", "itag").as[(String, String)].collect().sorted.toSeq
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("binned range join honors extra equi keys") {
    val kp = points.withColumn("k", lit("x"))
    val ki = ivs.withColumn("k", when($"itag" === "iv_a", "x").otherwise("y"))
    val out = AsOfJoin.binnedRangeJoin(kp, ki, "pt", "lo", "hi", "1 day",
        keys = Seq("k"))
      .select("ptag", "itag").as[(String, String)].collect().sorted
    assert(out.toSeq == Seq(("p1", "iv_a"), ("p2", "iv_a")))
  }

  test("pointInTime: version valid at fact time; delete gap and pre-history stay null") {
    // key 1: I at 0 (bal 10), U at 1 (bal 20), D at 2 -> gap from 2 on
    // key 2: I at 0 (bal 50), current forever
    val changes = Seq(
      (1L, 10.0, "I", 0L), (1L, 20.0, "U", 1L), (1L, 0.0, "D", 2L),
      (2L, 50.0, "I", 0L))
      .toDF("k", "bal", "op", "seq")
    val hist = Modes.scdHistory(changes, Seq("k"), "op", "seq")
      .select("k", "bal", "valid_from", "valid_to")
    val facts = Seq(
      (100L, 1L, 0L), (101L, 1L, 1L), (102L, 1L, 3L), // at, within, after-delete
      (103L, 2L, 7L),                                 // current version
      (104L, 3L, 1L))                                 // key with no history
      .toDF("fact_id", "k", "t")
    val out = AsOfJoin.pointInTime(facts, hist, Seq("k"), "t", Seq("bal"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(100L -> 10.0, 101L -> 20.0, 102L -> null,
      103L -> 50.0, 104L -> null))
  }
}
