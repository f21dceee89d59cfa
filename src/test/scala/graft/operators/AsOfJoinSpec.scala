package graft.operators

import java.sql.Timestamp

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
}
