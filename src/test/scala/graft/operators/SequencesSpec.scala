package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class SequencesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:02:00"), 2L, "view"),
    (1L, ts("2024-01-01 10:01:00"), 1L, "click"),
    (1L, ts("2024-01-01 10:02:00"), 3L, "buy"),   // ts tie -> event_id order
    (2L, ts("2024-01-01 09:00:00"), 4L, "click"))
    .toDF("user_id", "ts", "event_id", "event_type")

  test("sequences assemble in (order, tiebreak) order per key") {
    val out = Sequences.orderedJoined(events, Seq("user_id"),
      Seq("ts", "event_id"), "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((3L, "click>view>buy")))
    assert(out(2L) == ((1L, "click")))
  }

  test("maxLen keeps the ordered prefix and reports the true count") {
    val out = Sequences.orderedJoined(events, Seq("user_id"),
      Seq("ts", "event_id"), "event_type", maxLen = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((3L, "click>view")))   // prefix, not arbitrary 2
  }

  test("pattern match runs leftmost over the chronological symbol string") {
    // user 1 history "cvb": v[^vb]*b matches "vb"; user 2 "c": none
    val out = Sequences.matchPattern(events, Seq("user_id"),
      Seq("ts", "event_id"), "event_type", "v[^vb]*b")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out(1L) == (("cvb", "vb")))
    assert(out(2L) == (("c", "")))
    // leftmost semantics: a failed prefix never hides a later match
    val tricky = Seq((9L, ts("2024-01-01 10:00:00"), 1L, "v"),
      (9L, ts("2024-01-01 10:01:00"), 2L, "c"),
      (9L, ts("2024-01-01 10:02:00"), 3L, "v"),
      (9L, ts("2024-01-01 10:03:00"), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = Sequences.matchPattern(tricky, Seq("user_id"),
      Seq("ts", "event_id"), "event_type", "v[^vb]*b").head()
    assert(m.getString(2) == "vcvb" && m.getString(3) == "vb")
  }

  test("sequence build is one partial-agg shuffle, no global sort") {
    val df = Sequences.ordered(events, Seq("user_id"),
      Seq("ts", "event_id"), "event_type")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(l => l.contains("Sort") && l.contains("global=true")),
      s"must not globally sort:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }
}
