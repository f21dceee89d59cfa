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

  test("sequence build is one partial-agg shuffle, no global sort") {
    val df = Sequences.ordered(events, Seq("user_id"),
      Seq("ts", "event_id"), "event_type")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.linesIterator.exists(l => l.contains("Sort") && l.contains("global=true")),
      s"must not globally sort:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }
}
