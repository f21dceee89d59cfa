package graft.core

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Job telemetry — parity altitude with the reference's Sentry spans
  * (`config/Sentry.java:15-64`, SURVEY.md §2.10), re-expressed as a
  * SparkListener so the numbers come from the engine itself: records
  * and bytes read/written, shuffle traffic, task time, spill. Scoped
  * per measured block, safe to nest sequentially.
  */
object Telemetry {

  final case class Metrics(
      recordsRead: Long, bytesRead: Long,
      recordsWritten: Long, bytesWritten: Long,
      shuffleBytesWritten: Long, shuffleBytesRead: Long,
      diskBytesSpilled: Long, taskTimeMs: Long, tasks: Long) {
    def pretty: String =
      f"read $recordsRead%,d rows ($bytesRead%,d B), wrote $recordsWritten%,d rows " +
        f"($bytesWritten%,d B), shuffle w/r $shuffleBytesWritten%,d/$shuffleBytesRead%,d B, " +
        f"spill $diskBytesSpilled%,d B, $tasks%,d tasks, $taskTimeMs%,d ms task time"
  }

  private final class Collector extends SparkListener {
    val recordsRead = new LongAdder; val bytesRead = new LongAdder
    val recordsWritten = new LongAdder; val bytesWritten = new LongAdder
    val shuffleW = new LongAdder; val shuffleR = new LongAdder
    val spilled = new LongAdder; val taskTime = new LongAdder
    val tasks = new LongAdder

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recordsRead.add(m.inputMetrics.recordsRead)
        bytesRead.add(m.inputMetrics.bytesRead)
        recordsWritten.add(m.outputMetrics.recordsWritten)
        bytesWritten.add(m.outputMetrics.bytesWritten)
        shuffleW.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleR.add(m.shuffleReadMetrics.totalBytesRead)
        spilled.add(m.diskBytesSpilled)
        taskTime.add(m.executorRunTime)
        tasks.increment()
      }
    }

    def snapshot: Metrics = Metrics(
      recordsRead.sum, bytesRead.sum, recordsWritten.sum, bytesWritten.sum,
      shuffleW.sum, shuffleR.sum, spilled.sum, taskTime.sum, tasks.sum)
  }

  /** Run `body` with task-metric collection; returns (result, metrics).
    * Waits for listener-bus drain so late task events are counted. */
  def measure[T](spark: SparkSession)(body: => T): (T, Metrics) = {
    val c = new Collector
    spark.sparkContext.addSparkListener(c)
    try {
      val result = body
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext, 30000)
      (result, c.snapshot)
    } finally spark.sparkContext.removeSparkListener(c)
  }
}
