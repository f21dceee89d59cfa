package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; telemetry needs to
  * drain it so late task-end events are counted before a measurement
  * window closes. Same shim pattern as sql.graftbridge.Bridge.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  def listenerCount(sc: SparkContext): Int =
    sc.listenerBus.listeners.size()
}
