package org.apache.spark

/** Test-only bridge into Spark's `private[spark]` listener bus: specs that
  * assert on status-store state (job counts per group) drain the async
  * event queue instead of sleeping a fixed interval, which is flaky on
  * loaded machines.
  */
object graftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
