package org.apache.spark

/** Probe-side bridge: `SparkContext.listenerBus` is `private[spark]`,
  * but the measurement probes need a real barrier ("all posted task-end
  * events delivered") instead of a fixed sleep when reading listener
  * aggregates. Same one-file-in-the-spark-package technique as
  * [[org.apache.spark.sql.GraftShim]].
  */
object GraftSparkShim {
  /** Blocks until every event posted to the async listener bus so far
    * has been delivered to all registered listeners. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
