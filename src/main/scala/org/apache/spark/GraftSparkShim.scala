package org.apache.spark

/** Bridge to the `private[spark]` listener bus — the bench's per-query
  * attribution counters (jobs / task_ms / gc_ms) are fed by an ASYNC
  * listener, so reading them without a drain barrier can bill one
  * query's tail events to the next row. Lives in the org.apache.spark
  * package purely for access; no Spark internals are modified.
  */
object GraftSparkShim {

  /** Block until every queued listener event has been delivered (or the
    * timeout passes — a timeout degrades to the pre-barrier behavior
    * rather than failing the bench).
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
