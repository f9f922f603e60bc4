package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; this shim lives in the
  * spark package namespace (the standard pattern for measurement utilities)
  * to expose the deterministic drain [[graft.runner.JobCount]] needs.
  * A fixed `Thread.sleep` drain under-counts on a loaded host (ADVICE r12);
  * `waitUntilEmpty()` blocks until every queued listener event — including
  * the task-end events carrying the shuffle/CPU metrics — has been
  * dispatched, making the counters exact by construction. */
object ListenerShim {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
