package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Bridge to the `protected[spark]` TaskContext setter.
  *
  * ProcessSidecarFilter consumes the upstream iterator on a helper thread
  * (the sidecar stdin writer). Upstream iterators — shuffle readers,
  * sorters — may call `TaskContext.get()` on the consuming thread, which
  * is thread-local; Spark's own PipedRDD propagates the context to its
  * writer thread for exactly this reason. The setter is package-private
  * to `org.apache.spark`, hence this one-line bridge.
  */
object TaskContextBridge {
  def set(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
}
