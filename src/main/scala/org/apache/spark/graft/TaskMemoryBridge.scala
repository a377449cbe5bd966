package org.apache.spark.graft

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** `TaskContext.taskMemoryManager()` is `private[spark]`; the sweep-state
  * MemoryConsumer (graft.plans.SweepSpill) needs it to register with
  * Spark's execution-memory accounting. This bridge is the single,
  * minimal `org.apache.spark`-package crossing — no other Spark internals
  * are touched. */
object TaskMemoryBridge {
  /** The running task's memory manager, or null outside a task. */
  def current(): TaskMemoryManager = {
    val tc = TaskContext.get()
    if (tc == null) null else tc.taskMemoryManager()
  }
}
