package graft.engine

import java.util.concurrent.atomic.{LongAccumulator, LongAdder}

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Machine-independent cost counters for the bench harness.
  *
  * Wall-clock on a shared sandbox is ambient-noise-bound (the round-7 driver
  * pass measured 1.5–1.8× slower than an idle re-run of the same build), so
  * regressions need a deterministic proxy. Shuffle bytes ARE the 100-TB cost
  * model — the reference engine exists to move exactly these bytes
  * (reference: shuffle-hadoop/.../RemoteShuffleManager.scala registers
  * shuffles whose write/fetch volume is the whole performance story) — and
  * spill bytes are the memory-pressure signal. Both are exact properties of
  * the executed plan + data, identical run-to-run regardless of load.
  *
  * Aggregation is per-task onTaskEnd sums between [[reset]] and [[snapshot]]:
  * LongAdder because listener callbacks fire on the bus thread concurrently
  * with local[32] task completion storms; peak execution memory is a max
  * across tasks (the per-task high-water mark is the number that decides
  * whether a real executor OOMs — summing it would double-count freed pages).
  */
final class MetricsListener extends SparkListener {
  private val shuffleRead = new LongAdder
  private val shuffleWrite = new LongAdder
  private val spill = new LongAdder
  private val peakMem = new LongAccumulator(math.max(_: Long, _: Long), 0L)

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
      peakMem.accumulate(m.peakExecutionMemory)
    }
  }

  def reset(): Unit = {
    shuffleRead.reset(); shuffleWrite.reset(); spill.reset(); peakMem.reset()
  }

  /** Totals since the last reset. Call [[MetricsListener.drain]] first —
    * the listener bus is async and an action returning does not mean its
    * task-end events have been delivered. */
  def snapshot: MetricsListener.Snapshot = MetricsListener.Snapshot(
    shuffleRead.sum, shuffleWrite.sum, spill.sum, peakMem.get)
}

object MetricsListener {
  final case class Snapshot(
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long,
      peakExecMemoryBytes: Long)

  /** Install a listener on the session's context. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Block until every queued listener event has been delivered, so a
    * snapshot taken after an action sees all of that action's tasks.
    *
    * `SparkContext.listenerBus` / `LiveListenerBus.waitUntilEmpty` are
    * `private[spark]` in source but public in bytecode (Scala qualified
    * access compiles to public methods — the same door Spark's own test
    * harness uses); reflection here is measurement plumbing only, never on
    * a query path. Falls back to a bounded sleep if the internals move. */
  def drain(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = classOf[SparkContext].getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: ReflectiveOperationException | _: NoSuchMethodError =>
      Thread.sleep(200)
    }
}
