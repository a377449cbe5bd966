package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.metric.SQLMetric
import org.apache.spark.unsafe.Platform

/** SIZE-CAPPED SPILL-TO-DISK buffers for [[IntervalSweepCursor]]'s state
  * (VERDICT r12 §next-2).
  *
  * The keyed interval sweep's working set — the per-side ACTIVE lists and
  * the PENDING output queue — is bounded by the max concurrent overlap
  * depth per key, which is honestly declared but used to live in plain
  * `ArrayBuffer`s/`ArrayDeque`: a pathological key (open-ended intervals,
  * clock-skewed end timestamps) grew it without bound and OOM'd instead of
  * spilling. SortMergeJoin's buffered side uses
  * `ExternalAppendOnlyUnsafeRowArray` for exactly this; that class is
  * append-only + replay, while the sweep also needs in-place PRUNING and a
  * per-entry MATCHED flag, so these two purpose-built structures implement
  * the same contract (in-memory up to a budget, sequential disk beyond,
  * metric-visible spill bytes) with the access patterns the sweep needs:
  *
  *  - [[SpillableActives]]: append + full REWRITE-SCAN (visit every entry
  *    in arrival order, keep/mark/drop each). In memory it compacts in
  *    place exactly like the old ArrayBuffer write-pointer loops; once the
  *    budget is exceeded entries flow to a sequential spill file and a
  *    scan streams old-file → survivors-to-new-generation. Each scan is
  *    one sequential read + one sequential write of the live state — the
  *    same O(|active|) the in-memory sweep already paid per arrival, at
  *    disk bandwidth instead of RAM when (and only when) the state is
  *    pathological.
  *  - [[SpillableFifo]]: the pending (left, right|null) output pairs.
  *    Strict FIFO: spilled CHUNKS are read back oldest-first, one chunk
  *    buffered at a time, so peak memory is ~2× the budget regardless of
  *    how many pairs one arrival fans out to.
  *
  * Spill files live in java.io.tmpdir, are deleted eagerly (a rewritten
  * generation deletes its predecessor; a drained FIFO deletes its file)
  * and are backstopped by a task-completion listener, so an abandoned
  * iterator (limit, take) cannot leak them. Thread safety: none needed —
  * one cursor per task by contract. Budget: per structure per task,
  * `spark.graft.interval.sweep.spillThreshold` bytes (default 64 MB);
  * every spilled byte is added to the exec's `spillBytes` SQLMetric. */
object SweepSpill {
  val ThresholdConf = "spark.graft.interval.sweep.spillThreshold"
  val DefaultThreshold: Long = 64L * 1024 * 1024

  /** Driver-side read (builders are constructed in the exec, where
    * SQLConf.get is the session conf). Only a MISSING active SQLConf falls
    * back to the default (bare-executor contexts); a malformed value (e.g.
    * "64MB") fails loudly with NumberFormatException at plan time — the
    * repo's fail-loud convention (ADVICE r13; cf. autoHotKeys'
    * missing-column AnalysisException). */
  def thresholdInConf: Long = {
    val raw =
      try org.apache.spark.sql.internal.SQLConf.get
        .getConfString(ThresholdConf, null)
      catch { case _: Throwable => null }
    if (raw == null) TmmMode else raw.trim.toLong
  }

  /** Sentinel carried from plan time to task time: conf UNSET → integrate
    * with the task's real execution-memory accounting ([[TmmBudget]],
    * VERDICT r13 §next-8); conf SET → that fixed per-structure byte cap
    * (depth-stress/1-byte-law specs, A/B measurement). */
  val TmmMode: Long = -1L

  /** Task-side budget factory: fixed cap when the conf named one; the
    * TaskMemoryManager-integrated consumer otherwise, falling back to the
    * fixed default outside a task (direct cursor construction in specs). */
  def newBudget(threshold: Long): SweepBudget =
    if (threshold >= 0L) new FixedBudget(threshold)
    else {
      val tmm = org.apache.spark.graft.TaskMemoryBridge.current()
      if (tmm == null) new FixedBudget(DefaultThreshold)
      else new TmmBudget(tmm)
    }

  def newSpillFile(tag: String): File = {
    val f = File.createTempFile(s"graft-sweep-$tag-", ".bin")
    // backstop for abandoned iterators; eager deletes happen in the
    // structures themselves
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      if (f.exists()) { f.delete(); () }
    }
    f
  }

  def readRow(in: DataInputStream, numFields: Int): UnsafeRow = {
    val len = in.readInt()
    val bytes = new Array[Byte](len)
    in.readFully(bytes)
    val row = new UnsafeRow(numFields)
    row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET, len)
    row
  }

  def writeRow(out: DataOutputStream, row: UnsafeRow): Unit = {
    val bytes = row.getBytes
    out.writeInt(bytes.length)
    out.write(bytes)
  }
}

/** Memory budget the sweep structures draw from — one instance per cursor
  * (per task), shared by its two active lists and the pending FIFO.
  *
  *  - [[FixedBudget]]: the pre-r14 contract — a per-STRUCTURE byte cap,
  *    checked after each append (`postCap`); `tryReserve` always grants.
  *    Selected by setting the spillThreshold conf; the depth-stress and
  *    1-byte-law specs run here, byte-for-byte the old behavior.
  *  - [[TmmBudget]]: the default — a real [[MemoryConsumer]] registered
  *    with the task's [[TaskMemoryManager]] (VERDICT r13 §next-8), so
  *    sweep state coexists with Spark's own operators in the execution
  *    memory pool: reservations are acquired in 1 MB chunks (amortizing
  *    the TMM lock off the per-row path), a refused reservation makes the
  *    caller spill, and OTHER consumers' pressure (a downstream sort, a
  *    hash aggregate) triggers the sweep state to spill via the standard
  *    `spill(size, trigger)` callback instead of fighting it to an OOM.
  *    Single-threaded by construction: TMM spill callbacks run on the
  *    task's own thread, inside this task's `acquireMemory` calls. */
private[plans] sealed trait SweepBudget {
  /** Try to reserve `delta` more bytes; false → the caller should spill
    * its in-memory state first (best effort: an append after a failed
    * retry proceeds unreserved rather than deadlocking — at worst the
    * structure degenerates to spill-per-append). */
  def tryReserve(delta: Long): Boolean
  /** Return `bytes` previously reserved (structure spilled or cleared). */
  def release(bytes: Long): Unit
  /** Post-append overflow cap (fixed mode); MaxValue under TMM. */
  def postCap: Long
  /** Hook a structure's force-spill for external-pressure callbacks. */
  def register(forceSpill: () => Unit): Unit
}

private[plans] final class FixedBudget(cap: Long) extends SweepBudget {
  def tryReserve(delta: Long): Boolean = true
  def release(bytes: Long): Unit = ()
  val postCap: Long = cap
  def register(forceSpill: () => Unit): Unit = ()
}

private[plans] final class TmmBudget(
    tmm: org.apache.spark.memory.TaskMemoryManager)
    extends org.apache.spark.memory.MemoryConsumer(
      tmm, org.apache.spark.memory.MemoryMode.ON_HEAP) with SweepBudget {
  private val Chunk = 1L << 20
  private val spillers = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
  private var reserved = 0L // bytes acquired from the TMM
  private var usedBytes = 0L // bytes the structures currently hold in memory
  locally {
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ => close() }
  }

  def register(forceSpill: () => Unit): Unit = spillers += forceSpill
  val postCap: Long = Long.MaxValue

  def tryReserve(delta: Long): Boolean = {
    if (usedBytes + delta <= reserved) { usedBytes += delta; true }
    else {
      val need = usedBytes + delta - reserved
      val want = ((need + Chunk - 1) / Chunk) * Chunk
      val got = acquireMemory(want) // may re-enter spill(…, trigger=this)
      reserved += got
      if (usedBytes + delta <= reserved) { usedBytes += delta; true }
      else false
    }
  }

  def release(bytes: Long): Unit = {
    usedBytes = math.max(0L, usedBytes - bytes)
    // hand surplus back to the pool, keeping one chunk of slack
    val excess = reserved - usedBytes - Chunk
    if (excess > 0L) { freeMemory(excess); reserved -= excess }
  }

  override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer)
      : Long = {
    // self-trigger: tryReserve's caller handles the refusal by spilling —
    // spilling here, mid-reservation, would mutate state under the caller
    if (trigger eq this) return 0L
    val before = reserved
    spillers.foreach(f => f()) // each spill calls release() above
    before - reserved
  }

  def close(): Unit = {
    if (reserved > 0L) { freeMemory(reserved); reserved = 0L }
    usedBytes = 0L
  }
}

/** Append + rewrite-scan store of (end: Long, matched: Boolean, row) — the
  * sweep's per-side active list. See [[SweepSpill]]. */
private[plans] final class SpillableActives(numFields: Int,
    budget: SweepBudget, metric: SQLMetric) {
  import SweepSpill._

  /** Rewrite-scan visitor verdicts. */
  val DROP = 0
  val KEEP = 1          // matched flag unchanged
  val KEEP_MATCHED = 2  // matched := true

  private final class E(val end: Long, val matched: Boolean, val row: UnsafeRow)

  private var mem = scala.collection.mutable.ArrayBuffer.empty[E]
  private var memBytes = 0L
  private var file: File = _
  private var out: DataOutputStream = _
  private var spilled = 0L // entries currently on disk (arrival order, oldest first)
  private var n = 0L

  budget.register(() => if (mem.nonEmpty) spillMem())

  def size: Long = n
  def nonEmpty: Boolean = n > 0

  def append(end: Long, matched: Boolean, row: UnsafeRow): Unit = {
    val delta = row.getSizeInBytes + 24L
    if (!budget.tryReserve(delta)) {
      if (mem.nonEmpty) spillMem()
      // best-effort retry; a refusal here appends unreserved (release()
      // clamps, so accounting stays consistent) rather than deadlocking
      budget.tryReserve(delta)
    }
    mem += new E(end, matched, row)
    n += 1
    memBytes += delta
    if (memBytes > budget.postCap) spillMem()
  }

  private def spillMem(): Unit = {
    if (out == null) {
      file = newSpillFile("act")
      out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(file, true), 1 << 16))
    }
    var i = 0
    while (i < mem.length) {
      val e = mem(i)
      writeRow(out, e.row)
      out.writeLong(e.end)
      out.writeBoolean(e.matched)
      i += 1
    }
    if (metric != null) metric.add(memBytes)
    spilled += mem.length
    mem.clear()
    budget.release(memBytes)
    memBytes = 0L
  }

  /** Visit every entry in arrival order; survivors (KEEP/KEEP_MATCHED) form
    * the next generation, preserving order. Returns the survivor count.
    * In-memory-only state compacts in place (the old ArrayBuffer
    * write-pointer loop); spilled state streams old file → fresh state. */
  def scanRewrite(visit: (Long, Boolean, UnsafeRow) => Int): Long = {
    if (spilled == 0) {
      // fast path: pure in-memory compaction, no allocation
      var w = 0; var i = 0
      while (i < mem.length) {
        val e = mem(i)
        val v = visit(e.end, e.matched, e.row)
        if (v != DROP) {
          val kept = if (v == KEEP_MATCHED && !e.matched)
            new E(e.end, true, e.row) else e
          mem(w) = kept
          w += 1
        } else {
          val delta = e.row.getSizeInBytes + 24L
          memBytes -= delta
          budget.release(delta)
        }
        i += 1
      }
      mem.dropRightInPlace(mem.length - w)
      n = w
      return w
    }
    // spilled path: detach the old generation, stream it through the
    // visitor, re-append survivors (which may spill to a NEW file)
    val oldMem = mem
    val oldFile = file
    val oldSpilled = spilled
    if (out != null) { out.close(); out = null }
    mem = scala.collection.mutable.ArrayBuffer.empty[E]
    budget.release(memBytes) // detached entries re-reserve as they re-append
    memBytes = 0L
    file = null
    spilled = 0L
    n = 0L
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(oldFile), 1 << 16))
    try {
      var i = 0L
      while (i < oldSpilled) {
        val row = readRow(in, numFields)
        val end = in.readLong()
        val matched = in.readBoolean()
        val v = visit(end, matched, row)
        if (v != DROP) append(end, matched || v == KEEP_MATCHED, row)
        i += 1
      }
    } finally in.close()
    oldFile.delete()
    var i = 0
    while (i < oldMem.length) {
      val e = oldMem(i)
      val v = visit(e.end, e.matched, e.row)
      if (v != DROP) append(e.end, e.matched || v == KEEP_MATCHED, e.row)
      i += 1
    }
    n
  }

  def clear(): Unit = {
    mem.clear()
    budget.release(memBytes)
    memBytes = 0L
    if (out != null) { out.close(); out = null }
    if (file != null) { file.delete(); file = null }
    spilled = 0L
    n = 0L
  }
}

/** Strict-FIFO queue of (left row, right row | null) output pairs — the
  * sweep's pending emissions. See [[SweepSpill]]. */
private[plans] final class SpillableFifo(lFields: Int, rFields: Int,
    budget: SweepBudget, metric: SQLMetric) {
  import SweepSpill._

  private val memQ = new java.util.ArrayDeque[Array[InternalRow]]()
  private var memBytes = 0L
  private var file: File = _
  private var out: DataOutputStream = _
  private var in: DataInputStream = _
  private var onDisk = 0L // entries written, not yet read back

  budget.register(() => if (!memQ.isEmpty) spillMem())

  def isEmpty: Boolean = onDisk == 0 && memQ.isEmpty

  private def rowBytes(r: InternalRow): Long = r match {
    case u: UnsafeRow => u.getSizeInBytes.toLong
    case _ => 64L
  }

  def add(l: InternalRow, r: InternalRow): Unit = {
    val delta = rowBytes(l) + (if (r == null) 0L else rowBytes(r)) + 24L
    if (!budget.tryReserve(delta)) {
      if (!memQ.isEmpty) spillMem()
      budget.tryReserve(delta) // best-effort; see SpillableActives.append
    }
    memQ.addLast(Array(l, r))
    memBytes += delta
    if (memBytes > budget.postCap) spillMem()
  }

  private def spillMem(): Unit = {
    if (file == null) file = newSpillFile("pend")
    if (out == null) out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(file, true), 1 << 16))
    while (!memQ.isEmpty) {
      val e = memQ.pollFirst()
      writeRow(out, e(0).asInstanceOf[UnsafeRow])
      if (e(1) == null) out.writeInt(-1)
      else writeRow(out, e(1).asInstanceOf[UnsafeRow])
      onDisk += 1
    }
    // the read stream may already be draining this file: later appends must
    // be durable before poll() counts on them (onDisk is incremented above)
    out.flush()
    if (metric != null) metric.add(memBytes)
    budget.release(memBytes)
    memBytes = 0L
  }

  /** Oldest entry: disk (written first) before memory. One buffered stream
    * reads the file front-to-back; FIFO order means spilled entries are
    * ALWAYS older than anything still in memory. */
  def poll(): Array[InternalRow] = {
    if (onDisk > 0) {
      if (in == null) {
        out.flush()
        in = new DataInputStream(new BufferedInputStream(
          new FileInputStream(file), 1 << 16))
      }
      val l = readRow(in, lFields)
      val len = in.readInt()
      val r: InternalRow = if (len < 0) null else {
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val row = new UnsafeRow(rFields)
        row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET, len)
        row
      }
      onDisk -= 1
      if (onDisk == 0) reclaimFile()
      Array(l, r)
    } else {
      val e = memQ.pollFirst()
      if (e != null) {
        // pre-r14 code never decremented memBytes on memory polls, so a
        // long-lived FIFO drained from memory eventually tripped the cap
        // and spilled a near-empty queue; track the true size
        val d = rowBytes(e(0)) +
          (if (e(1) == null) 0L else rowBytes(e(1))) + 24L
        memBytes = math.max(0L, memBytes - d)
        budget.release(d)
      }
      e
    }
  }

  private def reclaimFile(): Unit = {
    try in.close() catch { case _: EOFException => }
    in = null
    out.close()
    out = null
    file.delete()
    file = null
  }
}
