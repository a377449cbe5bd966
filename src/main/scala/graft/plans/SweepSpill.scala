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
    if (raw == null) DefaultThreshold else raw.trim.toLong
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

/** Append + rewrite-scan store of (end: Long, matched: Boolean, row) — the
  * sweep's per-side active list. See [[SweepSpill]]. */
private[plans] final class SpillableActives(numFields: Int,
    capBytes: Long, metric: SQLMetric) {
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

  def size: Long = n
  def nonEmpty: Boolean = n > 0

  def append(end: Long, matched: Boolean, row: UnsafeRow): Unit = {
    mem += new E(end, matched, row)
    n += 1
    memBytes += row.getSizeInBytes + 24L
    if (memBytes > capBytes) spillMem()
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
        } else memBytes -= e.row.getSizeInBytes + 24L
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
    capBytes: Long, metric: SQLMetric) {
  import SweepSpill._

  private val memQ = new java.util.ArrayDeque[Array[InternalRow]]()
  private var memBytes = 0L
  private var file: File = _
  private var out: DataOutputStream = _
  private var in: DataInputStream = _
  private var onDisk = 0L // entries written, not yet read back

  def isEmpty: Boolean = onDisk == 0 && memQ.isEmpty

  private def rowBytes(r: InternalRow): Long = r match {
    case u: UnsafeRow => u.getSizeInBytes.toLong
    case _ => 64L
  }

  def add(l: InternalRow, r: InternalRow): Unit = {
    memQ.addLast(Array(l, r))
    memBytes += rowBytes(l) + (if (r == null) 0L else rowBytes(r)) + 24L
    if (memBytes > capBytes) spillMem()
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
    } else memQ.pollFirst()
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
