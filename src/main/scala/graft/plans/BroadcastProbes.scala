package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.metric.SQLMetric

/** The broadcast-side probe indexes shared by BOTH execution paths of
  * [[BroadcastAsOfJoinExec]] / [[BroadcastIntervalJoinExec]]: the
  * iterator `doExecute` and the whole-stage-codegen consume. One
  * implementation means the two paths cannot drift — the equality laws
  * pin the iterator path, and codegen calls the same `lookup`/`next`.
  *
  * The builders are `Serializable` closures over the UNBOUND right-side
  * expressions + schema; binding and projection construction happen in
  * `build`, on the executor, per task — exactly where the old inline
  * `mapPartitions` bodies did it. The classes expose Java-friendly
  * signatures (`InternalRow[]`, primitive longs) because generated Janino
  * code calls them directly. */
object AsOfProbeIndex {
  /** One key's timeline: times ascending, rows aligned. */
  final class Entry(val times: Array[Long], val rows: Array[InternalRow])
}

/** key → time-sorted right rows; `lookup` answers the as-of question for
  * one (key, time) probe: the row with the LARGEST time `< t` (strict) /
  * `<= t` (non-strict) within tolerance, else null. */
final class AsOfProbeIndex(
    map: java.util.HashMap[UnsafeRow, AsOfProbeIndex.Entry],
    strict: Boolean, hasTol: Boolean, tol: Long) {
  def lookup(key: UnsafeRow, time: Long): InternalRow = {
    val e = map.get(key)
    if (e == null) return null
    val ts = e.times
    var lo = 0; var hi = ts.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (if (strict) ts(mid) < time else ts(mid) <= time) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans < 0) null
    else if (hasTol && time - ts(ans) > tol) null
    else e.rows(ans)
  }
}

final class AsOfProbeBuilder(rOut: Seq[Attribute], rKeys: Seq[Expression],
    rTime: Expression, strict: Boolean, tolerance: Option[Long])
  extends Serializable {
  /** Assigned on the driver; every task of this join deserializes the same
    * value — the per-join half of the [[ProbeIndexCache]] key. */
  private val builderId: Long = ProbeIndexCache.newBuilderId()
  // plan-time snapshot of the A/B toggle (builders are constructed on the
  // driver, where SQLConf.get is the session conf)
  private val cacheEnabled: Boolean = ProbeIndexCache.enabledInConf

  /** Per-executor-cached build: the first task of this (join, broadcast)
    * pair on a JVM builds the index, every later task shares it — the
    * index is immutable after construction (lookup is read-only). Called
    * from both doExecute and the generated class init. */
  def buildCached(
      bcast: org.apache.spark.broadcast.Broadcast[Array[InternalRow]])
      : AsOfProbeIndex =
    if (!cacheEnabled) build(bcast.value)
    else ProbeIndexCache.getOrBuild(bcast.id, builderId)(build(bcast.value))
      .asInstanceOf[AsOfProbeIndex]

  def build(rows: Array[InternalRow]): AsOfProbeIndex = {
    val keyProj = UnsafeProjection.create(rKeys, rOut)
    val timeEval = BindReferences.bindReference(rTime, rOut)
    val grouped = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
    rows.foreach { row =>
      val t = timeEval.eval(row)
      // null right times never match: they never enter the index
      if (t != null) {
        val k = keyProj(row).copy()
        var buf = grouped.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(Long, InternalRow)]
          grouped.put(k, buf)
        }
        buf += ((t.asInstanceOf[Long], row))
      }
    }
    val map = new java.util.HashMap[UnsafeRow, AsOfProbeIndex.Entry](grouped.size())
    grouped.forEach { (k, buf) =>
      buf.sortInPlace()(Ordering.by(_._1))
      map.put(k, new AsOfProbeIndex.Entry(
        buf.map(_._1).toArray, buf.map(_._2).toArray))
      ()
    }
    new AsOfProbeIndex(map, strict, tolerance.isDefined, tolerance.getOrElse(0L))
  }
}

/** The two-pointer AS-OF MERGE as a compiled cursor shared by BOTH
  * execution paths of [[AsOfJoinExec]]: `advance()` positions one left row
  * and its as-of match (null when none) per call, streaming both sorted
  * inputs once with O(1) carried state — the exact loop the exec's
  * iterator ran inline before codegen needed to drive it from generated
  * Java. One implementation, two callers: the paths cannot drift. */
final class AsOfMergeCursor(lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lTimeEval: Expression, rTimeEval: Expression,
    keyOrd: Ordering[InternalRow], strict: Boolean,
    hasTol: Boolean, tol: Long) {
  private var lRow: InternalRow = _
  private var matched: InternalRow = _
  // right-side cursor: the NEXT unconsumed right row (+ its key/time), and
  // the last right row that qualified for the current key
  private var rRow: InternalRow = _
  private var rKey: UnsafeRow = _
  private var rTime: java.lang.Long = _
  private var candidate: InternalRow = _
  private var candidateKey: UnsafeRow = _
  private var candidateTime: Long = _
  advanceRight()

  private def advanceRight(): Unit =
    if (rIter.hasNext) {
      rRow = rIter.next()
      rKey = rKeyProj(rRow).copy()
      val t = rTimeEval.eval(rRow)
      rTime = if (t == null) null else t.asInstanceOf[Long]
    } else { rRow = null; rKey = null; rTime = null }

  /** Position the next (left row, match) pair; false when exhausted. */
  def advance(): Boolean = {
    if (!lIter.hasNext) return false
    val l = lIter.next()
    val lk = lKeyProj(l)
    val lt = lTimeEval.eval(l)
    // discard right rows for keys already passed
    while (rRow != null && keyOrd.compare(rKey, lk) < 0) advanceRight()
    // fold forward: every same-key right row strictly before lt becomes
    // the new candidate (they arrive time-ascending); null right times
    // sort FIRST within the key and never match — consume WITHOUT setting
    // the candidate (see the exec scaladoc / PropertySpec law)
    if (lt != null) {
      val ltv = lt.asInstanceOf[Long]
      while (rRow != null && keyOrd.compare(rKey, lk) == 0 &&
          (rTime == null ||
            (if (strict) rTime < ltv else rTime <= ltv))) {
        if (rTime != null) {
          candidate = rRow.asInstanceOf[UnsafeRow].copy()
          candidateKey = rKey
          candidateTime = rTime
        }
        advanceRight()
      }
    }
    val ok = lt != null && candidate != null &&
      candidateKey != null && keyOrd.compare(candidateKey, lk) == 0 &&
      (!hasTol || lt.asInstanceOf[Long] - candidateTime <= tol)
    lRow = l
    matched = if (ok) candidate else null
    true
  }

  def leftRow: InternalRow = lRow
  /** The as-of match for the current left row, or null (null-extension). */
  def matchedRow: InternalRow = matched
}

/** Serializable factory for [[AsOfMergeCursor]]: binds the key/time
  * expressions per task, exactly where the old inline zipPartitions body
  * did. Referenced from generated code, so the signature is Java-plain. */
final class AsOfMergeCursorBuilder(lOut: Seq[Attribute], rOut: Seq[Attribute],
    lKeys: Seq[Expression], rKeys: Seq[Expression],
    lTime: Expression, rTime: Expression,
    strict: Boolean, tolerance: Option[Long]) extends Serializable {
  def create(lIter: Iterator[InternalRow], rIter: Iterator[InternalRow])
      : AsOfMergeCursor =
    new AsOfMergeCursor(lIter, rIter,
      UnsafeProjection.create(lKeys, lOut), UnsafeProjection.create(rKeys, rOut),
      BindReferences.bindReference(lTime, lOut),
      BindReferences.bindReference(rTime, rOut),
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType)),
      strict, tolerance.isDefined, tolerance.getOrElse(0L))
}

/** The keyed interval PLANE SWEEP as a compiled cursor shared by both
  * execution paths of [[IntervalJoinExec]]: `advance()` positions one
  * output unit per call — an overlap pair for inner/outer (right null for
  * the outer null-extension), a bare left row for semi/anti — exactly the
  * step machine the exec's iterator ran inline (same arrival order,
  * pruning, eviction proofs, and mode semantics; the copies pended here
  * are immutable UnsafeRows, safe for downstream buffering).
  *
  * STATE IS SPILLABLE (VERDICT r12 §next-2): the active lists and the
  * pending queue live in [[SpillableActives]]/[[SpillableFifo]] — in
  * memory up to `spark.graft.interval.sweep.spillThreshold` bytes per
  * structure, sequential disk beyond, every spilled byte visible in the
  * exec's `spillBytes` metric. A pathological key (hundreds of thousands
  * of concurrently-open intervals) now completes at disk bandwidth instead
  * of OOMing; the per-arrival work stays O(live state), exactly the
  * in-memory sweep's bound. Each arrival's prune and pair scans are FUSED
  * into one rewrite pass per opposite-side store, so spilled state is read
  * and rewritten at most once per arrival; within one arrival the eviction
  * emissions (outer/anti dead-lefts) interleave with pair emissions in
  * entry order rather than strictly preceding them — a reordering within
  * one partition's output stream, which the exec declares unordered
  * (no `outputOrdering`), so no consumer may observe it. */
final class IntervalSweepCursor(lIter: Iterator[InternalRow],
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lSe: Expression, lEe: Expression, rSe: Expression, rEe: Expression,
    keyOrd: Ordering[InternalRow], mode: String,
    lFields: Int, rFields: Int, spillThreshold: Long, spillMetric: SQLMetric) {

  private final class Side(it: Iterator[InternalRow],
      keyProj: UnsafeProjection, sEv: Expression, eEv: Expression) {
    var row: InternalRow = _
    var key: UnsafeRow = _
    var start: java.lang.Long = _
    var end: java.lang.Long = _
    advance()
    def advance(): Unit =
      if (it.hasNext) {
        row = it.next()
        key = keyProj(row).copy()
        val sv = sEv.eval(row); val ev = eEv.eval(row)
        start = if (sv == null) null else sv.asInstanceOf[Long]
        end = if (ev == null) null else ev.asInstanceOf[Long]
      } else { row = null; key = null; start = null; end = null }
  }

  private val lc = new Side(lIter, lKeyProj, lSe, lEe)
  private val rc = new Side(rIter, rKeyProj, rSe, rEe)
  // one budget per cursor, shared by the three structures: fixed byte cap
  // when the conf named one, TaskMemoryManager-integrated otherwise
  // (VERDICT r13 §next-8; see SweepBudget)
  private val budget = SweepSpill.newBudget(spillThreshold)
  // actives: (end, matched, row); matched is only consulted for left-side
  // entries (outer's null-extension proof, semi's emit-once, anti's keep)
  private val activeL = new SpillableActives(lFields, budget, spillMetric)
  private val activeR = new SpillableActives(rFields, budget, spillMetric)
  private var curKey: UnsafeRow = _
  private var flushed = false
  private val pending = new SpillableFifo(lFields, rFields,
    budget, spillMetric)
  private var cur: Array[InternalRow] = _

  private def pend(l: InternalRow, r: InternalRow): Unit = pending.add(l, r)

  /** Emit a proven-dead unmatched left per mode (outer/anti). */
  private def emitDeadLeft(matched: Boolean, row: InternalRow): Unit =
    if (!matched) mode match {
      case "left_outer" | "left_anti" => pend(row, null)
      case _ => ()
    }

  private def flushLeft(): Unit = {
    activeL.scanRewrite { (_, matched, row) =>
      emitDeadLeft(matched, row); activeL.DROP
    }
    activeR.clear()
    ()
  }

  /** Consume one arrival (the side with the smaller (key, start)). */
  private def step(): Unit = {
    val takeLeft =
      if (lc.row == null) false
      else if (rc.row == null) true
      else {
        val kc = keyOrd.compare(lc.key, rc.key)
        if (kc != 0) kc < 0
        else {
          // within a key, null starts sort first (they never match:
          // consumed and skipped); then ascending start
          if (lc.start == null) true
          else if (rc.start == null) false
          else lc.start <= rc.start
        }
      }
    val c = if (takeLeft) lc else rc
    // key change: prove every remaining left dead, reset both sides
    if (curKey == null || keyOrd.compare(c.key, curKey) != 0) {
      flushLeft(); curKey = c.key
    }
    val valid = c.start != null && c.end != null &&
      c.end.longValue() >= c.start.longValue()
    if (takeLeft) {
      if (valid) {
        val sv = c.start.longValue()
        val lCopy = c.row.asInstanceOf[UnsafeRow].copy()
        // ONE fused pass over activeR: drop proven-dead rights (end < sv),
        // pair the arriving left with every survivor (inner/outer)
        val pairHere = mode == "inner" || mode == "left_outer"
        val survivors = activeR.scanRewrite { (end, _, row) =>
          if (end < sv) activeR.DROP
          else {
            if (pairHere) pend(lCopy, row)
            activeR.KEEP
          }
        }
        val anyMatch = survivors > 0
        if (mode == "left_semi" && anyMatch) pend(lCopy, null)
        // keep in state only while a future right could still matter
        val keep = mode match {
          case "inner" | "left_outer" => true
          case _ => !anyMatch
        }
        if (keep) activeL.append(c.end.longValue(), anyMatch, lCopy)
      } else {
        // null/malformed bounds never match — outer/anti emit now
        mode match {
          case "left_outer" | "left_anti" =>
            pend(c.row.asInstanceOf[UnsafeRow].copy(), null)
          case _ => ()
        }
      }
    } else if (valid) {
      val sv = c.start.longValue()
      val rCopy = c.row.asInstanceOf[UnsafeRow].copy()
      // ONE fused pass over activeL: evict proven-dead lefts (end < sv,
      // emitting outer/anti), pair/mark the survivors per mode; semi/anti
      // entries are DONE once matched — dropped from state immediately
      activeL.scanRewrite { (end, matched, row) =>
        if (end < sv) { emitDeadLeft(matched, row); activeL.DROP }
        else mode match {
          case "inner" | "left_outer" =>
            pend(row, rCopy); activeL.KEEP_MATCHED
          case "left_semi" =>
            if (!matched) pend(row, null)
            activeL.DROP
          case _ => // left_anti: matched ⇒ proven non-emitting, forget it
            activeL.DROP
        }
      }
      activeR.append(c.end.longValue(), false, rCopy)
    }
    c.advance()
  }

  /** Position the next output unit; false when the sweep is exhausted. */
  def advance(): Boolean = {
    while (pending.isEmpty && (lc.row != null || rc.row != null)) step()
    if (pending.isEmpty && !flushed) { flushLeft(); flushed = true }
    if (pending.isEmpty) return false
    cur = pending.poll()
    true
  }

  def leftRow: InternalRow = cur(0)
  /** Overlapping right row, or null (outer null-extension / semi / anti). */
  def rightRow: InternalRow = cur(1)
}

/** Serializable factory for [[IntervalSweepCursor]] — binds per task,
  * Java-plain signature for generated code. The spill threshold is read
  * from the session conf at PLAN time (driver) and travels with the
  * builder; the spill metric is the exec's, passed per task. */
final class IntervalSweepCursorBuilder(lOut: Seq[Attribute],
    rOut: Seq[Attribute], lKeys: Seq[Expression], rKeys: Seq[Expression],
    lStart: Expression, lEnd: Expression, rStart: Expression, rEnd: Expression,
    mode: String) extends Serializable {
  private val spillThreshold: Long = SweepSpill.thresholdInConf
  def create(lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
      spillMetric: SQLMetric): IntervalSweepCursor =
    new IntervalSweepCursor(lIter, rIter,
      UnsafeProjection.create(lKeys, lOut), UnsafeProjection.create(rKeys, rOut),
      BindReferences.bindReference(lStart, lOut),
      BindReferences.bindReference(lEnd, lOut),
      BindReferences.bindReference(rStart, rOut),
      BindReferences.bindReference(rEnd, rOut),
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType)),
      mode, lOut.length, rOut.length, spillThreshold, spillMetric)
}

object IntervalProbeIndex {
  /** One key's intervals sorted by start, with the running max-end prefix
    * array that powers the dead-head cut. */
  final class Entry(val starts: Array[Long], val ends: Array[Long],
    val pmax: Array[Long], val rows: Array[InternalRow])
}

/** key → start-sorted right intervals + max-end prefix; a PER-TASK mutable
  * cursor (`init` then `next` until null) so multi-match probes stream
  * without allocating a per-row collection. `next` counts each visited
  * candidate into the `scanned` metric LAZILY — a semi/anti consumer that
  * stops at the first live match never inflates the metric with entries it
  * did not visit. Single-threaded by contract: one instance per task, and
  * both the iterator path and generated whole-stage code consume a probe
  * fully (or abandon it) before the next `init`. */
final class IntervalProbeIndex(
    map: java.util.HashMap[UnsafeRow, IntervalProbeIndex.Entry],
    scanned: SQLMetric) {
  private var entry: IntervalProbeIndex.Entry = _
  private var i = 0
  private var last = -1
  private var ls = 0L

  /** Position the cursor on the live candidate window for [ls, le] of
    * `key`: last start ≤ le bounds the window, the max-end prefix binary
    * search skips the provably-dead head (every entry before it ended
    * before ls). */
  def init(key: UnsafeRow, ls: Long, le: Long): Unit = {
    this.ls = ls
    entry = map.get(key)
    if (entry == null) { i = 0; last = -1; return }
    val starts = entry.starts
    var lo = 0; var hi = starts.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (starts(mid) <= le) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    val pmax = entry.pmax
    var lo2 = 0; var hi2 = ans; var j0 = ans + 1
    while (lo2 <= hi2) {
      val mid = (lo2 + hi2) >>> 1
      if (pmax(mid) >= ls) { j0 = mid; hi2 = mid - 1 } else lo2 = mid + 1
    }
    i = j0
    last = ans
  }

  /** The next overlapping right row, or null when the window is exhausted. */
  def next(): InternalRow = {
    while (entry != null && i <= last) {
      val j = i
      i += 1
      if (scanned != null) scanned.add(1)
      if (entry.ends(j) >= ls) return entry.rows(j)
    }
    null
  }
}

final class IntervalProbeBuilder(rOut: Seq[Attribute], rKeys: Seq[Expression],
    rStart: Expression, rEnd: Expression) extends Serializable {
  /** Assigned on the driver; every task of this join deserializes the same
    * value — the per-join half of the [[ProbeIndexCache]] key. */
  private val builderId: Long = ProbeIndexCache.newBuilderId()
  // plan-time snapshot of the A/B toggle (builders are constructed on the
  // driver, where SQLConf.get is the session conf)
  private val cacheEnabled: Boolean = ProbeIndexCache.enabledInConf

  /** Per-executor-cached probe: the grouped/sorted index MAP (the heavy,
    * immutable part) is built once per (join, broadcast) pair per JVM; the
    * returned [[IntervalProbeIndex]] is a cheap PER-TASK cursor over the
    * shared map — the cursor is mutable (`init`/`next` state) and so must
    * never itself be shared between tasks. */
  def newProbeCached(
      bcast: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
      scanned: SQLMetric): IntervalProbeIndex = {
    if (!cacheEnabled) return newProbe(bcast.value, scanned)
    val map = ProbeIndexCache.getOrBuild(bcast.id, builderId)(buildMap(bcast.value))
      .asInstanceOf[java.util.HashMap[UnsafeRow, IntervalProbeIndex.Entry]]
    new IntervalProbeIndex(map, scanned)
  }

  def newProbe(rows: Array[InternalRow], scanned: SQLMetric): IntervalProbeIndex =
    new IntervalProbeIndex(buildMap(rows), scanned)

  private def buildMap(rows: Array[InternalRow])
      : java.util.HashMap[UnsafeRow, IntervalProbeIndex.Entry] = {
    val keyProj = UnsafeProjection.create(rKeys, rOut)
    val sEval = BindReferences.bindReference(rStart, rOut)
    val eEval = BindReferences.bindReference(rEnd, rOut)
    val grouped = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
    rows.foreach { row =>
      val sv = sEval.eval(row); val ev = eEval.eval(row)
      // null/malformed (end < start) intervals never match: never indexed
      if (sv != null && ev != null &&
          ev.asInstanceOf[Long] >= sv.asInstanceOf[Long]) {
        val k = keyProj(row).copy()
        var buf = grouped.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, InternalRow)]
          grouped.put(k, buf)
        }
        buf += ((sv.asInstanceOf[Long], ev.asInstanceOf[Long], row))
      }
    }
    val map = new java.util.HashMap[UnsafeRow, IntervalProbeIndex.Entry](grouped.size())
    grouped.forEach { (k, buf) =>
      buf.sortInPlace()(Ordering.by(_._1))
      val n = buf.length
      val starts = new Array[Long](n); val ends = new Array[Long](n)
      val pmax = new Array[Long](n); val rws = new Array[InternalRow](n)
      var m = Long.MinValue
      var j = 0
      while (j < n) {
        val (s, e, r) = buf(j)
        starts(j) = s; ends(j) = e; rws(j) = r
        if (e > m) m = e
        pmax(j) = m
        j += 1
      }
      map.put(k, new IntervalProbeIndex.Entry(starts, ends, pmax, rws))
      ()
    }
    map
  }
}
