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
  def newProbe(rows: Array[InternalRow], scanned: SQLMetric): IntervalProbeIndex = {
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
    new IntervalProbeIndex(map, scanned)
  }
}
