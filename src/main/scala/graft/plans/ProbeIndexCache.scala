package graft.plans

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** PER-EXECUTOR memo for broadcast-side probe indexes.
  *
  * [[BroadcastAsOfJoinExec]] / [[BroadcastIntervalJoinExec]] used to call
  * `builder.build(broadcastRows.value)` inside `mapPartitions` (and in the
  * generated class's init), so EVERY FACT TASK re-grouped and re-sorted the
  * full broadcast side — O(|dim| log |dim|) per task. Spark's own
  * BroadcastHashJoinExec avoids this by broadcasting a pre-built
  * `HashedRelation` (`HashedRelationBroadcastMode.transform`); these execs
  * ride `IdentityBroadcastMode` (the broadcast payload stays plain rows, the
  * shape AQE/ReuseExchange already canonicalize), so the build is deduped on
  * the consumer side instead: one build per (broadcast id, consuming join)
  * per JVM, every other task of the join gets the shared immutable index.
  * At 10⁵ fact tasks × 10⁶-row dimension the rebuild otherwise dominates
  * the probe — the same reason the reference keeps an executor-side index
  * cache (remote-shuffle `RemoteShuffleBlockResolver`'s per-executor
  * metadata cache).
  *
  * Key = (broadcast id, builder id). The broadcast id alone is NOT enough:
  * ReuseExchange can feed one broadcast exchange into two different joins
  * whose probe parameters (keys/time/tolerance/strict) differ, so each
  * driver-constructed builder carries its own id — all tasks of one join
  * deserialize the same builder instance and therefore share the id, while
  * a second join over the same broadcast gets its own entry.
  *
  * Values are [[SoftReference]]s: the cached index aliases the broadcast's
  * row array (no row copies) plus the grouping overlay, and memory pressure
  * may reclaim it — a cleared entry just means the next task rebuilds.
  * Thread safety: the indexes are immutable after construction
  * (concurrent `lookup`/`buildMap` reads only); misses take one coarse lock
  * because builds happen once per join, not per task.
  *
  * `builds` counts actual builds (cache misses) — the spec's proof that a
  * many-task fact pays ≤ 1 build per executor per join. */
object ProbeIndexCache {
  /** A/B toggle (driver-side, read at plan time): `spark.graft.probe.cache`
    * = "false" restores the per-task rebuild — kept ONLY so the win stays
    * measurable (Dev `probecache`, SCALING.md); default on. */
  val EnabledConf = "spark.graft.probe.cache"
  def enabledInConf: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(EnabledConf, "true") != "false"
    catch { case _: Throwable => true }

  private val ids = new AtomicLong(0L)

  /** Driver-side unique id for one probe-builder instance (== one join). */
  def newBuilderId(): Long = ids.incrementAndGet()

  /** Total index builds (cache misses) in this JVM. Test observability. */
  val builds = new AtomicLong(0L)

  private val cache =
    new ConcurrentHashMap[(Long, Long), SoftReference[AnyRef]]()

  private val purgeLock = new Object

  def getOrBuild(broadcastId: Long, builderId: Long)(build: => AnyRef): AnyRef = {
    val key = (broadcastId, builderId)
    val ref = cache.get(key)
    if (ref != null) {
      val v = ref.get()
      if (v != null) return v
    }
    // PER-KEY locking (ConcurrentHashMap.compute holds only the key's bin):
    // first tasks of unrelated concurrent joins on one executor build in
    // parallel instead of serializing behind each other's multi-second
    // builds (the old coarse cache.synchronized block did exactly that —
    // ADVICE r13). Within one key, compute still guarantees one build.
    var built: AnyRef = null
    val computed = cache.compute(key, (_, existing) => {
      val cur = if (existing != null) existing.get() else null
      if (cur != null) existing
      else {
        built = build
        builds.incrementAndGet()
        new SoftReference[AnyRef](built)
      }
    })
    if (built != null) {
      // purge entries whose referents were reclaimed: the map itself must
      // not grow without bound across many joins in one long-lived JVM.
      // Outside the compute (touching other bins inside a compute lambda
      // risks bin-lock inversion); remove(key, value) only removes the
      // exact cleared reference, so a concurrent rebuild is never evicted.
      purgeLock.synchronized {
        val it = cache.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.get() == null) cache.remove(e.getKey, e.getValue)
        }
      }
      built
    } else {
      val v = computed.get()
      // reclaimed between compute and read (GC pressure): rebuild
      if (v != null) v else getOrBuild(broadcastId, builderId)(build)
    }
  }
}
