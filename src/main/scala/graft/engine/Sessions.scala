package graft.engine

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify, Bench, and tests agree.
  *
  * Scale posture (SURVEY.md §7): AQE on (runtime coalescing / skew-join — the
  * reference's partition-range reads exist to serve exactly this,
  * RemoteShuffleManager.scala:91-110), shuffle partitions sized to cores on
  * local mode (on a 1000-executor cluster this would be cores×executors, with
  * AQE coalescing the tail), UTC timezone pinned for oracle agreement.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS): read as long, normalized in
      // Tables.load. Without this the scan itself throws PARQUET_TYPE_ILLEGAL.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Release every block-manager residue a finished query may have left:
    * CacheManager entries (the per-query `.cache()`s in the dedup/LSH
    * pipelines) and pinned RDD blocks (the `localCheckpoint` label/adjacency
    * frames of iterative operators). Harnesses call this BETWEEN queries —
    * caches in this engine are scoped to one query execution, and a
    * long-running session (bench pass, pipeline job) must not accumulate
    * storage across queries: at 100 TB an unreleased cache per query turns
    * executor storage memory into a ratchet that degrades everything
    * scheduled later. Unpersist is non-blocking; freeing is off the
    * critical path.
    *
    * Scope note: this sweeps EVERY CacheManager entry and persistent RDD on
    * the shared context — a single-tenant, between-queries design. A caller
    * holding an intentionally session-scoped cache (e.g. a cross-run
    * persisted-signature frame kept hot, or a multi-tenant session) would
    * have it silently dropped (lineage keeps results correct; the cost is a
    * full recompute). If caches ever become intentionally session-scoped,
    * track harness-created pins explicitly (registry of RDD ids) and sweep
    * only those. The durable cross-run shape is a parquet signature table
    * (see DedupQueries.signatureIndex), which this sweep never touches. */
  def releasePinned(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
