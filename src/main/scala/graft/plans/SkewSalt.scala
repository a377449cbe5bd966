package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SELF-SALTING skew mitigation for the native merge execs.
  *
  * AQE's skew-join split (`OptimizeSkewedJoin`) pattern-matches
  * `SortMergeJoinExec`/`ShuffledHashJoinExec` ONLY — a hot key flowing into
  * [[AsOfJoinExec]] or [[IntervalJoinExec]] keeps its straggler partition no
  * matter the thresholds (pinned by the AQE spec). This module is the
  * as-of/interval analogue of that rewrite, done at the DataFrame layer
  * where the operator's semantics make it safe:
  *
  *  - the LEFT (probe/fact) side of a HOT key is split across `salts`
  *    sub-keys by hashing its time/bound columns;
  *  - the RIGHT side replicates ONLY the hot keys' rows to every salt
  *    (cold keys ride salt 0 untouched), because any left row of the key
  *    may land on any salt and as-of/interval correctness per (key, salt)
  *    partition needs exactly one thing: the FULL right-side
  *    timeline/interval-set of that key. Both operators satisfy it — an
  *    as-of match is a function of (left row, full right timeline), and an
  *    interval pair (l, r) is emitted by whichever single salt partition
  *    holds l (l lives in exactly one salt; r is in all of them), so no
  *    pair is lost or duplicated in ANY mode (inner/outer/semi/anti emit
  *    per-left decisions, and each left row exists exactly once).
  *
  * Hot-key detection is an EXACT key-only aggregation pass
  * (`groupBy(keys).count`): map-side partial aggregation means the hot key
  * itself cannot straggle the detection shuffle (its per-partition partial
  * counts are one row each), and the pass reads only the key columns
  * (column pruning reaches the scan). At 100 TB, skip even that by passing
  * `hotKeys` explicitly — the list is usually known (a tracking table, a
  * prior run's stats, or a sample); the rewrite then costs two broadcast
  * hash joins (same subquery — ReuseExchange folds them) and an
  * S-way replication of ONLY the hot slice of the right side.
  *
  * The reference's whole hot-partition machinery
  * (remote-shuffle MapPartitionsWriter.scala:143-355) exists because one
  * hot partition ruins a shuffle; this is that concern, moved to the layer
  * where the engine plans itself. */
object SkewSalt {
  /** Helper-column names; double-underscore prefix keeps them out of every
    * user schema the engine's queries produce. */
  private[plans] val SaltCol = "__graft_salt"

  /** Session conf for FLEET-WIDE automatic salting — the "stats-gated"
    * half of the rewrite: set `spark.graft.skew.autoSalt.salts` to S ≥ 2
    * and every `AsOf.join` / `IntervalJoin.join` call that takes the MERGE
    * exec (the broadcast path has no exchange to skew, so it opts out via
    * the same stats consultation the strategy makes) rewrites itself to
    * the salted form at `spark.graft.skew.autoSalt.threshold` rows/key
    * (default 5M — roughly one straggler task's worth of a hot key).
    * OFF by default (0): the rewrite costs one key-only detection pass per
    * join, which is the caller's trade to make — per call site with
    * `joinSalted`, or per session/fleet with this conf. */
  val SaltsConf = "spark.graft.skew.autoSalt.salts"
  val ThresholdConf = "spark.graft.skew.autoSalt.threshold"

  /** STORED-STATS source for the automatic rewrite (VERDICT r12 §next-5):
    * `spark.graft.skew.autoSalt.statsPath` names a parquet of known-hot
    * keys — a q110-profiler output, a prior run's detection result, or a
    * curated tracking table — whose COLUMN NAMES must cover the LEFT key
    * columns of each auto-salted join. When set, the rewrite reads the
    * (tiny, key-only) stats table instead of running the exact
    * `groupBy(keys).count` detection pass over the fact side — fleet-wide
    * enablement then costs zero extra fact scans per join. Keys absent
    * from the stats frame are simply not salted (same contract as an
    * explicit `hotKeys` argument, which this is sugar for). */
  val StatsPathConf = "spark.graft.skew.autoSalt.statsPath"

  private[plans] def autoSalts(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get(SaltsConf, "0").toInt
  private[plans] def autoThreshold(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get(ThresholdConf, "5000000").toLong

  /** The conf-named stored hot-key frame, projected to `keys` — None when
    * the conf is unset (the detection-pass fallback). A missing column
    * fails loudly at plan time (AnalysisException), never silently
    * un-salts; so does an unreadable/deleted stats path (every auto-salted
    * join plans against it — a fleet operator who deletes the stats table
    * must also unset the conf; there is deliberately NO silent fallback to
    * the detection pass, which would mask the operational mistake with a
    * surprise fact-side scan per join). The loaded frame is memoized per
    * (session, path) so repeated auto-salted joins in one session pay the
    * driver-side parquet metadata read once, not per join (ADVICE r13). */
  private val statsFrames = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  private[plans] def autoHotKeys(spark: org.apache.spark.sql.SparkSession,
      keys: Seq[String]): Option[DataFrame] =
    Option(spark.conf.get(StatsPathConf, "")).filter(_.nonEmpty)
      .map { p =>
        statsFrames
          .computeIfAbsent((spark, p), _ => spark.read.parquet(p))
          .select(keys.map(c => col(s"`$c`")): _*)
      }

  /** Exact hot-key detection: keys of `df` whose row count reaches
    * `threshold`. One key-column-only pass, map-side combined. */
  def hotKeys(df: DataFrame, keys: Seq[String], threshold: Long): DataFrame = {
    require(threshold > 0, s"hot-key threshold must be positive: $threshold")
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") >= threshold)
      .drop("__graft_n")
  }

  /** (salted left, salted right): left rows of hot keys get
    * `pmod(hash(saltSource…), salts)`, cold rows salt 0; right rows of hot
    * keys replicate to ALL salts, cold rows salt 0. `hot` carries the
    * LEFT-side key column names (one row per hot key; deduplicated here so
    * a non-distinct caller list cannot duplicate left rows through the
    * tagging join). */
  private[graft] def saltSides(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], saltSource: Seq[String], salts: Int,
      hot: DataFrame): (DataFrame, DataFrame) = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    // canonical hot frame: distinct keys under neutral names, one flag col
    val hotC = hot.select(keys.map(_._1).zipWithIndex.map {
        case (k, i) => col(s"`$k`").as(s"__graft_hk$i") }: _*)
      .distinct()
      .withColumn("__graft_hot", lit(1))
    val helperCols = keys.indices.map(i => s"__graft_hk$i") :+ "__graft_hot"

    def tag(df: DataFrame, names: Seq[String], saltExpr: org.apache.spark.sql.Column)
        : DataFrame = {
      val d = df.alias("__graft_d")
      // null-safe equality: null keys group together (the engine's as-of/
      // interval convention), so a null hot key must tag null rows too
      val cond = names.zipWithIndex.map { case (k, i) =>
        col(s"__graft_d.`$k`") <=> col(s"__graft_h.__graft_hk$i") }.reduce(_ && _)
      d.join(broadcast(hotC.alias("__graft_h")), cond, "left")
        .withColumn(SaltCol, saltExpr)
        .drop(helperCols: _*)
    }

    val lSalted = tag(left, keys.map(_._1),
      when(col("__graft_hot").isNotNull,
        pmod(hash(saltSource.map(c => col(s"__graft_d.`$c`")): _*), lit(salts)))
        .otherwise(lit(0)))
    // explode replicates ONLY hot right rows S ways; cold rows stay single
    val rSalted = tag(right, keys.map(_._2),
      explode(when(col("__graft_hot").isNotNull,
          sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0)))))
    (lSalted, rSalted)
  }
}
