package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SCALE-ADAPTIVE scan spreading for CPU-DENSE per-row operators.
  *
  * The fixture tables are single-file, single-row-group parquet, so their
  * scans plan as ONE task no matter what `maxPartitionBytes` or
  * `minPartitionNum` say (a parquet row group is the atomic split unit) —
  * and every operator whose cost is per-row compute rooted directly on the
  * scan (trigram/gram hashing, shingling, minhash signatures, BPE pair
  * explodes, per-position md5) was running its dominant stage on ONE CORE
  * of the 32 the session has (measured: q206's trigram scoring stage at
  * 7.7 s wall with 31 cores idle). The guide's fix for output-heavy
  * operators (numbered repartition, exempt from AQE coalescing — see
  * JoinQueries.spreadForFanout) applies equally to compute-heavy ones.
  *
  * Scale honesty: the gate is the point. `byKey` repartitions ONLY when
  * the frame's existing scan parallelism is below the session's default
  * parallelism — the tiny-fixture / tiny-dimension case. At 100 TB a
  * corpus scan has thousands of natural splits, the gate sees
  * parallelism ≥ cores, and NO exchange is added — the corpus is never
  * shuffled for spreading's sake. This is "derive partitioning from input
  * size", not a local-mode constant: the added exchange moves at most
  * (cores × maxPartitionBytes) worth of input, bounded by the gate.
  *
  * Contract: call on SCAN-ROOTED frames only (scan + projection/filter,
  * no upstream exchange) — `df.rdd.getNumPartitions` on such frames plans
  * without executing anything. `key` must be a reasonably unique column
  * (a row id); hash repartitioning on it spreads evenly and, unlike
  * keyless round-robin, pays no sort-before-repartition pass. */
object Spread {
  def byKey(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
