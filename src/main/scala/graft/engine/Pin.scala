package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Materialize a frame into explicitly-freeable blocks behind a leaf plan —
  * the resource discipline shared by every iterative driver (connected
  * components, star contraction, k-means).
  *
  * The returned frame is a leaf over the pinned RDD, so an iterated PLAN
  * stays one join deep (Catalyst never sees prior rounds' lineage), and the
  * RDD handle is what `unpersist()` needs (`Dataset.unpersist` only covers
  * CacheManager entries; `Dataset.localCheckpoint` blocks can only be freed
  * by the ContextCleaner). persist — not localCheckpoint — on purpose: the
  * RDD keeps its lineage, so a block lost to eviction or a freed prior
  * round recomputes from source instead of throwing; a checkpoint's
  * truncated lineage makes every unpersist a point of no return.
  *
  * Contract for drivers: pin round N+1, then unpersist round N's handle the
  * moment its successor is materialized — block-manager storage stays O(1)
  * over any round count, which is what keeps a long-running session (bench
  * pass, production pipeline) from ratcheting executor storage memory. */
object Pin {
  def pin(df: DataFrame): (DataFrame, RDD[Row]) = {
    val r = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    r.count()
    (df.sparkSession.createDataFrame(r, df.schema), r)
  }
}
