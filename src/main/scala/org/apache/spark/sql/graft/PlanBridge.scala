package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway a library-defined operator needs: turn a
  * hand-built [[LogicalPlan]] into a user-facing DataFrame. Lives under
  * `org.apache.spark.sql` solely to satisfy `Dataset.ofRows`'s package-private
  * access — the standard extension-library technique; no Spark internals are
  * modified or shadowed. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
