package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's driver-contract entries. Each module maps
  * reference operators (SURVEY.md §2) to Spark-native plans; `oracleSql` holds
  * the DuckDB-dialect equivalent with identical column names/types/values.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    CoreQueries,
    JoinQueries,
    WindowQueries,
    AnalyticQueries,
    ScalarQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    MultimodalQueries,
    StatefulQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
