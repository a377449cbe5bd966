package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named bundle of driver-contract queries plus their DuckDB oracles.
  *
  * Contract (builder prompt + SURVEY.md §7): every operator claimed done has a
  * `queries` entry and, when SQL-expressible, an `oracles` entry producing the
  * same column names / types / values in DuckDB.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  /** DuckDB SQL producing identical results; omit keys for non-SQL ops. */
  def oracles: Map[String, String]
}

/** Shared numeric-determinism helpers.
  *
  * The driver hash-compares Spark output against DuckDB. Floating-point SUM
  * order differs between engines, so money columns (exact 2-decimal doubles in
  * the fixtures) are aggregated as exact integer cents: `sum(round(x*100))` is
  * order-independent and bit-identical in both engines. `avg` is never used —
  * always exact-sum / count, which is a single deterministic double division.
  */
object Num {
  /** Exact cents of a 2-decimal money column (long). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
  /** Exact 1e-4 units of a product of two 2-decimal columns (long). */
  def tenK(c: Column): Column = round(c * 10000, 0).cast("long")
  /** Long-typed sum of exact cents, aliased. */
  def sumCents(c: Column, as: String): Column = sum(cents(c)).as(as)

  /** DuckDB-side equivalents (string SQL fragments). */
  def sqlCents(e: String): String = s"CAST(round(($e)*100,0) AS BIGINT)"
  def sqlTenK(e: String): String = s"CAST(round(($e)*10000,0) AS BIGINT)"
  def sqlSumCents(e: String, as: String): String =
    s"CAST(sum(${sqlCents(e)}) AS BIGINT) AS $as"
}
