package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table catalog.
  *
  * The reference engine (oap-project/remote-shuffle) is schema-agnostic — the
  * layer above the shuffle owns schema (reference:
  * shuffle-hadoop/src/main/scala/org/apache/spark/shuffle/remote/RemoteShuffleManager.scala:67-85,
  * fully generic `registerShuffle[K, V, C]`). This engine IS that layer: the
  * catalog binds the driver-generated parquet fixtures (TESTDATA.md) to typed
  * DataFrames, letting Catalyst push filters/column pruning into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table; filters/pruning push down into the parquet scan.
    *
    * `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS), which Spark only reads as a raw long
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set in [[Sessions]]),
    * and plain microsecond TIMESTAMP. Normalize on type, not on faith: a
    * long column is nanos and converts to a microsecond TimestampType; a
    * timestamp column passes through. Downstream operators always see a
    * real timestamp.
    */
  /** Epoch unit of a long-typed `ts` column, inferred once per fixture dir
    * from a single non-null value's magnitude (epoch seconds ~1.7e9, millis
    * ~1.7e12, micros ~1.7e15, nanos ~1.7e18 — three decades apart, so any one
    * value decides). The fixture generator has already changed `ts`'s physical
    * type twice across rounds (TIMESTAMP(NANOS) → tz-naive micros); inferring
    * the unit instead of assuming nanos means a third change degrades to
    * nothing instead of failing every events-table query (round 8's BENCH
    * lost 20 queries to exactly that). Cached so the one-row read happens
    * once per dir, not once per query. */
  private val longTsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def inferLongTsUnit(df: DataFrame, key: String): String =
    longTsUnitCache.computeIfAbsent(key, _ => {
      import org.apache.spark.sql.functions.col
      val sample = df.select(col("ts")).filter(col("ts").isNotNull).head(1)
      val v = if (sample.isEmpty) 0L else math.abs(sample(0).getLong(0))
      if (v >= 100000000000000000L) "ns"        // ≥1e17
      else if (v >= 100000000000000L) "us"      // ≥1e14
      else if (v >= 100000000000L) "ms"         // ≥1e11
      else "s"
    })

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType =>
        import org.apache.spark.sql.functions.{expr, timestamp_micros, timestamp_millis, timestamp_seconds}
        inferLongTsUnit(df, s"$dir/$name") match {
          // `div` (integer division): ns values ~1.7e18 exceed double's exact
          // integer range, so `floor(ts / 1000)` would be off by up to 1 μs
          case "ns" => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case "us" => df.withColumn("ts", timestamp_micros(expr("ts")))
          case "ms" => df.withColumn("ts", timestamp_millis(expr("ts")))
          case _    => df.withColumn("ts", timestamp_seconds(expr("ts")))
        }
      case TimestampNTZType =>
        // tz-naive parquet timestamps arrive as TIMESTAMP_NTZ, which
        // unix_micros / bigint casts reject; with the session pinned to UTC
        // this cast is value-identical and restores the TimestampType every
        // downstream operator (and the DuckDB oracle agreement) was built
        // on. Other tables' date columns stay as read — they never hit
        // epoch arithmetic, and their outputs already oracle-match as-is.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every fixture table as a temp view named after itself, for
    * SQL-surface queries (GROUPING SETS etc.) and interactive use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
