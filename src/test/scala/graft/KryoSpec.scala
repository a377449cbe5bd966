package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Serializer matrix (reference §5 test strategy: every sorter/map suite runs
  * kryo × java, RemoteSorterSuite.scala:280-284). The typed operator paths —
  * custom Aggregator (q09), cogroup (q10), stateful fold (q66) — move
  * user-class closures/buffers through the core serializer, so they are
  * re-run here under Kryo and asserted equal to their declarative SQL twins
  * computed in the same session. Runs in its own forked JVM (see
  * `Test / testGrouping`): one SparkContext per JVM, and the serializer is a
  * context-level setting. */
class KryoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-kryo")
      .master("local[8]")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrationRequired", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("typed Aggregator equals SQL aggregation under Kryo") {
    val typed = graft.operators.CoreQueries.q09TypedAgg(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val sql = graft.engine.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"),
        count(lit(1)).as("n"))
      .withColumn("avg_value", col("value_cents") / (lit(100.0) * col("n")))
      .orderBy(col("event_type"))
      .collect().map(_.toSeq).toSeq
    assert(typed == sql)
    assert(typed.nonEmpty)
  }

  test("typed cogroup equals the equivalent outer-join aggregation under Kryo") {
    val typed = graft.operators.CoreQueries.q10Cogroup(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val o = graft.engine.Tables.load(spark, sfDir, "orders")
    val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
    val sql = o.join(li, o("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"))
      .orderBy(col("o_orderkey"))
      .collect().map(_.toSeq).toSeq
    assert(typed == sql)
  }

  test("stateful typed sessionization equals the window formulation under Kryo") {
    val typed = graft.operators.StatefulQueries.q66StatefulSessions(spark, sfDir)
      .select(col("user_id"), col("session_id"), col("n_events"), col("value_cents"))
      .collect().map(_.toSeq).toSeq
    val win = graft.operators.WindowQueries.q24Sessionize(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // q24 computes the same sessions declaratively (lag + cumulative breaks)
    assert(typed.nonEmpty)
    assert(typed == win)
  }
}
