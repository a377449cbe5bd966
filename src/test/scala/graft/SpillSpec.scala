package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spill-under-pressure evidence (reference A4/S2: RemoteAppendOnlyMapSuite
  * and RemoteSorterSuite force spills and assert correctness after them,
  * RemoteAppendOnlyMapSuite.scala:72-558, RemoteSorterSuite.scala:53-220).
  *
  * Spark's external paths are exercised by dropping the RUNTIME spill/
  * fallback thresholds to a few rows and re-running real declared queries:
  * each test asserts (a) the external path actually ran — nonzero spillSize
  * metric on the operator — and (b) the result is bit-identical to the
  * default in-memory run. AQE is disabled inside these tests only so the
  * executed plan's metrics are directly traversable. */
class SpillSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Sum of every `spillSize` metric in the executed (non-adaptive) plan. */
  private def spillBytes(df: DataFrame): Long = {
    var total = 0L
    df.queryExecution.executedPlan.foreach { n =>
      n.metrics.get("spillSize").foreach(m => total += m.value)
    }
    total
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("window operator spills externally and stays correct (S2 analogue)") {
    val want = rows(graft.operators.WindowQueries.q23CumSum(spark, sfDir01))
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      // groups buffer in an array up to the in-memory threshold before the
      // external sorter even exists — both knobs must drop below the ~10-row
      // window partitions for the external path to engage
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4") {
      val df = graft.operators.WindowQueries.q23CumSum(spark, sfDir01)
      val got = rows(df)
      assert(spillBytes(df) > 0, "window buffer must have spilled to disk")
      assert(got == want)
    }
  }

  test("sort-merge join buffer spills externally and stays correct") {
    def joined: DataFrame = {
      val c = graft.engine.Tables.load(spark, sfDir, "customer")
      c.as("a").join(c.as("b"), col("a.c_mktsegment") === col("b.c_mktsegment"))
        .groupBy(col("a.c_mktsegment"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("b.c_custkey")).as("k_sum"))
        .orderBy(col("a.c_mktsegment"))
    }
    val want = rows(joined)
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "8",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "8") {
      val df = joined
      val got = rows(df)
      assert(spillBytes(df) > 0, "SMJ match buffer must have spilled to disk")
      assert(got == want)
    }
  }

  test("hash aggregation falls back to external sort-based agg and stays correct (A4)") {
    val want = rows(graft.operators.CoreQueries.q01Agg(spark, sfDir))
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      // every aggregation task abandons its hash map after 100 entries and
      // finishes through the external sort-based merge path (the same
      // fallback a memory-starved executor takes at 100 TB)
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "100") {
      val df = graft.operators.CoreQueries.q01Agg(spark, sfDir)
      val got = rows(df)
      assert(got == want)
    }
  }
}
