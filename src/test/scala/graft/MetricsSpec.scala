package graft

import org.apache.spark.sql.functions._

import graft.engine.MetricsListener

/** Listener-plumbing evidence for the bench cost counters (VERDICT r7 §next-1).
  *
  * The counters exist so cross-round comparisons survive ambient load: wall
  * clock on a shared sandbox is noise, shuffle volume is a deterministic
  * property of plan+data. These tests pin the plumbing on plans whose
  * shuffle structure is known by construction: a two-shuffle agg-then-join
  * must show read and write bytes; a shuffle-free map-only scan must show
  * zero; reset must actually zero the window.
  */
class MetricsSpec extends SparkSpec {

  test("two-shuffle plan registers shuffle read+write bytes and peak memory") {
    val l = MetricsListener.install(spark)
    MetricsListener.drain(spark); l.reset()
    val li = graft.engine.Tables.load(spark, sfDir01, "lineitem")
    // shuffle 1: groupBy(l_suppkey); shuffle 2: the supp-key equi-join of
    // two aggregated sides (both exceed the broadcast threshold's row floor
    // only via the exchange — AQE may broadcast one side, which still
    // leaves shuffle 1's write + the broadcast build read nonzero)
    val a = li.groupBy("l_suppkey").agg(sum("l_quantity").as("q"))
    val b = li.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    val n = a.join(b, "l_suppkey").count()
    MetricsListener.drain(spark)
    val m = l.snapshot
    assert(n > 0)
    assert(m.shuffleWriteBytes > 0, "agg+join must have written shuffle data")
    assert(m.shuffleReadBytes > 0, "agg+join must have read shuffle data")
    assert(m.peakExecMemoryBytes > 0, "hash agg must have acquired execution memory")
  }

  test("map-only scan registers zero shuffle bytes; reset zeroes the window") {
    val l = MetricsListener.install(spark)
    MetricsListener.drain(spark); l.reset()
    val n = graft.engine.Tables.load(spark, sfDir01, "lineitem")
      .filter(col("l_quantity") > 25).select("l_orderkey").count()
    MetricsListener.drain(spark)
    // count() plans a partial-agg exchange of one row per partition; a
    // filter+project scan must not move data beyond that ~KB residue
    val m = l.snapshot
    assert(n > 0)
    assert(m.shuffleWriteBytes < 64 * 1024,
      s"map-only scan moved ${m.shuffleWriteBytes}B — a real shuffle leaked in")
    l.reset()
    val z = l.snapshot
    assert(z.shuffleReadBytes == 0 && z.shuffleWriteBytes == 0 &&
      z.spillBytes == 0 && z.peakExecMemoryBytes == 0)
  }

  test("forced spill registers spill bytes through the listener") {
    val l = MetricsListener.install(spark)
    val olds = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "4")
    try {
      MetricsListener.drain(spark); l.reset()
      // consume the window column: a bare count() lets column pruning drop
      // the window operator entirely and nothing ever spills
      graft.operators.WindowQueries.q23CumSum(spark, sfDir01)
        .agg(sum(col("cum_cents"))).collect()
      MetricsListener.drain(spark)
      assert(l.snapshot.spillBytes > 0,
        "4-row window buffer threshold must surface spill bytes in task metrics")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
