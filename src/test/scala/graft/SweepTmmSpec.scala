package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TaskMemoryManager-integrated sweep budget (VERDICT r13 §next-8):
  * with NO `spark.graft.interval.sweep.spillThreshold` conf set, the sweep
  * state must register with Spark's execution-memory accounting, spill
  * when the pool refuses it, and still produce exact results. Runs in its
  * OWN forked JVM (build.sbt testGrouping) because the constrained memory
  * is a SparkContext-level setting (`spark.testing.memory`). */
class SweepTmmSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .appName("graft-sweep-tmm")
    .master("local[2]")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // a 16 MB memory-manager pool (reserved zeroed): the ~10 MB sweep
    // stack below cannot fit the per-task execution grant, so the
    // TmmBudget's acquireMemory is refused mid-build and the structures
    // MUST take the spill path — with no private conf set anywhere
    .config("spark.testing.memory", (16L * 1024 * 1024).toString)
    .config("spark.testing.reservedMemory", "0")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sweep spills under TaskMemoryManager pressure with NO threshold conf") {
    import spark.implicits._
    assert(spark.conf.getOption(graft.plans.SweepSpill.ThresholdConf).isEmpty,
      "this spec exists to prove the NO-conf path")
    val nDeep = 150000L
    // one key, fully-overlapping open-ended lefts: the active stack holds
    // every row at once (~10 MB of UnsafeRows) — past the constrained grant
    val deep = spark.range(0, nDeep).select(lit(1L).as("k"),
      col("id").as("s"), lit(1000000000L).as("e"), col("id").as("lid"))
    val dead = spark.range(0, 5).select(lit(1L).as("k"),
      (col("id") + 1000000L).as("s"), (col("id") + 1000001L).as("e"),
      (col("id") + 9000000L).as("lid"))
    val left = deep.union(dead)
    val right = Seq((1L, 2000000L, 2000010L, 77L)).toDF("bk", "bs", "be", "rid")
    def run(mode: String): (Long, Long) = {
      val df = graft.plans.IntervalJoin.join(left, right, Seq("k" -> "bk"),
          "s", "e", "bs", "be", mode, broadcast = Some(false))
        .select(col("lid"))
      val n = df.collect().length.toLong
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: allNodes(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: allNodes(a.executedPlan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val spilled = allNodes(df.queryExecution.executedPlan)
        .collect { case e: graft.plans.IntervalJoinExec =>
          e.metrics("spillBytes").value }.max
      (n, spilled)
    }
    val (nInner, spInner) = run("inner")
    assert(nInner == nDeep, s"inner: every deep left pairs once, got $nInner")
    assert(spInner > 0,
      "the memory-manager grant must have forced sweep-state spills")
    val (nOuter, spOuter) = run("left_outer")
    assert(nOuter == nDeep + 5, s"outer adds the 5 evicted lefts, got $nOuter")
    assert(spOuter > 0)
  }
}
