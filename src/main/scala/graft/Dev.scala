package graft

/** Dev-loop tool: time one query N times and optionally dump its plan.
  * Usage: runMain graft.Dev <sfDir> <queryName> [reps] [explain]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val doExplain = args.contains("explain")
    val spark = graft.engine.Sessions.build("graft-dev")
    if (name == "all") {
      (1 to reps).foreach { i =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (qn, f) =>
          val t0 = System.nanoTime()
          val n = f(spark, sfDir).count()
          println(f"[dev] pass$i $qn: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
        }
      }
    } else {
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[dev] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
