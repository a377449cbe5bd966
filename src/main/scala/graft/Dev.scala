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
    if (name == "simham") {
      // dump per-doc simhash fingerprints for offline hamming analysis
      import org.apache.spark.sql.functions._
      val sh = graft.engine.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), array_distinct(expr(
          "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
      val bitCols = (0 until 64).map(b =>
        sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"v$b"))
      val votes = ex.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      votes.select(col("doc_id"),
          (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
            .reduce(_.bitwiseOR(_)).as("f"))
        .coalesce(1).write.mode("overwrite").parquet("/tmp/simham")
      println("[dev] simham written to /tmp/simham")
    } else if (name == "all") {
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
