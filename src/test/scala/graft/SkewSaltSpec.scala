package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the self-salting skew rewrite (VERDICT r11 §next-1): salted ==
  * plain on random and crafted hot-key tables for every as-of variant and
  * every interval mode, plus the structural pin that the hot key actually
  * lands in more than one task under the salted plan (it provably occupies
  * exactly one under the plain merge exec — the straggler being mitigated). */
class SkewSaltSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random tables: ~25 keys, lcg-scattered times, a
    * couple of null keys/times to exercise the grouping conventions. */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def randomLeft(n: Int, seed: Long): DataFrame = {
    val r = lcg(seed).take(3 * n).toArray
    (0 until n).map { i =>
      val k: java.lang.Long =
        if (math.floorMod(r(3 * i), 37) == 0) null
        else java.lang.Long.valueOf(math.floorMod(r(3 * i), 25))
      val t: java.lang.Long =
        if (math.floorMod(r(3 * i + 1), 41) == 0) null
        else java.lang.Long.valueOf(math.floorMod(r(3 * i + 1), 2000))
      (k, t, i.toLong)
    }.toDF("k", "t", "lid")
  }

  private def randomRight(n: Int, seed: Long): DataFrame = {
    val r = lcg(seed).take(3 * n).toArray
    (0 until n).map { i =>
      val k: java.lang.Long =
        if (math.floorMod(r(3 * i), 37) == 0) null
        else java.lang.Long.valueOf(math.floorMod(r(3 * i), 25))
      val t: java.lang.Long =
        if (math.floorMod(r(3 * i + 1), 41) == 0) null
        else java.lang.Long.valueOf(math.floorMod(r(3 * i + 1), 2000))
      (k, t, 100000L + i)
    }.toDF("bk", "bt", "rid")
  }

  /** Crafted hot table: 80% of left rows on ONE key, times scattered. */
  private def hotLeft(n: Int): DataFrame =
    (0 until n).map { i =>
      val k = if (i % 5 != 0) 7L else (i % 23).toLong
      (k, (i * 131L) % 5000, i.toLong)
    }.toDF("k", "t", "lid")

  private def hotRight(n: Int): DataFrame =
    (0 until n).map { i =>
      val k = if (i % 3 == 0) 7L else (i % 23).toLong
      (k, (i * 173L) % 5000, 100000L + i)
    }.toDF("bk", "bt", "rid")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("salted as-of == plain as-of (random + hot tables, strict/nonstrict/tolerance)") {
    val tables = Seq(
      ("random", randomLeft(400, 11L), randomRight(300, 99L)),
      ("hot", hotLeft(2000), hotRight(600)))
    for ((label, l, r) <- tables;
         strict <- Seq(true, false);
         tol <- Seq(None, Some(250L))) {
      val plain = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
        strict, tol, broadcast = Some(false))
      // threshold 8: on the random tables (~16 rows/key, ~10 null-key rows)
      // this makes MOST keys hot including the null key — the null-safe
      // tagging path is exercised, not just the crafted straggler
      val salted = graft.plans.AsOf.joinSalted(l, r, Seq("k" -> "bk"), "t", "bt",
        strict, tol, salts = 4, hotThreshold = 8L)
      assert(salted.columns.toSeq == plain.columns.toSeq,
        s"$label strict=$strict tol=$tol: schema drifted")
      assert(canon(salted) == canon(plain),
        s"$label strict=$strict tol=$tol: salted as-of diverged from plain")
    }
  }

  test("salted interval == plain interval (random + hot tables, all four modes)") {
    // reuse the time columns as interval bounds: [t, t+width]
    def asIntervals(df: DataFrame, t: String, w: Long): DataFrame =
      df.withColumn("s2", col(t)).withColumn("e2", col(t) + lit(w)).drop(t)
    val tables = Seq(
      ("random", asIntervals(randomLeft(300, 5L), "t", 60L),
        asIntervals(randomRight(250, 77L), "bt", 45L)),
      ("hot", asIntervals(hotLeft(1500), "t", 40L),
        asIntervals(hotRight(500), "bt", 30L)))
    for ((label, l, r) <- tables;
         mode <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = graft.plans.IntervalJoin.join(l, r, Seq("k" -> "bk"),
        "s2", "e2", "s2", "e2", mode, broadcast = Some(false))
      val salted = graft.plans.IntervalJoin.joinSalted(l, r, Seq("k" -> "bk"),
        "s2", "e2", "s2", "e2", mode, salts = 4, hotThreshold = 8L)
      assert(salted.columns.toSeq == plain.columns.toSeq,
        s"$label $mode: schema drifted")
      assert(canon(salted) == canon(plain),
        s"$label $mode: salted interval join diverged from plain")
    }
  }

  test("the hot key occupies ONE task plain, SEVERAL tasks salted (the straggler split)") {
    val l = hotLeft(4000)
    val r = hotRight(800)
    def hotPartitions(df: DataFrame): Long =
      df.filter(col("k") === 7L)
        .withColumn("pid", spark_partition_id())
        .select(col("pid")).distinct().count()
    // AQE coalescing OFF for the structural pin: at this fixture size it
    // would fold ALL post-shuffle partitions into one and hide the split
    // (the property under test is the partitioning, not the row values)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      // plain merge exec: ClusteredDistribution sends every k=7 row to one
      // post-shuffle partition — the straggler
      val plain = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
        broadcast = Some(false))
      assert(hotPartitions(plain) == 1L,
        "plain merge exec should funnel the hot key into exactly one task")
      // salted: the same rows spread across the salt sub-keys
      val salted = graft.plans.AsOf.joinSalted(l, r, Seq("k" -> "bk"), "t", "bt",
        salts = 8, hotThreshold = 100L)
      val spread = hotPartitions(salted)
      assert(spread > 1L,
        s"salted plan should spread the hot key over several tasks, got $spread")
    } finally old match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("conf-gated auto-salting engages on merge joins, skips broadcast-eligible rights") {
    val l = hotLeft(2000)
    val r = hotRight(600)
    def canon2(df: DataFrame): Seq[String] = canon(df)
    val plain = canon2(graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
      broadcast = Some(false)))
    val keys = Seq(graft.plans.SkewSalt.SaltsConf -> "4",
      graft.plans.SkewSalt.ThresholdConf -> "100")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // merge-path join rewrites ITSELF: the salt machinery appears in the
      // plan (no call-site change) and results stay law-equal
      val auto = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
        broadcast = Some(false))
      assert(auto.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "auto-salt conf must rewrite the merge-path join")
      assert(canon2(auto) == plain, "auto-salted join diverged from plain")
      // a broadcast-eligible right (stats under the session threshold) has
      // no exchange to skew: the rewrite must NOT engage
      val bc = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt")
      assert(!bc.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "broadcast-eligible join must not pay the salting rewrite")
      assert(canon2(bc) == plain)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("auto-salt consumes stored stats (statsPath conf): no detection pass, zero extra jobs") {
    val l = hotLeft(2000)
    val r = hotRight(600)
    val plain = canon(graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
      broadcast = Some(false)))
    // a prior run's profiler output, persisted: one row per known-hot key
    val statsDir = java.nio.file.Files.createTempDirectory("graft_salt_stats")
      .resolve("hot").toString
    Seq(Tuple1(7L)).toDF("k").write.mode("overwrite").parquet(statsDir)
    val confs = Seq(graft.plans.SkewSalt.SaltsConf -> "4",
      graft.plans.SkewSalt.ThresholdConf -> "100",
      graft.plans.SkewSalt.StatsPathConf -> statsDir)
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val auto = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
        broadcast = Some(false))
      val planStr = auto.queryExecution.optimizedPlan.toString
      assert(planStr.contains("__graft_salt"),
        "stats-fed auto-salt must still rewrite the join")
      // the detection aggregate (its __graft_n count column) must be GONE:
      // the hot frame comes off the stored stats scan instead
      assert(!planStr.contains("__graft_n"),
        s"stored stats must replace the groupBy-count detection pass:\n$planStr")
      assert(canon(auto) == plain, "stats-fed auto-salt diverged from plain")
      // job parity with an explicitly-passed hotKeys frame — supplying the
      // stats via conf costs ZERO extra Spark jobs over the explicit path
      def countJobs(body: => Unit): Long = {
        jobs.set(0)
        spark.sparkContext.addSparkListener(listener)
        // the listener bus is async (and private[spark]): a short post-job
        // drain, the Dev skewsalt probe's convention
        try { body; Thread.sleep(800) }
        finally spark.sparkContext.removeSparkListener(listener)
        jobs.get()
      }
      val viaConf = countJobs {
        graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
          broadcast = Some(false)).count()
      }
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      val viaExplicit = countJobs {
        graft.plans.AsOf.joinSalted(l, r, Seq("k" -> "bk"), "t", "bt",
          salts = 4, hotKeys = Some(spark.read.parquet(statsDir))).count()
      }
      // ≤, not ==: the conf path memoizes the stats frame per (session,
      // path) (ADVICE r13 — SkewSalt.statsFrames), so a session that has
      // already planned against this store skips the parquet
      // schema-inference job the explicit spark.read.parquet pays
      assert(viaConf <= viaExplicit,
        s"stats conf must add no jobs: conf=$viaConf explicit=$viaExplicit")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("explicit hotKeys frame skips detection and only replicates the listed keys") {
    val l = hotLeft(1000)
    val r = hotRight(400)
    val hot = Seq(Tuple1(7L)).toDF("k")
    val plain = graft.plans.AsOf.join(l, r, Seq("k" -> "bk"), "t", "bt",
      broadcast = Some(false))
    val salted = graft.plans.AsOf.joinSalted(l, r, Seq("k" -> "bk"), "t", "bt",
      salts = 4, hotKeys = Some(hot))
    assert(canon(salted) == canon(plain))
    // replication bound: salted right volume = cold rows + salts × hot rows
    val (lS, rS) = graft.plans.SkewSalt.saltSides(l, r, Seq("k" -> "bk"),
      Seq("t"), 4, hot)
    val nHot = r.filter(col("bk") === 7L).count()
    val nCold = r.count() - nHot
    assert(rS.count() == nCold + 4 * nHot,
      "only the hot slice of the right side may replicate")
    assert(lS.count() == l.count(), "salting must never duplicate left rows")
  }
}
