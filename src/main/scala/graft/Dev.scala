package graft

/** Dev-loop tool: time one query N times and optionally dump its plan.
  * Usage: runMain graft.Dev <sfDir> <queryName> [reps] [explain]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) scala.util.Try(args(2).toInt).getOrElse(2) else 2
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
    } else if (name == "cold") {
      // honest cold timings: caches released between reps, like Bench.
      // Usage: runMain graft.Dev <sfDir> cold <reps> <queryName>
      val qname = args(3)
      val fn = SparkEntry.queries(qname)
      (1 to reps).foreach { i =>
        graft.engine.Sessions.releasePinned(spark)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[dev] cold $qname rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
      spark.stop()
    } else if (name == "bloom") {
      // shuffle-bytes effect of the runtime bloom filter on q107's join,
      // forced onto the shuffle-join path a 100-TB fact side would take.
      // Usage: runMain graft.Dev <sfDir> bloom [reps]
      val metrics = graft.engine.MetricsListener.install(spark)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      Seq(false, true).foreach { on =>
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", on.toString)
        (1 to reps).foreach { i =>
          graft.engine.Sessions.releasePinned(spark)
          graft.engine.MetricsListener.drain(spark); metrics.reset()
          val t0 = System.nanoTime()
          val n = graft.operators.JoinQueries.q107BloomJoin(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.engine.MetricsListener.drain(spark)
          val m = metrics.snapshot
          println(f"[dev] bloom=$on rep$i: $dt%.2fs rows=$n " +
            s"shuffleRead=${m.shuffleReadBytes} shuffleWrite=${m.shuffleWriteBytes}")
        }
      }
      spark.stop()
    } else if (name == "q53cand") {
      // how many distinct docs reach the verify stage, and stage timings
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.register(spark)
      val docs = graft.engine.Tables.load(spark, sfDir, "documents")
        .filter(length(col("text")) >= 5)
      val t0 = System.nanoTime()
      val sigs = docs.select(col("doc_id"), col("n_chars"),
          expr("chargram_minhash(text, 5, 4)").as("sig"))
        .filter(col("sig").isNotNull)
      val bands = graft.operators.DedupQueries.bandRows(sigs, Seq("n_chars")).cache()
      bands.count()
      val t1 = System.nanoTime()
      val base = col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id") &&
        abs(col("x.n_chars") - col("y.n_chars")) <= 20
      val cand = bands.as("x").join(bands.as("y"), base)
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct().cache()
      val nCand = cand.count()
      val t2 = System.nanoTime()
      val nDocs = cand.select(col("i").as("d")).union(cand.select(col("j").as("d")))
        .distinct().count()
      val t3 = System.nanoTime()
      println(f"[dev] sigs+bands=${(t1 - t0) / 1e9}%.2fs selfjoin=${(t2 - t1) / 1e9}%.2fs " +
        f"candDocs=${(t3 - t2) / 1e9}%.2fs nCand=$nCand nCandDocs=$nDocs of ${docs.count()}")
      spark.stop()
    } else if (name == "q79probe") {
      import org.apache.spark.sql.functions._
      val c = graft.engine.Tables.load(spark, sfDir, "customer")
        .filter(col("c_custkey") < 2000)
        .select(col("c_custkey").as("k"), col("c_name").as("nm"),
          length(col("c_name")).cast("long").as("ln"))
        .withColumn("b", (col("ln") / 3).cast("long"))
      val probe = c.repartition(col("k")).withColumn("bb",
        explode(array(col("b") - 1, col("b"), col("b") + 1)))
      val joined = probe.as("x").join(c.as("y"),
        col("x.bb") === col("y.b") && col("x.k") < col("y.k") &&
        abs(col("x.ln") - col("y.ln")) <= 2)
      val t0 = System.nanoTime()
      val nc = joined.count()
      val t1 = System.nanoTime()
      val nl = joined.select(levenshtein(col("x.nm"), col("y.nm")).as("d"))
        .filter(col("d") <= 2).count()
      val t2 = System.nanoTime()
      println(f"[dev] candidates=$nc in ${(t1 - t0) / 1e9}%.2fs; +levenshtein n=$nl in ${(t2 - t1) / 1e9}%.2fs")
      spark.stop()
    } else if (name == "fuzzyprofile") {
      // stage decomposition of the deletion-blocked fuzzy join at full table
      import org.apache.spark.sql.functions._
      val c = graft.engine.Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("k"), col("c_name").as("nm"))
      val t0 = System.nanoTime()
      val pairs = graft.operators.JoinQueries.fuzzyPairsDeletion(c).cache()
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val verified = pairs
        .join(c.select(col("k").as("i"), col("nm").as("nm_i")), "i")
        .join(c.select(col("k").as("j"), col("nm").as("nm_j")), "j")
        .select(levenshtein(col("nm_i"), col("nm_j"), 2).as("d"))
        .filter(col("d") >= 1 && col("d") <= 2).count()
      val t2 = System.nanoTime()
      println(f"[dev] candidates=$nPairs in ${(t1 - t0) / 1e9}%.2fs; " +
        f"verify=$verified in ${(t2 - t1) / 1e9}%.2fs")
      spark.stop()
    } else if (name == "levprobe") {
      // raw levenshtein throughput: 2M pairs of 18-char strings
      import org.apache.spark.sql.functions._
      val df = spark.range(0, 2000000)
        .select(concat(lit("Customer#00000"), (col("id") % 97).cast("string")).as("a"),
          concat(lit("Customer#00000"), (col("id") % 89).cast("string")).as("b"))
      val t0 = System.nanoTime()
      val n = df.select(levenshtein(col("a"), col("b")).as("d"))
        .filter(col("d") <= 2).count()
      println(f"[dev] 2M levenshtein: ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
      spark.stop()
    } else if (name == "scaling") {
      // scaling probe of the heavy tier (VERDICT r7 §next-2): each query
      // cold at sf0.01 then sf0.1 in ONE JVM, reporting time + output rows
      // so observed growth can sit against the output-predicted growth in
      // SCALING.md. Usage: runMain graft.Dev ignored scaling <reps>
      val heavy = Seq("q79_fuzzy_join", "q92_record_linkage", "q53_dedup_ngram",
        "q59_dedup_clusters", "q80_semantic_dedup", "q100_triangles",
        "q51_dedup_minhash", "q73_pipeline", "q111_source_novelty",
        "q115_span_dedup", "q116_leak_safe_split", "q120_bigram_lm",
        "q121_span_dedup_incremental", "q135_containment",
        "q137_dedup_survivors", "q138_allpairs_jaccard", "q140_kcore")
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
           qn <- heavy) {
        val fn = SparkEntry.queries(qn)
        val times = (1 to math.max(1, reps)).map { _ =>
          graft.engine.Sessions.releasePinned(spark)
          val t0 = System.nanoTime()
          val n = fn(spark, sf).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = times.map(_._1).min
        println(f"[scaling] $qn sf=${sf.split('/').last} best=$best%.2fs rows=${times.head._2}")
      }
      spark.stop()
    } else if (name == "skyprune") {
      // q167 pre-prune effectiveness: rows entering the single-partition
      // global window, before vs after the map-side local skyline
      import org.apache.spark.sql.functions._
      val base = graft.engine.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"),
          graft.Num.cents(col("o_totalprice")).as("price_cents"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("date_us"))
      val total = base.count()
      val survivors = graft.operators.WindowQueries
        .localSkylineSurvivors(base, "price_cents", "date_us").count()
      val out = graft.operators.WindowQueries.q167Skyline(spark, sfDir).count()
      println(s"[dev] skyprune sf=$sfDir total=$total survivors=$survivors " +
        f"skyline=$out reduction=${total.toDouble / survivors}%.0fx")
      spark.stop()
    } else if (name == "intervalbytes") {
      // shuffle-byte delta of the broadcast interval exec (q183) vs the
      // composed grid plan (q136) — the q164 methodology
      val metrics = graft.engine.MetricsListener.install(spark)
      Seq("q136_interval_join" -> graft.operators.JoinQueries.q136IntervalJoin,
          "q183_interval_broadcast" -> graft.operators.JoinQueries.q183IntervalBroadcast)
        .foreach { case (qn, fn) =>
          (1 to reps).foreach { i =>
            graft.engine.Sessions.releasePinned(spark)
            graft.engine.MetricsListener.drain(spark); metrics.reset()
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            graft.engine.MetricsListener.drain(spark)
            val m = metrics.snapshot
            println(f"[dev] $qn rep$i: $dt%.2fs rows=$n " +
              s"shuffleRead=${m.shuffleReadBytes} shuffleWrite=${m.shuffleWriteBytes}")
          }
        }
      spark.stop()
    } else if (name == "intervalbcast") {
      // merge vs broadcast exec on the SAME keyed interval query (q174's
      // sessions): the q164 methodology — shuffle-byte delta of shipping
      // the window side whole vs clustering both sides
      import org.apache.spark.sql.functions._
      val metrics = graft.engine.MetricsListener.install(spark)
      // clustered = sessions straight off the per-user window (already
      // hash-clustered on the key: merge adds NO exchange, only sorts);
      // scattered = the same frames PERSISTED AND RE-READ round-robin —
      // the 100-TB case where interval inputs come off storage unaligned
      for (scattered <- Seq(false, true); bcast <- Seq(false, true)) {
        (1 to reps).foreach { i =>
          graft.engine.Sessions.releasePinned(spark)
          def side(pfx: String) = {
            val df = graft.operators.JoinQueries.typedSessionsProbe(spark, sfDir, pfx)
            if (scattered) {
              val path = s"/tmp/graft_ivb_$pfx"
              df.write.mode("overwrite").parquet(path)
              spark.read.parquet(path)
            } else df
          }
          val a = side("a"); val b = side("b")
          graft.engine.MetricsListener.drain(spark); metrics.reset()
          val t0 = System.nanoTime()
          val n = graft.plans.IntervalJoin.join(a, b, Seq("a_user" -> "b_user"),
              "a_start", "a_end", "b_start", "b_end", "inner", broadcast = Some(bcast))
            .count()
          val dt = (System.nanoTime() - t0) / 1e9
          graft.engine.MetricsListener.drain(spark)
          val m = metrics.snapshot
          println(f"[dev] scattered=$scattered bcast=$bcast rep$i: $dt%.2fs pairs=$n " +
            s"shuffleRead=${m.shuffleReadBytes} shuffleWrite=${m.shuffleWriteBytes}")
        }
      }
      spark.stop()
    } else if (name == "skewsalt") {
      // max-task-time effect of the self-salting rewrite (VERDICT r12
      // §next-1) on a crafted 80%-one-key fixture: the plain merge exec
      // funnels the hot key into ONE post-shuffle task (AQE's skew split
      // never fires for custom execs); salting splits it S ways. Reported
      // per rep: wall, MAX task ms, and total task ms (work conservation —
      // salting must not inflate total work beyond the hot-slice
      // replication). Usage: runMain graft.Dev ignored skewsalt [reps]
      import org.apache.spark.sql.functions._
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
      val sumTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          maxTaskMs.updateAndGet(m => math.max(m, d))
          sumTaskMs.addAndGet(d)
          ()
        }
      })
      // AQE coalescing off: at local scale it would fold the salt
      // partitions back together and mask the split being measured
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val nL = 4000000
      val nR = 40000
      val left = spark.range(0, nL).select(
        when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 23).as("k"),
        (col("id") * 131L % 5000000L).as("t"), col("id").as("lid"))
      val right = spark.range(0, nR).select(
        when(col("id") % 3 === 0, lit(7L)).otherwise(col("id") % 23).as("bk"),
        (col("id") * 173L % 5000000L).as("bt"), col("id").as("rid"))
      val hot = spark.range(0, 1).select(lit(7L).as("k"))
      for (salted <- Seq(false, true); i <- 1 to reps) {
        graft.engine.Sessions.releasePinned(spark)
        maxTaskMs.set(0); sumTaskMs.set(0)
        val t0 = System.nanoTime()
        val n = (if (salted)
            graft.plans.AsOf.joinSalted(left, right, Seq("k" -> "bk"), "t", "bt",
              salts = 16, hotKeys = Some(hot))
          else
            graft.plans.AsOf.join(left, right, Seq("k" -> "bk"), "t", "bt",
              broadcast = Some(false))).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // let straggler task-end events drain before reading the counters
        // (listenerBus is private[spark]; the bus is async but empties in
        // well under a second once the job has returned)
        Thread.sleep(1000)
        println(f"[dev] skewsalt salted=$salted rep$i: wall=$dt%.2fs " +
          s"maxTaskMs=${maxTaskMs.get} sumTaskMs=${sumTaskMs.get} rows=$n")
      }
      spark.stop()
    } else if (name == "saltcost") {
      // the COST side of the auto-salt conf: uniform keys, nothing above
      // the hot threshold — the rewrite pays its exact detection pass +
      // tagging joins and splits nothing. Measured so the conf's
      // off-by-default stance is a number, not a vibe.
      // Usage: runMain graft.Dev ignored saltcost [reps]
      import org.apache.spark.sql.functions._
      val metrics = graft.engine.MetricsListener.install(spark)
      val left = spark.range(0, 4000000).select(
        (col("id") % 9973).as("k"), (col("id") * 131L % 5000000L).as("t"),
        col("id").as("lid"))
      val right = spark.range(0, 40000).select(
        (col("id") % 9973).as("bk"), (col("id") * 173L % 5000000L).as("bt"),
        col("id").as("rid"))
      // third leg (r13): stats-fed auto-salt — the statsPath conf replaces
      // the per-join detection pass with a tiny stored-table read
      val statsDir = "/tmp/graft_saltcost_stats"
      spark.range(0, 1).select((col("id") + 7L).as("k"))
        .write.mode("overwrite").parquet(statsDir)
      for (mode <- Seq("off", "detect", "stored"); i <- 1 to reps) {
        mode match {
          case "off" =>
            spark.conf.unset(graft.plans.SkewSalt.SaltsConf)
            spark.conf.unset(graft.plans.SkewSalt.StatsPathConf)
          case "detect" =>
            spark.conf.set(graft.plans.SkewSalt.SaltsConf, "16")
            spark.conf.unset(graft.plans.SkewSalt.StatsPathConf)
          case _ =>
            spark.conf.set(graft.plans.SkewSalt.SaltsConf, "16")
            spark.conf.set(graft.plans.SkewSalt.StatsPathConf, statsDir)
        }
        graft.engine.Sessions.releasePinned(spark)
        graft.engine.MetricsListener.drain(spark); metrics.reset()
        val t0 = System.nanoTime()
        val n = graft.plans.AsOf.join(left, right, Seq("k" -> "bk"), "t", "bt",
          broadcast = Some(false)).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.engine.MetricsListener.drain(spark)
        val m = metrics.snapshot
        println(f"[dev] saltcost mode=$mode rep$i: $dt%.2fs rows=$n " +
          s"shuffleRead=${m.shuffleReadBytes} shuffleWrite=${m.shuffleWriteBytes}")
      }
      spark.conf.unset(graft.plans.SkewSalt.SaltsConf)
      spark.conf.unset(graft.plans.SkewSalt.StatsPathConf)
      spark.stop()
    } else if (name == "plans") {
      // dump explain("formatted") for a list of queries to files — the
      // plans/r13 evidence artifacts. Usage:
      //   runMain graft.Dev <sfDir> plans <outDir> <q1,q2,...|all>
      val outDir = args(2)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      val names =
        if (args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
        else args(3).split(",").map(_.trim).toSeq
      names.foreach { qn =>
        val df = SparkEntry.queries(qn)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$qn.txt"), txt.getBytes("UTF-8"))
        println(s"[dev] plan written: $outDir/$qn.txt")
      }
      spark.stop()
    } else if (name == "probecache") {
      // per-executor probe-index cache (VERDICT r12 §next-1): wall + build
      // count of a many-task fact probing a broadcast dimension, cache off
      // vs on. Off = every fact task re-groups/re-sorts the dimension
      // (the old behavior); on = one build per JVM, tasks share the index.
      // Usage: runMain graft.Dev ignored probecache [reps]
      import org.apache.spark.sql.functions._
      val nFact = 8000000L
      val nDim = 1000000L
      val fact = spark.range(0, nFact).select(
        (col("id") % 997).as("k"), (col("id") * 131L % 100000000L).as("t"),
        col("id").as("fid")).repartition(64)
      val dim = spark.range(0, nDim).select(
        (col("id") % 997).as("bk"), (col("id") * 173L % 100000000L).as("bt"),
        col("id").as("rid"))
      for (cached <- Seq(false, true); i <- 1 to reps) {
        spark.conf.set(graft.plans.ProbeIndexCache.EnabledConf, cached.toString)
        graft.engine.Sessions.releasePinned(spark)
        val b0 = graft.plans.ProbeIndexCache.builds.get()
        var t0 = System.nanoTime()
        val nA = graft.plans.AsOf.join(fact, dim, Seq("k" -> "bk"), "t", "bt",
          broadcast = Some(true)).count()
        val dtA = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nI = graft.plans.IntervalJoin.join(
          fact.withColumn("te", col("t") + 50L), dim.withColumn("bte", col("bt") + 20L),
          Seq("k" -> "bk"), "t", "te", "bt", "bte", "left_semi",
          broadcast = Some(true)).count()
        val dtI = (System.nanoTime() - t0) / 1e9
        val builds = graft.plans.ProbeIndexCache.builds.get() - b0
        println(f"[dev] probecache cached=$cached rep$i: asof=$dtA%.2fs " +
          f"interval=$dtI%.2fs cacheBuilds=$builds asofRows=$nA semiRows=$nI")
      }
      spark.conf.unset(graft.plans.ProbeIndexCache.EnabledConf)
      spark.stop()
    } else if (name == "q211prof") {
      // stage-by-stage wall breakdown of the q211 pipeline pieces
      import org.apache.spark.sql.functions._
      graft.engine.Sessions.releasePinned(spark)
      val docs = graft.engine.Spread.byKey(
        graft.engine.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
          .filter(length(col("text")) >= 11), "doc_id")
      var t0 = System.nanoTime()
      val store = graft.engine.Scratch.dir(spark, "q211_langprof_dev")
      graft.operators.TextQueries.langProfileTrain(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("text")), store)
      println(f"[dev] train ${(System.nanoTime()-t0)/1e9}%.2fs")
      t0 = System.nanoTime()
      val en = graft.operators.TextQueries.langIdScore(
          docs.select(col("doc_id"), col("lang"), col("text")),
          spark.read.parquet(store + "/profiles"))
        .filter(col("pred") === "en").select(col("doc_id")).cache()
      println(f"[dev] en ${en.count()} rows ${(System.nanoTime()-t0)/1e9}%.2fs")
      t0 = System.nanoTime()
      val perDoc = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok")).cache()
      println(f"[dev] perDoc ${perDoc.count()} rows ${(System.nanoTime()-t0)/1e9}%.2fs")
      t0 = System.nanoTime()
      val s1 = docs.join(en, Seq("doc_id"), "left_semi")
      val s2ids = graft.operators.TextQueries.winnowFingerprints(s1, 8, 4)
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fps"),
          expr("aggregate(fps, 0L, (a, x) -> a + pmod(x, 1000000007L))").as("ck"))
        .groupBy(col("n_fps"), col("ck")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).cache()
      println(f"[dev] s2ids ${s2ids.count()} rows ${(System.nanoTime()-t0)/1e9}%.2fs")
      t0 = System.nanoTime()
      val n = graft.operators.TextQueries.q211Pipeline2(spark, sfDir).count()
      println(f"[dev] full q211 (post warm caches in session) n=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
      spark.stop()
    } else if (name == "q135prof2") {
      // stage timings of the CURRENT (r13 one-exchange) containment shape
      import org.apache.spark.sql.functions._
      graft.engine.Sessions.releasePinned(spark)
      val docs = graft.engine.Spread.byKey(
        graft.engine.Tables.load(spark, sfDir, "documents"), "doc_id")
      val sh = graft.operators.DedupQueries.shingledDocs(docs).cache()
      var t0 = System.nanoTime()
      println(s"[dev] sh fill rows=${sh.count()} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val cand = graft.operators.DedupQueries.containmentCandidates(sh, 20).cache()
      println(s"[dev] cand rows=${cand.count()} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val verified = cand
        .join(broadcast(sh.select(col("doc_id").as("i"), col("sh").as("sh_i"))), "i")
        .join(broadcast(sh.select(col("doc_id").as("j"), col("sh").as("sh_j"))), "j")
        .select(col("i"), col("j"),
          size(array_intersect(col("sh_i"), col("sh_j"))).cast("long").as("inter"),
          size(col("sh_i")).cast("long").as("n_i"),
          size(col("sh_j")).cast("long").as("n_j"))
      println(s"[dev] verified rows=${verified.count()} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val n = graft.operators.DedupQueries.q135Containment(spark, sfDir).count()
      println(s"[dev] full q135 n=$n ${(System.nanoTime()-t0)/1e9}s")
      // decompose cand: gram stream volume, posting agg, raw pair volume
      val grams = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      t0 = System.nanoTime()
      println(s"[dev] grams rows=${grams.count()} ${(System.nanoTime()-t0)/1e9}s")
      val posts = grams.repartition(32, col("g"))
        .groupBy(col("g")).agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2 && size(col("ds")) <= 20)
      t0 = System.nanoTime()
      println(s"[dev] posting buckets=${posts.count()} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val raw = posts.select(explode(expr(
        """flatten(transform(ds, (xi, i) ->
             transform(slice(ds, i + 2, size(ds)), xj -> xi)))""")).as("x"))
      println(s"[dev] raw pairs=${raw.count()} ${(System.nanoTime()-t0)/1e9}s")
      spark.stop()
    } else if (name == "q169prof") {
      // BPE round decomposition: pin cost, pair-count cost, rewrite cost
      import org.apache.spark.sql.functions._
      graft.engine.Sessions.releasePinned(spark)
      val toks0 = graft.engine.Spread.byKey(
        graft.engine.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("t")), "doc_id")
      var t0 = System.nanoTime()
      val (cur, pin) = graft.engine.Pin.pin(toks0)
      println(s"[dev] pin round0 ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val (rewritten, best) = graft.operators.TextQueries.bpeRound(cur)
      val b = best.select(col("w1"), col("w2"), col("c")).take(1)
      println(s"[dev] pair-count+best ${b.head} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val (next, pin2) = graft.engine.Pin.pin(rewritten)
      println(s"[dev] rewrite+pin round1 ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val after = next.agg(sum(size(col("t"))).cast("long")).head().getLong(0)
      println(s"[dev] tokens_after=$after ${(System.nanoTime()-t0)/1e9}s")
      pin.unpersist(blocking = false); pin2.unpersist(blocking = false)
      t0 = System.nanoTime()
      val n = graft.operators.TextQueries.q169BpeMerges(spark, sfDir).count()
      println(s"[dev] full q169 n=$n ${(System.nanoTime()-t0)/1e9}s")
      spark.stop()
    } else if (name == "q135prof") {
      // stage timings for the containment pipeline
      import org.apache.spark.sql.functions._
      val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      val sh = graft.operators.DedupQueries.shingledDocs(docs).cache()
      var t0 = System.nanoTime()
      println(s"[dev] sh rows=${sh.count()} ${(System.nanoTime()-t0)/1e9}s")
      val grams = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      t0 = System.nanoTime()
      val rare = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20).select(col("g")).cache()
      println(s"[dev] rare=${rare.count()} ${(System.nanoTime()-t0)/1e9}s")
      val keyed = grams.join(rare, "g")
      t0 = System.nanoTime()
      val cand = keyed.as("x").join(keyed.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct().cache()
      println(s"[dev] cand=${cand.count()} ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val verified = cand
        .join(broadcast(sh.select(col("doc_id").as("i"), col("sh").as("sh_i"))), "i")
        .join(broadcast(sh.select(col("doc_id").as("j"), col("sh").as("sh_j"))), "j")
        .select(col("i"), col("j"),
          size(array_intersect(col("sh_i"), col("sh_j"))).cast("long").as("inter"))
      println(s"[dev] verified=${verified.count()} ${(System.nanoTime()-t0)/1e9}s")
      spark.stop()
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
