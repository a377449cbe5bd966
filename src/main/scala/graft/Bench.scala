package graft
/** Benchmark main: one warmup pass (JIT/codegen/parquet-footer warm), then
  * three timed passes keeping the per-query minimum (steady-state time,
  * robust to one-off GC/scheduler/ambient-load stalls); prints a single JSON
  * line for the driver.
  *
  * The artifact carries BOTH the per-query minimum ("queries" — the
  * cross-round comparable) and all three raw pass times ("passes") —
  * ambient load is then diagnosable from the artifact alone: a genuine
  * regression is slow in EVERY pass, a noisy-neighbour stall is one
  * outlier pass against two quiet ones (r10's q79 burned judge time on
  * exactly this adjudication; the min-of-3 already recorded the truth, but
  * the evidence wasn't in the file).
  *
  * A query that throws in either timed pass is reported as `null` timing and
  * listed under "failed" — a fast failure must never fold into the total as
  * a near-zero "win". */
object Bench {
  /** Fixed-work single-thread CPU spin (2×10⁸ xorshift64 steps), timed.
    * One runs immediately before each timed pass and its seconds land in
    * the JSON as "calibration": the work is constant, so the ratio between
    * two runs' calibration times IS the ambient-load ratio between their
    * machines/moments — the normalizer that turns a cross-round wall-clock
    * comparison from "maybe the box was busy" into arithmetic. (The r10/r11
    * adjudications both ended at "the driver box was loaded"; this field
    * carries the proof inside the artifact.) */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    dt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.build("graft-bench")
    // dev filter: SPARK_GRAFT_BENCH_ONLY=q79_fuzzy_join,q53_dedup_ngram
    // times just those queries (unset = the full suite, the driver's mode)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val gcBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "0") != "0"
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    ordered.foreach { case (name, fn) =>
      // warmup failures are non-fatal (the timed passes report them) but
      // must be visible — a query broken only under cold-cache conditions
      // should surface here, not hide until pass 1
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup FAILED $name: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      graft.engine.Sessions.releasePinned(spark)
    }
    // machine-independent cost counters (shuffle/spill/peak-mem): collected
    // on pass 1 only — they are properties of plan+data, identical across
    // passes, unlike the wall-clock the three passes exist to de-noise.
    // Caveat shared with the wall-clock numbers: count() is the consumer,
    // so Catalyst may prune operators whose output count() doesn't need
    // (top-level sort, window columns) — the regime every round since r1
    // has measured under, kept for cross-round comparability; metrics
    // reflect the same executed plan the timings do
    val metrics = graft.engine.MetricsListener.install(spark)
    val metricsByQuery = scala.collection.mutable.Map
      .empty[String, graft.engine.MetricsListener.Snapshot]
    def timedPass(collect: Boolean): Map[String, Either[String, Double]] =
      ordered.map { case (name, fn) =>
        if (collect) { graft.engine.MetricsListener.drain(spark); metrics.reset() }
        val t0 = System.nanoTime()
        val r = try {
          fn(spark, sfDir).count()
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
        }
        if (collect) {
          graft.engine.MetricsListener.drain(spark)
          metricsByQuery(name) = metrics.snapshot
        }
        // between-queries, outside the timer: per-query caches/pins are
        // dead weight for every query after this one — see releasePinned.
        // NO System.gc() here: a forced full GC clears soft-referenced
        // codegen/footer caches and unloads generated classes, so the NEXT
        // query restarts cold — measured +70% on every query in the suite
        // (A/B'd at sf0.1: 10-query subset 2.15 s without vs 3.77 s with).
        // One GC per PASS (below) bounds heap accumulation instead.
        graft.engine.Sessions.releasePinned(spark)
        if (gcBetween) System.gc()
        name -> r
      }.toMap
    // one full GC between passes (outside all timers): releases the pass's
    // accumulated garbage without the per-query cold-cache penalty above
    val passRuns = (1 to 3).map { i =>
      val cal = calibrate()
      val p = timedPass(collect = i == 1)
      System.gc()
      (cal, p)
    }
    val calibrations = passRuns.map(_._1)
    val passes = passRuns.map(_._2)
    val results: Seq[(String, Either[String, Double])] = ordered.map { case (name, _) =>
      val rs = passes.map(_(name))
      name -> rs.collectFirst { case Left(e) => Left(e) }
        .getOrElse(Right(rs.collect { case Right(v) => v }.min))
    }
    val failed = results.collect { case (n, Left(e)) =>
      System.err.println(s"[bench] FAILED $n: $e"); n
    }
    val qs = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + v
      case (k, Left(_))  => s"\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // every raw pass time per query, in pass order — the load-adjudication
    // evidence (see scaladoc); a failed pass records null in its slot
    val passesJson = ordered.map { case (name, _) =>
      val arr = passes.map(_(name)).map {
        case Right(v) => v.toString
        case Left(_)  => "null"
      }.mkString("[", ",", "]")
      s""""$name":$arr"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    // per-query cost counters: deterministic (plan+data), so cross-round
    // regressions are attributable even when driver wall-clock is
    // ambient-inflated (judge-measured 1.5-1.8x in r7)
    val ms = ordered.map { case (name, _) =>
      metricsByQuery.get(name) match {
        case Some(m) =>
          s""""$name":{"shuffle_read_bytes":${m.shuffleReadBytes},""" +
            s""""shuffle_write_bytes":${m.shuffleWriteBytes},""" +
            s""""spill_bytes":${m.spillBytes},""" +
            s""""peak_exec_mem_bytes":${m.peakExecMemoryBytes}}"""
        case None => s""""$name":null"""
      }
    }.mkString("{", ",", "}")
    val calJson = calibrations.mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passesJson,"calibration":$calJson,"metrics":$ms,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // also write the full timing map to a file: the driver's stdout capture
    // truncates long runs (r5/r6 both lost the head of the per-query map),
    // and the artifact must parse completely
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_timings.json")
    // round-stamped copy (VERDICT r12 §next-6): bench_timings.json is
    // clobbered by every run, so cross-round comparisons needed git
    // archaeology; SPARK_GRAFT_ROUND=<n> additionally writes an immutable
    // bench_timings_r<n>.json with the full per-query times + passes +
    // calibration. README §bench documents the convention.
    val outs = out +: sys.env.get("SPARK_GRAFT_ROUND").toSeq
      .map(r => s"bench_timings_r$r.json")
    outs.foreach { o =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(o),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $o: ${e.getMessage}")
      }
    }
    spark.stop()
    // Compact summary line, printed LAST (after spark.stop() so no shutdown
    // logging can land after it): the driver keeps only a ~2 KB stdout tail,
    // and the full line above is ~46 KB with 223 queries — it has arrived
    // truncated mid-map in all 13 rounds (BENCH_r01–r13 all show
    // parsed: null). This line is < 500 bytes (no per-query maps — those
    // live complete in the full line above and in bench_timings*.json), so
    // a 2 KB tail always contains it whole. VERDICT r13 §next-1.
    // failed list truncated to 8 names here (failed_n carries the true
    // count; the full list is in the big line + artifact) so a mass
    // failure cannot push this line past the tail window either
    val failedCompact = failed.take(8).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failedCompact,"failed_n":${failed.size},"calibration":$calJson,"sf":"$sfDir","queries_file":"$out"}""")
    // Always exit 0: failures are recorded honestly in the "failed" field of
    // the JSON artifact. A nonzero exit makes sbt append [error] lines AFTER
    // the JSON line on stdout, which corrupted the driver's last-line parse
    // in round 8 (BENCH_r08.json carried raw sbt stderr instead of the map).
    // A parseable artifact that says what failed beats an unparseable one.
  }
}
