package graft

import graft.operators.{AnalyticQueries, WindowQueries}
import org.apache.spark.sql.functions._

/** q141 EWM smoothing, q142 median/MAD anomaly flags, q143 sketch overlap:
  * plain-Scala recomputes plus the robustness law that motivates MAD. */
class SmoothingOverlapSpec extends SparkSpec {

  test("q141 EWM equals a plain-Scala recompute with power-of-two weights") {
    val daily = graft.engine.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val days = daily.map(_._2).toSet
    val expected = (for {
      (et, d, n) <- daily
      o <- 0 to 6
      r = d + o if days(r)
    } yield ((et, r), (n << (6 - o), 1L << (6 - o))))
      .groupBy(_._1)
      .map { case (k, vs) =>
        val num = vs.map(_._2._1).sum; val den = vs.map(_._2._2).sum
        (k._1, k._2, num, den, num * 1000000L / den)
      }.toSet
    val got = WindowQueries.q141EwmSmoothing(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q142 MAD flags survive a poisoned baseline that corrupts the mean/sigma flags") {
    import spark.implicits._
    // 14 days of flat volume 100 with ONE poisoned day (10000) in the
    // middle; day 13's trailing week contains the poison. A mean/sigma
    // baseline (q125's logic) is corrupted by the poison: its sigma
    // explodes, so a real 3x spike on day 13 goes UNFLAGGED (masking).
    // The median/MAD baseline ignores the poison: med=100, mad=0, and the
    // spike flags.
    val counts = (0L to 12L).map(d => ("click", d, if (d == 8L) 10000L else 100L)) :+
      (("click", 13L, 300L))
    val daily = counts.toDF("event_type", "day_num", "n_events")
    val mad = WindowQueries.madFlags(daily).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(5)))).toMap
    assert(mad(13L)._2 == 1L, "MAD must flag the real spike despite the poison")
    val z = WindowQueries.anomalyFlags(daily).collect()
      .map(r => (r.getLong(1), r.getLong(6))).toMap
    assert(z(13L) == 0L, "the z-score baseline is masked by the poison (the contrast)")
    // and the poisoned day itself flags under MAD (clean preceding week)
    assert(mad(8L)._2 == 1L)
  }

  test("q142 equals a plain-Scala trailing median/MAD recompute at sf0.001") {
    val daily = graft.engine.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (et, rows) =>
      val m = rows.map(r => (r._2, r._3)).toMap
      rows.toSeq.map { case (_, d, n) =>
        val win = ((d - 7) to (d - 1)).flatMap(m.get).sorted
        if (win.length == 7) {
          val med = win(3)
          val mad = win.map(v => math.abs(v - med)).sorted.apply(3)
          (et, d, n, Some(med), Some(mad),
            if (math.abs(n - med) * 10000 > mad * 44478) 1L else 0L)
        } else (et, d, n, None, None, 0L)
      }
    }.toSet
    val got = WindowQueries.q142MadAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toSet
    assert(got == expected)
  }

  test("q145 transition matrix equals a plain-Scala per-user lag recompute") {
    val evs = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, ops) =>
      val ordered = ops.sortBy(o => (o._2, o._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val cnt = trans.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val totals = cnt.groupBy(_._1._1).map { case (p, m) => (p, m.values.sum) }
    val expected = cnt.map { case ((p, nx), n) =>
      (p, nx, n, totals(p), n * 1000000L / totals(p))
    }.toSet
    val got = WindowQueries.q145MarkovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // probabilities per prev row-normalize (up to integer-floor loss < |row|)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val s = rows.toSeq.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }

  test("q144 centroid matrix equals a plain-Scala floor-mean + cosine recompute") {
    val vecs = graft.engine.Tables.load(spark, sfDir01, "embeddings")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def halfUp(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cents = vecs.groupBy(_._1).map { case (lbl, vs) =>
      val qs = vs.map(_._2.map(x => halfUp(x.toDouble * 1000000)))
      val dim = qs.head.length
      (lbl, Array.tabulate(dim) { i =>
        math.floor(qs.map(_(i)).sum.toDouble / qs.length).toLong
      })
    }
    val expected = (for {
      (la, va) <- cents.toSeq; (lb, vb) <- cents.toSeq if la < lb
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na = va.map(x => x * x).sum; nb = vb.map(x => x * x).sum
    } yield (la, lb,
      halfUp(dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1000000)
    )).toSet
    val got = graft.operators.SimilarityQueries
      .q144CentroidSimilarity(spark, sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q146 association rules equal a plain-Scala basket recompute") {
    val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairSupp = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairSupp((ps(i), ps(j))) = pairSupp.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val itemSupp = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = byOrder.size.toLong
    val expected = pairSupp.toSeq.filter(_._2 >= 2).flatMap { case ((a, b), s) =>
      Seq((a, b, s), (b, a, s))
    }.map { case (l, r, s) =>
      (l, r, s, itemSupp(l), itemSupp(r), s * 1000000L / itemSupp(l),
        s * nOrders * 1000000L / (itemSupp(l) * itemSupp(r)))
    }.toSet
    val got = graft.operators.AnalyticQueries
      .q146AssociationRules(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // confidence is a probability; both rule directions share a lift
    got.foreach { case (_, _, _, _, _, conf, _) => assert(conf <= 1000000L) }
    val lifts = got.map { case (l, r, _, _, _, _, lift) =>
      ((math.min(l, r), math.max(l, r)), lift) }
    assert(lifts.groupBy(_._1).forall(_._2.map(_._2).size == 1),
      "lift is symmetric in lhs/rhs")
  }

  test("q147 linear attribution conserves revenue up to the declared floor loss") {
    val rows = graft.operators.AnalyticQueries
      .q147LinearAttribution(spark, sfDir01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet == Set("click", "view", "none"))
    // independent recompute of total credited micro-cents from raw events
    val evs = graft.engine.Tables.load(spark, sfDir01, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    var expectedTotal = 0L
    var floorLossBound = 0L
    evs.groupBy(_._1).values.foreach { ops =>
      val sorted = ops.sortBy(_._2)
      sorted.filter(_._4 == "purchase").foreach { p =>
        val touches = sorted.filter(o => (o._4 == "click" || o._4 == "view") &&
          o._2 >= p._2 - 259200000000L && o._2 <= p._2 - 1L)
        val v = math.round(p._5 * 100)
        val k = touches.length.toLong
        if (k == 0) expectedTotal += v * 1000000L
        else { expectedTotal += k * (v * 1000000L / k); floorLossBound += k - 1 }
      }
    }
    assert(rows.map(_._4).sum == expectedTotal)
    // credited never exceeds raw revenue; the gap is bounded by Σ(k−1) µ¢
    val rawMicro = evs.filter(_._4 == "purchase")
      .map(e => math.round(e._5 * 100) * 1000000L).sum
    assert(expectedTotal <= rawMicro && rawMicro - expectedTotal <= floorLossBound)
  }

  test("q153 CUSUM window identity equals the recursive page test; a planted shift alarms") {
    import spark.implicits._
    // 10 baseline days at 50/day, 10 quiet days, then a +60% sustained
    // shift: CUSUM must stay unflagged through the quiet stretch and alarm
    // within the shifted regime
    val series = ((0L until 20L).map(d => ("a", d, 50L)) ++
      (20L until 30L).map(d => ("a", d, 80L)))
    val daily = series.toDF("event_type", "day_num", "n_events")
    val got = WindowQueries.cusumStats(daily)
      .orderBy(col("day_num")).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // recursive reference: S_i = max(0, S_{i-1} + dev_i), same integer scale
    val b = 500L; val dd = 10L
    var sRec = 0L
    val rec = series.map { case (_, d, x) =>
      sRec = math.max(0L, sRec + (10L * dd * x - 11L * b))
      (d, sRec, if (sRec > 40L * b) 1L else 0L)
    }
    assert(got.toSeq == rec)
    assert(got.takeWhile(_._1 < 20L).forall(_._3 == 0L), "no false alarm pre-shift")
    assert(got.exists(_._3 == 1L), "sustained shift must alarm")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q154 residual vanishes on a purely weekly series except the planted spike") {
    // x = 100 + 10*weekday repeated over 4 full weeks, one +70 spike on
    // day 10: trend/seasonal absorb the periodic structure mid-series, so
    // every full-frame residual is ~0 except the spike's neighbourhood
    val series = (0L until 28L).map { d =>
      val base = 100L + 10L * ((d + 4) % 7)
      ("a", d, if (d == 10L) base + 70L else base)
    }
    // route through the same engine path on a temp view-free frame:
    // replicate q154's body over a crafted daily frame via SQL on the spot
    import spark.implicits._
    val daily = series.toDF("event_type", "day_num", "n_events")
    daily.createOrReplaceTempView("crafted_daily")
    val out = spark.sql("""
      WITH dow AS (SELECT *, (day_num + 4) % 7 AS weekday FROM crafted_daily),
      dowstats AS (SELECT event_type, weekday, sum(n_events) AS dow_sum,
        count(*) AS m FROM dow GROUP BY 1, 2),
      tot AS (SELECT event_type, sum(n_events) AS tot, count(*) AS nd
        FROM crafted_daily GROUP BY 1),
      win AS (SELECT d.*, sum(n_events) OVER (PARTITION BY event_type
          ORDER BY day_num ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
        count(*) OVER (PARTITION BY event_type ORDER BY day_num
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7 FROM dow d)
      SELECT w.day_num, w.n_events * 1000000 -
        (CASE WHEN w.cnt7 = 7 THEN w.sum7 * 1000000 div 7 END) -
        (ds.dow_sum * 1000000 div ds.m - t.tot * 1000000 div t.nd) AS resid
      FROM win w
      JOIN dowstats ds ON w.event_type = ds.event_type AND w.weekday = ds.weekday
      JOIN tot t ON w.event_type = t.event_type
      ORDER BY w.day_num""").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val mid = out.filter { case (d, _) => d >= 3 && d <= 24 }
    // spike day and the 7-day frames containing it carry the spike mass,
    // and days sharing its weekday carry the dow-mean share (70/4); every
    // OTHER quiet day carries exactly the global-mean bias of one spike
    // spread over nd=28 days — +70e6/28 = 2.5e6 — a bias the decomposition
    // cannot avoid and the assertion therefore pins rather than hides
    val farFromSpike = mid.filter { case (d, _) =>
      (d < 7 || d > 13) && (d % 7 != 10 % 7) }
    assert(farFromSpike.forall { case (_, r) =>
      r.exists(v => math.abs(v - 2500000L) <= 10L) },
      s"quiet residuals must equal the 2.5e6 global-mean bias: ${farFromSpike.mkString(",")}")
    val spike = out.find(_._1 == 10L).get._2.get
    assert(spike > 40000000L, s"spike residual must dominate, got $spike")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q143 exact set algebra is right and the sketch estimates stay in bound") {
    val du = graft.engine.Tables.load(spark, sfDir01, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = du.filter(_._2 == "click").map(_._1).toSet
    val b = du.filter(_._2 == "purchase").map(_._1).toSet
    val r = AnalyticQueries.q143SketchOverlap(spark, sfDir01).collect().head
    assert(r.getLong(0) == a.size && r.getLong(1) == b.size)
    assert(r.getLong(2) == (a ++ b).size && r.getLong(3) == (a & b).size)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L)
  }
}
