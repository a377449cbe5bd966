package graft

import graft.operators.{AnalyticQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

/** Laws for the round-9 sketch/quantization tier: SQ8 ANN (q117), mergeable
  * histogram-quantile rollup (q118), Count–Min point estimates (q119).
  * Checks are black-box over the production query functions, with exact
  * expectations recomputed independently in plain Scala on the small
  * fixture. */
class SketchQuantileSpec extends SparkSpec {

  test("q117 SQ8: quantized candidates + exact rerank recover most of the brute top-5") {
    val truth = SimilarityQueries.q55KnnBrute(spark, sfDir01).collect()
      .filter(_.getLong(3) <= 5).map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = SimilarityQueries.q117KnnSq8(spark, sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq8.size == truth.size, "both emit top-5 per query")
    val recall = sq8.intersect(truth).size.toDouble / truth.size
    // 8-bit codes over a 64-dim corpus preserve neighbourhoods well; the
    // floor is deliberately below observed so it trips only on regressions
    assert(recall >= 0.6, s"SQ8 recall@5 vs brute = $recall")
  }

  test("q117 SQ8: reranked cosine never exceeds the true best and ranks are dense per query") {
    val rows = SimilarityQueries.q117KnnSq8(spark, sfDir01).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // cosines are exact (full-precision rerank), so they must be sorted
      val cs = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q123 IVF-SQ8: composed pruning recovers brute top-3 and never beats exact cosine") {
    val truth = SimilarityQueries.q55KnnBrute(spark, sfDir01).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SimilarityQueries.q123KnnIvfSq8(spark, sfDir01).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.groupBy(_.getLong(0)).keySet == Set(0L, 1L, 2L, 3L, 4L))
    rows.groupBy(_.getLong(0)).values.foreach(rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L)))
    val recall = got.intersect(truth).size.toDouble / truth.size
    // the recall ceiling is the parent IVF probe (cells are weakly
    // clustered on this fixture — q114's acknowledged property); the law is
    // that the SQ8 candidate layer costs at most a sliver on top of it
    // (observed: exactly zero — 0.267 vs 0.267)
    val ivf = SimilarityQueries.q75KnnIvfMultiprobe(spark, sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfRecall = ivf.intersect(truth).size.toDouble / truth.size
    assert(recall >= ivfRecall - 0.1,
      s"IVF-SQ8 recall@3 = $recall vs parent IVF $ivfRecall")
    assert(recall >= 0.2, s"absolute floor: $recall")
  }

  test("q184 PQ: ADC candidates + exact rerank hold a recall floor vs brute and SQ8") {
    val truth = SimilarityQueries.q55KnnBrute(spark, sfDir01).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SimilarityQueries.q184KnnPq(spark, sfDir01).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.groupBy(_.getLong(0)).keySet == Set(0L, 1L, 2L, 3L, 4L))
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L))
      // rerank cosines are exact, so they must be internally sorted
      val cs = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val recall = got.intersect(truth).size.toDouble / truth.size
    // 12-bit codes (m=4 × 3 bits) vs SQ8's 512: PQ trades more recall for
    // 42× more compression — observed 0.47 vs brute; floor set below
    // observed so it trips only on regressions
    assert(recall >= 0.3, s"PQ recall@3 vs brute = $recall")
    // the SQ8 parent at the same top-3 cut must stay at least as good —
    // PQ is the coarser quantizer by construction on this fixture
    val sq8 = SimilarityQueries.q117KnnSq8(spark, sfDir01).collect()
      .filter(_.getLong(4) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8Recall = sq8.intersect(truth).size.toDouble / truth.size
    assert(sq8Recall >= recall - 0.01,
      s"SQ8 parent recall $sq8Recall fell below PQ $recall")
  }

  test("q187 IVFPQ: residual-coded composition keeps the parents' recall band") {
    val truth = SimilarityQueries.q55KnnBrute(spark, sfDir01).collect()
      .filter(_.getLong(3) <= 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SimilarityQueries.q187KnnIvfPq(spark, sfDir01).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.groupBy(_.getLong(0)).keySet == Set(0L, 1L, 2L, 3L, 4L))
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L))
      val cs = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val recall = got.intersect(truth).size.toDouble / truth.size
    // the ceiling is the 2-cell coarse probe (weakly clustered fixture —
    // q123's acknowledged property); the law is that residual-PQ candidate
    // selection costs at most a sliver against the same-probe IVF parent
    val ivf = SimilarityQueries.q75KnnIvfMultiprobe(spark, sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfRecall = ivf.intersect(truth).size.toDouble / truth.size
    assert(recall >= ivfRecall - 0.15,
      s"IVFPQ recall@3 = $recall vs parent IVF $ivfRecall")
    assert(recall >= 0.15, s"absolute floor: $recall")
  }

  test("q118 quantile rollup: estimates bracket independently computed exact ranks") {
    val out = AnalyticQueries.q118QuantileRollup(spark, sfDir).collect()
    assert(out.nonEmpty)
    // exact values recomputed by brute sort per region in plain Scala
    val keyed = graft.engine.Tables.load(spark, sfDir, "lineitem")
      .join(graft.engine.Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.engine.Tables.load(spark, sfDir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").cast("long").as("region"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byRegion = keyed.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    out.foreach { r =>
      val vs = byRegion(r.getLong(0))
      val n = vs.length
      assert(r.getLong(1) == n.toLong, "n_values")
      val p50 = vs((n * 50 + 99) / 100 - 1)
      val p95 = vs((n * 95 + 99) / 100 - 1)
      assert(r.getLong(3) == p50 && r.getLong(6) == p95, "exact ranks agree")
      assert(r.getLong(4) == 1L && r.getLong(7) == 1L, "in-bin flags certain")
      assert(r.getLong(2) <= p50 && p50 < r.getLong(2) + 65536L)
      assert(r.getLong(5) <= p95 && p95 < r.getLong(5) + 65536L)
    }
  }

  test("q122 join-size estimate: never below truth, equals an independent sketch rebuild") {
    val r = AnalyticQueries.q122JoinSizeEstimate(spark, sfDir).collect()(0)
    val ek = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id")).collect().map(_.getLong(0))
    val okeys = graft.engine.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val trueSelf = ek.groupBy(identity).values.map(v => v.size.toLong * v.size).sum
    val oc = okeys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val trueCross = ek.groupBy(identity)
      .map { case (k, v) => oc.getOrElse(k, 0L) * v.size }.sum
    assert(r.getLong(1) == trueSelf && r.getLong(5) == trueCross, "true sizes")
    val consts = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    def sketch(ks: Array[Long]): Map[(Int, Long), Long] =
      ks.flatMap(k => (0 until 4).map(i => (i, ((k % 999983L) * consts(i)) % 512L)))
        .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val es = sketch(ek); val os = sketch(okeys)
    val estSelf = (0 until 4).map(i =>
      es.collect { case ((r0, _), c) if r0 == i => c * c }.sum).min
    val estCross = (0 until 4).map(i =>
      es.collect { case ((r0, b), c) if r0 == i => c * os.getOrElse((i, b), 0L) }.sum).min
    assert(r.getLong(0) == estSelf && r.getLong(4) == estCross, "sketch estimates")
    assert(r.getLong(2) == 1L && r.getLong(6) == 1L,
      "AMS/CM inner product never underestimates (law)")
  }

  test("q132 equi-depth buckets: disjoint ordered ranges, conserved mass, near-equal depth") {
    val rows = AnalyticQueries.q132EquiDepth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.engine.Tables.load(spark, sfDir, "lineitem").count()
    assert(rows.map(_._2).sum == total, "every row lands in exactly one bucket")
    assert(rows.map(_._1).distinct.length == rows.length)
    val ordered = rows.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo, _)) =>
        assert(hi < lo, "bucket value ranges must be disjoint and ordered")
      case _ =>
    }
    assert(ordered.length >= 6 && ordered.length <= 8, "≈8 equal-mass buckets")
    val sizes = ordered.map(_._2)
    assert(sizes.max.toDouble / sizes.min <= 3.0,
      s"equal depth to within bin granularity, got ${sizes.mkString(",")}")
  }

  test("q133 two-proportion z-test equals a plain-Scala recompute") {
    val users = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, xs) =>
        (u, if (xs.exists(x => x._2 == "purchase" && x._3 > 180)) 1L else 0L)
      }.toSeq
    def arm(u: Long) = ((u % 999983L) * 2654435761L) % 2L
    val (a0, a1) = users.partition(t => arm(t._1) == 0L)
    val (n0, n1) = (a0.size.toLong, a1.size.toLong)
    val (c0, c1) = (a0.map(_._2).sum, a1.map(_._2).sum)
    val p = (c0 + c1).toDouble / (n0 + n1)
    val z = (c1.toDouble / n1 - c0.toDouble / n0) /
      math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
    def m(x: Double) =
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val r = AnalyticQueries.q133AbProportions(spark, sfDir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n0, n1, c0, c1)))
    assert(r.getLong(6) == m(z), "z statistic")
    assert(r.getLong(7) == (if (math.abs(z) > 1.96) 1L else 0L))
  }

  test("q131 CUPED: moments, theta, and lifts equal a plain-Scala recompute") {
    val per = graft.engine.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)"),
        year(col("o_orderdate")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (c, xs) =>
        (c, xs.filter(_._3 < 1998).map(_._2).sum, xs.filter(_._3 >= 1998).map(_._2).sum)
      }.toSeq
    val n = per.size.toLong
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxx = per.map(t => t._2 * t._2).sum
    val sxy = per.map(t => t._2 * t._3).sum
    val syy = per.map(t => t._3 * t._3).sum
    def arm(c: Long) = ((c % 999983L) * 2654435761L) % 2L
    val (a0, a1) = per.partition(t => arm(t._1) == 0L)
    val theta = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    val diffNaive = a1.map(_._3).sum.toDouble / a1.size - a0.map(_._3).sum.toDouble / a0.size
    val diffCuped = diffNaive -
      theta * (a1.map(_._2).sum.toDouble / a1.size - a0.map(_._2).sum.toDouble / a0.size)
    val num = n.toDouble * sxy - sx.toDouble * sy
    val rho2 = num * num /
      ((n.toDouble * sxx - sx.toDouble * sx) * (n.toDouble * syy - sy.toDouble * sy))
    def m(x: Double) = // Spark round is HALF_UP away from zero on negatives
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val r = AnalyticQueries.q131AbCuped(spark, sfDir).collect()(0)
    assert(r.getLong(0) == a0.size.toLong && r.getLong(1) == a1.size.toLong)
    assert(r.getLong(2) == m(theta), "theta")
    assert(r.getLong(3) == m(diffNaive), "naive lift")
    assert(r.getLong(4) == m(diffCuped), "CUPED lift")
    assert(r.getLong(5) == m(rho2), "variance reduction")
    assert(r.getLong(5) > 0 && r.getLong(5) <= 1000000,
      "rho-squared must be a proper fraction")
  }

  test("q130 Poisson bootstrap: replica means and CI equal a plain-Scala resampling") {
    val rows = graft.engine.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L)
    def wt(k: Long, r: Int): Long = {
      val h = ((k * (2 * r + 1)) % 999983L) * 2654435761L % 1000000L
      val i = cdf.indexWhere(h < _); if (i < 0) 7L else i.toLong
    }
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      val means = (0 until 32).map { r =>
        val (s, n) = xs.foldLeft((0L, 0L)) { case ((s, n), (_, k, c)) =>
          val w = wt(k, r); (s + c * w, n + w)
        }
        s / n
      }.sorted
      val pt = xs.map(_._3).sum / xs.length
      g -> ((xs.length.toLong, pt, means(1), means(30)))
    }
    val got = AnalyticQueries.q130BootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    val flags = AnalyticQueries.q130BootstrapCi(spark, sfDir).collect()
      .map(_.getLong(6))
    assert(flags.forall(_ == 1L),
      "point estimate should sit inside its own 90% bootstrap interval here")
  }

  test("q126 gram matrix: equals a plain-Scala outer-product sum; merge order is irrelevant") {
    // quantize through the engine's own expression (Spark round is
    // away-from-zero on negative halves; a JVM math.round recompute would
    // silently disagree on exact .5 components)
    val vecs = SimilarityQueries.quantized(spark, sfDir)
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    val d = 64
    val want = Array.ofDim[Long](d, d)
    vecs.foreach(v => for (i <- 0 until d; j <- 0 until d) want(i)(j) += v(i) * v(j))
    val out = SimilarityQueries.q126GramMatrix(spark, sfDir).collect()
    assert(out.length == d * (d + 1) / 2)
    out.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(r.getLong(2) == want(i)(j), s"cell ($i,$j)")
      assert(r.getLong(3) == vecs.length.toLong)
    }
    // mergeability: reduce over any split, then merge == reduce over all
    import graft.operators.GramMatrix
    val (l, rr) = vecs.splitAt(vecs.length / 3)
    val merged = GramMatrix.merge(
      l.foldLeft(GramMatrix.zero)((b, v) => GramMatrix.reduce(b, v.toSeq)),
      rr.foldLeft(GramMatrix.zero)((b, v) => GramMatrix.reduce(b, v.toSeq)))
    val whole = vecs.foldLeft(GramMatrix.zero)((b, v) => GramMatrix.reduce(b, v.toSeq))
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("q119 CMS: never underestimates, and estimates equal an independent sketch rebuild") {
    val out = AnalyticQueries.q119CmsEstimate(spark, sfDir).collect()
    assert(out.nonEmpty)
    val keys = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id")).collect().map(_.getLong(0))
    val consts = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
    def cell(k: Long, r: Int): (Int, Long) = (r, ((k % 999983L) * consts(r)) % 512L)
    val sketch = keys.flatMap(k => (0 until 4).map(r => cell(k, r)))
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val trueCnt = keys.filter(_ < 20).groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    out.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == trueCnt(k), "true count")
      val est = (0 until 4).map(i => sketch(cell(k, i))).min
      assert(r.getLong(2) == est, "estimate equals rebuilt sketch min")
      assert(r.getLong(3) == 1L, "CMS never underestimates (law)")
    }
    assert(out.map(_.getLong(0)).toSet == trueCnt.keySet)
  }
}
