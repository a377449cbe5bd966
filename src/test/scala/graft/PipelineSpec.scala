package graft

import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Invariant specs for the sampling/clustering/pipeline operators whose main
  * gate is the DuckDB oracle — these pin the properties the oracle's exact
  * values imply but a regression could silently re-trade (assignment
  * totality, rate monotonicity, ledger monotonicity). */
class PipelineSpec extends SparkSpec {

  test("q71 stratified sample: deterministic, and rate ordering shows in expectation") {
    val r1 = graft.operators.CoreQueries.q71StratifiedSample(spark, sfDir01)
      .collect().map(_.toSeq).toList
    val r2 = graft.operators.CoreQueries.q71StratifiedSample(spark, sfDir01)
      .collect().map(_.toSeq).toList
    assert(r1 == r2, "same docs must be selected on every run")
    val rows = graft.operators.CoreQueries.q71StratifiedSample(spark, sfDir01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (src, nDocs, nSampled, rate) =>
      assert(nSampled >= 0 && nSampled <= nDocs, src)
      assert(Set(100L, 300L, 500L, 700L).contains(rate), src)
    }
    // aggregate over strata sharing a rate: higher target => higher achieved
    // aggregate fraction (the fixture's 20 balanced strata make this stable)
    val byRate = rows.groupBy(_._4).view
      .mapValues(g => g.map(_._3).sum.toDouble / g.map(_._2).sum).toMap
    assert(byRate(100L) < byRate(700L),
      s"700 permille stratum group must out-sample the 100 permille group: $byRate")
  }

  test("q72 k-means step: total assignment, bounded new centroids") {
    val n = Tables.load(spark, sfDir01, "embeddings").count()
    val rows = graft.operators.SimilarityQueries.q72KMeansStep(spark, sfDir01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 4 * 64, "4 clusters x 64 components")
    // every vector lands in exactly one cluster: per-component member counts
    // sum to the corpus size for EVERY component position
    (0L until 64L).foreach { pos =>
      assert(rows.filter(_._2 == pos).map(_._3).sum == n, s"pos $pos")
    }
    // new centroid coordinate is the floor mean: n*new_cv <= sum_v < n*(new_cv+1)
    rows.foreach { case (c, pos, nm, sumV, newCv) =>
      assert(nm > 0, s"empty cluster $c")
      assert(newCv * nm <= sumV && sumV < (newCv + 1) * nm, s"cluster $c pos $pos")
    }
  }

  test("partial top-k quota sampling equals the window formulation per stratum") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir01, "documents")
    val quota = lit(20L) +
      pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) * 15L
    val topk = graft.operators.CoreQueries.quotaSampleTopK(docs, quota)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // window twin: the q78 selection restated as raw (source, doc_id) rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val window = docs
      .withColumn("quota", quota)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000000)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("quota"))
      .select(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(topk == window)
    assert(topk.nonEmpty)
    // every stratum lands exactly at min(quota, |stratum|)
    val sizes = docs.groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val bySrc = topk.groupBy(_._1).view.mapValues(_.size).toMap
    bySrc.foreach { case (src, n) =>
      val q = math.min(20 + (src.drop(3).toLong % 4) * 15, sizes(src))
      assert(n == q, s"$src: $n != $q")
    }
    // at least one stratum must actually be CUT by its quota for the test
    // to exercise the selection (src*0/4/8... have quota 20 < 25 docs)
    assert(bySrc.exists { case (src, n) => n < sizes(src) })
  }

  test("kmeans driver recovers planted clusters and converges with O(1) storage") {
    import spark.implicits._
    // 3 well-separated planted clusters in 8 dims (centers at c*100000 per
    // component), 21 points each with deterministic jitter; ids interleave
    // (id % 3 = cluster) so the first-k seeds land one per cluster
    val dim = 8
    val pts = (0 until 63).map { id =>
      val c = id % 3
      val jitter = (id / 3) % 7 - 3 // -3..3, mean 0 over each cluster's 21 points
      (id.toLong, (0 until dim).map(d => c * 100000L + jitter * (d + 1)).toArray)
    }
    val df = pts.toDF("vec_id", "q")
    // start from a clean block manager: earlier suites in the shared JVM may
    // leave query-scoped caches, and the storage assertion below is absolute
    graft.engine.Sessions.releasePinned(spark)
    val cents = graft.operators.SimilarityQueries.kmeans(df, 3, maxIters = 10)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toMap
    assert(cents.keySet == Set(0L, 1L, 2L), "seed ids are the k lowest vec_ids")
    // each converged centroid sits within the jitter radius of its planted
    // center — floor-mean of 21 symmetric jitters stays within one unit
    for (c <- 0 until 3; d <- 0 until dim) {
      val want = c * 100000L
      val got = cents(c.toLong)(d)
      assert(math.abs(got - want) <= 3 * (d + 1), s"cluster $c dim $d: $got vs $want")
    }
    // purity: every point's nearest converged centroid is its planted cluster
    pts.foreach { case (id, q) =>
      val nearest = cents.minBy { case (_, cq) =>
        q.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum
      }._1
      assert(nearest == id % 3, s"vec $id assigned to $nearest")
    }
    // pin discipline: only the final centroid round may remain pinned
    assert(spark.sparkContext.getPersistentRDDs.size <= 2,
      "kmeans must unpersist prior rounds as it iterates")
    graft.engine.Sessions.releasePinned(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("semantic dedup over CONVERGED centroids equals driver-side brute force") {
    import org.apache.spark.sql.functions._
    // q80 oracles the 2-step chain (DuckDB cannot iterate to a fixpoint);
    // this pins the converged composition: kmeans driver -> within-cluster
    // exact cosine, against a driver-side recomputation of both stages
    graft.functions.GraftFunctions.register(spark)
    val vecs = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("q"))
    val cents = graft.operators.SimilarityQueries.kmeans(vecs, 4)
    val e = vecs.withColumn("n2", expr("dot_long(q, q)"))
    val got = graft.operators.SimilarityQueries
      .withinClusterNearDup(e, cents, b = 4, minCos = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // driver-side truth
    val cs = cents.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toVector))
    val vs = vecs.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Long](1).toVector))
    def dot(a: Vector[Long], b: Vector[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val byCluster = vs.groupBy { case (_, q) =>
      cs.minBy { case (cid, cq) => (dot(q, q) - 2 * dot(q, cq) + dot(cq, cq), cid) }._1
    }
    val want = (for {
      (cid, members) <- byCluster.toSeq
      (ki, qi) <- members; (kj, qj) <- members if ki < kj
      cos = dot(qi, qj) / (math.sqrt(dot(qi, qi).toDouble) * math.sqrt(dot(qj, qj).toDouble))
      if cos >= 0.45
    } yield (cid, ki, kj)).toSet
    assert(want.nonEmpty, "fixture should contain within-cluster near-dups")
    assert(got == want)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("kmeans fails loudly when the iteration cap is hit") {
    import spark.implicits._
    // two far-apart points, one seed is irrelevant: with maxIters = 0 the
    // driver must refuse to return an unconverged result
    val df = Seq((0L, Array(0L, 0L)), (1L, Array(1000L, 1000L))).toDF("vec_id", "q")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.SimilarityQueries.kmeans(df, 1, maxIters = 0)
    }
    assert(ex.getMessage.contains("did not converge"))
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q73 pipeline ledger: stages only narrow, checksums stay consistent") {
    val rows = graft.operators.DedupQueries.q73Pipeline(spark, sfDir01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toList ==
      List("0_input", "1_dedup", "2_quality", "3_decontam", "4_sample"))
    rows.sliding(2).foreach { case Array((sa, na, ida), (sb, nb, idb)) =>
      assert(nb <= na, s"$sb grew vs $sa")
      assert(idb <= ida, s"$sb id_sum grew vs $sa (doc_ids are nonnegative)")
    }
    assert(rows.last._2 > 0, "pipeline must not drain the corpus")
    graft.engine.Sessions.releasePinned(spark)
  }
}
