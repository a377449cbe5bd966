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
