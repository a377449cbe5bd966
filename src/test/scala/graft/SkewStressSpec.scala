package graft

import org.apache.spark.sql.functions._

/** Hot-bucket skew stress for the two quadratic-risk candidate generators
  * (VERDICT r9 §next-5): both docs declare the mass-duplication failure mode;
  * these fixtures EXERCISE it — one entity string × thousands of copies /
  * one gram in every document — and pin the opt-in cap's volume bound plus
  * the exact recall trade the cap costs. */
class SkewStressSpec extends SparkSpec {

  test("fuzzy deletion blocking: mass-duplicated string explodes uncapped, cap bounds it") {
    import spark.implicits._
    val nDup = 300
    // 300 copies of ONE name (the hot bucket — every deletion variant of
    // every copy collides, so the bucket enumerates all C(300,2) pairs in
    // each of its ~67 variant buckets) + 3 clean near-dup pairs whose
    // strings share no bucket with the duplicated mass
    val dup = (0 until nDup).map(i => (i.toLong, "Cust#000777"))
    val clean = Seq(
      (100000L, "Alice Blue Marble"), (100001L, "Alice Blue Marbel"),
      (200000L, "Quartz Kettle Nine"), (200001L, "Quartz Kettle Nune"),
      (300000L, "Velvet Iron Crane"), (300001L, "Velvet Iron Crans"))
    val names = (dup ++ clean).toDF("k", "nm")

    val uncapped = graft.operators.JoinQueries.fuzzyPairsDeletion(names).count()
    // every duplicate pair collides on every bucket: ≥ n(n−1)/2 pairs
    val dupPairs = nDup.toLong * (nDup - 1) / 2
    assert(uncapped >= dupPairs,
      s"expected the hot bucket to emit all $dupPairs duplicate pairs, got $uncapped")

    val capped = graft.operators.JoinQueries
      .fuzzyPairsDeletion(names, maxBucket = Some(16))
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // volume bound: every surviving bucket has ≤ 16 members, so candidates
    // ≤ (#buckets touched by the clean strings) × 16² — in this fixture the
    // duplicate mass is gone entirely and only clean-pair candidates remain
    assert(cappedPairs.size.toLong < dupPairs / 100,
      s"cap must collapse the quadratic bucket: ${cappedPairs.size} candidates")
    // recall contract, both directions: the documented trade is that pairs
    // sharing ONLY capped (hot) buckets vanish — the duplicate×duplicate
    // pairs — while pairs riding small buckets survive untouched
    val cleanPairs = Set((100000L, 100001L), (200000L, 200001L), (300000L, 300001L))
    assert(cleanPairs.subsetOf(cappedPairs),
      s"cap must not cost small-bucket recall: missing ${cleanPairs -- cappedPairs}")
    assert(!cappedPairs.exists { case (i, j) => i < nDup && j < nDup },
      "duplicate-mass pairs must be the (only) recall cost of the cap")
  }

  test("containment df-cap: an every-document gram generates zero candidates") {
    import spark.implicits._
    val n = 400
    // every doc shares the boilerplate shingle 'the quick fox'; docs 0/1
    // additionally share a RARE 3-shingle run ('alpha beta gamma delta' →
    // 2 shingles of df=2)
    val docs = (0 until n).map { i =>
      val rare = if (i < 2) " alpha beta gamma delta" else s" filler$i token$i extra$i"
      (i.toLong, s"the quick fox$rare")
    }.toDF("doc_id", "text")
    val sh = graft.operators.DedupQueries.shingledDocs(docs)

    val capped = graft.operators.DedupQueries.containmentCandidates(sh, dfCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the df=400 boilerplate gram is invisible; only the rare-gram pair emerges
    assert(capped == Set((0L, 1L)),
      s"expected only the rare-gram pair, got ${capped.size} candidates: " +
        capped.take(5).toString)

    // and the uncapped generator (dfCap = corpus size) pays the quadratic
    // blowup the cap exists to prevent: all n(n−1)/2 pairs become candidates
    val uncapped = graft.operators.DedupQueries
      .containmentCandidates(sh, dfCap = n).count()
    assert(uncapped == n.toLong * (n - 1) / 2,
      s"uncapped boilerplate gram must fan out all pairs, got $uncapped")
  }
}
