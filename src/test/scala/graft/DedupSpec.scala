package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Dedup operators: planted near-duplicates at sf0.01 must be found, and LSH
  * candidate pruning must agree with brute force (the recall the Scaladoc
  * promises). */
class DedupSpec extends SparkSpec {

  /** Brute-force token-3-shingle Jaccard ≥ 0.8 pairs, computed with plain
    * Spark ops — independent of the LSH code path under test. */
  private lazy val brutePairs: Set[(Long, Long)] = {
    val sh = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
    val a = sh.select(col("doc_id").as("i"), col("sh").as("si"))
    val b = sh.select(col("doc_id").as("j"), col("sh").as("sj"))
    a.join(b, col("i") < col("j"))
      .filter(size(array_intersect(col("si"), col("sj"))) >=
        size(array_union(col("si"), col("sj"))) * 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds exactly the brute-force pairs (planted near-dups)") {
    val got = DedupQueries.q51MinHashLsh(spark, sfDir01)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brutePairs)
    assert(got.nonEmpty, "fixture should contain planted near-duplicates")
  }

  test("simhash pairs are a subset of true near-dups and non-empty") {
    val got = DedupQueries.q52SimHash(spark, sfDir01)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "hamming<=3 should catch the most-identical planted pairs")
    assert(got.subsetOf(brutePairs),
      s"simhash false positives: ${got -- brutePairs}")
  }

  test("simhash: XXH64 and portable-md5 hash configs both catch planted pairs") {
    // Both feature-hash choices must stay honest near-dup detectors: no false
    // positives vs brute Jaccard, and both must recover the exact-duplicate
    // planted pairs (identical shingle sets ⇒ identical fingerprints ⇒ ham=0
    // under ANY feature hash — hash-independent by construction).
    val fast = DedupQueries.simHashNearDup(spark, sfDir01, 4, 3, portableHash = false)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val portable = DedupQueries.simHashNearDup(spark, sfDir01, 4, 3, portableHash = true)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.nonEmpty && portable.nonEmpty)
    assert(fast.subsetOf(brutePairs), s"xxh64 false positives: ${fast -- brutePairs}")
    assert(portable.subsetOf(brutePairs),
      s"portable false positives: ${portable -- brutePairs}")
    val identical = {
      val sh = graft.engine.Tables.load(spark, sfDir01, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), array_sort(array_distinct(expr(
          "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))).as("sh"))
      val a = sh.select(col("doc_id").as("i"), col("sh").as("si"))
      val b = sh.select(col("doc_id").as("j"), col("sh").as("sj"))
      a.join(b, col("i") < col("j") && col("si") === col("sj"))
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(identical.subsetOf(fast), s"xxh64 missed exact dups: ${identical -- fast}")
    assert(identical.subsetOf(portable),
      s"portable missed exact dups: ${identical -- portable}")
  }

  test("char-ngram LSH output only contains pairs above threshold with sane bounds") {
    val rows = DedupQueries.q53NgramJaccard(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, uni, jac) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(inter <= uni && jac >= 0.8 && jac <= 1.0)
    }
  }

  test("connected components: planted diameter-8 chain converges to one cluster") {
    import spark.implicits._
    // 0-1-2-…-8 is a chain of borderline near-dups with diameter 8: a fixed
    // 6-round propagation would silently fragment it; the checked fixpoint
    // must find the single component. 100-101 proves labels don't bleed.
    val pairs = ((0L until 8L).map(k => (k, k + 1)) :+ (100L, 101L)).toDF("i", "j")
    val labels = DedupQueries.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 11)
    (0L to 8L).foreach(id => assert(labels(id) == 0L, s"node $id"))
    assert(labels(100L) == 100L && labels(101L) == 100L)
  }

  test("connected components fails loudly when the round cap is exceeded") {
    import spark.implicits._
    val pairs = (0L until 8L).map(k => (k, k + 1)).toDF("i", "j")
    val ex = intercept[IllegalArgumentException] {
      DedupQueries.connectedComponents(pairs, maxRounds = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("auto CC: propagation within the cap, star fallback beyond it") {
    import spark.implicits._
    // diameter 4: plain propagation converges under the default cap —
    // auto must equal plain
    val small = ((0L until 4L).map(k => (k, k + 1)) :+ (9L, 10L)).toDF("i", "j")
    val gotSmall = DedupQueries.connectedComponentsAuto(small).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 4L).forall(gotSmall(_) == 0L) &&
      gotSmall(9L) == 9L && gotSmall(10L) == 9L)
    // diameter 64 with a tiny cap: plain propagation hits the cap, and
    // auto must fall back to star contraction instead of throwing — the
    // single long component still resolves, the disjoint pair untouched
    val chain = ((0L until 64L).map(k => (k, k + 1)) :+ (500L, 501L)).toDF("i", "j")
    val gotChain = DedupQueries.connectedComponentsAuto(chain, propagationCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotChain.size == 67)
    (0L to 64L).foreach(id => assert(gotChain(id) == 0L, s"node $id"))
    assert(gotChain(500L) == 500L && gotChain(501L) == 500L)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("star-contraction CC handles a diameter-64 chain in O(log n) rounds") {
    import spark.implicits._
    // 64 propagation rounds would exceed plain CC's default cap; the
    // star-contraction variant must converge well under its own cap and
    // produce the single component, with the disjoint pair untouched
    val pairs = ((0L until 64L).map(k => (k, k + 1)) :+ (500L, 501L)).toDF("i", "j")
    val labels = DedupQueries.connectedComponentsStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 67)
    (0L to 64L).foreach(id => assert(labels(id) == 0L, s"node $id"))
    assert(labels(500L) == 500L && labels(501L) == 500L)
  }

  test("incremental dedup over a persisted signature index equals the full run on new-involving pairs") {
    // the production ingest shape: old signatures come back from parquet,
    // only the new batch computes from payloads — the pair set must be
    // EXACTLY the full-corpus run restricted to pairs touching the batch
    val full = graft.operators.DedupQueries.q51MinHashLsh(spark, sfDir01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 % 7 == 3 || p._2 % 7 == 3)
    val inc = graft.operators.DedupQueries.q74IncrementalDedup(spark, sfDir01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full)
    assert(inc.nonEmpty, "fixture must exercise the incremental path")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("hot-band cap bounds candidate blowup without touching normal pairs") {
    import spark.implicits._
    import graft.operators.DedupQueries.{bandPairs, lshBands, shingledDocs}
    // corpus = the real fixture docs + a 60-doc boilerplate cluster whose
    // members all collapse to ONE signature (identical tiny shingle set) —
    // every bucket they occupy goes hot, the n² shape the cap exists for
    val boiler = (100000L until 100060L)
      .map(id => (id, "lorem ipsum dolor sit amet boilerplate notice"))
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .union(boiler.toDF("doc_id", "text"))
    val bands = lshBands(shingledDocs(docs), "sh").cache()
    def pairSet(cap: Option[Int]) = bandPairs(bands, maxBandSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairSet(None)
    val capped = pairSet(Some(30))
    def isBoiler(p: (Long, Long)) = p._1 >= 100000L && p._2 >= 100000L
    // the hot cluster's own 60*59/2 pairs are the declared recall trade...
    assert(uncapped.count(isBoiler) == 60 * 59 / 2)
    assert(capped.count(isBoiler) == 0, "hot-only pairs must be dropped")
    // ...and every candidate among normal docs survives untouched
    assert(capped.filterNot(isBoiler) == uncapped.filterNot(isBoiler))
    // candidate volume is bounded: the blowup term is gone
    assert(capped.size <= uncapped.size - 60 * 59 / 2)
    bands.unpersist(blocking = false)
  }

  test("star-contraction CC labels self-pair-only nodes like plain propagation") {
    import spark.implicits._
    // node 9 appears ONLY as a self-pair: star's canonical edge set drops
    // self-loops, so without the node-universe union it would vanish from
    // the output while plain propagation labels it — both drivers must
    // agree on any pair input (dedup pair generators can emit i==j rows)
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 9L), (5L, 5L), (5L, 6L)).toDF("i", "j")
    val plain = DedupQueries.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = DedupQueries.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(plain == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L, 5L -> 5L, 6L -> 5L))
    assert(star == plain)
  }

  test("star-contraction CC equals min-label propagation on random graphs") {
    import spark.implicits._
    // three deterministic random graphs (fixed seeds, self-pairs kept):
    // same component PARTITION and same min-label representatives
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val pairs = List.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("i", "j")
      val plain = DedupQueries.connectedComponents(pairs, maxRounds = 45)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val star = DedupQueries.connectedComponentsStar(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(star == plain, s"seed $seed")
    }
  }

  test("q59 leaves bounded storage; releasePinned drains it to zero") {
    // the r3/r4 bench pathology: per-round checkpoint blocks and per-query
    // caches accumulating across a session. After a full q59 run, live
    // storage must be O(1) frames (final labels + query caches), NOT
    // O(rounds); after the harness sweep it must be exactly zero.
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = DedupQueries.q59DedupClusters(spark, sfDir01)
    assert(out.count() > 0)
    val live = spark.sparkContext.getPersistentRDDs.size - before
    assert(live <= 4, s"q59 left $live persisted RDDs — per-round leak is back")
    graft.engine.Sessions.releasePinned(spark)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(_.getStorageLevel.useMemory == false),
      "releasePinned must drop every cached/pinned block")
  }

  test("exact dedup accounting is consistent") {
    val r = DedupQueries.q50Exact(spark, sfDir01).collect().head
    val nDistinct = r.getLong(0); val nDocs = r.getLong(1); val nDropped = r.getLong(2)
    assert(nDocs == nDistinct + nDropped)
    assert(nDocs == graft.engine.Tables.load(spark, sfDir01, "documents").count())
  }

  test("q138 prefix-filter join reproduces the brute-force pair set EXACTLY") {
    // the completeness claim LSH can't make: AllPairs prefix filtering is
    // provably lossless, so its verified pairs must EQUAL brute force —
    // not approximate it — on the same shingles and threshold
    val got = DedupQueries.q138AllPairsJaccard(spark, sfDir01)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brutePairs)
    assert(got.nonEmpty)
  }

  test("q137 survivor selection equals a plain-Scala union-find recompute") {
    // independent recompute: union-find over the brute pair graph, argmax
    // survivor by (n_chars desc, doc_id asc), per-source rollup
    val docs = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brutePairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val byCluster = docs.groupBy { case (id, _, _) => find(id) }
    val keepIds = byCluster.values.map(ms =>
      ms.minBy { case (id, _, nc) => (-nc, id) }._1).toSet
    val expected = docs.groupBy(_._2).map { case (src, ms) =>
      (src, ms.length.toLong,
        ms.count(m => keepIds(m._1)).toLong,
        ms.filter(m => keepIds(m._1)).map(_._1).sum,
        ms.filterNot(m => keepIds(m._1)).map(_._3).sum)
    }.toSet
    val got = DedupQueries.q137DedupSurvivors(spark, sfDir01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // dedup must actually drop something at sf0.01 (planted near-dups)
    assert(got.exists { case (_, nDocs, nKept, _, _) => nKept < nDocs })
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q200 substring coverage: unaligned copies, overlap merge, intra-doc repeats") {
    import spark.implicits._
    // L=10 fixture. Doc 1/2 share a 14-char string at DIFFERENT offsets
    // (prefix padding of different length = unaligned, q115's blind spot);
    // doc 3 repeats a 12-char string within itself; doc 4 is all-unique.
    val shared = "SHAREDRUN14CH!"             // 14 chars -> 5 dup 10-gram starts
    val rep = "REPEATED12go"                  // 12 chars, twice inside doc 3
    val d1 = "abc" + shared + "Xtail-one"     // shared at pos 4, context differs
    val d2 = "zyxwvu" + shared + "Ytailtwo"   // shared at pos 7, on BOTH sides
    val d3 = rep + "-middle-" + rep + "end"   // rep at pos 1 and 21
    val d4 = "entirely unique text with no repeats at all"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text")
    val rows = DedupQueries.substringCoverage(docs, 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    // Doc 1: dup 10-grams start at 4..8 (inside `shared`), covering [4, 17]
    // exactly the shared run — ONE merged span, 14 chars.
    assert(rows(1L) == ((1L, 14L, 4L * 100003L + 17L)))
    // Doc 2: same span shifted to [7, 20] — unaligned offsets both found.
    assert(rows(2L) == ((1L, 14L, 7L * 100003L + 20L)))
    // Doc 3: intra-document repeat — both occurrences of `rep` covered,
    // TWO spans of 12 chars each ([1,12] and [21,32]).
    assert(rows(3L) == ((2L, 24L, (1L * 100003L + 12L) + (21L * 100003L + 32L))))
    // Doc 4: no duplicated substring -> absent from the output.
    assert(!rows.contains(4L))
  }
}
