package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** ScalaCheck round-trip laws on generated data (SURVEY.md §7.5): exchange
  * and sort invariants that must hold for ANY input, not just fixtures.
  *
  * Keys are NULLABLE (~1 in 6 rows): the reference pushes null keys and
  * values through its sorter explicitly (RemoteSorterSuite.scala:220-243),
  * so every law here must hold with nulls flowing through exchange,
  * aggregation, sort, and distinct.
  *
  * Keys are also ADVERSARIAL: alongside a dense collision-heavy band
  * (−50..50 — many duplicate keys per run), the generator injects the
  * numeric extremes the reference's sorter suite pushes through its hash
  * and sort paths (`Int.MaxValue`, collision-key mixes —
  * RemoteSorterSuite.scala:104-243): Long.MinValue/MaxValue (negation and
  * abs() overflow, sign-extension bugs in hash mixing), Int boundary
  * values widened to Long (truncation bugs), 0/−1 (all-zeros/all-ones bit
  * patterns), and ±2³² (keys equal mod 32 bits — a hash that only mixes
  * the low word collides them into one partition/group). */
class PropertySpec extends SparkSpec {

  private val edgeKeys = Gen.oneOf(
    Long.MinValue, Long.MaxValue,
    Int.MinValue.toLong, Int.MaxValue.toLong,
    Int.MinValue.toLong - 1, Int.MaxValue.toLong + 1,
    0L, -1L, 1L << 32, -(1L << 32))

  private val rowsGen: Gen[List[(Option[Long], String, Double)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      k <- Gen.frequency(
        4 -> Gen.choose(-50L, 50L).map(Some(_): Option[Long]),
        1 -> edgeKeys.map(Some(_): Option[Long]),
        1 -> Gen.const(None: Option[Long]))
      s <- Gen.oneOf("a", "b", "c", "d", "")
      v <- Gen.choose(-1000, 1000).map(_ / 100.0)
    } yield (k, s, v))
  } yield rows

  private def key(r: Row): Option[Long] =
    if (r.isNullAt(0)) None else Some(r.getLong(0))

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, r.status.toString)
  }

  test("repartition preserves the row multiset for arbitrary data and widths") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen, Gen.choose(1, 40)) { (rows, parts) =>
      val df = rows.toDF("k", "s", "v")
      val back = df.repartition(parts, col("k")).collect()
        .map(r => (key(r), r.getString(1), r.getDouble(2)))
      back.groupBy(identity).view.mapValues(_.length).toMap ==
        rows.groupBy(identity).view.mapValues(_.length).toMap
    })
  }

  test("orderBy emits an ordered permutation for arbitrary data (nulls first)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val sorted = df.orderBy(col("k"), col("s"), col("v")).collect()
        .map(r => (key(r), r.getString(1), r.getDouble(2))).toList
      // Scala's Option ordering (None < Some) == Spark's asc nulls-first
      sorted.sorted == sorted && sorted.sorted == rows.sorted
    })
  }

  test("distinct equals set semantics for arbitrary data") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      df.distinct().collect().map(r => (key(r), r.getString(1), r.getDouble(2)))
        .toSet == rows.toSet
    })
  }

  test("equi-join drops null keys, null-safe join matches them (multiset counts)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val lf = l.toDF("k", "s", "v")
      val rf = r.toDF("k2", "s2", "v2")
      val lCnt = l.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val rCnt = r.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val equiWant = lCnt.collect {
        case (Some(k), n) => n * rCnt.getOrElse(Some(k), 0L)
      }.sum
      val safeWant = equiWant +
        lCnt.getOrElse(None, 0L) * rCnt.getOrElse(None, 0L)
      val equiGot = lf.join(rf, col("k") === col("k2")).count()
      val safeGot = lf.join(rf, col("k") <=> col("k2")).count()
      equiGot == equiWant && safeGot == safeWant
    })
  }

  test("single-bucket skew: one hot key + extremes + nulls survive exchange/agg/sort") {
    // deterministic worst case the generator only approximates: 20k copies
    // of ONE key (every row in one hash bucket — the skew AQE exists for),
    // plus one row per numeric extreme and a null block. Counts, distinct,
    // and total order must all be exact.
    import spark.implicits._
    val extremes = Seq(Long.MinValue, Long.MaxValue, Int.MinValue.toLong,
      Int.MaxValue.toLong, 0L, -1L, 1L << 32, -(1L << 32))
    val rows = List.fill(20000)(Option(42L)) ++ extremes.map(Option(_)) ++
      List.fill(100)(Option.empty[Long])
    val df = rows.toDF("k").repartition(32, col("k"))
    assert(df.count() == rows.length)
    val counts = df.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
      .map(r => (key(r), r.getLong(1))).toMap
    assert(counts(Some(42L)) == 20000L && counts(None) == 100L)
    extremes.foreach(e => assert(counts(Some(e)) == 1L, s"key $e"))
    val sorted = df.orderBy(col("k")).collect().map(key).toList
    assert(sorted == rows.sorted)
    assert(sorted.head.isEmpty && sorted.last.contains(Long.MaxValue))
  }

  test("groupBy count equals multiset cardinality (null keys form one group)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val got = df.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
        .map(r => (key(r), r.getLong(1))).toMap
      got == rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    })
  }

  test("funnel stages are monotone non-increasing (q89 law)") {
    // every stage is a strict refinement of the previous one's user set,
    // so the counts must fall (or hold) down the funnel at any SF
    val rows = graft.operators.AnalyticQueries.q89Funnel(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("1_view") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
  }

  test("retention offset-0 equals cohort size (q90 law)") {
    // a user is by definition active in their own first week, so the
    // week_offset = 0 row must count the whole cohort
    val ret = graft.operators.AnalyticQueries.q90Retention(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wk = 7L * 86400L * 1000000L
    val cohorts = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), expr(s"unix_micros(ts) div ${wk}L").as("wk"))
      .groupBy(col("user_id")).agg(min(col("wk")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cohorts.nonEmpty)
    cohorts.foreach { case (c, n) =>
      assert(ret((c, 0L)) == n, s"cohort $c offset-0")
    }
  }

  test("PageRank mass is conserved up to truncation loss (q91 law)") {
    // scaled-integer PageRank: Σranks = SCALE exactly under real
    // arithmetic; each truncating division loses < 1 unit per edge/node
    // per round, so the total must sit just under SCALE and every node
    // must hold at least the damping floor
    val scale = 1000000000000L
    val ranks = graft.operators.AnalyticQueries.q91PageRank(spark, sfDir)
      .collect().map(_.getLong(2))
    val n = ranks.length
    assert(n > 0)
    val floor = (15L * (scale / n)) / 100L
    assert(ranks.forall(_ >= floor), "every node keeps the damping floor")
    val total = ranks.sum
    assert(total <= scale, s"mass must not be created (got $total)")
    assert(total >= scale - scale / 1000, s"truncation loss should be tiny (got $total)")
  }

  test("PageRank pinned-round driver handles a >100k-node graph (q91 large branch)") {
    // a 120_001-node ring crosses PageRankPinThreshold, so each round pins
    // and frees via Pin — the branch the 25-nation fixture never reaches.
    // Ring symmetry makes correctness exact: every node has in/out degree
    // 1, so all ranks are identical each round, decaying by at most 1
    // scaled unit per round of truncating division from the 1/n fixpoint
    val n = 120001L
    val ring = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"),
      org.apache.spark.sql.functions.lit(1L).as("w"))
    val rounds = 3
    val (ranks, pins) = graft.operators.AnalyticQueries.pageRankRanks(ring, rounds)
    val distinctRanks = ranks.select(col("rank_s")).distinct().collect()
    assert(ranks.count() == n)
    assert(distinctRanks.length == 1, "ring symmetry: every node has the same rank")
    val r = distinctRanks.head.getLong(0)
    val fix = 1000000000000L / n
    assert(r <= fix && r >= fix - rounds,
      s"rank $r must sit within $rounds truncation units under the 1/n fixpoint $fix")
    // the large branch held exactly two pins: edges + the last round
    assert(pins.length == 2, "pin-per-round branch must have engaged")
    pins.foreach(_.unpersist(blocking = false))
    graft.engine.Sessions.releasePinned(spark)
  }

  test("Misra–Gries candidates cover every key above n/(k+1) for any partitioning (q99 law)") {
    import spark.implicits._
    import graft.operators.MisraGries
    // hot head + a uniform tail wider than k distinct keys, so the summary
    // actually evicts; the mergeable-summaries bound says eviction may only
    // ever cost a key whose true count is ≤ n/(k+1)
    val keyGen = Gen.frequency(
      3 -> Gen.choose(0L, 4L),
      2 -> Gen.choose(0L, 199L))
    val g = for {
      n <- Gen.choose(50, 1500)
      ks <- Gen.listOfN(n, keyGen)
    } yield ks
    holds(Prop.forAll(g, Gen.choose(1, 32)) { (ks, parts) =>
      val cands = ks.toDS().repartition(parts)
        .select(MisraGries.toColumn.name("cand")).head().toSet
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavies = exact.collect {
        case (key, c) if c * (MisraGries.k + 1) > ks.length => key
      }.toSet
      heavies.subsetOf(cands) && cands.size <= MisraGries.k
    })
  }

  test("native as-of exec equals the brute per-row maximum for arbitrary tables (q148 law)") {
    import spark.implicits._
    // keys collide on purpose (small range), times collide too (small
    // range), and null times appear on both sides — the analytic model is
    // three lines, the exec is a two-pointer merge; they must agree on
    // every randomized instance including strict/non-strict and tolerance
    val sideGen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 5L)
        t <- Gen.option(Gen.choose(0L, 40L))
        id <- Gen.choose(0L, 1000000L)
      } yield (k, t, id))
    } yield rows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
    holds(Prop.forAll(sideGen, sideGen, Gen.oneOf(true, false),
        Gen.oneOf(None, Some(3L), Some(10L)),
        Gen.oneOf(true, false)) { (l, r, strict, tol, bcast) =>
      val left = l.toDF("k", "t", "lid")
      val right = r.toDF("rk", "rt", "rid")
      val got = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"),
          "t", "rt", strict, tol, broadcast = Some(bcast))
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      // brute model: per left row, the right row with the largest
      // qualifying time; ties on time broken by the largest rid (the merge
      // keeps the LAST same-key row in (time, arrival) sort order, and the
      // planner sorts by time only — so only compare when the winner is
      // unique on (k, t), which the generator makes common enough)
      val model = l.map { case (k, t, lid) =>
        val cands = r.filter { case (rk, rt, _) => rk == k &&
          t.isDefined && rt.isDefined &&
          (if (strict) rt.get < t.get else rt.get <= t.get) &&
          tol.forall(t.get - rt.get <= _) }
        lid -> (if (cands.isEmpty) Set(-1L)
          else {
            val best = cands.map(_._2.get).max
            cands.filter(_._2.get == best).map(_._3).toSet
          })
      }.toMap
      l.forall { case (_, _, lid) => model(lid).contains(got(lid)) }
    })
  }

  test("skyline window formulation equals the brute dominance filter (q167 law)") {
    import spark.implicits._
    // heavy value collisions so price ties (the RANGE-frame subtlety) and
    // date ties both occur constantly
    val g = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        p <- Gen.choose(0L, 15L)
        d <- Gen.choose(0L, 15L)
      } yield (p, d))
    } yield rows.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }
    holds(Prop.forAll(g) { rows =>
      val got = graft.operators.WindowQueries
        .skyline2d(rows.toDF("id", "p", "d"), "p", "d")
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val brute = rows.filter { case (_, p, d) =>
        !rows.exists { case (_, p2, d2) => p2 > p && d2 > d }
      }.map(_._1).toSet
      got == brute
    })
  }

  test("BPE round equals a sequential greedy reference on arbitrary token streams (q169 law)") {
    import spark.implicits._
    // tiny alphabet so self-pair chains ('a a a …', the overlap case) are
    // routine, not rare
    val g = for {
      nDocs <- Gen.choose(1, 12)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 20).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c"))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    holds(Prop.forAll(g) { docs =>
      val hasPair = docs.exists(_._2.size >= 2)
      if (!hasPair) true // no pairs: best frame is empty, nothing to law
      else {
        val (rewritten, best) = graft.operators.TextQueries.bpeRound(
          docs.toDF("doc_id", "t"))
        val (bw1, bw2, bc) = best.collect().map(r =>
          (r.getString(0), r.getString(1), r.getLong(2))).head
        // reference: count all adjacent pairs, best by (count desc, pair asc)
        val counts = docs.flatMap(_._2.sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1)))).groupBy(identity).view.mapValues(_.size).toMap
        val ((ew1, ew2), ec) = counts.toSeq
          .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.head
        // reference greedy rewrite
        val expect = docs.map { case (id, t) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < t.size) {
            if (j < t.size - 1 && t(j) == ew1 && t(j + 1) == ew2) {
              out += s"${ew1}_$ew2"; j += 2
            } else { out += t(j); j += 1 }
          }
          id -> out.toSeq
        }.toMap
        val got = rewritten.collect()
          .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        (bw1, bw2, bc) == ((ew1, ew2, ec.toLong)) && got == expect
      }
    })
  }

  test("N-round BPE driver equals the iterated sequential greedy reference (q169 law)") {
    import spark.implicits._
    // the full training loop, not one step: 5 rounds over tiny alphabets so
    // merged tokens re-merge ('a_b' + 'c' etc.) and early exhaustion occurs
    val g = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b"))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    holds(Prop.forAll(g) { docs0 =>
      val rounds = 5
      // reference: iterate count→select→greedy-rewrite, stop when no pair
      var docs: Map[Long, Seq[String]] =
        docs0.map { case (id, t) => id -> (t: Seq[String]) }.toMap
      val expect = Seq.newBuilder[(Long, String, Long, Long)]
      var r = 1L
      var done = false
      while (r <= rounds && !done) {
        val counts = docs.values.flatMap(_.sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1)))).groupBy(identity).view.mapValues(_.size).toMap
        if (counts.isEmpty) done = true
        else {
          val ((w1, w2), c) = counts.toSeq
            .sortBy { case ((a, b), n) => (-n, a, b) }.head
          docs = docs.view.mapValues { t =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < t.size) {
              if (j < t.size - 1 && t(j) == w1 && t(j + 1) == w2) {
                out += s"${w1}_$w2"; j += 2
              } else { out += t(j); j += 1 }
            }
            out.toSeq
          }.toMap
          expect += ((r, s"${w1}_$w2", c.toLong, docs.values.map(_.size.toLong).sum))
          r += 1
        }
      }
      val got = graft.operators.TextQueries
        .bpeTrain(docs0.toDF("doc_id", "t"), rounds)
        .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
          x.getLong(3))).toSeq
      got == expect.result()
    })
  }
}
