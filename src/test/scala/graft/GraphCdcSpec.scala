package graft

import graft.operators.AnalyticQueries
import org.apache.spark.sql.functions._

/** q139 CDC log compaction and q140 k-core: plain-Scala recomputes plus the
  * crafted multi-round peel case the bounded-unroll oracle relies on. */
class GraphCdcSpec extends SparkSpec {

  test("q139 CDC compaction equals a plain-Scala latest-wins-with-tombstones recompute") {
    val evs = graft.engine.Tables.load(spark, sfDir01, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tsus"), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val expected = evs.groupBy(_._1).flatMap { case (uid, ops) =>
      val last = ops.maxBy(o => (o._2, o._3))
      if (last._4 == "error") None
      else Some((uid, ops.length.toLong, ops.count(_._4 == "error").toLong,
        last._2, last._4, math.round(last._5 * 100)))
    }.toSet
    val got = AnalyticQueries.q139CdcApply(spark, sfDir01)
      .select(col("user_id"), col("n_ops"), col("n_deletes"),
        expr("unix_micros(last_ts)"), col("last_op"), col("last_value_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSet
    assert(got == expected)
    // tombstone semantics must actually fire on the fixture: some users'
    // final event is an 'error', and they must be absent from the output
    val tombstoned = evs.groupBy(_._1).count { case (_, ops) =>
      ops.maxBy(o => (o._2, o._3))._4 == "error"
    }
    assert(tombstoned > 0 && got.size + tombstoned == evs.map(_._1).distinct.length)
  }

  test("q140 k-core peels a pendant path over multiple synchronous rounds") {
    import spark.implicits._
    // K4 on {1,2,3,4} is a 3-core fixpoint; the pendant path 4-5-6-7 needs
    // THREE peel rounds (7 drops, then 6, then 5) — a single-pass degree
    // filter would leave 5 and 6 behind. Extra node 8 hangs off the clique
    // with degree 1 and drops in round 1.
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (1L, 8L)).toDF("a", "b")
    val core = AnalyticQueries.kCoreEdges(e0, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q140 sub-3-core graph peels to empty without throwing") {
    import spark.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b") // triangle = 2-core
    assert(AnalyticQueries.kCoreEdges(e0, k = 3).count() == 0)
    val r = AnalyticQueries.kCoreEdges(e0, k = 3)
      .agg(count(lit(1)).as("n"), sum(col("a")).as("s")).collect().head
    assert(r.getLong(0) == 0 && r.isNullAt(1))
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming CDC store equals batch q139 on a 3-way split; replay cannot double-count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .as[(java.sql.Timestamp, Long, Long, String, Double)].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/partials"
    val stream = MemoryStream[(java.sql.Timestamp, Long, Long, String, Double)]
    val q = graft.streaming.StreamOps.cdcApplyStream(
      stream.toDF().toDF("ts", "event_id", "user_id", "event_type", "value"), store)
    val batches = events.grouped((events.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("n_ops"), col("n_deletes"),
        expr("unix_micros(last_ts)"), col("last_op"), col("last_value_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSet
    val want = canon(AnalyticQueries.q139CdcApply(spark, sfDir))
    assert(canon(AnalyticQueries.cdcFromStore(spark, store)) == want,
      "store-served state equals the batch query")
    // REPLAY batch 2 under its original id: dynamic overwrite of its own
    // partition — nothing may move (the counter sums would double otherwise)
    AnalyticQueries.cdcBatchAppend(
      spark.createDataset(batches(1))
        .toDF("ts", "event_id", "user_id", "event_type", "value"), store, 1L)
    assert(canon(AnalyticQueries.cdcFromStore(spark, store)) == want,
      "replayed batch overwrites its own partition, never double-counts")
  }

  test("q152 BFS assigns true shortest hops on a crafted two-component graph") {
    import spark.implicits._
    // path 1-2-3-4-5-6 with a shortcut 2-4: node 4 must take hop 2 via the
    // shortcut, not hop 3 along the path; 6 (hop 4) lies beyond rounds=3 →
    // hop -1; {10,11} is a separate unseeded component → hop -1.
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 4L),
      (10L, 11L)).toDF("a", "b")
    val sym = e0.select(col("a").as("v"), col("b").as("u"))
      .union(e0.select(col("b").as("v"), col("a").as("u")))
    val nodes = sym.select(col("v")).distinct()
    val seeds = Seq(1L).toDF("v")
    val (out, pin) = AnalyticQueries.bfsHops(sym, nodes, seeds, rounds = 3)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    pin.unpersist(blocking = false)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      6L -> -1L, 10L -> -1L, 11L -> -1L))
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q189 frontier Bellman-Ford equals a plain Scala full-relaxation reference (law)") {
    import spark.implicits._
    // deterministic pseudo-random weighted graph: 40 nodes, ~120 edges,
    // weights 1..9 chosen so cheapest paths routinely use MORE hops than
    // the hop-minimal route (the case BFS cannot answer); plus an
    // unreachable island {100,101}
    val rnd = new scala.util.Random(42)
    val edges0 = (Seq.tabulate(39)(i => (i.toLong, i + 1L, 9L)) ++ // spine, costly
      Seq.fill(80)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        1L + rnd.nextInt(9))) ++ Seq((100L, 101L, 1L)))
      .filter(e => e._1 != e._2)
    val symSeq = edges0.flatMap(e => Seq(e, (e._2, e._1, e._3)))
    val nodeSeq = symSeq.map(_._1).distinct
    val seedSeq = Seq(0L, 17L)
    for (rounds <- Seq(1, 3, 5)) {
      // reference: full relaxation — after k layers, dist(v) is the exact
      // min cost over paths of <= k edges (the textbook bounded invariant)
      var ref = nodeSeq.map(v =>
        v -> (if (seedSeq.contains(v)) 0L else Long.MaxValue)).toMap
      (1 to rounds).foreach { _ =>
        val next = scala.collection.mutable.Map(ref.toSeq: _*)
        symSeq.foreach { case (v, u, w) =>
          if (ref(v) != Long.MaxValue && ref(v) + w < next(u))
            next(u) = ref(v) + w
        }
        ref = next.toMap
      }
      val expect = nodeSeq.map(v =>
        v -> (if (ref(v) == Long.MaxValue) -1L else ref(v))).toMap
      val (out, pin) = AnalyticQueries.ssspRounds(
        symSeq.toDF("v", "u", "w"), nodeSeq.toDF("v"), seedSeq.toDF("v"),
        rounds)
      val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      pin.unpersist(blocking = false)
      assert(got == expect, s"rounds=$rounds: frontier engine diverged")
    }
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q140 sf0.01 peel depth stays within the oracle 16-round unroll") {
    // the bounded-unroll oracle is only valid if the data converges within
    // its layers: recompute the peel depth in plain Scala on the same
    // co-purchase edges
    val li = graft.engine.Tables.load(spark, sfDir01, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("supp")).filter(col("supp") >= 2)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var live = edges.toSet
    var rounds = 0
    var done = false
    while (!done) {
      val deg = live.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => (n, xs.size) }
      val weak = deg.filter(_._2 < 3).keySet
      if (weak.isEmpty) done = true
      else {
        rounds += 1
        live = live.filter(e => !weak(e._1) && !weak(e._2))
        assert(rounds <= 16, "peel depth exceeds the oracle unroll")
      }
    }
    assert(rounds <= 16)
  }
}
