package graft

import graft.operators.{SessEvent, Session, StatefulQueries}
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful fold unit laws + streaming twins vs their batch oracles. */
class StatefulStreamingSpec extends SparkSpec {

  test("sessionize splits exactly at the >600s gap boundary") {
    def ev(id: Long, t: Long) = SessEvent(1L, id, t, 100L)
    val out = StatefulQueries.sessionize(1L,
      Iterator(ev(1, 0), ev(2, 600), ev(3, 1201), ev(4, 1801), ev(5, 2402))).toSeq
    // gaps: 600 (keep), 601 (split), 600 (keep), 601 (split)
    assert(out.map(s => (s.session_id, s.n_events)) == Seq((1L, 2L), (2L, 2L), (3L, 1L)))
    assert(out.head.start_s == 0 && out.head.end_s == 600)
  }

  test("sessionize handles empty and unsorted input") {
    assert(StatefulQueries.sessionize(1L, Iterator.empty).isEmpty)
    def ev(id: Long, t: Long) = SessEvent(1L, id, t, 1L)
    val shuffled = StatefulQueries.sessionize(1L,
      Iterator(ev(3, 2000), ev(1, 0), ev(2, 100))).toSeq
    assert(shuffled.map(_.n_events) == Seq(2L, 1L))
  }

  test("streaming hourly counts equal the batch time-bucket aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[(java.sql.Timestamp, String, Double)].collect().toSeq
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(events)
    val q = StreamOps.hourlyTypeCounts(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly")
      .select(col("hour"), col("event_type"), col("n"), col("value_cents"))
      .collect().map(_.toSeq).toSet
    val want = graft.engine.Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("streaming dedup collapses duplicated input to exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)].collect().toSeq
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    // triple + partial dupes, including replays whose event time was
    // RE-STAMPED by the source (+1s): still the same id, still a duplicate
    val restamped = events.take(50).map { case (id, ts, et) =>
      (id, new java.sql.Timestamp(ts.getTime + 1000), et)
    }
    stream.addData(events ++ events ++ restamped)
    val q = StreamOps.dedupStream(
        stream.toDF().toDF("event_id", "ts", "event_type"), "event_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(got.length == got.toSet.size, "no duplicates may survive")
    assert(got.toSet == events.map(_._1).toSet, "every unique id survives")
  }

  test("streaming parquet file sink round-trips exactly (checkpointed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .as[(Long, Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, Long, String)]
    stream.addData(rows)
    val dir = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val q = stream.toDF().toDF("event_id", "user_id", "event_type")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, String)].collect().toSeq
    assert(back.sorted == rows.sorted)
  }

  test("watermarked stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    def side(tpe: String, u: String, t: String, id: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t), col("event_id").as(id))
    val clicksB = side("click", "c_user", "c_ts", "c_id")
    val errsB = side("error", "e_user", "e_ts", "e_id")
    // batch twin: same code, watermark is a no-op on static frames
    val want = StreamOps.clickErrorJoin(clicksB, errsB)
      .select("user_id", "c_id", "e_id").collect().map(_.toSeq).toSet
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val es = MemoryStream[(Long, java.sql.Timestamp, Long)]
    cs.addData(clicksB.as[(Long, java.sql.Timestamp, Long)].collect().toSeq)
    es.addData(errsB.as[(Long, java.sql.Timestamp, Long)].collect().toSeq)
    val q = StreamOps.clickErrorJoin(
        cs.toDF().toDF("c_user", "c_ts", "c_id"),
        es.toDF().toDF("e_user", "e_ts", "e_id"))
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssjoin").select("user_id", "c_id", "e_id")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("left-outer stream-stream join emits null rows only after the watermark proves no match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1's click gets an error inside the 10-min window; user 2's never
    // does — its null row may only surface once both watermarks pass the
    // click's match horizon
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val es = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamOps.clickErrorJoinLeft(
        cs.toDF().toDF("c_user", "c_ts", "c_id"),
        es.toDF().toDF("e_user", "e_ts", "e_id"))
      .writeStream.format("memory").queryName("ssleft").outputMode("append").start()
    cs.addData((1L, ts(1000), 101L), (2L, ts(1000), 102L))
    es.addData((1L, ts(1200), 201L))
    q.processAllAvailable()
    def rows() = spark.table("ssleft")
      .filter(col("user_id") <= 2)
      .select(col("user_id"), col("c_id"),
        when(col("e_id").isNull, -1L).otherwise(col("e_id")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // before the watermark advances, only the matched row may have emitted
    assert(!rows().contains((2L, 102L, -1L)),
      "outer row emitted before the watermark could prove no match")
    // advance BOTH watermarks well past the horizon (global wm = min of the
    // two), then run the follow-up batch that flushes proven-unmatched state
    cs.addData((9L, ts(100000), 900L)); es.addData((9L, ts(100000), 901L))
    q.processAllAvailable()
    cs.addData((9L, ts(110000), 910L)); es.addData((9L, ts(110000), 911L))
    q.processAllAvailable()
    q.stop()
    assert(rows() == Set((1L, 101L, 201L), (2L, 102L, -1L)))
    // batch twin: the same code on static frames is a plain left interval
    // join, nulls included
    val want = StreamOps.clickErrorJoinLeft(
        Seq((1L, ts(1000), 101L), (2L, ts(1000), 102L))
          .toDF("c_user", "c_ts", "c_id"),
        Seq((1L, ts(1200), 201L)).toDF("e_user", "e_ts", "e_id"))
      .select(col("user_id"), col("c_id"),
        when(col("e_id").isNull, -1L).otherwise(col("e_id")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows() == want)
  }

  test("full-outer stream-stream join emits unmatched rows from BOTH sides, watermark-gated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: matched pair; user 2: click with no error (null right);
    // user 3: error with no click (null left) — both null rows may only
    // surface once the global watermark passes their match horizons
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val es = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamOps.clickErrorJoinFull(
        cs.toDF().toDF("c_user", "c_ts", "c_id"),
        es.toDF().toDF("e_user", "e_ts", "e_id"))
      .writeStream.format("memory").queryName("ssfull").outputMode("append").start()
    cs.addData((1L, ts(1000), 101L), (2L, ts(1000), 102L))
    es.addData((1L, ts(1200), 201L), (3L, ts(1200), 203L))
    q.processAllAvailable()
    def rows() = spark.table("ssfull")
      .filter(col("user_id") <= 3)
      .select(col("user_id"),
        when(col("c_id").isNull, -1L).otherwise(col("c_id")).as("c"),
        when(col("e_id").isNull, -1L).otherwise(col("e_id")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // before the watermark advances, neither unmatched row may have emitted
    assert(!rows().contains((2L, 102L, -1L)),
      "left-side outer row emitted before the watermark could prove no match")
    assert(!rows().contains((3L, -1L, 203L)),
      "right-side outer row emitted before the watermark could prove no match")
    // advance BOTH watermarks past the horizons, then the flush batch
    cs.addData((9L, ts(100000), 900L)); es.addData((9L, ts(100000), 901L))
    q.processAllAvailable()
    cs.addData((9L, ts(110000), 910L)); es.addData((9L, ts(110000), 911L))
    q.processAllAvailable()
    q.stop()
    val want = StreamOps.clickErrorJoinFull(
        Seq((1L, ts(1000), 101L), (2L, ts(1000), 102L))
          .toDF("c_user", "c_ts", "c_id"),
        Seq((1L, ts(1200), 201L), (3L, ts(1200), 203L))
          .toDF("e_user", "e_ts", "e_id"))
      .select(col("user_id"),
        when(col("c_id").isNull, -1L).otherwise(col("c_id")).as("c"),
        when(col("e_id").isNull, -1L).otherwise(col("e_id")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows() == want)
    assert(rows() == Set((1L, 101L, 201L), (2L, 102L, -1L), (3L, -1L, 203L)))
  }

  test("stream-static enrichment join equals the batch broadcast left join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // static dim covering only half the users: unmatched events must
    // survive with nulls, not drop
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user_events"))
      .filter(col("user_id") % 2 === 0)
    val want = StreamOps.enrichWithDim(ev, dim, "user_id")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_user_events"), lit(-1L)).as("n"))
      .collect().map(_.toSeq).toSet
    val stream = MemoryStream[(Long, Long, Double)]
    stream.addData(ev.as[(Long, Long, Double)].collect().toSeq)
    val q = StreamOps.enrichWithDim(
        stream.toDF().toDF("event_id", "user_id", "value"), dim, "user_id")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_user_events"), lit(-1L)).as("n"))
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich").collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.exists(_(2) == -1L), "uncovered users must surface with nulls")
    assert(got.exists(_(2) != -1L))
  }

  test("streaming incremental dedup flags every near-dup pair exactly once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    // two ingest batches split by doc parity: batch-1 pairs are even-even,
    // batch-2 pairs touch an odd doc — disjoint by construction, so the
    // exactly-once claim is testable as plain set arithmetic
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val stream = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    val q = StreamOps.incrementalDedupStream(
        stream.toDF().toDF("doc_id", "text"),
        s"$dir/docs", s"$dir/sigs") { (pairs, id) =>
      seen ++= pairs.select(col("i"), col("j")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))
    }
    stream.addData(b1); q.processAllAvailable()
    q.stop()
    // RESTART: a brand-new stream and query over the same store + index —
    // all state the resumed pipeline needs must come back from parquet,
    // which is the operator's whole durability claim
    val stream2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.incrementalDedupStream(
        stream2.toDF().toDF("doc_id", "text"),
        s"$dir/docs", s"$dir/sigs", batchIdBase = 100L) { (pairs, id) =>
      seen ++= pairs.select(col("i"), col("j")).collect()
        .map(r => (id, r.getLong(0), r.getLong(1)))
    }
    stream2.addData(b2); q2.processAllAvailable()
    q2.stop()
    val got = seen.map(p => (p._2, p._3)).toSet
    assert(seen.size == got.size, "a pair must be flagged exactly once")
    // across batches the union equals the full-corpus run
    val want = graft.operators.DedupQueries.q51MinHashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the index persisted one signature row per shingled doc, batch-partitioned
    val idx = spark.read.parquet(s"$dir/sigs")
    assert(idx.select(col("doc_id")).distinct().count() == idx.count())
    assert(idx.select(col("ingest_batch")).distinct().count() == 2)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming span dedup equals the one-shot ingest; a replayed batch reproduces its output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val newDocs = docs.filter(col("doc_id") % 7 === 3)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    def seedStore(path: String): Unit =
      graft.operators.DedupQueries.spanBlocks(docs.filter(col("doc_id") % 7 =!= 3))
        .groupBy(col("btext"))
        .agg(min(struct(col("doc_id"), col("bidx"))).as("s0"))
        .select(col("btext"), col("s0.doc_id").as("doc_id"), col("s0.bidx").as("bidx"))
        .write.mode("overwrite").parquet(path)
    // one-shot reference over its own store
    val oneShot = java.nio.file.Files.createTempDirectory("graft_span1").toString + "/spans"
    seedStore(oneShot)
    val want = graft.operators.DedupQueries
      .spanDedupBatch(spark.createDataset(newDocs).toDF("doc_id", "text"), oneShot)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // streamed: the same docs in three ascending-id micro-batches
    val streamed = java.nio.file.Files.createTempDirectory("graft_span2").toString + "/spans"
    seedStore(streamed)
    val stream = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, String)]
    val q = StreamOps.spanDedupStream(
        stream.toDF().toDF("doc_id", "text"), streamed) { (out, _) =>
      out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getString(3)))
    }
    val batches = newDocs.grouped((newDocs.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    assert(got.toMap == want, "micro-batched ingest equals one-shot")
    assert(want.values.exists(v => v._2 < v._1),
      "fixture must actually drop some spans for the law to bite")
    // REPLAY the last batch (its append already landed): the first-site
    // registry must reproduce the identical per-doc output, not drop the
    // replayed docs' own first sites
    val replay = graft.operators.DedupQueries
      .spanDedupBatch(spark.createDataset(batches.last).toDF("doc_id", "text"), streamed)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    replay.foreach { case (id, v) => assert(v == got(id), s"replay drifted for doc $id") }
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming substring coverage equals batch q200; a replayed batch is absorbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch q200 over the whole corpus is the oracle — the STRONG law:
    // ingest the SAME corpus in three micro-batches, serve from the stores,
    // and every forward duplicate (pair split across batches, second side
    // later) must retro-cover its first site to exact equality
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val want = canon(graft.operators.DedupQueries.q200SubstringDedup(spark, sfDir))
    assert(want.nonEmpty, "fixture must contain substring duplicates")
    val base = java.nio.file.Files.createTempDirectory("graft_subdup").toString
    val (gramStore, dupSites) = (base + "/grams", base + "/dupsites")
    val all = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.substringDedupStream(
      stream.toDF().toDF("doc_id", "text"), gramStore, dupSites)
    val batches = all.grouped((all.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    val served = canon(graft.operators.DedupQueries
      .substringCoverageFromStore(spark, dupSites))
    assert(served == want, "3-batch incremental serve must equal batch q200")
    // the law must have exercised the retro path: some duplicated hash must
    // span two batches (first site in an earlier batch than a later one)
    // — guaranteed here by corpus boilerplate, asserted via a direct count
    val cut1 = batches.head.map(_._1).max
    assert(want.keys.exists(_ <= cut1) && want.keys.exists(_ > cut1),
      "fixture must have covered docs on both sides of a batch boundary")
    // REPLAY the last batch (its appends already landed): self-site guards
    // + serve-time distinct must reproduce the identical coverage
    graft.operators.DedupQueries.substringDedupBatch(
      spark.createDataset(batches.last).toDF("doc_id", "text"),
      gramStore, dupSites)
    val replayed = canon(graft.operators.DedupQueries
      .substringCoverageFromStore(spark, dupSites))
    assert(replayed == want, "replayed batch drifted the served coverage")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming anomaly store equals batch q125; a replayed batch cannot double-count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
      .as[(java.sql.Timestamp, String)].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("graft_anom").toString + "/daily"
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamOps.anomalyStream(stream.toDF().toDF("ts", "event_type"), store)
    events.grouped((events.size + 2) / 3).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    q.stop()
    def served = graft.operators.WindowQueries.anomalyFromStore(spark, store)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val want = graft.operators.WindowQueries.q125RollingAnomaly(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(served == want, "store-served flags equal the batch query")
    // REPLAY batch 2 (dynamic overwrite of its own partition): nothing moves
    val lastBatch = events.grouped((events.size + 2) / 3).toSeq.last
    graft.operators.WindowQueries.anomalyBatchAppend(
      spark.createDataset(lastBatch).toDF("ts", "event_type"), store, 2L)
    assert(served == want, "replay must overwrite, not double-count")
    // the SAME store serves the CUSUM monitor: its streamed twin must equal
    // batch q153 row for row — one day-grain store, multiple monitors
    val cusumServed = graft.operators.WindowQueries.cusumFromStore(spark, store)
      .collect().map(_.toSeq).toSeq
    val cusumWant = graft.operators.WindowQueries.q153Cusum(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(cusumServed == cusumWant, "store-served CUSUM equals batch q153")
  }

  test("streaming freshness store equals batch q180 readout; replay is a no-op by max algebra") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
      .as[(java.sql.Timestamp, String)].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("graft_fresh").toString + "/mx"
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamOps.freshnessStream(stream.toDF().toDF("ts", "event_type"), store)
    val batches = events.grouped((events.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    def serve() = graft.operators.AnalyticQueries
      .freshnessFromStore(spark, store).collect().map(_.toSeq).toSeq
    val served = serve()
    val batch = graft.operators.AnalyticQueries.q180Freshness(spark, sfDir)
      .drop("n_events").collect().map(_.toSeq).toSeq
    assert(served == batch, "store-served readout must equal batch q180")
    // replay a batch: register-max absorbs it, nothing moves
    graft.operators.AnalyticQueries.freshnessBatchAppend(
      spark.createDataset(batches.head).toDF("ts", "event_type"), store)
    assert(serve() == served, "replayed max partial must be a no-op")
  }

  test("streaming postings ingest: segment-merged serve equals the single-pass q166 build; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("graft_post").toString + "/seg"
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.postingsStream(stream.toDF().toDF("doc_id", "text"), store)
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    def serve() = graft.operators.TextQueries.postingsFromStore(spark, store)
      .collect().map(_.toSeq).toSeq
    val served = serve()
    val batch = graft.operators.TextQueries.q166Postings(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(served == batch,
      "segment-merged index must equal the single-pass build row-for-row")
    // replay batch 1 under its original id: dynamic overwrite, nothing moves
    graft.operators.TextQueries.postingsBatchAppend(
      spark.createDataset(batches(1)).toDF("doc_id", "text"), store, 1L)
    assert(serve() == served, "replayed segment append must overwrite, not duplicate")
  }

  test("streaming heavy-hitter store: confirmed ⊆ exact heavies ⊆ candidates; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // q99's derived-skew stream: key = floor(sqrt(event_id)) ⇒ key v has
    // frequency ≈ 2v+1, so a handful of large-v keys dominate
    val keys = graft.engine.Tables.load(spark, sfDir, "events")
      .select(expr("CAST(floor(sqrt(event_id)) AS BIGINT)").as("key"))
      .as[Long].collect().toSeq
    val store = java.nio.file.Files.createTempDirectory("graft_hh").toString + "/mg"
    val stream = MemoryStream[Long]
    val q = StreamOps.heavyHitterStream(stream.toDF().toDF("key"), store)
    val batches = keys.grouped((keys.size + 2) / 3).toSeq
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    def serve() = graft.operators.AnalyticQueries
      .heavyHittersFromStore(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val served = serve()
    val trueCounts = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = keys.size.toLong
    val exactHeavies = trueCounts.collect {
      case (k, c) if c * graft.operators.MisraGries.k > n => k
    }.toSet
    val candidates = served.map(_._1).toSet
    val confirmed = served.collect { case (k, _, true) => k }.toSet
    assert(exactHeavies.nonEmpty, "fixture must contain heavy keys")
    assert(exactHeavies.subsetOf(candidates),
      "every true heavy hitter must survive the merged-summary prune")
    assert(confirmed.subsetOf(exactHeavies),
      "a confirmed key must truly be heavy (lower bound is sound)")
    served.foreach { case (k, lb, _) =>
      assert(lb <= trueCounts(k), s"lb for $k exceeds the true count")
      assert(lb + n / (graft.operators.MisraGries.k + 1) >= trueCounts(k),
        s"undercount for $k exceeds the n/(k+1) merge bound")
    }
    // replay batch 0 under its original id: dynamic overwrite, nothing moves
    graft.operators.AnalyticQueries.mgBatchAppend(
      spark.createDataset(batches.head).toDF("key"), store, 0L)
    assert(serve() == served, "replayed MG partial must overwrite, not double-count")
  }

  test("streaming DAU sketch store equals batch build; replayed merges cannot move estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    val streamedStore = java.nio.file.Files.createTempDirectory("graft_dau_s").toString
    val batchStore = java.nio.file.Files.createTempDirectory("graft_dau_b").toString
    // three ingest micro-batches vs one batch build over the same events
    val batches = events.groupBy(e => (e._1 % 3).toInt).toSeq.sortBy(_._1).map(_._2)
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamOps.rollingDauStream(
      stream.toDF().toDF("user_id", "ts"), streamedStore)
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    graft.operators.AnalyticQueries.dauSketchBatchAppend(
      graft.engine.Tables.load(spark, sfDir, "events"), batchStore)
    def est(path: String): Map[Long, Long] =
      graft.operators.AnalyticQueries.dauFromSketchStore(spark, path)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = est(streamedStore)
    assert(streamed == est(batchStore),
      "union of per-batch daily sketches must estimate exactly like the single-pass build")
    assert(streamed.nonEmpty)
    // at-least-once replay: re-append batch 2's sketches; register-max
    // union absorbs the duplicate, so every estimate is unchanged
    val replay = batches(1).toDF("user_id", "ts")
    graft.operators.AnalyticQueries.dauSketchBatchAppend(replay, streamedStore)
    assert(est(streamedStore) == streamed, "replayed sketch merge must be a no-op")
  }

  test("streaming decontamination over the stored gram index equals batch q70") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    graft.operators.TextQueries.writeEvalGramIndex(
      docs.filter(col("doc_id") % 20 === 0), dir)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    // two micro-batches split by parity; per-doc reports are
    // batch-independent, so the union must equal the batch q70 exactly
    val (b1, b2) = corpus.partition(_._1 % 2 == 0)
    val stream = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    val q = StreamOps.decontaminateStream(
        stream.toDF().toDF("doc_id", "text"), dir) { (hits, _) =>
      seen ++= hits.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    val want = graft.operators.TextQueries.q70Decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(seen.toSet == want)
    assert(seen.size == seen.toSet.size, "a doc reports exactly once across batches")
    assert(seen.nonEmpty)
  }

  test("native session_window streaming equals the batch stateful fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
      .as[SessEvent].collect().toSeq
    val stream = MemoryStream[SessEvent]
    stream.addData(evs)
    val q = StreamOps.sessionWindowAgg(
        stream.toDS().withColumn("ts", timestamp_seconds(col("ts_s"))))
      .writeStream.format("memory").queryName("swagg").outputMode("append").start()
    q.processAllAvailable()
    // two watermark bumps so every real session's window closes and emits
    val maxTs = evs.map(_.ts_s).max
    stream.addData(SessEvent(-1L, 0L, maxTs + 100000, 0L))
    q.processAllAvailable()
    stream.addData(SessEvent(-1L, 1L, maxTs + 200000, 0L))
    q.processAllAvailable()
    q.stop()
    // session_window end = last event + gap; subtract the 601s gap to get
    // the batch session's last-event time
    val got = spark.table("swagg").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - 601, r.getLong(3), r.getLong(4)))
      .toSet
    val want = graft.operators.StatefulQueries
      .q66StatefulSessions(spark, sfDir).as[Session].collect()
      .map(s => (s.user_id, s.start_s, s.end_s, s.n_events, s.value_cents)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("late cross-batch event cannot regress last_s and split the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessEvent]
    val q = StreamOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("late_sess").outputMode("append").start()
    // batch 1: in-order events at 1000, 1400 → watermark after = 1400s - 10min
    stream.addData(SessEvent(7L, 1L, 1000L, 10L), SessEvent(7L, 2L, 1400L, 10L))
    q.processAllAvailable()
    // batch 2: a watermark-admitted LATE event (1200 ≥ 800). If it regressed
    // last_s to 1200, the next on-time event at 1900 — within the true gap
    // (1900-1400 = 500 ≤ 600) — would wrongly open a new session (1900-1200 > 600).
    stream.addData(SessEvent(7L, 3L, 1200L, 10L))
    q.processAllAvailable()
    stream.addData(SessEvent(7L, 4L, 1900L, 10L))
    q.processAllAvailable()
    // sentinel bumps to time out and emit the open session (watermark from
    // batch N applies at batch N+1)
    stream.addData(SessEvent(-1L, 0L, 200000L, 0L)); q.processAllAvailable()
    stream.addData(SessEvent(-1L, 1L, 300000L, 0L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sess").as[Session].collect()
      .filter(_.user_id == 7L)
      .map(s => (s.session_id, s.n_events, s.value_cents, s.start_s, s.end_s)).toSeq
    assert(got == Seq((1L, 4L, 40L, 1000L, 1900L)))
  }

  test("streaming sessionization equals the batch stateful fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
      .as[SessEvent].collect().toSeq
    val stream = MemoryStream[SessEvent]
    stream.addData(evs)
    val q = StreamOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable()
    // advance the watermark far past every real user's gap horizon so idle
    // open sessions hit their event-time timeout and emit; two bumps because
    // the watermark derived from batch N applies to batch N+1. The sentinel
    // user (-1) is filtered from the assertion.
    val maxTs = evs.map(_.ts_s).max
    stream.addData(SessEvent(-1L, 0L, maxTs + 100000, 0L))
    q.processAllAvailable()
    stream.addData(SessEvent(-1L, 1L, maxTs + 200000, 0L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions").as[Session].collect()
      .filter(_.user_id >= 0)
      .map(s => (s.user_id, s.session_id, s.n_events, s.value_cents)).toSet
    val want = graft.operators.StatefulQueries
      .q66StatefulSessions(spark, sfDir).as[Session].collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.value_cents)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming semantic dedup over the stored cell index equals batch q83 across batches + restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = graft.operators.SimilarityQueries.quantized(spark, sfDir01)
      .select(col("vec_id"), col("q"), col("n2"))
    val isNew = col("vec_id") % 3 === 1
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    graft.operators.SimilarityQueries.writeSemanticCellIndex(e.filter(!isNew), dir)
    // the q83 "new" slice split into three deterministic micro-batches: a
    // cross-batch near-dup pair must surface exactly once, when its LATER
    // member arrives and finds the earlier one already in the cell store
    val news = e.filter(isNew)
      .as[(Long, Array[Long], Long)].collect().toSeq
    val parts = (0 until 3).map(g => news.filter(t => (t._1 / 3) % 3 == g))
    val seen = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    def drive(batches: Seq[Seq[(Long, Array[Long], Long)]], base: Long): Unit = {
      val stream = MemoryStream[(Long, Array[Long], Long)]
      val q = StreamOps.semanticDedupStream(
          stream.toDF().toDF("vec_id", "q", "n2"), dir, batchIdBase = base) {
        (pairs, id) =>
          seen ++= pairs.select(col("i"), col("j")).collect()
            .map(r => (id, r.getLong(0), r.getLong(1)))
      }
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
    }
    drive(Seq(parts(0), parts(1)), base = 0L)
    // RESTART: a brand-new stream and query over the same index — the cell
    // store and centroids must carry the resumed pipeline entirely
    drive(Seq(parts(2)), base = 100L)
    val got = seen.map(p => (p._2, p._3)).toSet
    assert(seen.size == got.size, "a pair must be flagged exactly once")
    val want = graft.operators.SimilarityQueries
      .q83SemanticDedupIncremental(spark, sfDir01)
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // the cell store holds the bootstrap partition plus one per micro-batch
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.select(col("ingest_batch")).distinct().count() == 4)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming as-of enrich equals batch q26/q148 across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the raw fixture stream, unfiltered, in event-time order
    val all = graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[graft.streaming.AsofEvent].collect().toSeq
      .sortBy(e => (e.ts_us, e.event_id))
    // split mid-timeline: the second half's matches depend on click state
    // carried across the micro-batch boundary
    val (b1, b2) = all.splitAt(all.size / 2)
    val stream = MemoryStream[graft.streaming.AsofEvent]
    val q = StreamOps.asofEnrichStream(stream.toDS())
      .writeStream.format("memory").queryName("asofenrich")
      .outputMode("append").start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    def norm(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))
    val got = spark.table("asofenrich")
      .select(col("event_id"), col("user_id"), col("click_id"), col("gap_us"))
      .collect().map(norm).toSet
    val want = graft.operators.WindowQueries.q26AsofJoin(spark, sfDir)
      .collect().map(norm).toSet
    assert(got == want)
    assert(got.exists(_._3 >= 0) && got.exists(_._3 == -1L),
      "fixture must exercise both matched and null-extended errors")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming LM scoring from the stored model equals batch q192 over all batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select(col("doc_id"), col("text"))
    val toks = docsDf.select(col("doc_id"), split(col("text"), " ").as("t"))
    // train the model ONCE on the even half (q192's split), persisted
    val dir = java.nio.file.Files.createTempDirectory("graft_lmstream").toString
    graft.operators.TextQueries.lmTrain(
      toks.filter(col("doc_id") % 2 === 0), s"$dir/lm")
    // stream the FULL corpus in 3 batches through the stateless scorer
    val docs = docsDf.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.lmScoreStream(stream.toDF().toDF("doc_id", "text"),
      s"$dir/lm", s"$dir/scores")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    val got = spark.read.parquet(s"$dir/scores")
      .select(col("doc_id"), col("n_bigrams"), col("lm_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.operators.TextQueries.lmScore(toks,
        spark.read.parquet(s"$dir/lm/bigrams"),
        spark.read.parquet(s"$dir/lm/unigrams"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream scores diverged: ${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // replay idempotence: re-scoring batch partitions is an overwrite, so
    // each doc appears exactly once in the store
    assert(got.size == got.map(_._1).size)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming language ID from the stored profiles equals the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.engine.Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), col("text"))
    // train the profiles ONCE on the even half (q206's split), persisted
    val dir = java.nio.file.Files.createTempDirectory("graft_langstream").toString
    graft.operators.TextQueries.langProfileTrain(
      docsDf.filter(col("doc_id") % 2 === 0), s"$dir/prof")
    val docs = docsDf.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamOps.langIdStream(stream.toDF().toDF("doc_id", "lang", "text"),
      s"$dir/prof", s"$dir/preds")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("lang"), col("pred"), col("best_micro"),
        col("margin_micro"))
      .collect().map(_.toSeq).toSet
    val got = canon(spark.read.parquet(s"$dir/preds"))
    val want = canon(graft.operators.TextQueries.langIdScore(docsDf,
      spark.read.parquet(s"$dir/prof/profiles")))
    assert(got == want, s"stream predictions diverged: ${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // replay idempotence: partitions overwrite, each doc predicted once
    assert(got.size == got.map(_.head).size)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming OOV audit from the stored vocab equals the batch audit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val toks = docsDf.select(col("doc_id"), col("source"),
      split(col("text"), " ").as("t"))
    val dir = java.nio.file.Files.createTempDirectory("graft_vocabstream").toString
    graft.operators.TextQueries.vocabTrain(
      toks.filter(col("doc_id") % 2 === 0), s"$dir/v", minCount = 3, maxSize = 4096)
    val docs = docsDf.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamOps.vocabOovStream(
      stream.toDF().toDF("doc_id", "source", "text"), s"$dir/v", s"$dir/audit")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val got = canon(StreamOps.vocabOovFromStore(spark, s"$dir/audit"))
    val want = canon(graft.operators.TextQueries.vocabOovAudit(toks,
      spark.read.parquet(s"$dir/v/vocab")))
    assert(got == want, "served cumulative audit diverged from the batch audit")
    assert(got.nonEmpty)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming sequence packing equals batch q186 across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the fixture corpus as PackDoc rows in shard-writer (doc_id) order,
    // split into 3 batches so open sequences cross batch boundaries with
    // partial fill carried in state
    val docs = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select((col("doc_id") % 8).as("shard"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[graft.streaming.PackDoc].collect().toSeq.sortBy(_.doc_id)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val stream = MemoryStream[graft.streaming.PackDoc]
    val q = StreamOps.packingStream(stream.toDS())
      .writeStream.format("memory").queryName("packing")
      .outputMode("append").start()
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    val assigns = spark.table("packing")
    // every doc assigned exactly once
    assert(assigns.count() == docs.size)
    // rolled up to per-shard stats, the stream must equal the batch query
    val got = assigns
      .groupBy(col("shard"), col("seq_idx"))
      .agg(count(lit(1)).as("docs_in_seq"), sum(col("n_tokens")).as("fill"))
      .groupBy(col("shard"))
      .agg(max(col("seq_idx")).as("n_seqs"),
        sum(col("docs_in_seq")).as("n_docs"),
        sum(col("fill")).as("total_tokens"),
        sum(greatest(lit(0L), lit(256L) - col("fill"))).as("padding_tokens"),
        sum(when(col("fill") > 256, 1L).otherwise(0L)).as("oversize_seqs"))
      .collect().map(_.toSeq).toSet
    val want = graft.operators.TextQueries.q186SeqPacking(spark, sfDir01)
      .collect().map(_.toSeq).toSet
    assert(got == want)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming intro dedup: store equals batch first-sites, replay reclassifies identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.MultimodalQueries
    val allIds = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val parts = allIds.grouped((allIds.size + 2) / 3).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_introstream").toString
    val stream = MemoryStream[Long]
    val q = StreamOps.introDedupStream(
      stream.toDF().toDF("doc_id"), s"$dir/store", s"$dir/audit")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    // law 1: ORDERED ingestion makes the union of per-batch first-sites
    // exactly the batch min-doc-per-hash index over the whole corpus
    def storeSet = spark.read.parquet(s"$dir/store/keyframes")
      .select(col("h0"), col("first_doc")).collect().map(_.toSeq).toSet
    val gotStore = storeSet
    val wantStore = MultimodalQueries.frame0Hashes(
        graft.engine.Tables.load(spark, sfDir, "documents").select(col("doc_id")))
      .groupBy(col("h0")).agg(min(col("doc_id")).as("first_doc"))
      .collect().map(_.toSeq).toSet
    assert(gotStore == wantStore, "streamed store must equal batch first-sites")
    // law 2: each doc audited exactly once; novel ⟺ it IS its hash's
    // global first site
    def auditRows = spark.read.parquet(s"$dir/audit")
      .select(col("doc_id"), col("h0"), col("verdict"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val audit = auditRows
    assert(audit.length == allIds.size && audit.map(_._1).distinct.length == allIds.size)
    val firstDocs = wantStore.map(_(1).asInstanceOf[Long])
    audit.foreach { case (id, _, v) =>
      assert((v == "novel") == firstDocs.contains(id),
        s"doc $id verdict $v disagrees with global first-sites") }
    // law 3: at-least-once replay of the LAST batch (fresh stream, same
    // ingest id) reclassifies against the pre-batch store — audit and
    // store must come out identical, not self-poisoned by its own appends
    val before = (audit.toSet, gotStore)
    val stream2 = MemoryStream[Long]
    val q2 = StreamOps.introDedupStream(
      stream2.toDF().toDF("doc_id"), s"$dir/store", s"$dir/audit",
      batchIdBase = parts.size - 1L)
    stream2.addData(parts.last); q2.processAllAvailable()
    q2.stop()
    assert((auditRows.toSet, storeSet) == before,
      "replay must rewrite identically, never duplicate or self-poison")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming span masks equal the batch layout; replay rewrites, never duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val docs = docsDf.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_maskstream").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamOps.spanMaskStream(
      stream.toDF().toDF("doc_id", "source", "text"), s"$dir/masks")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    // replay the LAST batch (at-least-once delivery after a restart): a
    // fresh stream whose batchIdBase points at the last partition lands
    // the SAME ingest_batch — dynamic overwrite must rewrite it, never
    // append a duplicate mask set
    val stream2 = MemoryStream[(Long, String, String)]
    val q2 = StreamOps.spanMaskStream(
      stream2.toDF().toDF("doc_id", "source", "text"), s"$dir/masks",
      batchIdBase = parts.size - 1L)
    stream2.addData(parts.last); q2.processAllAvailable()
    q2.stop()
    val cols = Seq("doc_id", "source", "n_tok", "n_masked", "n_spans", "ck")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val got = canon(spark.read.parquet(s"$dir/masks"))
    val want = canon(graft.operators.TextQueries.spanMaskSignals(docsDf))
    assert(got == want, s"stream masks diverged: ${got.size} vs ${want.size}")
    // each doc masked exactly once despite the replayed batch
    val all = spark.read.parquet(s"$dir/masks").collect()
    assert(all.length == docs.size, s"replay must not duplicate: ${all.length}")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("streaming quality gates equal the batch per-doc signals, rollup included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val docs = docsDf.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_gatestream").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = StreamOps.qualityGateStream(
      stream.toDF().toDF("doc_id", "source", "text"), s"$dir/gates")
    parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    q.stop()
    val cols = Seq("doc_id", "source", "h_micro", "ttr_ppm", "rep4_ppm",
      "low_h", "high_rep")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val got = canon(spark.read.parquet(s"$dir/gates"))
    val want = canon(graft.operators.TextQueries.entropySignals(docsDf))
    assert(got == want, s"stream gates diverged: ${got.size} vs ${want.size}")
    assert(got.nonEmpty)
    // replay idempotence: each doc gated exactly once across partitions
    assert(got.size == got.map(_.head).size)
    // the q213 rollup over the streamed store equals the batch query —
    // every signal is per-doc, so a groupBy over the union IS the batch
    val rollup = spark.read.parquet(s"$dir/gates")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("low_h")).as("n_low_entropy"),
        sum(col("high_rep")).as("n_high_rep"),
        sum(greatest(col("low_h"), col("high_rep"))).as("n_flagged"),
        sum(col("h_micro")).as("h_sum"),
        sum(col("ttr_ppm")).as("ttr_sum"),
        sum(col("rep4_ppm")).as("rep4_sum"),
        sum(col("h_micro") * (col("doc_id") % 97 + 1)).as("h_checksum"))
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextQueries.q213EntropyQuality(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(rollup == batch, "streamed rollup must equal batch q213")
    graft.engine.Sessions.releasePinned(spark)
  }
}
