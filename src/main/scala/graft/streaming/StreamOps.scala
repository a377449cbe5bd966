package graft.streaming

import graft.operators.{SessEvent, Session}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The currently-open session for one user — the ONLY state the streaming
  * sessionizer keeps per key, so state size is O(users), not O(events). */
case class OpenSession(
    session_id: Long, n_events: Long, value_cents: Long,
    start_s: Long, last_s: Long)

/** SessEvent plus its event-time timestamp: the watermarked column must flow
  * INTO the stateful operator (projecting it away detaches the watermark and
  * event-time timeouts are rejected at analysis). */
case class SessEventW(
    user_id: Long, event_id: Long, ts_s: Long, value_cents: Long,
    ets: java.sql.Timestamp)

/** One mixed click/error event for the streaming as-of enrich twin. */
case class AsofEvent(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String)

/** Streaming as-of state: the single latest click per user — O(users)
  * state, like [[OpenSession]]. */
case class LastClick(c_ts: Long, click_id: Long)

/** One enriched error — batch q26/q148's exact output row shape. */
case class AsofHit(event_id: Long, user_id: Long,
    click_id: Option[Long], gap_us: Option[Long])

/** One incoming document for the streaming packer. */
case class PackDoc(shard: Long, doc_id: Long, n_tokens: Long)

/** Streaming packing state: the open sequence per shard — TWO integers. */
case class PackState(seq_idx: Long, fill: Long)

/** One doc→sequence assignment, emitted exactly once (Append mode). */
case class PackAssign(shard: Long, seq_idx: Long, doc_id: Long, n_tokens: Long)

/** Structured Streaming operators (SURVEY.md §2.7: absent from the reference,
  * declared engine-first).
  *
  * All transforms are written against unbounded Datasets: callers hand in
  * `spark.readStream...` sources and attach any sink. The specs drive them
  * with MemoryStream and assert equality with the batch twins (q35 hourly
  * buckets, q66 sessionization) — the engine treats streaming as incremental
  * execution of the same computation, exactly Structured Streaming's model.
  *
  * Scale: keyed state hash-distributes on the key; watermarks bound EVERY
  * state store here (window buckets, dedup ids, open sessions), which is the
  * difference between a pipeline that runs for a day and one that runs
  * forever at 100 TB/day.
  */
object StreamOps {

  /** Hourly per-type event counts/sums with a 2-hour watermark: the streaming
    * twin of AnalyticQueries.q35 (tumbling window ≡ date_trunc bucket). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("value_cents"))

  /** Streaming exact deduplication: at-least-once sources dedup to
    * exactly-once on the id column ALONE — `dropDuplicatesWithinWatermark`
    * collapses replays even when the source re-stamps event time (a replayed
    * id with a different ts is still a duplicate), while the watermark still
    * bounds dedup state to the lateness horizon. */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(idCol)

  /** Declarative streaming sessionization via the NATIVE session_window
    * operator — the built-in alternative to the typed stateful sessionizer
    * below for when per-session aggregates suffice. Gap "601 seconds" makes
    * the merge rule (new session at gap ≥ 601) identical to the batch split
    * at gap > 600; the emitted window is [min_ts, max_ts + gap), so
    * `end - 601` is the batch session's last-event time. Watermark bounds
    * session state; Append mode emits each closed session exactly once. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "601 seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("value_cents"))
      .select(col("user_id"),
        col("sw.start").cast("long").as("start_s"),
        col("sw.end").cast("long").as("end_s"),
        col("n_events"), col("value_cents"))

  /** Watermarked stream-stream INTERVAL join: each error event joined to the
    * same user's clicks in the preceding 10 minutes (funnel attribution).
    * Both sides carry watermarks and the join condition bounds event time in
    * BOTH directions, so the state store provably evicts rows once nothing
    * can match them anymore — the requirement that makes a two-unbounded-
    * stream join runnable forever. Called on static frames the watermark is
    * a no-op and this is a plain interval join, so the batch twin IS the
    * same code — the spec asserts both agree. */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("c_ts", "10 minutes")
    val e = errors.withWatermark("e_ts", "10 minutes")
    c.join(e,
      col("c_user") === col("e_user") &&
      col("e_ts") >= col("c_ts") &&
      col("e_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("c_user").as("user_id"), col("c_id"), col("e_id"),
        col("c_ts"), col("e_ts"))
  }

  /** LEFT OUTER variant of [[clickErrorJoin]]: every click emits, with null
    * error columns when no error follows within the window. The outer side
    * makes the watermark LOAD-BEARING for emission, not just eviction: a
    * click's null row can only emit once the global watermark (the MIN of
    * both streams' watermarks) proves no matching error can still arrive —
    * so results are exactly-once and never retracted, and unmatched rows
    * surface with bounded (watermark-delay) latency instead of waiting
    * forever. Same both-direction time bound as the inner join, which is
    * what Spark requires to run an outer stream-stream join at all. On
    * static frames this is a plain left interval join — the batch twin is
    * the same code; the spec asserts both agree, including the null rows. */
  def clickErrorJoinLeft(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("c_ts", "10 minutes")
    val e = errors.withWatermark("e_ts", "10 minutes")
    c.join(e,
      col("c_user") === col("e_user") &&
      col("e_ts") >= col("c_ts") &&
      col("e_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("c_id"), col("e_id"),
        col("c_ts"), col("e_ts"))
  }

  /** FULL OUTER variant of [[clickErrorJoin]], completing the stream-stream
    * join family (inner / left / full): every click AND every error emits —
    * matched pairs once, unmatched rows from EITHER side with nulls on the
    * other. Both null directions are watermark-gated: a click's null row
    * waits until the global watermark proves no error can still arrive in
    * its forward window, an error's null row until no click can still
    * arrive in its backward window — so emission is exactly-once with
    * bounded latency on both sides. `user_id` coalesces across sides
    * because either may be null. Same both-direction event-time bound as
    * the inner join (Spark's requirement for any outer stream-stream join);
    * on static frames this is a plain full interval join — the batch twin
    * is the same code. */
  def clickErrorJoinFull(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks.withWatermark("c_ts", "10 minutes")
    val e = errors.withWatermark("e_ts", "10 minutes")
    c.join(e,
      col("c_user") === col("e_user") &&
      col("e_ts") >= col("c_ts") &&
      col("e_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "full_outer")
      .select(coalesce(col("c_user"), col("e_user")).as("user_id"),
        col("c_id"), col("e_id"), col("c_ts"), col("e_ts"))
  }

  /** Stream-STATIC enrichment join: each micro-batch of events joins the
    * static dimension frame — the stateless member of the streaming join
    * family (no watermark, no state store; Spark replans the static side
    * per batch, picking up dimension updates for free on file sources).
    * The dimension is broadcast: enrichment dims are the canonical
    * broadcast-sized side, and keeping the stream side shuffle-free is what
    * lets a 100 TB/day event stream enrich at scan speed. Left join so
    * events with no dimension row survive with nulls (the production
    * default — dropping unmatched events silently is how funnels go
    * missing). On static frames this is a plain broadcast left join — the
    * batch twin is the same code. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** STREAMING incremental near-dup dedup over a persisted signature index:
    * foreachBatch drives [[graft.operators.DedupQueries.incrementalDedupBatch]]
    * — per micro-batch: land the docs in the partitioned doc store
    * (replay-idempotent), band-join the batch's map-side signatures against
    * the parquet index, verify with exact Jaccard, hand the flagged pairs to
    * `onPairs`, then append the batch's signatures to the index. All durable
    * state is the index + store; the state store holds nothing, so executor
    * memory is flat over an unbounded stream (each batch's pinned pair
    * blocks are freed the moment `onPairs` returns) and a restart resumes
    * from the index. On a CLEAN stream each near-dup pair surfaces once —
    * when its later doc arrives (restart-spec'd: a brand-new query over the
    * same store+index continues correctly). Delivery to `onPairs` is
    * AT-LEAST-ONCE, like foreachBatch itself: a failure replay re-invokes it
    * with the same batch's pairs (the store/index writes are idempotent via
    * dynamic partition overwrite, but emission is not), so `onPairs` must
    * write to an idempotent sink keyed by (batchId, i, j).
    *
    * Restart discipline: the store/index partitions are keyed by batch id,
    * so ids must never repeat against the same paths. With
    * `checkpointLocation` set (production), Structured Streaming itself
    * continues batch ids monotonically across restarts and `batchIdBase`
    * stays 0; for checkpoint-free restarts (tests, ad-hoc backfills) pass a
    * `batchIdBase` beyond every id already used — otherwise the replayed
    * id's dynamic overwrite, the very mechanism that makes failure replays
    * idempotent, would clobber a prior run's partition. */
  def incrementalDedupStream(docs: DataFrame, docStorePath: String,
      indexPath: String, batchIdBase: Long = 0L)
      (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (pairs, pairsPin) = graft.operators.DedupQueries.incrementalDedupBatch(
        batch, batchIdBase + batchId, docStorePath, indexPath)
      try onPairs(pairs, batchIdBase + batchId)
      finally pairsPin.unpersist(blocking = false)
    }.start()

  /** STREAMING incremental SEMANTIC dedup over the persisted cell index:
    * foreachBatch drives
    * [[graft.operators.SimilarityQueries.semanticDedupBatch]] — per
    * micro-batch of (vec_id, q, n2) vectors: assign against the STORED
    * centroids, pair-join within cells against the STORED corpus with the
    * at-least-one-side-new gate, hand the near-dup pairs to `onPairs`,
    * then append the batch's cell assignments. The symmetry claim of the
    * incremental tier (VERDICT r7 §missing-2): signature dedup (q74),
    * decontamination (q70/q81), and semantic dedup all ship the same
    * batch/streaming twin pair over the same durable index.
    *
    * Bootstrap [[graft.operators.SimilarityQueries.writeSemanticCellIndex]]
    * first — the index predates the stream. Delivery to `onPairs` is
    * at-least-once like foreachBatch itself; pairs are deterministic per
    * batch, so an idempotent sink keyed by (batchId, i, j) absorbs
    * replays. Restart discipline matches [[incrementalDedupStream]]: with
    * a checkpoint, Structured Streaming continues batch ids and
    * `batchIdBase` stays 0; checkpoint-free restarts must pass a base
    * beyond every id already used so the idempotent dynamic overwrite
    * cannot clobber a prior run's cell partition. */
  def semanticDedupStream(vectors: DataFrame, indexPath: String,
      batchIdBase: Long = 0L)
      (onPairs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (pairs, pairsPin) = graft.operators.SimilarityQueries.semanticDedupBatch(
        batch, batchIdBase + batchId, indexPath)
      try onPairs(pairs, batchIdBase + batchId)
      finally pairsPin.unpersist(blocking = false)
    }.start()

  /** STREAMING sub-document span dedup over the persisted span store:
    * foreachBatch drives [[graft.operators.DedupQueries.spanDedupBatch]] —
    * per micro-batch of (doc_id, text) documents: drop every 8-word block
    * whose text the store has already seen (or an earlier block of this
    * batch claims first), hand the per-doc surviving text to `onDocs`,
    * then append the batch's new block texts to the store. Completes the
    * incremental-twin symmetry for the span family (q115 batch ↔ this):
    * signature dedup, decontamination, semantic dedup, rolling DAU, and
    * span dedup all share the one durable-index ingest shape.
    *
    * Replay discipline is the rolling-DAU kind, not the batch-id kind: the
    * store is the FIRST-SITE REGISTRY of every span seen, so a failed
    * batch's re-append collapses under the min-site aggregate AND the
    * replayed batch reproduces its original output (its own sites are the
    * registered first sites) — no batch-id keying, no dynamic overwrite.
    * Delivery to `onDocs` is at-least-once like foreachBatch; outputs are
    * deterministic per batch given the store, so an idempotent sink keyed
    * by doc_id absorbs replays. */
  def spanDedupStream(docs: DataFrame, storePath: String)
      (onDocs: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onDocs(graft.operators.DedupQueries.spanDedupBatch(batch, storePath),
        batchId)
    }.start()

  /** STREAMING substring-duplicate coverage ingestion (q200's twin — the
    * last dedup tier to gain one): each micro-batch of (doc_id, text) runs
    * [[graft.operators.DedupQueries.substringDedupBatch]], appending newly
    * seen gram hashes to the first-site registry and newly proven
    * duplicated positions (including RETROACTIVE ones — a forward duplicate
    * covers its first site the moment the second occurrence arrives) to the
    * dup-site store. Serving
    * ([[graft.operators.DedupQueries.substringCoverageFromStore]]) reads
    * ONLY the distinct dup sites and replays batch q200's island merge —
    * the corpus position stream is never revisited. Replay idempotence is
    * the self-site-guard + serve-time-distinct algebra (spec-pinned), so no
    * batch-id bookkeeping is needed. */
  def substringDedupStream(docs: DataFrame, gramStorePath: String,
      dupSitesPath: String, L: Int = 30)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.operators.DedupQueries.substringDedupBatch(
        batch, gramStorePath, dupSitesPath, L)
    }.start()

  /** STREAMING intro dedup over the persisted keyframe-hash store (q223's
    * twin — the video member of the incremental family): each micro-batch
    * of doc ids classifies against every earlier batch's first-sites and
    * appends its own novel ones,
    * [[graft.operators.MultimodalQueries.keyframeBatchApply]]. Idempotence
    * is the batch-id partition discipline taken one step further than the
    * usual dynamic overwrite: the store probe reads ONLY partitions
    * strictly below the current ingest id, so an at-least-once replay
    * reclassifies against exactly the pre-batch store state instead of
    * mistaking its own appended hashes for dup_store. */
  def introDedupStream(docs: DataFrame, storePath: String, auditPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.MultimodalQueries.keyframeBatchApply(
        batch, storePath, auditPath, batchIdBase + batchId)
    }.start()

  /** STREAMING anomaly monitoring into the persisted daily-count store:
    * each micro-batch of (ts, event_type) events appends its per-day counts
    * via [[graft.operators.WindowQueries.anomalyBatchAppend]]; serving
    * ([[graft.operators.WindowQueries.anomalyFromStore]]) sums the per-batch
    * partials and runs batch q125's integer z-test window — events are
    * never revisited. Unlike the DAU store's register-max sketches, counts
    * double on replay, so idempotence is the batch-id dynamic-overwrite
    * discipline (q74's): with a checkpoint, Structured Streaming continues
    * batch ids and `batchIdBase` stays 0; checkpoint-free restarts must
    * pass a base beyond every id already used. */
  def anomalyStream(events: DataFrame, storePath: String,
      batchIdBase: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.WindowQueries.anomalyBatchAppend(
        batch, storePath, batchIdBase + batchId)
    }.start()

  /** STREAMING rolling-DAU ingestion into the persisted daily-sketch store:
    * each micro-batch of (user_id, ts) events appends its per-day HLL
    * sketches via
    * [[graft.operators.AnalyticQueries.dauSketchBatchAppend]]; serving
    * reads ONLY the store
    * ([[graft.operators.AnalyticQueries.dauFromSketchStore]]) and never
    * revisits events. The lightest durable-state discipline in the
    * incremental family: HLL union is register-max, so a failure replay
    * that re-appends a batch's sketches is absorbed by the merge algebra
    * itself — no batch-id keying, no dynamic overwrite, nothing to make
    * idempotent. Restarts need no bookkeeping for the same reason; the
    * spec pins streamed-store == batch-store estimates and replay
    * invariance. */
  /** STREAMING CDC ingestion into the persisted per-key partial store:
    * each micro-batch of change events appends its per-key partials via
    * [[graft.operators.AnalyticQueries.cdcBatchAppend]] (batch-id dynamic
    * partition overwrite — the counter sums need it; the latest-op struct
    * max alone would absorb replays); serving
    * ([[graft.operators.AnalyticQueries.cdcFromStore]]) collapses stored
    * partials with the SAME code path the batch query uses, so
    * store-served state == q139 on the union of batches by construction
    * of the merge algebra (max associative/commutative, sums partitioned
    * by batch). The log is never revisited. */
  def cdcApplyStream(events: DataFrame, storePath: String,
      batchIdBase: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.AnalyticQueries.cdcBatchAppend(
        batch, storePath, batchIdBase + batchId)
    }.start()

  def rollingDauStream(events: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.operators.AnalyticQueries.dauSketchBatchAppend(batch, storePath)
    }.start()

  /** STREAMING freshness/SLA monitor into the persisted per-type max-ts
    * store: each micro-batch appends its per-type register-max partial via
    * [[graft.operators.AnalyticQueries.freshnessBatchAppend]]; serving
    * ([[graft.operators.AnalyticQueries.freshnessFromStore]]) computes the
    * lag/staleness readout from the store alone. Max-merge absorbs
    * replays by algebra (the DAU-sketch discipline — no batch-id keying),
    * spec-pinned equal to batch q180 and replay-invariant. */
  def freshnessStream(events: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.operators.AnalyticQueries.freshnessBatchAppend(batch, storePath)
    }.start()

  /** STREAMING inverted-index ingest into the persisted posting-segment
    * store: each micro-batch of (doc_id, text) documents appends its
    * (term, block) segments via
    * [[graft.operators.TextQueries.postingsBatchAppend]]; serving
    * ([[graft.operators.TextQueries.postingsFromStore]]) rebuilds q166's
    * exact output by segment algebra (df/cf sums, sorted-union postings)
    * without ever revisiting a document — the retrieval-index member of
    * the incremental family (signatures q74, grams q81, cells q83, spans
    * q121, DAU sketches, CDC partials, MG counters). Idempotence is the
    * batch-id dynamic-overwrite discipline; segment merge is exact
    * because each doc lives in exactly one ingest batch. */
  def postingsStream(docs: DataFrame, storePath: String,
      batchIdBase: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.TextQueries.postingsBatchAppend(
        batch, storePath, batchIdBase + batchId)
    }.start()

  /** STREAMING heavy hitters into the persisted Misra–Gries store: each
    * micro-batch of keys appends its ≤ k-counter MG partial plus its row
    * count via [[graft.operators.AnalyticQueries.mgBatchAppend]] — O(k)
    * durable rows per batch, never the key space; serving
    * ([[graft.operators.AnalyticQueries.heavyHittersFromStore]]) merges
    * the partials under the PODS-2012 bound and reports each candidate
    * with a lower-bound count and a `confirmed` flag. The streaming twin
    * of batch q99 with the one honest difference spec-pinned: q99's second
    * exact pass recounts candidates, a stream cannot — so the serve
    * output is (superset candidates, sound confirmations) rather than the
    * exact set. Counter sums double on replay, so idempotence is the
    * batch-id dynamic-overwrite discipline (q125/q139's): with a
    * checkpoint, batch ids continue across restarts and `batchIdBase`
    * stays 0; checkpoint-free restarts must pass a base beyond every id
    * already used. */
  def heavyHitterStream(keyed: DataFrame, storePath: String,
      batchIdBase: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keyed.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.AnalyticQueries.mgBatchAppend(
        batch, storePath, batchIdBase + batchId)
    }.start()

  /** STREAMING decontamination over a persisted eval-gram index: each
    * micro-batch of corpus docs checks against the stored index
    * ([[graft.operators.TextQueries.writeEvalGramIndex]]) map-side and
    * hands its contaminated-doc report to `onHits`. Decontamination is
    * per-doc — NO cross-batch state, no doc store, nothing written per
    * batch — so this is the lightest member of the incremental family:
    * the eval index is the only durable state, batches are independent,
    * and the union of per-batch reports equals the full-corpus q70
    * (spec-asserted). Like foreachBatch itself, delivery to `onHits` is
    * at-least-once on failure replay; the report is deterministic per
    * batch, so an idempotent sink keyed by (batchId, doc_id) absorbs
    * replays. */
  def decontaminateStream(docs: DataFrame, indexPath: String)
      (onHits: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onHits(graft.operators.TextQueries.decontaminateAgainstIndex(
        batch, indexPath), batchId)
    }.start()

  /** STREAMING as-of enrich — the stateful twin of the batch as-of join
    * (q26 window composition / q148 native operator): every error event
    * emits immediately with the latest strictly-preceding click of the same
    * user, null-extended when none exists yet.
    *
    * Where the stream-stream interval join ([[clickErrorJoin]]) needs BOTH
    * sides buffered inside a watermark-bounded range, as-of needs exactly
    * ONE struct per user — the latest click — because "largest click time
    * below the error time" over an in-order stream is a running maximum.
    * That is the whole scale story: state O(users) forever, no range
    * buffer, no watermark-sized click retention.
    *
    * In-order contract (same as [[sessionizeStream]]): each batch's group
    * is sorted by (ts_us, event_id); across batches the caller feeds
    * event-time order. A tie click (c_ts == error ts) never matches —
    * strict semantics — and concurrent ties among clicks keep the max
    * event_id, exactly the batch twin's per-(user, ts) collapse. Non-click
    * non-error types flow through untouched, so the caller can feed the
    * raw event stream unfiltered. */
  def asofEnrichStream(events: Dataset[AsofEvent]): Dataset[AsofHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, AsofHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[AsofEvent], state: GroupState[LastClick]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = Seq.newBuilder[AsofHit]
          var last = state.getOption
          for (e <- sorted) {
            if (e.event_type == "error") {
              last match {
                case Some(c) if c.c_ts < e.ts_us =>
                  out += AsofHit(e.event_id, uid,
                    Some(c.click_id), Some(e.ts_us - c.c_ts))
                case _ => out += AsofHit(e.event_id, uid, None, None)
              }
            } else if (e.event_type == "click") {
              last = last match {
                case Some(c) if c.c_ts > e.ts_us => Some(c)
                case Some(c) if c.c_ts == e.ts_us =>
                  Some(LastClick(c.c_ts, math.max(c.click_id, e.event_id)))
                case _ => Some(LastClick(e.ts_us, e.event_id))
              }
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** STREAMING LM quality gate over the stored model (q192's twin): each
    * micro-batch of (doc_id, text) documents scores against the persisted
    * bigram/unigram count tables — [[graft.operators.TextQueries.lmScore]]
    * verbatim, so stream and batch scores are bit-identical — and lands
    * under its own `ingest_batch` partition in the score store (dynamic
    * overwrite: an at-least-once replay rewrites its partition instead of
    * duplicating, the q81/q121 discipline). The model is STATIC, so the
    * operator is stateless — no watermark, no state store, executor memory
    * flat over an unbounded stream; re-reading the store per batch picks
    * up a retrained model on the next batch for free (file-source replan,
    * the [[enrichWithDim]] property). `batchIdBase` contract as
    * [[incrementalDedupStream]]: with a checkpoint, ids continue
    * monotonically and the base stays 0. */
  def lmScoreStream(docs: DataFrame, lmStorePath: String, scoresPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      graft.operators.TextQueries.lmScore(
          batch.select(col("doc_id"), split(col("text"), " ").as("t")),
          s.read.parquet(lmStorePath + "/bigrams"),
          s.read.parquet(lmStorePath + "/unigrams"))
        .withColumn("ingest_batch", lit(batchIdBase + batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic").parquet(scoresPath)
      ()
    }.start()

  /** STREAMING language ID over the stored trigram profiles (q206's twin,
    * the [[lmScoreStream]] shape exactly): each micro-batch of
    * (doc_id, lang, text) documents classifies against the persisted
    * profile table — [[graft.operators.TextQueries.langIdScore]] verbatim,
    * so stream and batch predictions are bit-identical — and lands under
    * its own `ingest_batch` partition (dynamic overwrite: an
    * at-least-once replay rewrites its partition instead of duplicating).
    * The profile store is STATIC → stateless operator, flat executor
    * memory, and a retrained profile table is picked up on the next batch
    * for free (file-source replan). */
  def langIdStream(docs: DataFrame, profileStorePath: String, predsPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      graft.operators.TextQueries.langIdScore(
          batch.select(col("doc_id"), col("lang"), col("text")),
          s.read.parquet(profileStorePath + "/profiles"))
        .withColumn("ingest_batch", lit(batchIdBase + batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic").parquet(predsPath)
      ()
    }.start()

  /** STREAMING OOV audit over the stored vocab (q212's twin — the third
    * stateless stored-model scorer beside [[lmScoreStream]] and
    * [[langIdStream]]): each micro-batch of (doc_id, source, text)
    * documents audits against the persisted (id, token, cnt) vocab table —
    * [[graft.operators.TextQueries.vocabOovAudit]] verbatim over the
    * batch's token stream — and lands its per-source rollup under its own
    * `ingest_batch` partition (dynamic overwrite absorbs replays). Serving
    * sums the per-batch partial masses; OOV ppm recomputes from the summed
    * integers, so the served rate equals the batch audit exactly. The
    * vocab-drift alarm as a continuously-updated dashboard feed. */
  def vocabOovStream(docs: DataFrame, vocabStorePath: String, auditPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      graft.operators.TextQueries.vocabOovAudit(
          batch.select(col("doc_id"), col("source"),
            split(col("text"), " ").as("t")),
          s.read.parquet(vocabStorePath + "/vocab"))
        .withColumn("ingest_batch", lit(batchIdBase + batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic").parquet(auditPath)
      ()
    }.start()

  /** STREAMING quality gates (q213's twin — the stateless member with no
    * store at all: the signals are pure per-row functions, so this is the
    * simplest shape in the stored-model-scorer family): each micro-batch
    * of (doc_id, source, text) documents computes the per-doc
    * entropy/TTR/dup-4-gram signals and gate flags —
    * [[graft.operators.TextQueries.entropySignals]] verbatim, so stream
    * and batch gates are bit-identical — and lands the gated feed under
    * its own `ingest_batch` partition (dynamic overwrite absorbs
    * at-least-once replays). Downstream consumers read the flags as a
    * keep/drop feed; the batch q213 rollup equals a groupBy over the
    * union of all ingested partitions because every signal is per-doc. */
  def qualityGateStream(docs: DataFrame, gatesPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.TextQueries.entropySignals(
          batch.select(col("doc_id"), col("source"), col("text")))
        .withColumn("ingest_batch", lit(batchIdBase + batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic").parquet(gatesPath)
      ()
    }.start()

  /** STREAMING span-corruption mask feed (q220's twin): each micro-batch
    * of (doc_id, source, text) documents computes its md5-anchored mask
    * layout — [[graft.operators.TextQueries.spanMaskSignals]] verbatim —
    * and lands under its own `ingest_batch` partition (dynamic overwrite
    * absorbs at-least-once replays). The determinism theorem does the
    * heavy lifting: the SAME doc masks identically in any batch, on any
    * executor, after any restart, so a trainer consuming this feed
    * mid-epoch resumes with bit-identical targets — the q220 batch rollup
    * equals a groupBy over the union of all ingested partitions. */
  def spanMaskStream(docs: DataFrame, masksPath: String,
      batchIdBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.operators.TextQueries.spanMaskSignals(
          batch.select(col("doc_id"), col("source"), col("text")))
        .withColumn("ingest_batch", lit(batchIdBase + batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic").parquet(masksPath)
      ()
    }.start()

  /** Serve the cumulative per-source OOV audit from the streamed partial
    * store: sum the integer masses, recompute the ppm once — equal to the
    * batch audit over the union of all ingested batches. */
  def vocabOovFromStore(s: org.apache.spark.sql.SparkSession,
      auditPath: String): DataFrame =
    s.read.parquet(auditPath)
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("n_tokens"),
        org.apache.spark.sql.functions.sum(col("n_invocab")).as("n_invocab"),
        org.apache.spark.sql.functions.sum(col("id_checksum")).as("id_checksum"))
      .withColumn("oov_ppm",
        org.apache.spark.sql.functions.expr(
          "((n_tokens - n_invocab) * 1000000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("n_invocab"),
        col("oov_ppm"), col("id_checksum"))

  /** Streaming twin of q186's shard-local greedy sequence packing — the
    * CONTINUOUS shard writer: as documents arrive they append to their
    * shard's open training sequence, closing it when the next doc would
    * overflow the 256-token cap. State is [[PackState]] — two integers per
    * shard, forever — and each doc's (shard, seq_idx) assignment emits
    * exactly once in Append mode, so a downstream partitioned sink lays
    * out the same sequences the batch pass would. In-order contract as
    * [[sessionizeStream]]: each batch's group is sorted by doc_id; across
    * batches the caller feeds shard-writer order. Spec pins stream ==
    * batch q186 per-shard stats across micro-batch boundaries, oversize
    * docs included. */
  def packingStream(docs: Dataset[PackDoc], cap: Long = 256L): Dataset[PackAssign] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, it: Iterator[PackDoc], state: GroupState[PackState]) =>
          val sorted = it.toIndexedSeq.sortBy(_.doc_id)
          val out = Seq.newBuilder[PackAssign]
          var st = state.getOption
          for (d <- sorted) {
            st = st match {
              case Some(s) if s.fill + d.n_tokens <= cap =>
                Some(PackState(s.seq_idx, s.fill + d.n_tokens))
              case Some(s) => Some(PackState(s.seq_idx + 1, d.n_tokens))
              case None => Some(PackState(1L, d.n_tokens))
            }
            out += PackAssign(shard, st.get.seq_idx, d.doc_id, d.n_tokens)
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Gap between events that closes a session, and the session gap horizon
    * used for the event-time timeout (shared with the batch q24/q66). */
  private val GapS = 600L

  /** Per-user sessionization keeping ONLY the open session in state: events
    * extend or split it, closed sessions emit immediately, and the final
    * session of an idle user emits via EventTimeTimeout once the watermark
    * passes its gap horizon (`last_s + 601`) — so state is one small struct
    * per active user and Append-mode emits each session exactly once.
    *
    * In-order contract: events later than the watermark bound are the
    * caller's responsibility (the 10-minute allowed lateness here matches the
    * session gap); an event older than the open session's start is folded by
    * per-batch sort but cannot reopen an already-emitted session — the
    * standard streaming-sessionization tradeoff. `session_id` counts from 1
    * within one continuous residence in state: after a timeout evicts an
    * idle user, a returning user restarts at 1, so the durable session key
    * is (user_id, start_s) — session_id exists for batch-twin parity, where
    * a bounded input means exactly one residence. */
  def sessionizeStream(events: Dataset[SessEvent]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val withWm = events
      .withColumn("ets", timestamp_seconds(col("ts_s")))
      .withWatermark("ets", "10 minutes")
      .as[SessEventW]
    withWm
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEventW], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val o = state.get
            state.remove()
            Iterator(Session(uid, o.session_id, o.n_events, o.value_cents,
              o.start_s, o.last_s))
          } else {
            val sorted = it.toIndexedSeq.sortBy(e => (e.ts_s, e.event_id))
            val out = Seq.newBuilder[Session]
            var open = state.getOption
            for (e <- sorted) {
              open = open match {
                case Some(o) if e.ts_s - o.last_s > GapS =>
                  out += Session(uid, o.session_id, o.n_events, o.value_cents,
                    o.start_s, o.last_s)
                  Some(OpenSession(o.session_id + 1, 1L, e.value_cents, e.ts_s, e.ts_s))
                case Some(o) =>
                  // a watermark-admitted late event may arrive out of order
                  // across batches: never regress last_s (a regressed last_s
                  // would split the next on-time event into a spurious new
                  // session) and never advance start_s past the true start
                  Some(o.copy(n_events = o.n_events + 1,
                    value_cents = o.value_cents + e.value_cents,
                    start_s = math.min(o.start_s, e.ts_s),
                    last_s = math.max(o.last_s, e.ts_s)))
                case None =>
                  Some(OpenSession(1L, 1L, e.value_cents, e.ts_s, e.ts_s))
              }
            }
            open.foreach { o =>
              state.update(o)
              // close once the watermark proves no event can extend it
              state.setTimeoutTimestamp((o.last_s + GapS + 1) * 1000)
            }
            out.result().iterator
          }
      }
  }
}
