package graft.operators

import graft.QueryModule
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** One event for typed stateful processing (ts in epoch seconds). */
case class SessEvent(user_id: Long, event_id: Long, ts_s: Long, value_cents: Long)

/** One closed session produced by the imperative sessionizer. */
case class Session(
    user_id: Long, session_id: Long, n_events: Long, value_cents: Long,
    start_s: Long, end_s: Long)

/** Typed stateful operators (reference's user-closure surface, SURVEY.md
  * §2.7: `Aggregator`/`Ordering` plug-ins are its only "UDFs").
  *
  * q66 runs the same sessionization as q24 but imperatively inside
  * `KeyValueGroupedDataset.flatMapGroups` — per-user events are sorted and
  * folded with explicit mutable state, the exact state-machine a Structured
  * Streaming `flatMapGroupsWithState` sessionizer runs per key (the streaming
  * twin lives in graft.streaming and is exercised by its spec). One hash
  * exchange on user_id; group payloads are bounded by per-user activity, so
  * the in-memory sort per group holds at scale (a power user with millions of
  * events would need the window-function variant, q24).
  */
object StatefulQueries extends QueryModule {

  /** Fold one user's time-ordered events into sessions split at >600 s gaps.
    * Shared by the batch query below and the streaming sessionizer's spec as
    * the behavioral oracle. */
  def sessionize(userId: Long, events: Iterator[SessEvent]): Iterator[Session] = {
    val sorted = events.toIndexedSeq.sortBy(e => (e.ts_s, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[Session]
      var sid = 0L; var n = 0L; var cents = 0L
      var start = 0L; var last = Long.MinValue
      for (e <- sorted) {
        if (last == Long.MinValue || e.ts_s - last > 600) {
          if (n > 0) out += Session(userId, sid, n, cents, start, last)
          sid += 1; n = 0L; cents = 0L; start = e.ts_s
        }
        n += 1; cents += e.value_cents; last = e.ts_s
      }
      out += Session(userId, sid, n, cents, start, last)
      out.result().iterator
    }
  }

  /** q66 — imperative typed sessionization; oracle is the q24-equivalent SQL,
    * proving the stateful path computes exactly what the declarative windows
    * compute. */
  val q66StatefulSessions: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroups((uid, it) => sessionize(uid, it))
      .toDF()
      .orderBy(col("user_id"), col("session_id"))
  }

  def queries: Map[String, Q] = Map("q66_stateful_sessions" -> q66StatefulSessions)

  def oracles: Map[String, String] = Map(
    "q66_stateful_sessions" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
          CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM events),
      gaps AS (
        SELECT *, ts_s - lag(ts_s, 1) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s
        FROM e),
      marked AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 THEN 1 ELSE 0 END AS is_new
        FROM gaps),
      sess AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked)
      SELECT user_id, session_id, count(*) AS n_events,
        CAST(sum(value_cents) AS BIGINT) AS value_cents,
        min(ts_s) AS start_s, max(ts_s) AS end_s
      FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""")
}
