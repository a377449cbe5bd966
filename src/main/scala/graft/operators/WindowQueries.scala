package graft.operators

import graft.{Num, QueryModule}
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.7 / §7.2 step 4).
  *
  * The reference has zero window functions (exhaustive listing, SURVEY.md §2.7)
  * — they live above its shuffle layer. Here they are declared Spark-first:
  * every window is `partitionBy(key)` so the single hash exchange it plans is
  * the same shuffle the reference's machinery would serve, and rows within a
  * partition stream through one sort — no driver materialization. At 100 TB
  * the partition key (user_id / custkey) has ~uniform cardinality, so skew is
  * bounded; a global (unpartitioned) window is deliberately never used.
  *
  * All order keys include a unique tiebreaker (event_id / o_orderkey) so rank/
  * lag results are deterministic and oracle-comparable.
  */
object WindowQueries extends QueryModule {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  /** q20 — ranking family: row_number/rank/dense_rank per user by value. */
  val q20Rank: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), Num.cents(col("value")).as("value_cents"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("user_id"), col("rn"))
  }

  /** q21 — lag/lead: inter-event gap seconds per user along the time axis. */
  val q21LagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        (col("ts").cast("long") -
          lag(col("ts"), 1).over(w).cast("long")).as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q22 — sliding frame: moving sum/min/max of the last 3 events per user
    * (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). */
  val q22Moving: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        sum(Num.cents(col("value"))).over(w).as("mov_sum_cents"),
        min(Num.cents(col("value"))).over(w).as("mov_min_cents"),
        max(Num.cents(col("value"))).over(w).as("mov_max_cents"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q84 — time-RANGE frame: trailing one-hour event count and value per
    * user (`RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over epoch
    * seconds) — the frame kind q22's ROWS cannot express: the window spans
    * whatever number of events the last hour holds, including ALL ties on
    * the boundary second (peer semantics, identical in any SQL engine,
    * which is what keeps a tie-heavy event stream deterministic without a
    * unique-key order column). Same single hash exchange + one
    * partition-local sort as every other window here; Spark evaluates the
    * variable-width frame with two moving pointers, so cost stays linear
    * per partition regardless of how dense the hour is. */
  val q84RangeWindow: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-3600, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("ts_s"),
        Num.cents(col("value")).as("cents"))
      .select(col("user_id"), col("event_id"), col("ts_s"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("cents")).over(w).as("cents_1h"))
      .orderBy(col("user_id"), col("ts_s"), col("event_id"))
  }

  /** q87 — SCD TYPE-2 HISTORY build: turn a change stream (each order =
    * a new version of its customer's tracked value) into the
    * slowly-changing-dimension shape a warehouse serves — one row per
    * version carrying [valid_from, valid_to) and an is_current flag,
    * derived with a single `lead` over (entity, version order). This is
    * the temporal complement of q69's MERGE (which keeps only the latest
    * state): same single hash exchange on the entity key, one
    * partition-local sort, no self-join — the degenerate
    * effective-dating pattern that survives any history depth because
    * each row looks exactly one version ahead. Version order carries the
    * unique key as tiebreaker so same-day versions chain
    * deterministically. */
  val q87Scd2History: Q = (s, dir) => {
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("valid_from"), col("version_key"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("custkey"),
        Num.cents(col("o_totalprice")).as("value_cents"),
        col("o_orderdate").as("valid_from"),
        col("o_orderkey").as("version_key"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .orderBy(col("custkey"), col("valid_from"), col("version_key"))
  }

  /** q23 — cumulative frame: running order count + revenue per customer
    * (UNBOUNDED PRECEDING), over orders. */
  val q23CumSum: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_so_far"),
        sum(Num.cents(col("o_totalprice"))).over(w).as("cum_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q24 — sessionization (gaps-and-islands): a new session starts after a
    * >600 s silence; classic lag + cumulative-sum-of-breaks pattern. One
    * exchange on user_id serves both windows. */
  val q24Sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long"))
      .withColumn("is_new", when(col("gap_s").isNull || col("gap_s") > 600, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Num.cents(col("value"))).as("value_cents"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q94 — EVENT PATH ANALYSIS: the top within-session event-type sequences
    * ("view→click→purchase" and friends), the exploratory complement of the
    * fixed-stage funnel (q89). Sessions are q24's (600 s gap, (ts,
    * event_id) order); each session folds to ONE path string via
    * sort_array over (ts, event_id, type) structs — deterministic however
    * the rows arrive, and bounded by session length, never by user history
    * (the per-user-array trap q89's doc warns about is bounded here by the
    * session gap). Path frequencies are a count over the session frame
    * (rows = sessions, not events), and the top-15 cut uses the total
    * order (n DESC, path ASC) so the boundary is deterministic. At 100 TB:
    * two user-keyed window passes + one path-keyed aggregate, all partial-
    * aggregated; the path cardinality (≤ |type|^len) is the only growth
    * axis and it caps the output, not the shuffle. */
  val q94PathAnalysis: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long"))
      .withColumn("is_new", when(col("gap_s").isNull || col("gap_s") > 600, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(expr("array_join(transform(sort_array(collect_list(" +
        "struct(ts, event_id, event_type))), x -> x.event_type), '->')").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("user_id")).as("user_checksum"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  /** q156 — window NAVIGATION family: percent_rank / cume_dist /
    * nth_value / last_value over the segment-balance ordering — the §2.7
    * window surface q20 (ranks) and q25 (ntile/first) leave uncovered.
    * The relative-position functions emit as FLOORED micro-unit integers:
    * both engines compute the identical IEEE double ((r−1)/(n−1), r/n)
    * and floor is deterministic on it, so the oracle compare stays exact
    * without shipping raw doubles. nth/last run over the explicit
    * full-partition frame (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING)
    * — the default frame would make last_value mean "current row", the
    * classic window gotcha, declared away here. */
  val q156WindowNav: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Num.cents(col("c_acctbal")), col("c_custkey"))
    val wf = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Num.cents(col("c_acctbal")), col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        floor(percent_rank().over(w) * 1000000d).cast("long").as("pr_micro"),
        floor(cume_dist().over(w) * 1000000d).cast("long").as("cd_micro"),
        nth_value(col("c_custkey"), 3).over(wf).as("third_poorest"),
        last(col("c_custkey")).over(wf).as("richest"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** q157 — SEQUENCE PATTERN MATCH over session paths (MATCH_RECOGNIZE-
    * lite): how many sessions/users exhibit each behavioural regex —
    * "viewed then eventually purchased", "began with signup", "ended in
    * error", "double-click" — the declarative funnel q89 hard-codes and
    * q94 only surfaces when the exact sequence is frequent enough for its
    * top-k. Paths are q94's deterministic per-session fold; each session
    * row fans map-side to the 4 patterns (literal array explode — pattern
    * count is the fan factor, never a join), regex evaluates in the scan,
    * and the count agg carries ≤ |patterns| groups. Patterns stay in the
    * RE2 ∩ java.util.regex common dialect (literals, `.*`, anchors) so
    * engine and oracle agree by construction. */
  val q157SequenceMatch: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pats = Seq("view->.*purchase", "^signup", "error$", "click->click")
    events(s, dir)
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long"))
      .withColumn("is_new", when(col("gap_s").isNull || col("gap_s") > 600, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(expr("array_join(transform(sort_array(collect_list(" +
        "struct(ts, event_id, event_type))), x -> x.event_type), '->')").as("path"))
      .select(col("user_id"), col("path"),
        explode(array(pats.map(lit): _*)).as("pattern"))
      .filter(expr("path rlike pattern"))
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("pattern"))
  }

  /** q25 — ntile + percent_rank: account-balance quartiles per market segment. */
  val q25Ntile: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(Num.cents(col("c_acctbal")), col("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        first(col("c_custkey")).over(w).as("poorest_custkey"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** q26 — as-of join (operator Spark lacks natively, composed per the
    * engine's preference rules): each 'error' event joined to the same
    * user's most recent strictly-earlier 'click'. Implemented as union-tag +
    * `last(_, ignoreNulls)` over one (user, time, tag) window — a single hash
    * exchange, versus the range-join explosion a naive inequality join plans.
    * Errors sort before clicks at equal timestamps, which is exactly strict
    * "<" semantics; clicks are deduped per (user, μs) for determinism.
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  val q26AsofJoin: Q = (s, dir) => {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us"), lit(1).as("tag"),
        col("click_id"), lit(null).cast("long").as("event_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        lit(null).cast("long").as("click_id"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.union(errors)
      .withColumn("m_click", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts",
        last(when(col("tag") === 1, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("event_id"), col("user_id"), col("m_click").as("click_id"),
        (col("ts_us") - col("m_ts")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q27 — time-series gap filling (resampling): every hour in each user's
    * active span, zero-filled where no events occurred. sequence+explode
    * generates the dense axis per user (rows ∝ users × span — bounded), then
    * one left join against the hourly aggregate; both sides partition on
    * user_id so the join co-locates. */
  val q27GapFill: Q = (s, dir) => {
    val ev = events(s, dir)
    val hourly = ev.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val spans = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    spans.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** q125 — ROLLING Z-SCORE ANOMALY DETECTION over daily per-type event
    * volumes: each (event_type, day) compares its count x against the
    * trailing 7-day window's mean/variance, flagging |z| > 3 — the
    * monitoring primitive that pages before a pipeline poisons a day of
    * training data. The z-test is INTEGER-EXACT by cross-multiplication:
    * with n, S=Σx, Q=Σx² over the trailing RANGE frame (calendar-day
    * range, so gaps cannot misalign the window the way a ROWS frame
    * would), |x−μ| > 3σ ⇔ (n·x − S)² > 9·(n·Q − S²) — no division, no
    * doubles, identical on any engine. Flag only on full 7-day windows
    * (n = 7): a 3-day-old series has no baseline to betray.
    *
    * Scale: ONE event-volume aggregation to daily counts (map-side
    * partial), then the window runs over type×day rows — thousands, not
    * billions; state per partition is the 7-row frame. */
  /** The z-test window over any (event_type, day_num, n_events) daily-count
    * frame — shared by the batch query and the store-serving streaming twin
    * ([[graft.streaming.StreamOps.anomalyStream]]). */
  private[graft] def anomalyFlags(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("win_sumsq",
        coalesce(sum(col("n_events") * col("n_events")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        (col("win_n") === 7 &&
          (col("win_n") * col("n_events") - col("win_sum")) *
            (col("win_n") * col("n_events") - col("win_sum")) >
          (col("win_n") * col("win_sumsq") -
            col("win_sum") * col("win_sum")) * 9).cast("long"))
      .orderBy(col("event_type"), col("day_num"))
  }

  /** Daily per-type counts of an events frame (ts already a timestamp). */
  private[graft] def dailyCounts(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day_num"))
      .agg(count(lit(1)).as("n_events"))

  val q125RollingAnomaly: Q = (s, dir) =>
    anomalyFlags(dailyCounts(Tables.load(s, dir, "events")))

  /** One ingest step of the STREAMING anomaly monitor: append this batch's
    * (event_type, day, count) rows to the daily-count store, keyed by
    * ingest batch. Counts don't absorb replays the way HLL's register-max
    * does (a re-appended batch would double-count), so idempotence comes
    * from the q74 discipline instead: the batch id is a partition column
    * and the write is a DYNAMIC partition overwrite — a replayed batch
    * overwrites exactly its own partition. */
  def anomalyBatchAppend(events: org.apache.spark.sql.DataFrame,
      storePath: String, batchId: Long): Unit =
    dailyCounts(events)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic").parquet(storePath)

  /** Serve anomaly flags ENTIRELY from the daily-count store: per-batch
    * partials sum to one count per (type, day) — count addition is the
    * merge algebra, valid across any batch split — then the same z-test
    * window as batch q125 runs over day-grain rows. Raw events are never
    * revisited; the store holds one row per (type, day) per ingest batch. */
  def anomalyFromStore(s: org.apache.spark.sql.SparkSession, storePath: String)
      : org.apache.spark.sql.DataFrame =
    anomalyFlags(s.read.parquet(storePath)
      .groupBy(col("event_type"), col("day_num"))
      .agg(sum(col("n_events")).as("n_events")))

  /** Serve CUSUM changepoint state (q153) from the SAME daily-count store
    * the streaming anomaly monitor maintains — one persisted day-grain
    * store, three monitors (z-score q125, and this level-shift detector):
    * per-batch partials sum to day grain (count addition is the merge
    * algebra), then [[cusumStats]] runs unchanged. The streaming twin of
    * q153 is therefore collapse∘store by construction, exactly the q139
    * CDC discipline. */
  def cusumFromStore(s: org.apache.spark.sql.SparkSession, storePath: String)
      : org.apache.spark.sql.DataFrame =
    cusumStats(s.read.parquet(storePath)
      .groupBy(col("event_type"), col("day_num"))
      .agg(sum(col("n_events")).as("n_events")))
      .orderBy(col("event_type"), col("day_num"))

  /** q155 — TIME-weighted average value per user (TWAP): each event's value
    * holds until the user's next event (step-function semantics), so the
    * average weights every observation by how LONG it was in force —
    * the tick-data aggregate where q141's EWM weights by recency and a
    * plain avg() weights every tick equally (a burst of cheap ticks then
    * drags the mean even if it lasted seconds). One lead() per user gives
    * each interval's duration; the weighted sum collapses in the same
    * user-keyed exchange the window planned — no second shuffle. Integer-
    * exact: cents × whole-second durations summed in BIGINT, one micro-unit
    * division at the end; the final open-ended observation carries no
    * duration (excluded by the lead null), zero-length intervals (same-
    * second ticks) contribute no weight, and all-simultaneous users
    * (span 0) are reported with a NULL twap rather than a division blowup. */
  val q155Twap: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"), Num.cents(col("value")).as("cents"))
      .withColumn("next_ts", lead(col("ts_s"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("next_ts") - col("ts_s")).as("span_s"),
        sum(col("cents") * (col("next_ts") - col("ts_s"))).as("wsum"))
      .select(col("user_id"), col("n_intervals"), col("span_s"),
        when(col("span_s") > 0, expr("wsum * 1000000 div span_s"))
          .as("twap_micro_cents"))
      .orderBy(col("user_id"))
  }

  /** q158 — OLS TREND LINE per event type over the daily series: slope and
    * intercept of the least-squares fit y = a + b·x (x = day offset from
    * the global first day) — the "is this metric growing and how fast"
    * readout that completes the monitoring tier's descriptive side (q141
    * smooths, q153 alarms on shifts, this quantifies drift). ONE
    * aggregation collects the five moments (n, Σx, Σy, Σxy, Σx²) per type
    * — the same single-pass moment shape as q131's CUPED — then both
    * closed forms are integer micro-unit divisions of cross-multiplied
    * BIGINTs: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept =
    * (ΣyΣx² − ΣxΣxy)/same-denominator (its own closed form, NOT chained
    * through the rounded slope). Both engines truncate integer division
    * toward zero (`div` / `//`), so signs are safe. A type with every
    * observation on one day (zero denominator) reports NULLs. */
  val q158TrendSlope: Q = (s, dir) => {
    val daily = dailyCounts(Tables.load(s, dir, "events"))
    val d0 = daily.agg(min(col("day_num")).as("d0"))
    daily.crossJoin(broadcast(d0))
      .withColumn("x", col("day_num") - col("d0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("n_events")).as("sy"),
        sum(col("x") * col("n_events")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("event_type"), col("n"),
        when(col("den") =!= 0,
          expr("(n * sxy - sx * sy) * 1000000 div den")).as("slope_micro"),
        when(col("den") =!= 0,
          expr("(sy * sxx - sx * sxy) * 1000000 div den")).as("intercept_micro"))
      .orderBy(col("event_type"))
  }

  /** CUSUM core over a (event_type, day_num, n_events) daily frame —
    * spec-driven on crafted shifted series, fixture-driven by q153.
    *
    * The page test S_i = max(0, S_{i-1} + dev_i) is a per-row recursion no
    * window function expresses directly; the engine uses the exact
    * prefix-sum identity S_i = P_i − least(0, min_{j≤i} P_j) (P = running
    * sum of deviations), turning the recursion into TWO stacked windows
    * over one exchange + one sort (Catalyst collapses same-spec windows).
    * Integer-exact: dev is scaled by 10·D (D = baseline days), so
    * dev_num = 10·D·x − 11·B encodes x − μ − μ/10 (slack k = 10% of the
    * baseline mean μ = B/D) and the h = 4μ alarm threshold cross-multiplies
    * to cusum_num > 40·B — no IEEE accumulation anywhere. */
  private[graft] def cusumStats(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val d0 = daily.agg(min(col("day_num")).as("d0"))
    val base = daily.crossJoin(broadcast(d0))
      .filter(col("day_num") < col("d0") + 10)
      .groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("b"), count(lit(1)).as("dd"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(base), "event_type")
      .withColumn("dev_num",
        lit(10L) * col("dd") * col("n_events") - lit(11L) * col("b"))
      .withColumn("p", sum(col("dev_num")).over(w))
      .withColumn("cusum_num",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .select(col("event_type"), col("day_num"), col("n_events"),
        col("cusum_num"),
        (col("cusum_num") > lit(40L) * col("b")).cast("long").as("flag"))
  }

  /** q153 — CUSUM changepoint detection on daily per-type event volumes:
    * the sequential level-shift detector (Page's test) completing the
    * monitoring tier — q125 flags single outlier days against a trailing
    * z-score, q142 robustifies it, but a persistent SMALL shift (say
    * +15% forever) never trips a per-day threshold: CUSUM accumulates
    * drift above a slack and alarms when the accumulated excess crosses
    * h, detecting sustained shifts fast in proportion to their size.
    * Baseline μ from the first 10 days; see [[cusumStats]] for the
    * window-identity and integer-exact scaling. On the uniform fixture
    * the flags stay 0 (no shift exists — the statistic itself is what the
    * oracle pins); the spec plants a +60% shift and watches it alarm. */
  val q153Cusum: Q = (s, dir) =>
    cusumStats(dailyCounts(Tables.load(s, dir, "events")))
      .orderBy(col("event_type"), col("day_num"))

  /** q154 — classical seasonal decomposition of the same daily series:
    * x = trend + seasonal + residual, with trend the centered 7-day moving
    * average (NULL where the frame is incomplete — honest edges), seasonal
    * the day-of-week mean minus the overall mean (the weekly profile), and
    * the residual what monitoring should actually alarm on: q125/q142/q153
    * all read raw daily counts, so a true weekday dip reads as anomaly;
    * deseasonalizing first is the standard fix. Micro-unit integer
    * divisions on non-negative numerators only (q141's discipline —
    * truncating `div` and floor `//` agree on non-negatives), weekday from
    * day_num arithmetic ((day_num + 4) % 7 — engine-neutral, no locale or
    * WEEK_START dependence). One exchange on event_type serves the DOW
    * aggregation, the window, and the per-type totals alike. */
  val q154SeasonalDecompose: Q = (s, dir) => {
    val daily = dailyCounts(Tables.load(s, dir, "events"))
    val dow = daily
      .withColumn("weekday", (col("day_num") + 4) % 7)
    val dowStats = dow.groupBy(col("event_type"), col("weekday"))
      .agg(sum(col("n_events")).as("dow_sum"), count(lit(1)).as("m"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("tot"), count(lit(1)).as("nd"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rowsBetween(-3, 3)
    dow
      .withColumn("sum7", sum(col("n_events")).over(w7))
      .withColumn("cnt7", count(lit(1)).over(w7))
      .join(broadcast(dowStats), Seq("event_type", "weekday"))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("dow_mean_micro", expr("dow_sum * 1000000 div m"))
      .withColumn("overall_micro", expr("tot * 1000000 div nd"))
      .withColumn("trend_micro",
        when(col("cnt7") === 7, expr("sum7 * 1000000 div 7")))
      .withColumn("seasonal_micro", col("dow_mean_micro") - col("overall_micro"))
      .withColumn("resid_micro",
        col("n_events") * 1000000L - col("trend_micro") - col("seasonal_micro"))
      .select(col("event_type"), col("day_num"), col("n_events"),
        col("trend_micro"), col("seasonal_micro"), col("resid_micro"))
      .orderBy(col("event_type"), col("day_num"))
  }

  /** q141 — EXPONENTIALLY-WEIGHTED trailing smoothing of daily per-type
    * event volumes: each report day's smoothed rate halves the weight per
    * day of age over a 7-day horizon (w = 2^(6−lag)) — the monitoring
    * smoother that damps weekday noise faster than a flat 7-day mean while
    * still forgetting spikes geometrically. INTEGER-EXACT end to end:
    * weights are powers of two (shiftleft), numerator/denominator are
    * BIGINT sums, and the smoothed value is ONE integer division to micro
    * units — no IEEE pow/avg whose partial-sum order an engine could
    * reorder. Days absent from the data contribute neither weight nor
    * mass (self-describing denominator).
    *
    * Scale: q96's shape — ONE event-volume aggregation to daily counts,
    * then each (type, day) row fans map-side to the ≤ 7 report days it
    * serves (an equi-join on the report day, never a window over event
    * rows); the exchange carries type×day rows. */
  val q141EwmSmoothing: Q = (s, dir) => {
    val daily = dailyCounts(Tables.load(s, dir, "events"))
    val days = daily.select(col("day_num").as("d")).distinct()
    daily
      .select(col("event_type"), col("n_events"),
        explode(expr("sequence(day_num, day_num + 6)")).as("report_day"),
        col("day_num"))
      .withColumn("w", expr("cast(shiftleft(1, 6 - cast(report_day - day_num as int)) as long)"))
      .drop("day_num")
      .join(broadcast(days), col("report_day") === col("d"), "left_semi")
      .groupBy(col("event_type"), col("report_day"))
      .agg(sum(col("n_events") * col("w")).as("ewm_num"),
        sum(col("w")).as("ewm_den"))
      .withColumn("ewm_micro", expr("ewm_num * 1000000 div ewm_den"))
      .orderBy(col("event_type"), col("report_day"))
  }

  /** q142 — ROBUST (median/MAD) rolling anomaly flags: q125's z-score
    * twin with the breakdown point the mean lacks — one poisoned day in
    * the trailing week corrupts a mean/σ baseline (masking the very
    * anomaly it should catch), while the median and the median absolute
    * deviation ignore it. Trailing 7-day window per (type, day): med =
    * 4th order statistic, MAD = median of |xᵢ − med|, flag when
    * |x − med| · 10⁴ > 44478 · MAD — the 3·1.4826·MAD rule
    * cross-multiplied to exact integers (1.4826 ≈ Φ⁻¹-consistency for
    * the normal). Flags only on full windows; MAD = 0 (constant week)
    * flags any deviation, the degenerate case handled identically in
    * both engines by the same integer comparison.
    *
    * Scale: the window's collect_list runs over the TYPE×DAY frame (7
    * small integers per row), not events — the only event-volume work is
    * the daily-count aggregation q125 already bounded. */
  /** The median/MAD window over any (event_type, day_num, n_events) daily
    * frame — separated from the fixture binding so specs can drive crafted
    * series (a poisoned baseline) through the exact production logic. */
  private[graft] def madFlags(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-7, -1)
    daily
      .withColumn("win", collect_list(col("n_events")).over(w))
      .withColumn("med", when(size(col("win")) === 7,
        element_at(array_sort(col("win")), 4)))
      .withColumn("mad", when(size(col("win")) === 7,
        element_at(array_sort(expr("transform(win, v -> abs(v - med))")), 4)))
      .withColumn("is_anomaly",
        (size(col("win")) === 7 &&
          abs(col("n_events") - col("med")) * 10000 > col("mad") * 44478)
          .cast("long"))
      .select(col("event_type"), col("day_num"), col("n_events"),
        col("med"), col("mad"), col("is_anomaly"))
      .orderBy(col("event_type"), col("day_num"))
  }

  val q142MadAnomaly: Q = (s, dir) =>
    madFlags(dailyCounts(Tables.load(s, dir, "events")))

  /** q145 — MARKOV TRANSITION MATRIX over per-user event streams: counts
    * and first-order probabilities of consecutive event-type transitions —
    * the aggregate complement of q94's literal top paths (q94 surfaces
    * whole sequences; this estimates the chain that generates them, the
    * input to next-event prediction and to spotting broken flows — a
    * view→error rate jump pages someone). One user-keyed window pass (lag
    * by (ts, event_id) — q112's deterministic order) emits transition
    * pairs map-side; the count aggregation is the only event-volume
    * exchange and its output is ≤ |types|² rows, over which the row-total
    * window and the micro-unit division are free. Probabilities are
    * integer micro units (count·10⁶ div row-total — exact). */
  val q145MarkovTransitions: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wPrev = Window.partitionBy(col("prev"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(wPrev))
      .withColumn("p_micro", expr("n * 1000000 div row_total"))
      .orderBy(col("prev"), col("next"))
  }

  /** q148 — the SAME as-of join as q26, executed by the engine's custom
    * Catalyst operator ([[graft.plans.AsOfJoinExec]]) instead of the
    * union-tag window composition: a custom LogicalPlan planned by an
    * injected SparkStrategy into a hash-clustered, (key, time)-sorted
    * single-pass partition merge — the §7.3(c) whole-operator tier,
    * exercised end-to-end through the driver's oracle gate (DuckDB's
    * native ASOF LEFT JOIN, the identical SQL q26 checks against).
    * Output/column contract identical to q26 by construction; the spec
    * additionally pins row-for-row equality between the two engines'
    * paths and that the executed plan contains AsOfJoinExec. */
  val q148AsofNative: Q = (s, dir) => {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        col("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    graft.plans.AsOf.join(errors, clicks, Seq("user_id" -> "c_user"),
        "ts_us", "c_ts")
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts_us") - col("c_ts")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q149 — point-in-time (SCD2) dimension lookup: every lineitem resolves
    * the customer's order-version effective AT its ship day, via the native
    * as-of operator in NON-STRICT mode (`r.t <= l.t` — the SCD2 convention
    * where a version starting on the fact's day applies; 278 fixture rows
    * land exactly on a version boundary, so strict/non-strict genuinely
    * diverge here). The dimension is q87's version chain collapsed to one
    * row per (custkey, effective-day) with `max_by` picking the winning
    * version. Two shuffles total at any scale: the fact-side orderkey
    * equi-join, then the operator's own custkey exchange — the version
    * chain is ~orders-sized but the as-of merge streams both sides once,
    * no per-key buffering, so a 100 TB fact table rides the same plan. */
  val q149PitJoin: Q = (s, dir) => {
    val epoch = to_date(lit("1970-01-01"))
    val versions = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("v_custkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("from_day"))
      .agg(max(col("o_orderkey")).as("version_key"),
        max_by(Num.cents(col("o_totalprice")), col("o_orderkey"))
          .as("ver_value_cents"))
    val facts = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("o_custkey").as("custkey"),
        datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"))
    graft.plans.AsOf.join(facts, versions, Seq("custkey" -> "v_custkey"),
        "ship_day", "from_day", strict = false)
      .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
        col("ship_day"), col("version_key"), col("ver_value_cents"),
        (col("ship_day") - col("from_day")).as("age_days"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q150 — q148's as-of with a TOLERANCE: an error only attributes to the
    * last preceding click if the gap is within 48 h (median fixture gap is
    * ~34 h, so ~half the matches null out — the bound genuinely bites).
    * Tolerance is enforced inside the merge: the candidate is already the
    * nearest preceding click, so one comparison per left row decides —
    * identical result to a post-join null-out, without re-projecting. */
  val q150AsofTolerance: Q = (s, dir) => {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        col("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    graft.plans.AsOf.join(errors, clicks, Seq("user_id" -> "c_user"),
        "ts_us", "c_ts", strict = true, tolerance = Some(172800000000L))
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts_us") - col("c_ts")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q151 — FORWARD as-of: each error matched to the NEXT click strictly
    * after it (time-to-recovery attribution). Runs through
    * [[graft.plans.AsOf.joinForward]] — forward(t) = backward(-t), so the
    * identical merge exec serves both directions; DuckDB expresses it
    * natively as `ASOF LEFT JOIN ... ON l.t < r.t`. */
  val q151AsofForward: Q = (s, dir) => {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        col("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    graft.plans.AsOf.joinForward(errors, clicks, Seq("user_id" -> "c_user"),
        "ts_us", "c_ts")
      .select(col("event_id"), col("user_id"),
        col("click_id").as("next_click_id"),
        (col("c_ts") - col("ts_us")).as("lead_us"))
      .orderBy(col("event_id"))
  }

  /** q164 — q148's as-of through the BROADCAST physical strategy: the
    * click dimension ships whole (BroadcastExchange + per-partition
    * hash-of-sorted-arrays index, binary search per error) and the error
    * side pays ZERO exchanges — the as-of analogue of broadcast-hash vs
    * sort-merge, which at a 100 TB fact table IS the operator's whole
    * cost. One oracle (DuckDB ASOF), three physical engines now: window
    * composition (q26), partition merge (q148), broadcast index (this);
    * the spec additionally pins merge == broadcast on randomized tables
    * and that the broadcast plan contains no hash exchange. */
  val q164AsofBroadcast: Q = (s, dir) => {
    val ev = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        col("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    graft.plans.AsOf.join(errors, clicks, Seq("user_id" -> "c_user"),
        "ts_us", "c_ts", broadcast = Some(true))
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts_us") - col("c_ts")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q167 — 2-D SKYLINE (Pareto frontier): the orders no other order
    * strictly beats on BOTH price and recency — the classic multi-objective
    * shortlist (Börzsönyi et al., "The Skyline Operator", ICDE 2001)
    * recast as ONE sort + ONE window pass instead of the textbook
    * quadratic self-anti-join: sorted by price DESC, a row is dominated
    * iff some strictly-higher-priced row has a strictly-later date, i.e.
    * iff max(date) over the RANGE frame (unbounded, price+1] exceeds its
    * own date. The RANGE (not ROWS) frame makes price TIES non-dominating
    * by construction, which is exactly strict-both-dims dominance.
    *
    * Scale shape: a LOCAL skyline pre-prune runs map-side first — each
    * input partition sorts locally (no exchange) and drops every row some
    * same-partition row strictly beats on both dims. Strict dominance is
    * transitive, so a locally-dominated row is globally dominated AND its
    * dominator survives to keep dominating across partitions — the global
    * skyline over survivors equals the global skyline over all rows
    * (law-tested). The global pass (`Window.orderBy` with no partitionBy)
    * IS a single-partition funnel — one task sees every survivor — which
    * is why the pre-prune is the whole scale story: the funnel's input is
    * each partition's own local skyline (typically a handful of rows),
    * not the table. Measured at sf0.1 (`Dev skyprune`): 150 000 orders →
    * 76 rows enter the single-partition exchange (1974× reduction). */
  /** Strict-dominance 2-D skyline core: keep rows where no other row is
    * strictly greater on BOTH `p` and `d` (law-tested against the brute
    * quadratic filter on arbitrary tables). `p` and `d` must be LongType;
    * rows null on either dim skip the local prune (conservative) and get
    * the same treatment as before in the global pass. */
  private[graft] def skyline2d(df: org.apache.spark.sql.DataFrame,
      p: String, d: String): org.apache.spark.sql.DataFrame = {
    val frontier = Window.orderBy(col(p).desc)
      .rangeBetween(Window.unboundedPreceding, -1L)
    localSkylineSurvivors(df, p, d)
      .withColumn("__mx", max(col(d)).over(frontier))
      .filter(col("__mx").isNull || col("__mx") <= col(d))
      .drop("__mx")
  }

  /** Map-side local skyline: within each input partition (no exchange), drop
    * rows some same-partition row strictly beats on both dims. Rows arrive
    * p DESC after the partition-local sort; `maxD` tracks max(d) over
    * STRICTLY-higher-p rows (equal-p groups fold into it only once p drops,
    * so ties never dominate each other — the same strictness the global
    * RANGE frame encodes). */
  private[graft] def localSkylineSurvivors(df: org.apache.spark.sql.DataFrame,
      p: String, d: String): org.apache.spark.sql.DataFrame = {
    val schema = df.schema
    val pi = schema.fieldIndex(p)
    val di = schema.fieldIndex(d)
    require(schema(pi).dataType == org.apache.spark.sql.types.LongType &&
      schema(di).dataType == org.apache.spark.sql.types.LongType,
      s"skyline2d dims must be bigint, got ${schema(pi).dataType}/${schema(di).dataType}")
    df.sortWithinPartitions(col(p).desc)
      .mapPartitions { it =>
        var maxD = Long.MinValue
        var groupP = 0L
        var groupMax = Long.MinValue
        var started = false
        it.filter { row =>
          if (row.isNullAt(pi) || row.isNullAt(di)) true
          else {
            val pv = row.getLong(pi)
            val dv = row.getLong(di)
            if (!started || pv != groupP) {
              if (started && groupMax > maxD) maxD = groupMax
              started = true; groupP = pv; groupMax = Long.MinValue
            }
            if (dv > groupMax) groupMax = dv
            maxD <= dv
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  val q167Skyline: Q = (s, dir) =>
    skyline2d(
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          Num.cents(col("o_totalprice")).as("price_cents"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("date_us")),
      "price_cents", "date_us")
      .select(col("o_orderkey"), col("price_cents"), col("date_us"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))

  /** q182 — CLICK→PURCHASE LATENCY PERCENTILES: how long after their last
    * click do users buy, by day of week — the conversion-latency readout
    * marketing reads next to the funnel (q89). Each purchase resolves its
    * latest strictly-preceding click through the NATIVE as-of operator
    * (q148's merge exec: one clustered exchange pair, O(1) merge state),
    * then the lag distribution reduces per day-of-week group by exact rank
    * selection (q171's discipline — median and p90 are actual data values
    * at 1-based ranks ⌈n/2⌉ and ⌈9n/10⌉, integer arithmetic only).
    * Click-time ties collapse to DISTINCT (user, ts) so the as-of winner's
    * LAG is tie-independent. Purchases with no preceding click drop —
    * DuckDB's inner ASOF, the same filter. */
  val q182PurchaseLatency: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("unix_micros(ts)").as("c_ts"))
      .distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("p_ts"), col("ts"))
    val lagged = graft.plans.AsOf.join(purchases, clicks,
        Seq("user_id" -> "c_user"), "p_ts", "c_ts")
      .filter(col("c_ts").isNotNull)
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        expr("(p_ts - c_ts) div 1000000").as("lag_s"))
    val ranked = lagged
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dow")).orderBy(col("lag_s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("dow"))))
    ranked.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_purchases"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("lag_s")))
          .as("median_lag_s"),
        min(when(col("rn") === expr("(9 * n + 9) div 10"), col("lag_s")))
          .as("p90_lag_s"))
      .orderBy(col("dow"))
  }

  def queries: Map[String, Q] = Map(
    "q182_purchase_latency" -> q182PurchaseLatency,
    "q167_skyline" -> q167Skyline,
    "q148_asof_native" -> q148AsofNative,
    "q164_asof_broadcast" -> q164AsofBroadcast,
    "q149_pit_join" -> q149PitJoin,
    "q150_asof_tolerance" -> q150AsofTolerance,
    "q151_asof_forward" -> q151AsofForward,
    "q145_markov_transitions" -> q145MarkovTransitions,
    "q153_cusum" -> q153Cusum,
    "q154_seasonal_decompose" -> q154SeasonalDecompose,
    "q155_twap" -> q155Twap,
    "q156_window_nav" -> q156WindowNav,
    "q157_sequence_match" -> q157SequenceMatch,
    "q158_trend_slope" -> q158TrendSlope,
    "q141_ewm_smoothing" -> q141EwmSmoothing,
    "q142_mad_anomaly" -> q142MadAnomaly,
    "q125_rolling_anomaly" -> q125RollingAnomaly,
    "q26_asof_join"     -> q26AsofJoin,
    "q27_gapfill"       -> q27GapFill,
    "q20_window_rank"   -> q20Rank,
    "q21_window_laglead" -> q21LagLead,
    "q22_window_moving" -> q22Moving,
    "q84_window_range"  -> q84RangeWindow,
    "q87_scd2_history"  -> q87Scd2History,
    "q23_window_cumsum" -> q23CumSum,
    "q24_sessionize"    -> q24Sessionize,
    "q94_path_analysis" -> q94PathAnalysis,
    "q25_window_ntile"  -> q25Ntile)

  /** DuckDB's native ASOF LEFT JOIN — shared verbatim by q26 (window
    * composition) and q148 (custom Catalyst operator): one semantics, two
    * physical engines, one oracle. */
  private val duckAsof = """
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
      clicks AS (
        SELECT user_id, ts_us, max(event_id) AS click_id
        FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
      errors AS (
        SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'error')
      SELECT e.event_id, e.user_id, c.click_id, e.ts_us - c.ts_us AS gap_us
      FROM errors e
      ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts_us > c.ts_us
      ORDER BY e.event_id"""

  def oracles: Map[String, String] = Map(
    "q182_purchase_latency" -> """
      WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
        event_type, ts FROM events),
      clicks AS (SELECT DISTINCT user_id AS c_user, ts_us AS c_ts
        FROM ev WHERE event_type = 'click'),
      p AS (SELECT user_id, ts_us AS p_ts, ts
        FROM ev WHERE event_type = 'purchase'),
      j AS (SELECT CAST(dayofweek(p.ts) AS BIGINT) AS dow,
          (p.p_ts - c.c_ts) // 1000000 AS lag_s
        FROM p ASOF JOIN clicks c
          ON p.user_id = c.c_user AND p.p_ts > c.c_ts),
      r AS (SELECT dow, lag_s,
        row_number() OVER (PARTITION BY dow ORDER BY lag_s) AS rn,
        count(*) OVER (PARTITION BY dow) AS n FROM j)
      SELECT dow, count(*) AS n_purchases,
        CAST(min(CASE WHEN rn = (n + 1) // 2 THEN lag_s END) AS BIGINT)
          AS median_lag_s,
        CAST(min(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_s END) AS BIGINT)
          AS p90_lag_s
      FROM r GROUP BY 1 ORDER BY 1""",
    "q167_skyline" -> """
      WITH o AS (SELECT o_orderkey,
        CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents,
        epoch_us(o_orderdate) AS date_us FROM orders)
      SELECT o_orderkey, price_cents, date_us FROM (
        SELECT *, max(date_us) OVER (ORDER BY price_cents DESC
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx FROM o)
      WHERE mx IS NULL OR mx <= date_us
      ORDER BY price_cents DESC, o_orderkey""",
    "q164_asof_broadcast" -> duckAsof,
    "q158_trend_slope" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      d0 AS (SELECT min(day_num) AS d0 FROM daily),
      mo AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(day_num - d0) AS BIGINT) AS sx,
          CAST(sum(n_events) AS BIGINT) AS sy,
          CAST(sum((day_num - d0) * n_events) AS BIGINT) AS sxy,
          CAST(sum((day_num - d0) * (day_num - d0)) AS BIGINT) AS sxx
        FROM daily, d0 GROUP BY 1),
      den AS (SELECT *, n * sxx - sx * sx AS den FROM mo)
      SELECT event_type, n,
        CASE WHEN den <> 0
          THEN (n * sxy - sx * sy) * 1000000 // den END AS slope_micro,
        CASE WHEN den <> 0
          THEN (sy * sxx - sx * sxy) * 1000000 // den END AS intercept_micro
      FROM den ORDER BY event_type""",
    "q156_window_nav" -> """
      WITH c AS (
        SELECT c_mktsegment, c_custkey,
          CAST(round(c_acctbal*100,0) AS BIGINT) AS cents
        FROM customer)
      SELECT c_mktsegment, c_custkey,
        CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro,
        CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro,
        nth_value(c_custkey, 3) OVER wf AS third_poorest,
        last_value(c_custkey) OVER wf AS richest
      FROM c
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents, c_custkey),
        wf AS (PARTITION BY c_mktsegment ORDER BY cents, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_mktsegment, c_custkey""",
    "q157_sequence_match" -> """
      WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
          epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1)
            OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
        FROM events),
      marked AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 THEN 1 ELSE 0 END AS is_new
        FROM gaps),
      sess AS (
        SELECT user_id, event_id, ts, event_type,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      paths AS (
        SELECT user_id, session_id,
          string_agg(event_type, '->' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY 1, 2),
      pats AS (SELECT * FROM (VALUES ('view->.*purchase'), ('^signup'),
        ('error$'), ('click->click')) AS t(pattern))
      SELECT pattern, count(*) AS n_sessions,
        count(DISTINCT user_id) AS n_users
      FROM paths, pats WHERE regexp_matches(path, pattern)
      GROUP BY pattern ORDER BY pattern""",
    "q155_twap" -> """
      WITH e AS (
        SELECT user_id, event_id,
          CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
          CAST(round(value*100,0) AS BIGINT) AS cents
        FROM events),
      iv AS (
        SELECT user_id, cents, ts_s,
          lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS next_ts
        FROM e),
      agg AS (
        SELECT user_id, count(*) AS n_intervals,
          CAST(sum(next_ts - ts_s) AS BIGINT) AS span_s,
          CAST(sum(cents * (next_ts - ts_s)) AS BIGINT) AS wsum
        FROM iv WHERE next_ts IS NOT NULL GROUP BY 1)
      SELECT user_id, n_intervals, span_s,
        CASE WHEN span_s > 0 THEN wsum * 1000000 // span_s END
          AS twap_micro_cents
      FROM agg ORDER BY user_id""",
    "q153_cusum" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      d0 AS (SELECT min(day_num) AS d0 FROM daily),
      base AS (
        SELECT event_type, CAST(sum(n_events) AS BIGINT) AS b, count(*) AS dd
        FROM daily, d0 WHERE day_num < d0 + 10 GROUP BY 1),
      st AS (
        SELECT d.event_type, d.day_num, d.n_events, base.b,
          10 * base.dd * d.n_events - 11 * base.b AS dev_num
        FROM daily d JOIN base USING (event_type)),
      ps AS (
        SELECT *, CAST(sum(dev_num) OVER (PARTITION BY event_type ORDER BY day_num
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        FROM st),
      cs AS (
        SELECT event_type, day_num, n_events, b,
          p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY day_num
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum_num
        FROM ps)
      SELECT event_type, day_num, n_events, cusum_num,
        CAST(cusum_num > 40 * b AS BIGINT) AS flag
      FROM cs ORDER BY event_type, day_num""",
    "q154_seasonal_decompose" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_num,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      dow AS (SELECT *, (day_num + 4) % 7 AS weekday FROM daily),
      dowstats AS (
        SELECT event_type, weekday, CAST(sum(n_events) AS BIGINT) AS dow_sum, count(*) AS m
        FROM dow GROUP BY 1, 2),
      tot AS (
        SELECT event_type, CAST(sum(n_events) AS BIGINT) AS tot, count(*) AS nd
        FROM daily GROUP BY 1),
      win AS (
        SELECT d.*,
          CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day_num
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sum7,
          count(*) OVER (PARTITION BY event_type ORDER BY day_num
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
        FROM dow d),
      j AS (
        SELECT w.event_type, w.day_num, w.n_events,
          ds.dow_sum * 1000000 // ds.m AS dow_mean_micro,
          t.tot * 1000000 // t.nd AS overall_micro,
          CASE WHEN w.cnt7 = 7 THEN w.sum7 * 1000000 // 7 END AS trend_micro
        FROM win w
        JOIN dowstats ds ON w.event_type = ds.event_type AND w.weekday = ds.weekday
        JOIN tot t ON w.event_type = t.event_type)
      SELECT event_type, day_num, n_events, trend_micro,
        dow_mean_micro - overall_micro AS seasonal_micro,
        n_events * 1000000 - trend_micro - (dow_mean_micro - overall_micro)
          AS resid_micro
      FROM j ORDER BY event_type, day_num""",
    "q148_asof_native" -> duckAsof,
    "q149_pit_join" -> """
      WITH versions AS (
        SELECT o_custkey AS v_custkey,
               CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS from_day,
               max(o_orderkey) AS version_key,
               arg_max(CAST(round(o_totalprice*100,0) AS BIGINT), o_orderkey) AS ver_value_cents
        FROM orders GROUP BY 1, 2),
      facts AS (
        SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
               o.o_custkey AS custkey,
               CAST(datediff('day', DATE '1970-01-01', l.l_shipdate) AS BIGINT) AS ship_day
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_day,
             v.version_key, v.ver_value_cents,
             f.ship_day - v.from_day AS age_days
      FROM facts f ASOF LEFT JOIN versions v
        ON f.custkey = v.v_custkey AND f.ship_day >= v.from_day
      ORDER BY f.l_orderkey, f.l_linenumber""",
    "q150_asof_tolerance" -> """
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
      clicks AS (
        SELECT user_id, ts_us, max(event_id) AS click_id
        FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
      errors AS (
        SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'error'),
      base AS (
        SELECT e.event_id, e.user_id, c.click_id, e.ts_us - c.ts_us AS gap_us
        FROM errors e
        ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts_us > c.ts_us)
      SELECT event_id, user_id,
        CASE WHEN gap_us <= 172800000000 THEN click_id END AS click_id,
        CASE WHEN gap_us <= 172800000000 THEN gap_us END AS gap_us
      FROM base ORDER BY event_id""",
    "q151_asof_forward" -> """
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
      clicks AS (
        SELECT user_id, ts_us, max(event_id) AS click_id
        FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
      errors AS (
        SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'error')
      SELECT e.event_id, e.user_id, c.click_id AS next_click_id,
             c.ts_us - e.ts_us AS lead_us
      FROM errors e
      ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts_us < c.ts_us
      ORDER BY e.event_id""",
    "q145_markov_transitions" -> """
      WITH tr AS (
        SELECT lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev,
          event_type AS next
        FROM events),
      cnt AS (
        SELECT prev, next, count(*) AS n
        FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2)
      SELECT prev, next, n,
        CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS row_total,
        CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev) AS BIGINT)
          AS p_micro
      FROM cnt ORDER BY prev, next""",
    "q141_ewm_smoothing" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
            AS day_num,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      days AS (SELECT DISTINCT day_num FROM daily),
      fan AS (
        SELECT event_type, day_num + o AS report_day,
          n * (1::BIGINT << (6 - o)) AS wn, (1::BIGINT << (6 - o)) AS w
        FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
        WHERE day_num + o IN (SELECT day_num FROM days))
      SELECT event_type, report_day,
        CAST(sum(wn) AS BIGINT) AS ewm_num,
        CAST(sum(w) AS BIGINT) AS ewm_den,
        CAST(sum(wn) * 1000000 // sum(w) AS BIGINT) AS ewm_micro
      FROM fan GROUP BY 1, 2 ORDER BY 1, 2""",
    "q142_mad_anomaly" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
            AS day_num,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      win AS (
        SELECT event_type, day_num, n_events,
          list(n_events) OVER (PARTITION BY event_type ORDER BY day_num
            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS w
        FROM daily),
      med AS (
        SELECT *,
          CASE WHEN len(w) = 7 THEN list_sort(w)[4] END AS med
        FROM win),
      mad AS (
        SELECT *,
          CASE WHEN len(w) = 7 THEN
            list_sort([abs(v - med) for v in w])[4] END AS mad
        FROM med)
      SELECT event_type, day_num, CAST(n_events AS BIGINT) AS n_events,
        CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
        CAST(coalesce(len(w) = 7 AND
          abs(n_events - med) * 10000 > mad * 44478, false) AS BIGINT)
          AS is_anomaly
      FROM mad ORDER BY event_type, day_num""",
    "q125_rolling_anomaly" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
            AS day_num,
          count(*) AS n_events
        FROM events GROUP BY 1, 2),
      win AS (
        SELECT event_type, day_num, n_events,
          count(*) OVER w AS win_n,
          coalesce(sum(n_events) OVER w, 0) AS win_sum,
          coalesce(sum(n_events * n_events) OVER w, 0) AS win_sumsq
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day_num, n_events,
        CAST(win_n AS BIGINT) AS win_n,
        CAST(win_sum AS BIGINT) AS win_sum,
        CAST(win_sumsq AS BIGINT) AS win_sumsq,
        CAST(win_n = 7 AND
             (win_n * n_events - win_sum) * (win_n * n_events - win_sum) >
             (win_n * win_sumsq - win_sum * win_sum) * 9 AS BIGINT)
          AS is_anomaly
      FROM win ORDER BY event_type, day_num""",
    "q94_path_analysis" -> """
      WITH gaps AS (
        SELECT user_id, event_id, ts, event_type,
          epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1)
            OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
        FROM events),
      marked AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 THEN 1 ELSE 0 END AS is_new
        FROM gaps),
      sess AS (
        SELECT user_id, event_id, ts, event_type,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      paths AS (
        SELECT user_id, session_id,
          string_agg(event_type, '->' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY 1, 2)
      SELECT path, count(*) AS n_sessions,
        CAST(sum(user_id) AS BIGINT) AS user_checksum
      FROM paths GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 15""",
    "q26_asof_join" -> """
      WITH ev AS (
        SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events),
      clicks AS (
        SELECT user_id, ts_us, max(event_id) AS click_id
        FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
      errors AS (
        SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'error')
      SELECT e.event_id, e.user_id, c.click_id, e.ts_us - c.ts_us AS gap_us
      FROM errors e
      ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts_us > c.ts_us
      ORDER BY e.event_id""",
    "q27_gapfill" -> """
      WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events GROUP BY 1, 2),
      spans AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY user_id),
      axis AS (
        SELECT user_id, unnest(generate_series(CAST(h0 AS TIMESTAMP), CAST(h1 AS TIMESTAMP),
          INTERVAL 1 HOUR)) AS hour
        FROM spans)
      SELECT a.user_id, a.hour, coalesce(h.n, 0) AS n
      FROM axis a LEFT JOIN hourly h ON a.user_id = h.user_id AND a.hour = h.hour
      ORDER BY a.user_id, a.hour""",
    "q20_window_rank" -> """
      SELECT * FROM (
        SELECT user_id, event_id, CAST(round(value*100,0) AS BIGINT) AS value_cents,
          row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id))
      WHERE rn <= 3 ORDER BY user_id, rn""",
    "q21_window_laglead" -> """
      SELECT user_id, event_id,
        epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1) OVER w)) AS gap_s,
        lead(event_type,1) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",
    "q22_window_moving" -> """
      SELECT user_id, event_id,
        CAST(sum(CAST(round(value*100,0) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_cents,
        min(CAST(round(value*100,0) AS BIGINT)) OVER w AS mov_min_cents,
        max(CAST(round(value*100,0) AS BIGINT)) OVER w AS mov_max_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",
    "q87_scd2_history" -> """
      WITH v AS (
        SELECT o_custkey AS custkey,
          CAST(round(o_totalprice*100,0) AS BIGINT) AS value_cents,
          o_orderdate AS valid_from, o_orderkey AS version_key
        FROM orders)
      SELECT custkey, value_cents, valid_from, version_key,
        lead(valid_from) OVER w AS valid_to,
        CAST(CASE WHEN lead(valid_from) OVER w IS NULL THEN 1 ELSE 0 END
             AS BIGINT) AS is_current
      FROM v WINDOW w AS (PARTITION BY custkey ORDER BY valid_from, version_key)
      ORDER BY custkey, valid_from, version_key""",
    "q84_window_range" -> """
      WITH e AS (
        SELECT user_id, event_id,
          CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
          CAST(round(value*100,0) AS BIGINT) AS cents
        FROM events)
      SELECT user_id, event_id, ts_s,
        count(*) OVER w AS n_1h,
        CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_s, event_id""",
    "q23_window_cumsum" -> """
      SELECT o_custkey, o_orderkey,
        count(*) OVER w AS n_so_far,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) OVER w AS BIGINT) AS cum_cents
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",
    "q24_sessionize" -> """
      WITH gaps AS (
        SELECT user_id, event_id, ts, value,
          epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1)
            OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
        FROM events),
      marked AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 THEN 1 ELSE 0 END AS is_new
        FROM gaps),
      sess AS (
        SELECT user_id, value,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        count(*) AS n_events,
        CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
      FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "q25_window_ntile" -> """
      SELECT c_mktsegment, c_custkey,
        ntile(4) OVER w AS quartile,
        first_value(c_custkey) OVER w AS poorest_custkey
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY CAST(round(c_acctbal*100,0) AS BIGINT), c_custkey)
      ORDER BY c_mktsegment, c_custkey""")
}
