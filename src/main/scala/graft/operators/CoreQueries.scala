package graft.operators

import graft.{Num, QueryModule}
import graft.engine.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** One event row for the typed-Aggregator path (reference A1/A2's
  * createCombiner/mergeValue/mergeCombiners closures —
  * shuffle-hadoop/src/main/scala/org/apache/spark/shuffle/remote/RemoteAggregator.scala:24-56). */
case class Ev(user_id: Long, event_type: String, value: Double)

/** Typed partial-aggregation demo: exact integer-cents (sum, count) buffer.
  * `reduce` is the map-side combine (reference A1, RemoteSorter.scala:188-215),
  * `merge` the reduce-side combiner merge (reference A2). */
object CentsSumCount extends Aggregator[Ev, (Long, Long), (Long, Long)] {
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), e: Ev): (Long, Long) =
    (b._1 + math.round(e.value * 100), b._2 + 1)
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Long, Long)): (Long, Long) = b
  def bufferEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
  def outputEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
}

/** Core exchange/aggregation/sort/dedup operators (SURVEY.md §2.1–2.3).
  *
  * Each query is the Spark-native expression of a reference operator; Catalyst
  * plans the partial/final aggregation, range-partitioned sort, and AQE
  * coalescing that the reference hand-implements in its shuffle layer.
  */
object CoreQueries extends QueryModule {

  /** q01 — flagship TPC-H-Q1-shaped aggregation (reference A1/A2/A7 + S3:
    * scan → partial agg → exchange → final agg → sort; mirrors the SQL test at
    * shuffle-hadoop/src/test/scala/.../RemoteShuffleManagerSuite.scala:180-191).
    * Money sums are exact integer cents / 1e-4 / 1e-6 units so results are
    * order-independent (at 100 TB these become DECIMAL(38,x), same plan). */
  val q01Agg: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    li.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        Num.sumCents(col("l_extendedprice"), "sum_base_cents"),
        sum(Num.tenK(disc)).as("sum_disc_tenk"),
        sum(round(charge * 1000000, 0).cast("long")).as("sum_charge_micros"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_cents") / (lit(100.0) * col("count_order")))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02 — round-robin repartition with count+checksum invariant (reference P2,
    * RemoteShuffleManagerSuite.scala:146-154: repartition preserves the
    * multiset). Width follows `defaultParallelism` so the declared operator
    * scales with the cluster instead of pinning the local core count. */
  val q02Repartition: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .repartition(s.sparkContext.defaultParallelism)
      .agg(count(lit(1)).as("cnt"), sum(col("l_orderkey")).as("checksum"))

  /** q03 — global total-order sort (reference S3 `sortByKey`,
    * RemoteShuffleReader.scala:126-142): RangePartitioning exchange + sort. */
  val q03SortGlobal: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))

  /** q04 — top-k (reference S6): TakeOrderedAndProject, no full sort/shuffle. */
  val q04TopK: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        Num.cents(col("c_acctbal")).as("acctbal_cents"))
      .orderBy(col("acctbal_cents").desc, col("c_custkey"))
      .limit(25)

  /** q05 — distinct as hash aggregation (reference A6). */
  val q05Distinct: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey").distinct()
      .agg(count(lit(1)).as("cnt"), sum(col("l_orderkey")).as("checksum"))

  /** q06 — per-group exact count-distinct (reference A6; expand+agg plan). */
  val q06CountDistinct: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** q07 — set operations union/intersect/except (distinct semantics). */
  val q07SetOps: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 250000).select("o_custkey")
    val lo = o.filter(col("o_totalprice") < 50000).select("o_custkey")
    val u = hi.union(lo).distinct().agg(count(lit(1)).as("n_union"))
    val i = hi.intersect(lo).agg(count(lit(1)).as("n_intersect"))
    val e = hi.except(lo).agg(count(lit(1)).as("n_except"))
    u.crossJoin(i).crossJoin(e)
  }

  /** q195 — MULTISET set operations (EXCEPT ALL / INTERSECT ALL): the
    * duplicate-sensitive completion of q07's distinct-semantics family.
    * `exceptAll` keeps max(0, n_left − n_right) copies per row and
    * `intersectAll` min(n_left, n_right) — the semantics that matter when
    * the row IS an occurrence (supplier shipments here: "shipments of
    * returned lines beyond those of clean lines" is a bag difference, not
    * a membership test). Catalyst rewrites both into a counted aggregate +
    * replicate-generate (RewriteExceptAll/RewriteIntersectAll) — ONE
    * shuffle on the row value, no join — and the per-key rollup collapses
    * the replicated rows right back map-side. DuckDB runs the literal
    * EXCEPT ALL / INTERSECT ALL. */
  val q195MultisetSetOps: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
    val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
    val ex = a.exceptAll(r).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val in = a.intersectAll(r).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.union(in).select(col("op"), col("l_suppkey").cast("long").as("suppkey"),
        col("n"))
      .orderBy(col("op"), col("suppkey"))
  }

  /** q08 — groupBy().sum() SQL-path shape the reference tests end-to-end with
    * AQE coalescing (RemoteShuffleManagerSuite.scala:180-191). */
  val q08GroupBySum: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(Num.cents(col("value"))).as("value_cents"),
        max(col("user_id")).as("max_user"),
        min(col("user_id")).as("min_user"))
      .orderBy(col("event_type"))

  /** q09 — typed Dataset aggregation via a custom Aggregator (reference's
    * user-supplied combiner closures, RemoteAggregator.scala:24-36). */
  val q09TypedAgg: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value")).as[Ev]
      .groupByKey(_.event_type)
      .agg(CentsSumCount.toColumn.name("acc"))
      .select(col("key").as("event_type"),
        col("acc._1").as("value_cents"), col("acc._2").as("n"))
      .withColumn("avg_value", col("value_cents") / (lit(100.0) * col("n")))
      .orderBy(col("event_type"))
  }

  /** q10 — cogroup (reference J1, RemoteAppendOnlyMapSuite.scala:206-224):
    * typed KeyValueGroupedDataset.cogroup of orders × lineitem by order key. */
  val q10Cogroup: Q = (s, dir) => {
    import s.implicits._
    val ords = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("cents"))
      .as[(Long, Long)]
    val lis = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
    ords.groupByKey(_._1).cogroup(lis.groupByKey(_._1)) { (k, os, ls) =>
      val ov = os.toSeq
      if (ov.isEmpty) Iterator.empty // lineitem rows always have an order
      else {
        var n = 0L; var qty = 0.0
        ls.foreach { l => n += 1; qty += l._2 } // integral doubles: exact sum
        Iterator((k, ov.head._2, n, qty))
      }
    }.toDF("o_orderkey", "price_cents", "n_items", "sum_qty")
      .orderBy(col("o_orderkey"))
  }

  /** q28 — multiset (bag) set operations: UNION ALL / INTERSECT ALL /
    * EXCEPT ALL keep duplicates, unlike q07's distinct variants. */
  val q28SetOpsAll: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 200000).select("o_custkey")
    val lo = o.filter(col("o_totalprice") < 100000).select("o_custkey")
    val u = hi.unionAll(lo).agg(count(lit(1)).as("n_union_all"))
    val i = hi.intersectAll(lo).agg(count(lit(1)).as("n_intersect_all"))
    val e = hi.exceptAll(lo).agg(count(lit(1)).as("n_except_all"))
    u.crossJoin(i).crossJoin(e)
  }

  /** q29 — deterministic reproducible sampling: multiplicative-hash bucket on
    * the key (NOT TABLESAMPLE, whose rows differ per engine/run). The same
    * 5% of orders is selected on any engine, any cluster size, any day —
    * the property a 100 TB pipeline needs for debuggable samples. The key is
    * reduced modulo a prime BEFORE the multiply: the raw product would
    * overflow int64 past ~3.4e9 keys, where Spark (non-ANSI) wraps silently
    * but DuckDB raises — reducing first keeps the product ≤ 1e6·2.7e9,
    * exact in both engines at any corpus size. */
  val q29Sample: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(pmod(pmod(col("o_orderkey"), lit(999983)) * 2654435761L, lit(1000)) < 50)
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("o_orderkey")).as("key_checksum"),
        Num.sumCents(col("o_totalprice"), "price_cents"))

  /** q71 — STRATIFIED deterministic sampling: per-stratum rates (domain
    * mixing weights) applied with q29's engine-portable multiplicative hash.
    * This is the training-data "source mixing" op — each source gets its own
    * target inclusion rate (here derived from the source index: 100–700‰),
    * and the same docs are selected on any engine at any scale. One narrow
    * scan + one small per-source aggregate: the rate lookup and hash are
    * map-side codegen'd expressions, the shuffle carries one row per
    * stratum, and nothing about the plan changes when the corpus grows
    * 1000× — the canonical shape for mixing-weight jobs at 100 TB. Conditional
    * sums keep NULL semantics identical to the oracle (empty stratum sample
    * → NULL checksum in both engines). */
  val q71StratifiedSample: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .withColumn("rate",
        lit(100L) + pmod(expr("substring(source, 4)").cast("long"), lit(4L)) * 200L)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000)))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("h") < col("rate"), 1L).otherwise(0L)).as("n_sampled"),
        min(col("rate")).as("target_permille"),
        sum(when(col("h") < col("rate"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy(col("source"))
  }

  /** q78 — QUOTA sampling: exactly min(quota, |stratum|) docs per source,
    * the fixed-token-budget companion to q71's rate mixing (a training mix
    * is usually specified as "N tokens from source X", not a rate). Docs
    * rank within their stratum by the engine-portable multiplicative hash
    * (ties by doc_id), so selection is deterministic on any engine and
    * independent of physical row order. The per-stratum top-k is a window
    * rank — at 100 TB the same result comes from a partial top-k
    * (per-partition heap via mapPartitions, then merge k·strata rows),
    * since only the quota-sized head of each stratum's order matters; the
    * window form is the declarative statement of that contract. Output is
    * one row per stratum (count + id-checksum of the selected docs), so
    * the oracle pins exactly WHICH docs were chosen, not just how many. */
  val q78QuotaSample: Q = (s, dir) => {
    val quota = lit(20L) +
      pmod(expr("substring(source, 4)").cast("long"), lit(4L)) * 15L
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("quota", quota)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000000)))
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quota")).as("quota"),
        sum(when(col("rnk") <= col("quota"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("rnk") <= col("quota"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy(col("source"))
  }

  /** The 100-TB formulation of q78's per-stratum top-k, implemented rather
    * than merely claimed: a full `row_number` window sorts EVERY row of
    * every stratum, but only the quota-sized head matters — so each input
    * partition keeps a bounded per-stratum buffer of its best (hash,
    * doc_id) keys (mapPartitions, O(strata·quota) memory), the survivors
    * (≤ partitions·strata·quota rows, corpus-size-independent) shuffle
    * once, and the exact head is re-selected per stratum. Returns the
    * selected (source, doc_id) rows; equality with the window formulation
    * is spec-pinned, stratum by stratum. */
  def quotaSampleTopK(docs: DataFrame, quotaOf: Column): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .withColumn("quota", quotaOf)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000000)))
      .select(col("source"), col("quota"), col("h"), col("doc_id"))
      .as[(String, Long, Long, Long)]
    val partial = keyed.mapPartitions { it =>
      // per-stratum bounded buffer: the quota best (h, doc_id) keys seen in
      // this partition — everything else provably cannot reach the head
      val best = scala.collection.mutable.Map
        .empty[String, (Long, scala.collection.mutable.PriorityQueue[(Long, Long)])]
      it.foreach { case (src, quota, h, id) =>
        val (_, heap) = best.getOrElseUpdate(
          src, (quota, scala.collection.mutable.PriorityQueue.empty[(Long, Long)]))
        if (heap.size < quota) heap.enqueue((h, id))
        else if (Ordering[(Long, Long)].lt((h, id), heap.head)) {
          heap.dequeue(); heap.enqueue((h, id))
        }
      }
      best.iterator.flatMap { case (src, (quota, heap)) =>
        heap.iterator.map { case (h, id) => (src, quota, h, id) }
      }
    }
    val w = Window.partitionBy(col("_1")).orderBy(col("_3"), col("_4"))
    partial.toDF()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("_2"))
      .select(col("_1").as("source"), col("_4").as("doc_id"))
  }

  /** q58 — partition-major ordering, asserted directly (reference P3,
    * RWritablePartitionedPairCollection.scala:75-100: records are emitted
    * partition-by-partition, key-sorted within each). Hash-repartition on the
    * key, `sortWithinPartitions`, then one imperative per-partition scan
    * counting (a) rows, (b) ordering violations, (c) distinct keys seen in
    * that partition. Hash partitioning makes key sets disjoint across
    * partitions, so Σ per-partition distinct keys must equal the global
    * distinct count, and within-partition sortedness must hold exactly —
    * the oracle pins violations to 0 and the key identity, so any engine
    * regression in exchange or partition-local sort hash-mismatches. */
  val q58PartitionSort: Q = (s, dir) => {
    import s.implicits._
    val df = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)]
      .repartition(s.sparkContext.defaultParallelism, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
    df.mapPartitions { it =>
      // distinct keys via a sorted-run counter (keys arrive sorted, so a
      // key!=prev bump is exact) — O(1) per-task memory at any scale, where
      // a HashSet would grow with keys-per-partition. The run count is only
      // exact on sorted input, which `viol` independently verifies (any
      // disorder → viol > 0 → oracle hash-mismatch regardless of nkeys).
      var rows = 0L; var viol = 0L; var nkeys = 0L
      var pk = Long.MinValue; var po = Long.MinValue; var first = true
      it.foreach { case (k, o) =>
        rows += 1
        if (first || k != pk) nkeys += 1
        if (!first && (k < pk || (k == pk && o < po))) viol += 1
        pk = k; po = o; first = false
      }
      Iterator((rows, viol, nkeys))
    }.toDF("rows", "viol", "nkeys")
      .agg(sum(col("rows")).as("n_rows"),
        sum(col("viol")).as("sort_violations"),
        sum(col("nkeys")).as("sum_part_keys"))
  }

  /** q93 — Z-ORDER (Morton) clustering key: interleave the bits of two
    * dimension columns so that sorting/range-partitioning on ONE key keeps
    * BOTH dimensions clustered — the layout trick behind multi-dimensional
    * data skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`, Hudi clustering):
    * min/max statistics on z-sorted files prune on either predicate
    * dimension, where a plain sort prunes only its leading column. Here:
    * p_size (6 bits used) × price offset in 40-cent steps (8 bits), 8 bits
    * interleaved each; the query buckets the keyspace (z div 256 — the
    * "file" granule) and emits each bucket's (x, y) bounding box + key
    * checksum, which IS the data-skipping index a reader would consult;
    * narrow boxes = working locality, and the oracle pins every box edge.
    * The computation is pure per-row bit arithmetic (codegen'd shifts and
    * masks, no shuffle before the bucket agg); the clustering-write spec
    * (`CoreOpsSpec`) proves the scale claim: range-partitioning by z
    * bounds BOTH dimension spans per partition, a plain x-sort leaves the
    * y span at full width. */
  val q93ZOrder: Q = (s, dir) => {
    // z = Σ_b ((x>>b & 1) << 2b) | ((y>>b & 1) << 2b+1), b ∈ [0,8)
    val z = (0 until 8).map(b =>
        s"shiftleft(shiftright(x, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright(y, $b) & 1, ${2 * b + 1})")
      .mkString("(", " + ", ")")
    Tables.load(s, dir, "part")
      .select(col("p_partkey"),
        col("p_size").cast("long").as("x"),
        expr("(CAST(round(p_retailprice*100,0) AS BIGINT) - 90000) div 40")
          .as("y"))
      .withColumn("z", expr(z))
      .groupBy(expr("z div 256").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"),
        sum(col("p_partkey")).as("key_checksum"))
      .orderBy(col("z_bucket"))
  }

  /** q103 — SMALL-FILE COMPACTION PLAN: assign files to target-size
    * compaction bins per partition directory — the planning half of
    * OPTIMIZE/compact, the maintenance op every 100-TB parquet lake runs
    * continuously (small files tax every scan with per-file open/footer
    * cost; the planner's output IS the rewrite job list). Files here are
    * the documents table (size = n_chars, partition = lang) — the planner
    * only ever consumes a (partition, file, size) listing, whatever
    * produces it. Binning is next-fit-decreasing via one window cumsum:
    * order files largest-first within the partition, bin = floor of the
    * PRE-file cumulative sum / target — stateless window arithmetic (one
    * exchange on the partition key, linear in file count, works at
    * millions of files) where true first-fit-decreasing would need a
    * stateful per-bin scan that doesn't distribute; NFD's per-bin
    * overshoot is bounded by one file and the largest-first order keeps
    * stragglers off full bins. Every bin row carries an id checksum so
    * the oracle pins WHICH files land where, not just the sizes. */
  val q103CompactionPlan: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val target = 65536L
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("bin", expr(s"(cum - n_chars) div ${target}L"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("bytes"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("lang"), col("bin"))
  }

  /** q97 — WEIGHTED PRIORITY SAMPLING (Duffield, Lund, Thorup, JACM 2007):
    * per-source top-10 documents by priority q = w / u, with w = n_chars
    * (longer docs proportionally likelier) and u the same portable
    * multiplicative hash the q29/q71/q78 sampling family uses — so the
    * sample is deterministic, engine-portable, and weight-sensitive,
    * the scheme production samplers use when "uniform over documents"
    * would under-represent long documents. Integer arithmetic only:
    * q = w·10⁹ div (u+1) (max ~2·10¹³, no overflow), ties broken by
    * doc_id. Same scale path as q78: the window form here; the bounded
    * per-partition-heap `quotaSampleTopK` applies verbatim when sources
    * explode (survivors ≤ partitions·strata·quota). */
  val q97PrioritySample: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val u = "((doc_id % 999983) * 2654435761) % 1000000"
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"(n_chars * 1000000000L) div (($u) + 1)").as("priority"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    d.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"),
        col("priority"))
      .orderBy(col("source"), col("rnk"))
  }

  /** q108 — TRAINING-SHARD ASSIGNMENT + balance audit: the last stage of a
    * corpus pipeline deals documents into a fixed number of output shards
    * for the training loader. The shard key is the q29/q71/q97 portable
    * multiplicative hash (deterministic, engine-portable, oracle-checkable
    * — Spark's murmur3 `hash()` would be opaque to any other system reading
    * the shards), so assignment is reproducible across engines and reruns.
    * The audit is the single aggregation a 100-TB run needs before
    * committing the write: docs/tokens/bytes per shard expose imbalance
    * (a skewed shard = a straggling trainer), and the id checksum pins
    * membership. One exchange on the shard key — the same partitioning the
    * physical `partitionBy(shard)` write uses, so audit and writer share a
    * shuffle; SourcesSpec round-trips the actual partitioned write. */
  val q108ShardAudit: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("n_chars"),
        split(col("text"), " ").as("w"))
      .withColumn("shard", expr("((doc_id % 999983) * 2654435761) % 64"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("w")).cast("long")).as("tokens"),
        sum(col("n_chars").cast("long")).as("bytes"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("shard"))

  /** q109 — TEMPERATURE MIXTURE SAMPLING (α = 1/2): rebalance a multi-source
    * corpus toward uniform by keeping each source at rate
    * √(n_min/n_source) — the standard temperature reweighting between
    * corpus filtering and shard writing (over-represented sources are
    * down-sampled as their share^(1-α)). Integer-exact and engine-portable:
    * rate‰ = floor(√((10⁶·n_min) div n_source)) — integer division plus one
    * IEEE-754 sqrt (correctly rounded, so Spark and any other engine agree
    * bit-for-bit) — and membership is the q29/q71/q97 portable hash, so the
    * kept set is reproducible everywhere. Scale shape: one partial-agg pass
    * for per-source counts (rows = #sources, driver-trivial), rates
    * broadcast back onto the corpus scan, one final rollup — the full-data
    * path is two narrow map stages; nothing global ever shuffles doc rows
    * twice. */
  val q109MixtureSample: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        col("n_chars"))
    val rates = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_min", min(col("n_docs")).over(
        Window.partitionBy()))  // #sources rows — tiny by construction
      .withColumn("rate_permille",
        expr("cast(floor(sqrt((1000000 * n_min) div n_docs)) as bigint)"))
      .select(col("source"), col("n_docs"), col("rate_permille"))
    d.withColumn("h",
        pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000)))
      .join(broadcast(rates), "source")
      .groupBy(col("source"))
      .agg(min(col("n_docs")).as("n_docs"),
        min(col("rate_permille")).as("rate_permille"),
        sum(when(col("h") < col("rate_permille"), 1L).otherwise(0L))
          .as("n_sampled"),
        sum(when(col("h") < col("rate_permille"), col("n_chars").cast("long"))
          .otherwise(0L)).as("sampled_chars"),
        sum(when(col("h") < col("rate_permille"), col("doc_id"))
          .otherwise(0L)).as("sampled_id_sum"))
      .orderBy(col("source"))
  }

  /** q110 — JOIN-KEY SKEW PROFILER: the diagnostic a 100-TB shuffle plan
    * starts from — per candidate join/partition key: row count, key
    * cardinality, the heaviest key's share, and how much of the table sits
    * on keys over 2× the mean. These four numbers decide broadcast vs
    * shuffle, whether AQE's skew split will engage, and whether a key
    * needs salting BEFORE the job runs, instead of discovering a straggler
    * task at hour three. All-integer skew indicators (shares in ppm,
    * heaviness by cross-multiplied `c·n_keys > 2·n_rows` — no division
    * until the final ppm) so the profile is oracle-exact. Shape: one
    * partial-agg pass builds the per-key count frame (one row per key —
    * the only thing that shuffles), a 1-row broadcast total joins back for
    * the threshold comparison; three keys profiled in one union. */
  val q110KeySkew: Q = (s, dir) => {
    def profile(df: org.apache.spark.sql.DataFrame, key: String,
        label: String): org.apache.spark.sql.DataFrame = {
      // both the totals pass and the threshold pass consume the per-key
      // count frame; pin it so the base table scans ONCE per key (the
      // frame is (k, c) pairs — tiny next to a 100-TB rescan). The
      // harness session sweep (Sessions.releasePinned) frees it after
      // the action, the same contract the iterative drivers use.
      val counts = df.groupBy(col(key).cast("long").as("k"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val totals = counts.agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("c")).as("max_per_key"))
      counts.crossJoin(broadcast(totals))
        .agg(first(col("n_rows")).as("n_rows"),
          first(col("n_keys")).as("n_keys"),
          first(col("max_per_key")).as("max_per_key"),
          sum(when(col("c") * col("n_keys") > col("n_rows") * 2, 1L)
            .otherwise(0L)).as("heavy_keys"),
          sum(when(col("c") * col("n_keys") > col("n_rows") * 2, col("c"))
            .otherwise(0L)).as("heavy_rows"))
        .select(lit(label).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_per_key"),
          expr("max_per_key * 1000000 div n_rows").as("top1_share_ppm"),
          expr("heavy_rows * 1000000 div n_rows").as("heavy_rows_ppm"),
          col("heavy_keys"))
    }
    profile(Tables.load(s, dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
      .unionAll(profile(Tables.load(s, dir, "orders"), "o_custkey",
        "orders.o_custkey"))
      .unionAll(profile(Tables.load(s, dir, "events"), "user_id",
        "events.user_id"))
      .orderBy(col("key_col"))
  }

  /** q163 — TABLE CONTENT DIGESTS (Merkle-style movement audit): every
    * orders row renders to a canonical string and folds through the
    * engine-portable polynomial hash (q63's fold — Spark's murmur3 would
    * be opaque to the system on the other side of a migration); digests
    * aggregate per hash-shard with an ORDER-INDEPENDENT sum, so two
    * copies of the table compare as 64 small rows regardless of layout,
    * partitioning, or row order. This is the content complement of q108's
    * membership audit: q108's id checksum catches lost/duplicated rows,
    * this catches a flipped VALUE in a row that is still present (the
    * failure a copy job, codec bug, or type coercion introduces). At
    * 100 TB: one scan, map-side fold, a 64-row exchange — validating a
    * cross-cluster copy costs two scans and a 64-row diff, never a row
    * join. */
  val q163TableDigest: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        Num.cents(col("o_totalprice")).as("cents"),
        col("o_orderdate").cast("string").as("od"), col("o_orderpriority"))
      .withColumn("rowstr", concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("cents"), col("od"), col("o_orderpriority")))
      .withColumn("rh", expr(
        "aggregate(transform(sequence(1, length(rowstr)), " +
          "i -> CAST(ascii(substring(rowstr, i, 1)) AS BIGINT)), " +
          "0L, (acc, c) -> (acc * 31 + c) % 2147483647)"))
      .groupBy(pmod(col("o_orderkey"), lit(64)).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("rh")).as("content_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("shard"))

  def queries: Map[String, Q] = Map(
    "q195_multiset_setops" -> q195MultisetSetOps,
    "q163_table_digest"   -> q163TableDigest,
    "q110_key_skew"       -> q110KeySkew,
    "q109_mixture_sample" -> q109MixtureSample,
    "q108_shard_audit"    -> q108ShardAudit,
    "q97_priority_sample" -> q97PrioritySample,
    "q103_compaction_plan" -> q103CompactionPlan,
    "q93_zorder" -> q93ZOrder,
    "q58_partition_sort" -> q58PartitionSort,
    "q28_setops_all"     -> q28SetOpsAll,
    "q29_sample"         -> q29Sample,
    "q71_stratified_sample" -> q71StratifiedSample,
    "q78_quota_sample" -> q78QuotaSample,
    "q01_agg"            -> q01Agg,
    "q02_repartition"    -> q02Repartition,
    "q03_sort_global"    -> q03SortGlobal,
    "q04_topk"           -> q04TopK,
    "q05_distinct"       -> q05Distinct,
    "q06_count_distinct" -> q06CountDistinct,
    "q07_setops"         -> q07SetOps,
    "q08_groupby_sum"    -> q08GroupBySum,
    "q09_typed_agg"      -> q09TypedAgg,
    "q10_cogroup"        -> q10Cogroup)

  def oracles: Map[String, String] = Map(
    "q195_multiset_setops" -> """
      WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
      r AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
      ex AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM r),
      inx AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM r)
      SELECT 'except_all' AS op, CAST(l_suppkey AS BIGINT) AS suppkey,
        count(*) AS n FROM ex GROUP BY 2
      UNION ALL
      SELECT 'intersect_all', CAST(l_suppkey AS BIGINT), count(*)
      FROM inx GROUP BY 2
      ORDER BY op, suppkey""",
    "q163_table_digest" -> """
      WITH r AS (
        SELECT o_orderkey,
          o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' ||
          o_orderstatus || '|' ||
          CAST(round(o_totalprice*100,0) AS BIGINT)::VARCHAR || '|' ||
          o_orderdate::VARCHAR || '|' || o_orderpriority AS rowstr
        FROM orders),
      h AS (
        SELECT o_orderkey,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(unicode(rowstr[i]) AS BIGINT)
             for i in range(1, length(rowstr)+1)]),
            (acc, c2) -> (acc * 31 + c2) % 2147483647) AS rh
        FROM r)
      SELECT o_orderkey % 64 AS shard, count(*) AS n_rows,
        CAST(sum(rh) AS BIGINT) AS content_sum,
        CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM h GROUP BY 1 ORDER BY shard""",
    "q110_key_skew" -> """
      WITH
      p1 AS (SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
      p2 AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
      p3 AS (SELECT CAST(user_id AS BIGINT) AS k FROM events),
      prof AS (
        SELECT 'lineitem.l_orderkey' AS key_col, k FROM p1
        UNION ALL SELECT 'orders.o_custkey', k FROM p2
        UNION ALL SELECT 'events.user_id', k FROM p3),
      counts AS (
        SELECT key_col, k, count(*) AS c FROM prof GROUP BY key_col, k),
      tot AS (
        SELECT key_col, CAST(sum(c) AS BIGINT) AS n_rows,
          count(*) AS n_keys, CAST(max(c) AS BIGINT) AS max_per_key
        FROM counts GROUP BY key_col)
      SELECT c.key_col, t.n_rows, t.n_keys, t.max_per_key,
        CAST(t.max_per_key * 1000000 // t.n_rows AS BIGINT) AS top1_share_ppm,
        CAST(sum(CASE WHEN c.c * t.n_keys > t.n_rows * 2 THEN c.c ELSE 0 END)
          * 1000000 // t.n_rows AS BIGINT) AS heavy_rows_ppm,
        CAST(sum(CASE WHEN c.c * t.n_keys > t.n_rows * 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS heavy_keys
      FROM counts c JOIN tot t ON c.key_col = t.key_col
      GROUP BY c.key_col, t.n_rows, t.n_keys, t.max_per_key
      ORDER BY c.key_col""",
    "q109_mixture_sample" -> """
      WITH n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      r AS (
        SELECT source, n_docs,
          CAST(floor(sqrt((1000000 * (SELECT min(n_docs) FROM n)) // n_docs))
            AS BIGINT) AS rate_permille
        FROM n),
      h AS (
        SELECT d.source, d.doc_id, d.n_chars, r.n_docs, r.rate_permille,
          ((d.doc_id % 999983) * 2654435761) % 1000 AS h
        FROM documents d JOIN r ON d.source = r.source)
      SELECT source,
        CAST(min(n_docs) AS BIGINT) AS n_docs,
        CAST(min(rate_permille) AS BIGINT) AS rate_permille,
        CAST(sum(CASE WHEN h < rate_permille THEN 1 ELSE 0 END) AS BIGINT)
          AS n_sampled,
        CAST(sum(CASE WHEN h < rate_permille THEN n_chars ELSE 0 END) AS BIGINT)
          AS sampled_chars,
        CAST(sum(CASE WHEN h < rate_permille THEN doc_id ELSE 0 END) AS BIGINT)
          AS sampled_id_sum
      FROM h GROUP BY source ORDER BY source""",
    "q108_shard_audit" -> """
      SELECT CAST(((doc_id % 999983) * 2654435761) % 64 AS BIGINT) AS shard,
        count(*) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
        CAST(sum(n_chars) AS BIGINT) AS bytes,
        CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q103_compaction_plan" -> """
      WITH f AS (
        SELECT lang, doc_id, n_chars,
          sum(n_chars) OVER (PARTITION BY lang
            ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents)
      SELECT lang, CAST((cum - n_chars) // 65536 AS BIGINT) AS bin,
        count(*) AS n_files,
        CAST(sum(n_chars) AS BIGINT) AS bytes,
        CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM f GROUP BY 1, 2 ORDER BY 1, 2""",
    "q97_priority_sample" -> """
      WITH p AS (
        SELECT doc_id, source, n_chars,
          (n_chars * 1000000000) // ((((doc_id % 999983) * 2654435761) % 1000000) + 1)
            AS priority
        FROM documents),
      r AS (
        SELECT source, doc_id, n_chars, priority,
          row_number() OVER (PARTITION BY source
            ORDER BY priority DESC, doc_id) AS rnk
        FROM p)
      SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars,
        CAST(priority AS BIGINT) AS priority
      FROM r WHERE rnk <= 10 ORDER BY source, rnk""",
    "q93_zorder" -> {
      val z = (0 until 8).map(b =>
          s"((((x >> $b) & 1) << ${2 * b}) + (((y >> $b) & 1) << ${2 * b + 1}))")
        .mkString("(", " + ", ")")
      s"""
      WITH d AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
          (CAST(round(p_retailprice*100,0) AS BIGINT) - 90000) // 40 AS y
        FROM part),
      zd AS (SELECT p_partkey, x, y, $z AS z FROM d)
      SELECT z // 256 AS z_bucket, count(*) AS n,
        min(x) AS x_min, max(x) AS x_max,
        min(y) AS y_min, max(y) AS y_max,
        CAST(sum(p_partkey) AS BIGINT) AS key_checksum
      FROM zd GROUP BY 1 ORDER BY z_bucket"""
    },
    "q28_setops_all" -> """
      SELECT
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 200000
          UNION ALL SELECT o_custkey FROM orders WHERE o_totalprice < 100000)) AS n_union_all,
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 200000
          INTERSECT ALL SELECT o_custkey FROM orders WHERE o_totalprice < 100000)) AS n_intersect_all,
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 200000
          EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice < 100000)) AS n_except_all""",
    "q29_sample" -> """
      SELECT count(*) AS n_sampled,
        CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents
      FROM orders
      WHERE ((o_orderkey % 999983) * 2654435761) % 1000 < 50""",
    "q78_quota_sample" -> """
      WITH r AS (
        SELECT source, doc_id,
          CAST(20 + (CAST(substring(source, 4) AS BIGINT) % 4) * 15 AS BIGINT) AS quota,
          row_number() OVER (PARTITION BY source
            ORDER BY ((doc_id % 999983) * 2654435761) % 1000000, doc_id) AS rnk
        FROM documents)
      SELECT source, count(*) AS n_docs, min(quota) AS quota,
        CAST(sum(CASE WHEN rnk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        CAST(sum(CASE WHEN rnk <= quota THEN doc_id END) AS BIGINT) AS sampled_id_sum
      FROM r GROUP BY source ORDER BY source""",
    "q71_stratified_sample" -> """
      WITH d AS (
        SELECT source, doc_id,
          100 + (CAST(substring(source, 4) AS BIGINT) % 4) * 200 AS rate,
          ((doc_id % 999983) * 2654435761) % 1000 AS h
        FROM documents)
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        CAST(min(rate) AS BIGINT) AS target_permille,
        CAST(sum(CASE WHEN h < rate THEN doc_id END) AS BIGINT) AS sampled_id_sum
      FROM d GROUP BY source ORDER BY source""",
    "q58_partition_sort" -> """
      SELECT (SELECT count(*) FROM orders) AS n_rows,
        CAST(0 AS BIGINT) AS sort_violations,
        (SELECT count(DISTINCT o_custkey) FROM orders) AS sum_part_keys""",
    "q01_agg" -> """
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS sum_disc_tenk,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000,0) AS BIGINT)) AS BIGINT) AS sum_charge_micros,
        count(*) AS count_order,
        sum(l_quantity)/count(*) AS avg_qty,
        sum(CAST(round(l_extendedprice*100,0) AS BIGINT))/(100.0*count(*)) AS avg_price
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_repartition" -> """
      SELECT count(*) AS cnt, CAST(sum(l_orderkey) AS BIGINT) AS checksum
      FROM lineitem""",
    "q03_sort_global" -> """
      SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
      FROM orders ORDER BY price_cents DESC, o_orderkey""",
    "q04_topk" -> """
      SELECT c_custkey, c_name, CAST(round(c_acctbal*100,0) AS BIGINT) AS acctbal_cents
      FROM customer ORDER BY acctbal_cents DESC, c_custkey LIMIT 25""",
    "q05_distinct" -> """
      SELECT count(*) AS cnt, CAST(sum(l_orderkey) AS BIGINT) AS checksum
      FROM (SELECT DISTINCT l_orderkey FROM lineitem)""",
    "q06_count_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_orderkey) AS n_orders,
        count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q07_setops" -> """
      SELECT
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 250000
          UNION SELECT o_custkey FROM orders WHERE o_totalprice < 50000)) AS n_union,
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 250000
          INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice < 50000)) AS n_intersect,
        (SELECT count(*) FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 250000
          EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice < 50000)) AS n_except""",
    "q08_groupby_sum" -> """
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents,
        max(user_id) AS max_user, min(user_id) AS min_user
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q09_typed_agg" -> """
      SELECT event_type,
        CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents,
        count(*) AS n,
        sum(CAST(round(value*100,0) AS BIGINT))/(100.0*count(*)) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q10_cogroup" -> """
      SELECT o_orderkey,
        CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents,
        coalesce(li.n_items, 0) AS n_items,
        coalesce(li.sum_qty, 0.0) AS sum_qty
      FROM orders
      LEFT JOIN (SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
                 FROM lineitem GROUP BY l_orderkey) li
        ON o_orderkey = l_orderkey
      ORDER BY o_orderkey""")
}
