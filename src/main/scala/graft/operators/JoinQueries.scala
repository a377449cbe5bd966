package graft.operators

import graft.{Num, QueryModule}
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.4).
  *
  * The reference implements only the exchange+cogroup substrate joins compile
  * to (RemoteAppendOnlyMapSuite.scala:206-224); here the full equi-join family
  * is declared Spark-first and Catalyst/AQE pick shuffled-hash vs sort-merge vs
  * broadcast. Dimension tables (nation/region, literal band tables) are
  * explicitly `broadcast()` — at 100 TB the fact side never shuffles for those.
  */
object JoinQueries extends QueryModule {

  /** q11 — inner equi-join + aggregation: revenue per customer. At scale both
    * sides hash-partition on the key; AQE handles skew. */
  val q11JoinInner: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Num.cents(o("o_totalprice"))).as("revenue_cents"))
      .orderBy(c("c_custkey"))
  }

  /** q12 — left outer join: customers kept with zero high-value orders. */
  val q12JoinLeft: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_big_orders"),
        coalesce(sum(Num.cents(o("o_totalprice"))), lit(0L)).as("revenue_cents"))
      .orderBy(c("c_custkey"))
  }

  /** q13 — left semi join (EXISTS): customers holding at least one urgent order. */
  val q13JoinSemi: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q14 — left anti join (NOT EXISTS): customers with no order above 400k. */
  val q14JoinAnti: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(Num.cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  /** q15 — broadcast star join over the dimension chain
    * customer→nation→region: zero shuffle on the dimensions. */
  val q15BroadcastStar: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val n = broadcast(Tables.load(s, dir, "nation"))
    val r = broadcast(Tables.load(s, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"), n("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(Num.cents(c("c_acctbal"))).as("acctbal_cents"))
      .orderBy(r("r_name"), n("n_name"))
  }

  /** q16 — TPC-H Q3 shape (shipping priority): selective dimension filter
    * joined into two fact tables, aggregated, top-20. */
  val q16ShippingPriority: Q = (s, dir) => {
    val cut = lit("2000-01-01").cast("timestamp")
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderdate") < cut)
    val l = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > cut)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
      .agg(sum(Num.tenK(l("l_extendedprice") * (lit(1.0) - l("l_discount"))))
        .as("revenue_tenk"))
      .orderBy(col("revenue_tenk").desc, col("l_orderkey"))
      .limit(20)
  }

  /** q17 — TPC-H Q5 shape (local supplier volume): 6-way join where supplier
    * and customer nations must match; broadcast dims, shuffled facts.
    *
    * Join ORDER matters at scale: the ASIA restriction keeps 1 of 5 regions,
    * so it is resolved first — `asiaN = nation ⋈ region[ASIA]` (a handful of
    * rows, broadcast) — and applied to `customer` and `supplier` BEFORE any
    * fact-fact join. Catalyst cannot reorder this without CBO stats; filtering
    * the dims last would compute (then discard) ~80% of the c⋈o and o⋈l
    * shuffle/join work. */
  val q17RegionVolume: Q = (s, dir) => {
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(s, dir, "nation")
    val asiaN = broadcast(n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(n("n_nationkey"), n("n_name")))
    val c = Tables.load(s, dir, "customer")
      .join(asiaN, col("c_nationkey") === asiaN("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val sup = broadcast(Tables.load(s, dir, "supplier")
      .join(asiaN.select(col("n_nationkey").as("sn_nationkey")),
        col("s_nationkey") === col("sn_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey")))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
    val l = Tables.load(s, dir, "lineitem")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") &&
                 c("c_nationkey") === sup("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(Num.tenK(l("l_extendedprice") * (lit(1.0) - l("l_discount"))))
        .as("revenue_tenk"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue_tenk").desc, col("n_name"))
  }

  /** q18 — non-equi band (range) join against a small literal dimension:
    * planned as BroadcastNestedLoopJoin; the broadcast keeps it linear. */
  val q18RangeJoin: Q = (s, dir) => {
    import s.implicits._
    val bands = broadcast(Seq(
      ("p00_925", 0.0, 925.0),
      ("p925_975", 925.0, 975.0),
      ("p975_up", 975.0, 99999.0)).toDF("band", "lo", "hi"))
    Tables.load(s, dir, "part")
      .join(bands, col("p_retailprice") >= col("lo") &&
                   col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        sum(Num.cents(col("p_retailprice"))).as("price_cents"))
      .orderBy(col("band"))
  }

  /** q19 — FULL OUTER equi-join: the join type the reference's cogroup most
    * directly maps to (keys present on either side survive,
    * RemoteAppendOnlyMapSuite.scala:206-224). Two filtered aggregates of
    * orders joined on customer key; customers with only big orders, only
    * urgent orders, or both — the single-sided rows carry real NULLs through
    * the join output. Same shuffle shape as inner at scale; AQE skew handling
    * applies unchanged. */
  val q19JoinFull: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 300000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"),
        Num.sumCents(col("o_totalprice"), "big_cents"))
      .select(col("o_custkey").as("k_big"), col("n_big"), col("big_cents"))
    val urg = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_urgent"))
      .select(col("o_custkey").as("k_urg"), col("n_urgent"))
    big.join(urg, col("k_big") === col("k_urg"), "full_outer")
      .select(coalesce(col("k_big"), col("k_urg")).as("custkey"),
        col("n_big"), col("big_cents"), col("n_urgent"))
      .orderBy(col("custkey"))
  }

  /** q68 — RIGHT OUTER join: fact side right-joined so every customer
    * survives (mirror of q12's left outer, declared explicitly to close the
    * equi-join family). */
  val q68JoinRight: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 350000)
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_big_orders"),
        coalesce(sum(Num.cents(o("o_totalprice"))), lit(0L)).as("revenue_cents"))
      .orderBy(c("c_custkey"))
  }

  /** q49 — null keys through aggregation, window, and null-safe join
    * (reference tests null keys/values through its sorter explicitly,
    * RemoteSorterSuite.scala:220-243). A NULLIF-derived segment makes a real
    * NULL group: the window partitions on it, the aggregation groups on it,
    * and the self-join matches it with `<=>` (IS NOT DISTINCT FROM) — the
    * three places a null key can silently drop rows at scale. */
  val q49NullKeys: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.load(s, dir, "customer")
      .select(expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
        col("c_custkey"), col("c_acctbal"))
    val w = Window.partitionBy(col("seg")).orderBy(col("c_custkey"))
    val a = c.withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_cust"),
        Num.sumCents(col("c_acctbal"), "bal_cents"),
        max(col("rn")).as("max_rn"))
    val b = c.groupBy(col("seg"))
      .agg(max(col("c_custkey")).as("max_custkey"))
      .select(col("seg").as("seg_b"), col("max_custkey"))
    a.join(b, col("seg") <=> col("seg_b"))
      .select(col("seg"), col("n_cust"), col("bal_cents"),
        col("max_rn"), col("max_custkey"))
      .orderBy(asc_nulls_first("seg"))
  }

  /** q69 — MERGE/upsert: apply a deterministic change set (updates to one
    * hash stratum, inserts keyed past the base range) onto the orders
    * snapshot via full-outer join + coalesce — exactly the physical shape a
    * lakehouse MERGE INTO compiles to (shuffle both sides on the key, one
    * pass). Emits per-action accounting; all money exact cents. */
  val q69MergeUpsert: Q = (s, dir) => {
    val base = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("k"), Num.cents(col("o_totalprice")).as("cents"))
    val updates = base.filter(pmod(col("k"), lit(10)) === 3)
      .select(col("k").as("ck"), (col("cents") + 100).as("ccents"))
    val inserts = base.filter(pmod(col("k"), lit(10)) === 7)
      .select((col("k") + 100000000L).as("ck"), col("cents").as("ccents"))
    val changes = updates.union(inserts)
    base.join(changes, col("k") === col("ck"), "full_outer")
      .select(coalesce(col("k"), col("ck")).as("key"),
        coalesce(col("ccents"), col("cents")).as("cents_final"),
        when(col("k").isNull, lit("inserted"))
          .when(col("ck").isNull, lit("kept"))
          .otherwise(lit("updated")).as("action"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents_final")).as("cents_total"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("action"))
  }

  /** FUZZY self-join candidate generation, edit distance ≤ 2 — three
    * COMPLETE blocking schemes over a (k: long, nm: string) entity frame,
    * all returning distinct candidate (i, j) pairs with i < j that a
    * downstream exact `levenshtein` verifies (precision 1 always; blocking
    * only bounds the candidate volume). Spec-pinned to produce identical
    * VERIFIED pair sets on varied-length and constant-prefix fixtures.
    *
    *  - [[fuzzyPairsLengthWindow]]: ED ≤ 2 ⇒ |Δlen| ≤ 2; width-3 length
    *    buckets, probe explodes to bucket ±1. The coarsest key: complete,
    *    but on length-uniform data it degenerates to ONE bucket and the
    *    candidate set is all pairs (~n²/2 — measured 112M at sf0.1).
    *  - [[fuzzyPairsSegments]]: PassJoin-style partition signatures (Li,
    *    Deng, Feng, "PASS-JOIN", VLDB'12). Each string splits into d+1 = 3
    *    segments; ≤ 2 edits leave ≥ 1 segment intact (pigeonhole), shifted
    *    by at most ±2, so the probe enumerates each candidate length's
    *    segment windows and equi-joins on (length, segment idx, substring).
    *    Far finer than length alone on real entity data — but any segment
    *    that is CORPUS-CONSTANT (here `c_name`'s 13-char shared prefix
    *    covers segments 0 and 1 entirely) is one hot bucket = all pairs
    *    again. Right scheme for long strings with distributed entropy.
    *  - [[fuzzyPairsDeletion]]: deletion-neighbourhood blocking (FastSS,
    *    Bocek et al. 2007): bucket key = every string obtainable by
    *    deleting ≤ 2 characters. ED(r, s) ≤ 2 ⇒ an optimal alignment's
    *    matched positions form a common string reachable from BOTH sides
    *    by ≤ 2 deletions, so true pairs always share a bucket — and a
    *    bucket collision requires the ENTIRE remaining string to match,
    *    so constant affixes cannot form hot buckets (the shared prefix is
    *    in every key, discriminating suffixes survive ≥ 3 of their 5
    *    chars). O(L²) variants per string caps it to short entity keys
    *    (names, titles, SKUs — the fuzzy-join use case); for long strings
    *    use segments. On this fixture: 17M candidates vs 112M, against
    *    4M TRUE pairs — within 4× of the inherent output. */
  private[graft] def fuzzyPairsLengthWindow(names: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val c = names.withColumn("ln", length(col("nm")).cast("long"))
      .withColumn("b", (col("ln") / 3).cast("long"))
    val probe = spreadForFanout(c).withColumn("bb",
      explode(array(col("b") - 1, col("b"), col("b") + 1)))
    probe.as("x").join(c.as("y"),
        col("x.bb") === col("y.b") && col("x.k") < col("y.k") &&
        abs(col("x.ln") - col("y.ln")) <= 2)
      .select(col("x.k").as("i"), col("y.k").as("j")).distinct()
  }

  /** PassJoin segment blocking (see [[fuzzyPairsLengthWindow]] scheme doc).
    * Index side: 3 (k, len, segIdx, segment) rows per string — longer
    * segments first (l_i = base + [i < len mod 3]), positions cumulative.
    * Probe side: for each candidate indexed length ls ∈ [len-2, len+2] and
    * segment idx, every substring of the probe with that segment's length
    * starting within ±2 of its indexed position (edits shift an intact
    * segment by at most the edit count). Both sides require len ≥ 3 so all
    * three segments are non-empty (pigeonhole needs d+1 non-vacuous
    * parts); shorter strings — O(alphabet³) of them at most — pair through
    * [[fuzzyPairsLengthWindow]], which is cheap exactly there. */
  private[graft] def fuzzyPairsSegments(names: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val c = names.withColumn("ln", length(col("nm")))
    val long = c.filter(col("ln") >= 3)
    val idx = long
      .withColumn("si", explode(sequence(lit(0), lit(2))))
      .select(col("k"), col("ln"), col("si"),
        expr("substring(nm, si * (ln div 3) + least(si, ln % 3) + 1," +
          " (ln div 3) + IF(si < ln % 3, 1, 0))").as("seg"))
    val probe = spreadForFanout(long)
      .withColumn("ls", explode(sequence(col("ln") - 2, col("ln") + 2)))
      .filter(col("ls") >= 3)
      .withColumn("si", explode(sequence(lit(0), lit(2))))
      .withColumn("li", expr("(ls div 3) + IF(si < ls % 3, 1, 0)"))
      .withColumn("pi", expr("si * (ls div 3) + least(si, ls % 3)"))
      .withColumn("lo", greatest(lit(0), col("pi") - 2))
      .withColumn("hi", least(col("ln") - col("li"), col("pi") + 2))
      .filter(col("lo") <= col("hi"))
      .withColumn("st", explode(sequence(col("lo"), col("hi"))))
      .select(col("k"), col("ls"), col("si"),
        expr("substring(nm, st + 1, li)").as("sub"))
    val segPairs = probe.as("x").join(idx.as("y"),
        col("x.ls") === col("y.ln") && col("x.si") === col("y.si") &&
        col("x.sub") === col("y.seg") && col("x.k") < col("y.k"))
      .select(col("x.k").as("i"), col("y.k").as("j"))
    val short = c.filter(col("ln") < 3)
    val shortPairs = fuzzyPairsLengthWindow(short.select(col("k"), col("nm")))
    // short×long pairs: ED ≤ 2 with len < 3 vs len ≥ 3 forces len = 3,4 on
    // the long side — equi-join the tiny short side against just those rows
    val shortLong = short.as("x").join(
        long.filter(col("ln") <= 4).as("y"),
        col("x.ln") >= col("y.ln") - 2 && col("x.k") =!= col("y.k"))
      .select(least(col("x.k"), col("y.k")).as("i"),
        greatest(col("x.k"), col("y.k")).as("j"))
    segPairs.union(shortPairs).union(shortLong).distinct()
  }

  /** Deletion-neighbourhood (FastSS) blocking (see
    * [[fuzzyPairsLengthWindow]] scheme doc): explode each string to its
    * distinct ≤2-deletion variants, self-equi-join on the variant.
    *
    * The join key is `xxhash64(variant)`, not the variant string: an
    * 8-byte fixed-width key shrinks the exchange and the join probe, and a
    * hash COLLISION can only ADD a candidate pair — exact levenshtein
    * verification downstream discards it, so completeness and precision
    * are unaffected (the blocking-equivalence spec pins this). */
  private[graft] def fuzzyPairsDeletion(names: org.apache.spark.sql.DataFrame,
      maxBucket: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    // ONE exchange, not a self-join: group the variant rows by bucket and
    // enumerate each bucket's pairs with a HOF over the sorted member
    // list. The earlier self-join formulation shuffled the 170×-exploded
    // frame TWICE (its two sides don't canonicalize to one exchange — the
    // HOF lambda ids differ per instantiation) and needed both a cache and
    // a shuffle_hash hint to stop Catalyst broadcasting a multi-million-row
    // "small" side (explode breaks size estimation); grouping shuffles the
    // compact (k, wh) rows once, map-side-combines into per-bucket sets,
    // and the quadratic pair fan-out happens AFTER the exchange, spread
    // over the numbered partitions below (exempt from AQE coalescing —
    // see [[spreadForFanout]]). Measured equal to the self-join form at
    // sf0.1 (7.0 s vs 6.7 s, within ambient variance — stage profile:
    // candidate generation ~13 s cold-cached vs verify ~2.5 s, the cost
    // being the 17.4M candidates themselves, within 4.3× of the fixture's
    // 4.08M TRUE pairs), kept for the structural wins: half the shuffled
    // bytes, no cache, no hint. Bucket
    // member lists are small by construction (a bucket collision forces
    // the entire remaining string to match); a pathological hot bucket
    // (mass-duplicated entity strings) explodes quadratically: the OPT-IN
    // `maxBucket` cap (q51's LSH discipline) drops buckets above the bound
    // BEFORE pair enumeration, bounding candidates at cap² per bucket by
    // construction; the recall trade is exact and spec-measured
    // (SkewStressSpec): pairs sharing ONLY capped buckets vanish — under
    // mass duplication those are duplicate×duplicate pairs exact dedup
    // (q50) should have collapsed first. q79 defaults to cap = None —
    // completeness — because its fixture is already exact-deduped; the cap
    // is the config for corpora that are not.
    val v = deletionVariants(names)
    val grouped = v.repartition(
        v.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("wh"))
      .groupBy(col("wh")).agg(sort_array(collect_set(col("k"))).as("ks"))
      .filter(size(col("ks")) >= 2)
    val capped = maxBucket match {
      case Some(cap) => grouped.filter(size(col("ks")) <= cap)
      case None => grouped
    }
    // pairs ride the distinct exchange PACKED as one 8-byte long
    // (i << 32 | j) instead of a 16-byte two-long row — the candidate
    // dedup is this operator's volume term (17.4M distinct pairs at
    // sf0.1), so halving its key width halves the exchange. Sound while
    // both keys < 2^32 — TPC-H custkey is 150M at SF 1000, and entity-key
    // fuzzy join is a dimension-side operator by contract (the scaladoc's
    // short-entity-string framing); a corpus beyond 2^32 keys repacks to
    // the two-column struct this replaced. Guarded by the bound check
    // below: packing silently corrupting on oversized keys would be a
    // correctness bug, so oversized keys fail loudly instead. The decode
    // MUST be shiftrightUNSIGNED: for xi in [2^31, 2^32) the pack
    // overflows the signed long's sign bit (still bijective — the full
    // 64-bit pattern is (xi << 32) | xj), and an arithmetic shiftright
    // would sign-extend xi back as negative (VERDICT r13 defect #1;
    // boundary keys 2^31−1 / 2^31 / 2^32−1 are spec-pinned).
    dedupPackedPairs(capped
      .select(explode(expr(
        s"""flatten(transform(ks, (xi, i) ->
             transform(slice(ks, i + 2, size(ks)), xj -> $packPairExpr)))"""))
        .as("pk")))
  }

  /** The guarded pack of two bucket-member keys `xi`, `xj` (each in
    * [0, 2^32), enforced with raise_error — silent corruption is a
    * correctness bug) into one 8-byte long `(xi << 32) | xj`. Bijective
    * over the full guarded range: for xi in [2^31, 2^32) the shift
    * overflows the sign bit, which is why the decode in
    * [[dedupPackedPairs]] must be shiftrightUNSIGNED (VERDICT r13 defect
    * #1 — arithmetic shiftright sign-extends xi back negative; boundary
    * keys 2^31−1 / 2^31 / 2^32−1 are spec-pinned). */
  private[graft] val packPairExpr =
    """CASE WHEN xi >= 4294967296 OR xj >= 4294967296 OR xi < 0 OR xj < 0
         THEN raise_error('fuzzy pair key >= 2^32: repack to struct')
         ELSE shiftleft(xi, 32) + xj END"""

  /** Dedup packed candidate pairs and decode them back to (i, j) — the
    * shared distinct-exchange shape of [[fuzzyPairsDeletion]] (q79) and
    * [[fuzzyJoinTables]] (q92): the distinct rides an 8-byte long instead
    * of a 16-byte two-long row, halving the operator's volume-term
    * exchange. The unsigned decode makes the FULL guarded key range
    * round-trip exactly. */
  private[graft] def dedupPackedPairs(packed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    packed.distinct()
      .select(shiftrightunsigned(col("pk"), 32).as("i"),
        col("pk").bitwiseAND(lit(4294967295L)).as("j"))

  /** TWO-TABLE fuzzy join candidates (record linkage: match a dirty feed
    * against a master entity table): deletion-variant blocking across
    * distinct key spaces, candidate (i from `a`, j from `b`) pairs for
    * edit distance ≤ 2. Same completeness argument as the self-join; the
    * sides block independently, so either may be the smaller feed and
    * Catalyst/AQE pick the join strategy from runtime sizes. */
  def fuzzyJoinTables(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // same one-exchange shape as [[fuzzyPairsDeletion]]: both sides' variant
    // rows union into one bucket grouping (side-tagged), pairs enumerate
    // a-members × b-members per bucket — neither side is ever a join build
    // side, so the explode-breaks-size-estimation trap can't bite
    val v = deletionVariants(a).withColumn("side", lit(0))
      .unionByName(deletionVariants(b).withColumn("side", lit(1)))
    // (i from a, j from b) pairs ride the distinct exchange packed as one
    // 8-byte long — the q79 packing (see [[dedupPackedPairs]]), applied to
    // this operator's own volume term: the two-table candidate dedup was
    // the suite's largest remaining exchange (87.7 MB at sf0.1 for q92).
    // Same soundness argument, same loud guard, unsigned decode from day
    // one (VERDICT r13 §next-4).
    dedupPackedPairs(v.repartition(
        v.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("wh"))
      .groupBy(col("wh"))
      .agg(collect_set(when(col("side") === 0, col("k"))).as("ka"),
        collect_set(when(col("side") === 1, col("k"))).as("kb"))
      .filter(size(col("ka")) >= 1 && size(col("kb")) >= 1)
      .select(explode(expr(
        s"""flatten(transform(ka, xi ->
             transform(kb, xj -> $packPairExpr)))""")).as("pk")))
  }

  /** (k, xxhash64(variant)) rows: every string obtainable from `nm` by
    * deleting ≤ 2 characters, hashed (see [[fuzzyPairsDeletion]] doc for
    * why hashing the key is sound). */
  private def deletionVariants(names: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spreadForFanout(names.filter(col("nm").isNotNull))
      .select(col("k"), explode(expr(
        """transform(array_distinct(concat(
             array(nm),
             IF(length(nm) >= 1,
               transform(sequence(1, length(nm)), a ->
                 concat(substring(nm, 1, a - 1), substring(nm, a + 1, length(nm)))),
               array()),
             IF(length(nm) >= 2,
               flatten(transform(sequence(1, length(nm) - 1), a ->
                 transform(sequence(a + 1, length(nm)), b ->
                   concat(substring(nm, 1, a - 1),
                          substring(nm, a + 1, b - a - 1),
                          substring(nm, b + 1, length(nm)))))),
               array()))), w -> xxhash64(w))""")).as("wh"))

  /** The candidate work of every fuzzy blocking lives in join/explode
    * OUTPUT, which AQE coalescing cannot anticipate (it sees a few
    * thousand tiny input rows → 1 partition → serial execution; measured
    * 22–27 s vs ~4 s spread at sf0.1) — numbered repartition is exempt
    * from coalescing, the escape hatch for output-heavy operators. */
  private def spreadForFanout(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, col("k"))

  /** q79 — FUZZY self-join (edit distance ≤ 2 over the FULL customer
    * table): the entity-resolution primitive of data curation (same record
    * typed twice, OCR'd names, near-identical metadata). Candidates come
    * from [[fuzzyPairsDeletion]] — the scheme that stays near the true
    * output volume on this fixture's worst case (length-uniform names
    * sharing a 13-char constant prefix, where length-window and segment
    * blocking both degenerate to all pairs: 112M candidates at sf0.1 vs
    * deletion blocking's 17M against 4M TRUE pairs — the output itself is
    * inherently quadratic-ish here, every near-identical name pair really
    * is a match). Names for verification re-join by key (entity frames are
    * dimension-sized; Catalyst broadcasts under the threshold, shuffles
    * above — both correct). Output aggregates per distance with key
    * checksums, so the oracle pins which pairs matched, not just how
    * many.
    *
    * 100-TB CONFIG CARD — `maxBucket` (opt-in, default None):
    *  - cap: drop deletion-variant buckets with > maxBucket members
    *    BEFORE pair enumeration;
    *  - candidate bound: ≤ maxBucket² per surviving bucket by
    *    construction (uncapped, a hot bucket enumerates C(n,2) —
    *    SkewStressSpec measures 300 copies of one string emitting all
    *    44 850 duplicate pairs uncapped vs < 449 candidates at cap 16);
    *  - recall trade, exact and spec-pinned: ONLY pairs whose every
    *    shared bucket is capped vanish — under mass duplication those are
    *    duplicate×duplicate pairs that exact dedup (q50) should have
    *    collapsed first; pairs riding any small bucket survive untouched.
    *    q79 runs uncapped because its fixture is exact-deduped; set the
    *    cap on corpora that are not. */
  val q79FuzzyJoin: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("nm"))
    // dedup candidates FIRST (compact 16-byte rows through the join output
    // and the distinct exchange), then verify once per distinct pair with
    // broadcast name lookups and threshold-banded levenshtein (O(L·d)
    // band, '-1' = over threshold). Both alternative orders were measured
    // SLOWER at sf0.1: verifying inside the join (names carried on the
    // variant rows) hit 13.3 s vs 6.1 s — 31.7M candidate rows ×2 string
    // materializations in the join loop out-cost the 14M extra compact
    // rows the early filter would have saved; verifying after a name join
    // on the multiset landed between (8.1 s). Keep strings OUT of the
    // fan-out path: big joins move fixed-width keys, wide payloads attach
    // to the (much smaller) deduped output.
    fuzzyPairsDeletion(c)
      .join(c.select(col("k").as("i"), col("nm").as("nm_i")), "i")
      .join(c.select(col("k").as("j"), col("nm").as("nm_j")), "j")
      .select(col("i"), col("j"),
        levenshtein(col("nm_i"), col("nm_j"), 2).cast("long").as("dist"))
      .filter(col("dist") >= 1 && col("dist") <= 2)
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("i")).as("i_sum"), sum(col("j")).as("j_sum"))
      .orderBy(col("dist"))
  }

  /** q86 — Hamming-distance profile over fixed-format keys: the
    * substitution-only companion to q79's levenshtein (exact and O(n) on
    * equal-length strings — zero-padded ids, hashes, SKUs — where edit
    * distance degenerates to position-wise difference). Uses the native
    * codegen'd [[graft.functions.HammingStr]]; DuckDB's builtin `hamming`
    * is the oracle. Each name is compared against a deterministic
    * transposition-image of itself (8↔9 swapped), and the distance
    * DISTRIBUTION with per-bucket key checksums pins every row's exact
    * distance. Map-side compute, one tiny aggregate — scan-speed at any
    * corpus size. */
  val q86HammingProfile: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        expr("hamming_str(c_name, translate(c_name, '89', '98'))")
          .cast("long").as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_checksum"))
      .orderBy(col("h"))
  }

  /** Deterministic "dirty feed" for record linkage: a perturbed image of
    * the customer table, cycling through the canonical entity-resolution
    * error modes by key — exact copy, last-char truncation (ED 1), one
    * mid-string substitution (ED 1), a 2-char prefix insertion (ED 2),
    * and a reversal (unlinkable). Nation / balance-bucket fields carry
    * their own independent disagreement patterns so the score has
    * multiple evidence dimensions, like a real Fellegi–Sunter setup. */
  private[graft] def linkageFeed(c: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    c.select(col("c_custkey").as("f_id"),
      expr("""CASE c_custkey % 5
        WHEN 0 THEN c_name
        WHEN 1 THEN substring(c_name, 1, length(c_name) - 1)
        WHEN 2 THEN concat(substring(c_name, 1, 14), 'X', substring(c_name, 16))
        WHEN 3 THEN concat('ZZ', c_name)
        ELSE reverse(c_name) END""").as("nm_f"),
      expr("CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25 " +
        "ELSE c_nationkey END").cast("long").as("nation_f"),
      // +1_000_000 offset keeps the dividend positive (acctbal may be
      // negative; Spark `div` truncates toward zero, DuckDB `//` floors —
      // they agree only on non-negative operands)
      expr("(CASE WHEN c_custkey % 2 = 0 THEN " +
        "CAST(round(c_acctbal*100,0) AS BIGINT) ELSE " +
        "CAST(round(c_acctbal*100,0) AS BIGINT) + 150000 END + 1000000) " +
        "div 100000").as("bucket_f"))

  /** q92 — RECORD LINKAGE with Fellegi–Sunter-style evidence scoring: a
    * dirty feed (see [[linkageFeed]]) matched against the master customer
    * table. Candidates come from [[fuzzyJoinTables]] — two-table
    * deletion-neighbourhood blocking, complete for edit distance ≤ 2, so
    * the expensive quadratic space is never enumerated (the oracle, which
    * CAN afford it at sf0.01, does the full cross join — that asymmetry is
    * the point of blocking). Each surviving pair is scored on integer
    * agreement weights: name edit distance (0/1/2 → 40/25/10), nation
    * agreement (+20/−5), balance-bucket agreement (+10/−2); decisions
    * threshold the score (≥60 match, ≥35 possible, else review). All
    * arithmetic integer, all joins equi-joins; the feed side broadcasts
    * its attributes back onto the deduped candidate pairs. At 100 TB both
    * sides block independently and the candidate join stays keyed on the
    * 8-byte variant hash — the same cost model as q79, linkage's
    * production shape (Fellegi & Sunter 1969; Christen, "Data Matching",
    * 2012). */
  val q92RecordLinkage: Q = (s, dir) => {
    val master = Tables.load(s, dir, "customer")
    // a third of the entity space as the dirty feed — the production shape
    // (an ingest batch against a master list). Selecting whole consecutive
    // key TRIPLES (period-9 pattern) keeps every residue class of the
    // %5/%3/%2 perturbation cycles represented — a plain %3 filter would
    // alias the nation-perturbation cycle and erase one evidence dimension
    val feed = linkageFeed(master.filter(expr("(c_custkey div 3) % 3 = 0")))
    val cand = fuzzyJoinTables(
      feed.select(col("f_id").as("k"), col("nm_f").as("nm")),
      master.select(col("c_custkey").as("k"), col("c_name").as("nm")))
    cand
      .join(feed.select(col("f_id").as("i"), col("nm_f"), col("nation_f"),
        col("bucket_f")), "i")
      .join(master.select(col("c_custkey").as("j"), col("c_name"),
        col("c_nationkey").cast("long").as("nation_m"),
        expr("(CAST(round(c_acctbal*100,0) AS BIGINT) + 1000000) div 100000")
          .as("bucket_m")), "j")
      .select(col("i"), col("j"),
        levenshtein(col("nm_f"), col("c_name"), 2).cast("long").as("dist"),
        col("nation_f"), col("nation_m"), col("bucket_f"), col("bucket_m"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .select(col("i"), col("j"),
        (when(col("dist") === 0, 40L).when(col("dist") === 1, 25L).otherwise(10L)
          + when(col("nation_f") === col("nation_m"), 20L).otherwise(-5L)
          + when(col("bucket_f") === col("bucket_m"), 10L).otherwise(-2L))
          .as("score"))
      .select(col("i"), col("j"), col("score"),
        when(col("score") >= 60, "match")
          .when(col("score") >= 35, "possible")
          .otherwise("review").as("decision"))
      .groupBy(col("decision"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("i")).as("i_checksum"),
        sum(col("j")).as("j_checksum"), sum(col("score")).as("score_sum"))
      .orderBy(col("decision"))
  }

  /** q107 — selective-fact join shaped for RUNTIME ROW-LEVEL FILTERING:
    * a <2%-selective dimension filter (urgent + high-value orders) against
    * the full lineitem fact, revenue rolled up per ship year. At sf0.01 the
    * filtered side broadcasts and the fact never shuffles; at 100 TB both
    * sides exceed the broadcast budget and the join becomes a shuffle join —
    * which is exactly where Spark's runtime Bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.*`) injects a
    * `might_contain` pre-filter on l_orderkey ahead of the fact-side
    * exchange, shrinking shuffle bytes by roughly the dimension
    * selectivity. PlansSpec proves the injection fires and preserves
    * results under production-scale thresholds; SCALING.md carries the
    * measured shuffle-bytes delta. */
  val q107BloomJoin: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
    val l = Tables.load(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(Num.cents(col("l_extendedprice"))).as("revenue_cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy(col("ship_year"))
  }

  /** q124 — SNAPSHOT DIFF (dataset versioning / CDC): classify every key of
    * two table snapshots as added / removed / changed / same and emit the
    * per-class audit a data-versioning layer publishes per commit. q69
    * showed MERGE (apply a change-set); this is its inverse — RECOVER the
    * change-set from two materialized snapshots, the shape used to diff a
    * re-run pipeline against its last release or to CDC a table without a
    * log. Snapshot B is derived from A deterministically (deletes k≡3 mod
    * 17, updates k≡5 mod 13 by +100 cents, inserts fresh keys from k≡7 mod
    * 29), so the oracle rebuilds both sides exactly.
    *
    * Scale shape: ONE full-outer sort-merge join on the key — both sides
    * shuffle exactly once on the comparison key, classification and the
    * balance delta are map-side expressions, and the output aggregate is
    * 4 rows. A billion-row diff costs one co-partitioned pass; at 100 TB
    * the snapshots would be bucketed on the key and the exchange vanishes
    * entirely. */
  val q124SnapshotDiff: Q = (s, dir) => {
    val a = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("k"), Num.cents(col("c_acctbal")).as("va"))
    val b = Tables.load(s, dir, "customer")
      .filter(pmod(col("c_custkey"), lit(17)) =!= 3)
      .select(col("c_custkey").as("bk"),
        (Num.cents(col("c_acctbal")) +
          when(pmod(col("c_custkey"), lit(13)) === 5, 100L).otherwise(0L)).as("vb"))
      .union(Tables.load(s, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(29)) === 7)
        .select((col("c_custkey") + 10000000L).as("bk"), lit(4242L).as("vb")))
    a.join(b, col("k") === col("bk"), "full_outer")
      .select(coalesce(col("k"), col("bk")).as("key"), col("va"), col("vb"),
        when(col("k").isNull, lit("added"))
          .when(col("bk").isNull, lit("removed"))
          .when(col("va") =!= col("vb"), lit("changed"))
          .otherwise(lit("same")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("key")).as("key_checksum"),
        sum(coalesce(col("vb"), lit(0L)) - coalesce(col("va"), lit(0L)))
          .as("delta_cents"))
      .orderBy(col("status"))
  }

  /** q136 — INTERVAL OVERLAP JOIN via GRID BUCKETING: which user sessions
    * overlap which campaign windows — the temporal join behind ad
    * attribution, maintenance-window impact, and on-call overlap queries.
    * The naive plan is a non-equi theta join (cartesian at scale); the
    * scale shape is the standard grid trick: every interval explodes
    * map-side to the 6-hour cells it covers, overlapping intervals must
    * share a cell, so candidates come from a plain EQUI-join on the cell
    * id and the exact overlap predicate only verifies candidates. Session
    * intervals are q24's (600 s gap); campaigns are 40 deterministic
    * 18-hour windows stepped every 17 hours. Per campaign: overlapping
    * session/user counts, a session checksum, and total overlap seconds —
    * all integers. PlansSpec-style guarantee rides in the shape itself:
    * the only join key is `cell`. Cell width trades fan-out (intervals ×
    * cells) against candidate precision; 6 h ≈ session-length-friendly. */
  /** 600 s-gap user sessions as intervals (q24's sessionization) — the fact
    * side q136 and q183 join against campaign windows. */
  private def gapSessions(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long"))
      .withColumn("is_new",
        when(col("gap_s").isNull || col("gap_s") > 600, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts").cast("long")).as("a_start"),
        max(col("ts").cast("long")).as("a_end"))
  }

  /** The 40 deterministic 18-hour campaign windows stepped every 17 hours. */
  private def campaignWindows(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    s.range(0, 40).select(col("id").as("camp"),
      (lit(1704067200L) + col("id") * 61200L).as("b_start"),
      (lit(1704067200L) + col("id") * 61200L + 64800L).as("b_end"))

  val q136IntervalJoin: Q = (s, dir) => {
    val C = 21600L
    val sess = gapSessions(s, dir)
    val camps = campaignWindows(s)
    val aCells = sess.withColumn("cell",
      explode(expr(s"sequence(a_start div $C, a_end div $C)")))
    val bCells = camps.withColumn("cell",
      explode(expr(s"sequence(b_start div $C, b_end div $C)")))
    aCells.join(bCells, "cell")
      .select(col("user_id"), col("session_id"), col("a_start"), col("a_end"),
        col("camp"), col("b_start"), col("b_end"))
      .distinct()
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .groupBy(col("camp"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("user_id") * 100 + col("session_id")).as("sess_checksum"),
        sum(least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_seconds"))
      .orderBy(col("camp"))
  }

  /** q183 — UNKEYED interval join through the BROADCAST exec
    * ([[graft.plans.BroadcastIntervalJoinExec]]): q136's campaign
    * attribution, but the 40 global windows ship whole to every task and
    * the session side is joined IN PLACE — no grid explode, no
    * double-counted-cell `distinct`, no shuffle of the fact side for the
    * join (the only exchanges left are the sessionization's own window
    * shuffle and the tiny per-campaign rollup). The windows are global
    * (no key), which is exactly the case the clustered-merge exec cannot
    * serve — a constant key would funnel every session into one
    * partition; the broadcast exec's one-entry index costs nothing.
    * Same oracle as q136 — two physical shapes, one semantic, both
    * hash-checked; IntervalPlanSpec pins merge==broadcast per mode and
    * the no-fact-exchange plan shape. */
  val q183IntervalBroadcast: Q = (s, dir) => {
    val sess = gapSessions(s, dir).withColumn("g", lit(0L))
    val camps = campaignWindows(s).withColumn("g", lit(0L))
    graft.plans.IntervalJoin.join(sess, camps, Seq("g" -> "g"),
        "a_start", "a_end", "b_start", "b_end", "inner", broadcast = Some(true))
      .groupBy(col("camp"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("user_id") * 100 + col("session_id")).as("sess_checksum"),
        sum(least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_seconds"))
      .orderBy(col("camp"))
  }

  /** q174 — KEYED INTERVAL OVERLAP JOIN ON THE NATIVE OPERATOR: for every
    * user, which of their browse sessions (click/view activity runs)
    * overlap their transact sessions (purchase/error runs) — the
    * concurrent-behaviour question (was the user browsing WHILE buying?)
    * that needs interval×interval within a key. Planned through
    * [[graft.plans.IntervalJoinPlan]] (§7.3(c) tier, the second native
    * operator beside as-of): one exchange pair clustered on user, both
    * sides sorted (user, start), partition-local plane sweep whose memory
    * is the per-user concurrent-overlap depth — vs q136's composed grid
    * bucketing, which pays a cell explode + distinct, and vs the
    * BNL/cartesian Spark would plan for the raw theta join (PlansSpec
    * bans; IntervalPlanSpec pins this exec and brute equality on random
    * tables). The DuckDB oracle pays the within-user non-equi join. */
  /** Per-user activity runs for a subset of event types: hour-gap
    * sessionization (split at gap > 3600 s) with the end padded to the
    * run's gap horizon — the interval form q174/q175 join on. */
  /** Dev-probe access to the two session interval frames (a = browse,
    * b = transact) for the merge-vs-broadcast byte measurement. */
  private[graft] def typedSessionsProbe(s: org.apache.spark.sql.SparkSession,
      dir: String, pfx: String): org.apache.spark.sql.DataFrame =
    typedSessions(s, dir,
      if (pfx == "a") Seq("click", "view") else Seq("purchase", "error"), pfx)

  private def typedSessions(s: org.apache.spark.sql.SparkSession, dir: String,
      types: Seq[String], pfx: String): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .filter(col("event_type").isin(types: _*))
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long"))
      .withColumn("is_new",
        when(col("gap_s").isNull || col("gap_s") > 3600, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id").as(s"${pfx}_user"), col("sid").as(s"${pfx}_sid"))
      .agg(min(col("ts").cast("long")).as(s"${pfx}_start"),
        (max(col("ts").cast("long")) + 3600L).as(s"${pfx}_end"))
  }

  val q174IntervalNative: Q = (s, dir) => {
    val a = typedSessions(s, dir, Seq("click", "view"), "a")
    val b = typedSessions(s, dir, Seq("purchase", "error"), "b")
    graft.plans.IntervalJoin.join(a, b, Seq("a_user" -> "b_user"),
        "a_start", "a_end", "b_start", "b_end")
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_seconds"),
        sum(col("a_sid") * 1000L + col("b_sid")).as("sid_checksum"))
      .orderBy(col("user_id"))
  }

  /** q175 — INTERVAL ANTI JOIN on the native operator: browse sessions
    * with NO concurrent transact session — the isolation question (pure
    * window-shopping runs) that is the anti-mode of q174. Same plane-sweep
    * exec; unmatched lefts are emitted when the sweep PROVES no right can
    * reach them (eviction / end-of-key), so the anti output needs no
    * second pass or subtract join. Oracle pays the NOT EXISTS non-equi
    * subquery. */
  val q175IntervalAnti: Q = (s, dir) => {
    val a = typedSessions(s, dir, Seq("click", "view"), "a")
    val b = typedSessions(s, dir, Seq("purchase", "error"), "b")
    graft.plans.IntervalJoin.join(a, b, Seq("a_user" -> "b_user"),
        "a_start", "a_end", "b_start", "b_end", "left_anti")
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("n_isolated"),
        sum(col("a_sid")).as("sid_sum"),
        sum(col("a_end") - col("a_start")).as("isolated_seconds"))
      .orderBy(col("user_id"))
  }

  /** q176 — INTERVAL LEFT-OUTER on the native operator: EVERY browse
    * session, annotated with its concurrent transact sessions when they
    * exist and null-extended when none do — the coverage report (how much
    * browsing happens alongside transacting, per user) that inner (q174)
    * and anti (q175) each only half-answer. Null-extension rides the
    * sweep's eviction proof (no subtract join, no second pass); the
    * aggregation counts covered vs uncovered sessions and splits overlap
    * seconds out of total session seconds. Oracle pays the LEFT JOIN
    * non-equi subquery. */
  val q176IntervalCoverage: Q = (s, dir) => {
    val a = typedSessions(s, dir, Seq("click", "view"), "a")
    val b = typedSessions(s, dir, Seq("purchase", "error"), "b")
    graft.plans.IntervalJoin.join(a, b, Seq("a_user" -> "b_user"),
        "a_start", "a_end", "b_start", "b_end", "left_outer")
      .groupBy(col("a_user").as("user_id"))
      .agg(countDistinct(col("a_sid")).as("n_sessions"),
        countDistinct(when(col("b_sid").isNotNull, col("a_sid")))
          .as("n_covered"),
        count(col("b_sid")).as("n_pairs"),
        coalesce(sum(least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))), lit(0L))
          .as("overlap_seconds"))
      .orderBy(col("user_id"))
  }

  /** q178 — HEADER/DETAIL RECONCILIATION: the financial-close audit — does
    * each order header's total agree with the sum of its line items
    * (extended price net of discount)? Reported as the delta distribution:
    * per (has-lines, delta-sign) bucket, order count, header money, and
    * the absolute divergence mass — the artefact an accountant reads to
    * decide whether the feed is usable. All money is exact integer 1e-4
    * units; the sign is a separate column so no signed value meets a
    * division (q170's rule). Headerless-detail rows can't exist (FK), but
    * LINELESS HEADERS can and land in their own bucket via the left join.
    * Plan: one detail aggregation + one header left join + a 3-row
    * rollup; both exchanges are key-partitioned, the fact side shuffles
    * once. */
  val q178Reconcile: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), Num.cents(col("o_totalprice")).as("header_cents"))
    val l = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(Num.tenK(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("lines_tenk"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("header_cents"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("lines_tenk"), lit(0L)).as("lines_tenk"))
      .withColumn("delta_tenk", col("header_cents") * 100L - col("lines_tenk"))
      .groupBy((col("n_lines") > 0).as("has_lines"),
        signum(col("delta_tenk")).cast("long").as("delta_sign"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("header_cents")).as("header_cents_sum"),
        sum(abs(col("delta_tenk"))).as("abs_delta_tenk"),
        max(abs(col("delta_tenk"))).as("max_abs_delta_tenk"))
      .orderBy(col("has_lines"), col("delta_sign"))
  }

  def queries: Map[String, Q] = Map(
    "q183_interval_broadcast" -> q183IntervalBroadcast,
    "q178_reconcile" -> q178Reconcile,
    "q176_interval_coverage" -> q176IntervalCoverage,
    "q175_interval_anti" -> q175IntervalAnti,
    "q174_interval_native" -> q174IntervalNative,
    "q136_interval_join" -> q136IntervalJoin,
    "q124_snapshot_diff" -> q124SnapshotDiff,
    "q107_bloom_join"    -> q107BloomJoin,
    "q92_record_linkage" -> q92RecordLinkage,
    "q86_hamming_profile" -> q86HammingProfile,
    "q79_fuzzy_join"     -> q79FuzzyJoin,
    "q69_merge_upsert"   -> q69MergeUpsert,
    "q19_join_full"      -> q19JoinFull,
    "q68_join_right"     -> q68JoinRight,
    "q49_null_keys"      -> q49NullKeys,
    "q11_join_inner"     -> q11JoinInner,
    "q12_join_left"      -> q12JoinLeft,
    "q13_join_semi"      -> q13JoinSemi,
    "q14_join_anti"      -> q14JoinAnti,
    "q15_broadcast_star" -> q15BroadcastStar,
    "q16_shipping_priority" -> q16ShippingPriority,
    "q17_region_volume"  -> q17RegionVolume,
    "q18_range_join"     -> q18RangeJoin)

  /** q136's sessionization CTE chain, parameterized by event-type filter:
    * `$name` ends as (user_id, sid, s, e) session intervals. */
  private def duckSessions(name: String, types: String,
      gapS: Long = 3600L, padS: Long = 3600L): String = s"""
      ${name}_g AS (
        SELECT user_id, event_id, ts,
          epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1)
            OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
        FROM events WHERE event_type IN ($types)),
      ${name}_m AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > $gapS THEN 1 ELSE 0 END AS is_new
        FROM ${name}_g),
      ${name}_r AS (
        SELECT user_id, ts,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ${name}_m),
      $name AS (
        SELECT user_id, CAST(sid AS BIGINT) AS sid,
          CAST(min(epoch(date_trunc('second', ts))) AS BIGINT) AS s,
          CAST(max(epoch(date_trunc('second', ts))) AS BIGINT) + $padS AS e
        FROM ${name}_r GROUP BY 1, 2)"""

  /** q136/q183 shared oracle: brute non-equi session×campaign overlap. */
  private val q136OracleSql: String = """
      WITH gaps AS (
        SELECT user_id, event_id, ts,
          epoch(date_trunc('second', ts)) - epoch(date_trunc('second', lag(ts,1)
            OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS gap_s
        FROM events),
      marked AS (
        SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 THEN 1 ELSE 0 END AS is_new
        FROM gaps),
      se AS (
        SELECT user_id, ts,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      sess AS (
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          CAST(min(epoch(date_trunc('second', ts))) AS BIGINT) AS a_start,
          CAST(max(epoch(date_trunc('second', ts))) AS BIGINT) AS a_end
        FROM se GROUP BY 1, 2),
      camps AS (
        SELECT r AS camp, 1704067200 + r * 61200 AS b_start,
          1704067200 + r * 61200 + 64800 AS b_end
        FROM (SELECT unnest(range(0, 40)) AS r)),
      ov AS (
        SELECT * FROM sess, camps
        WHERE a_start <= b_end AND b_start <= a_end)
      SELECT CAST(camp AS BIGINT) AS camp, count(*) AS n_sessions,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        CAST(sum(user_id * 100 + session_id) AS BIGINT) AS sess_checksum,
        CAST(sum(least(a_end, b_end) - greatest(a_start, b_start)) AS BIGINT)
          AS overlap_seconds
      FROM ov GROUP BY 1 ORDER BY camp"""

  def oracles: Map[String, String] = Map(
    // within-user non-equi overlap join — the plan shape the native sweep
    // operator replaces; results must match exactly
    "q178_reconcile" -> s"""
      WITH det AS (
        SELECT l_orderkey, count(*) AS n_lines,
          CAST(sum(${Num.sqlTenK("l_extendedprice * (1.0 - l_discount)")})
            AS BIGINT) AS lines_tenk
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT o_orderkey, ${Num.sqlCents("o_totalprice")} AS header_cents,
          coalesce(n_lines, 0) AS n_lines,
          coalesce(lines_tenk, 0) AS lines_tenk
        FROM orders LEFT JOIN det ON o_orderkey = l_orderkey),
      d AS (SELECT *, header_cents * 100 - lines_tenk AS delta_tenk FROM j)
      SELECT n_lines > 0 AS has_lines,
        CAST(CASE WHEN delta_tenk > 0 THEN 1 WHEN delta_tenk < 0 THEN -1
          ELSE 0 END AS BIGINT) AS delta_sign,
        count(*) AS n_orders,
        CAST(sum(header_cents) AS BIGINT) AS header_cents_sum,
        CAST(sum(abs(delta_tenk)) AS BIGINT) AS abs_delta_tenk,
        CAST(max(abs(delta_tenk)) AS BIGINT) AS max_abs_delta_tenk
      FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    "q176_interval_coverage" -> s"""
      WITH ${duckSessions("sa", "'click','view'")},
      ${duckSessions("sb", "'purchase','error'")}
      SELECT a.user_id, count(DISTINCT a.sid) AS n_sessions,
        count(DISTINCT CASE WHEN b.sid IS NOT NULL THEN a.sid END)
          AS n_covered,
        count(b.sid) AS n_pairs,
        CAST(coalesce(sum(least(a.e, b.e) - greatest(a.s, b.s)), 0) AS BIGINT)
          AS overlap_seconds
      FROM sa a LEFT JOIN sb b
        ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
      GROUP BY 1 ORDER BY 1""",
    "q175_interval_anti" -> s"""
      WITH ${duckSessions("sa", "'click','view'")},
      ${duckSessions("sb", "'purchase','error'")}
      SELECT a.user_id, count(*) AS n_isolated,
        CAST(sum(a.sid) AS BIGINT) AS sid_sum,
        CAST(sum(a.e - a.s) AS BIGINT) AS isolated_seconds
      FROM sa a WHERE NOT EXISTS (SELECT 1 FROM sb b
        WHERE b.user_id = a.user_id AND a.s <= b.e AND b.s <= a.e)
      GROUP BY 1 ORDER BY 1""",
    "q174_interval_native" -> s"""
      WITH ${duckSessions("sa", "'click','view'")},
      ${duckSessions("sb", "'purchase','error'")}
      SELECT a.user_id, count(*) AS n_overlaps,
        CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
          AS overlap_seconds,
        CAST(sum(a.sid * 1000 + b.sid) AS BIGINT) AS sid_checksum
      FROM sa a JOIN sb b
        ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
      GROUP BY 1 ORDER BY 1""",
    // brute non-equi overlap join — the quadratic plan the grid bucketing
    // avoids; results must match exactly (blocking is complete: overlap
    // implies a shared cell)
    // q183 runs the same semantics through the broadcast interval exec —
    // one oracle, two physical shapes, both hash-checked
    "q183_interval_broadcast" -> q136OracleSql,
    "q136_interval_join" -> q136OracleSql,
    "q124_snapshot_diff" -> """
      WITH a AS (
        SELECT c_custkey AS k,
          CAST(round(c_acctbal * 100, 0) AS BIGINT) AS va
        FROM customer),
      b AS (
        SELECT c_custkey AS bk,
          CAST(round(c_acctbal * 100, 0) AS BIGINT) +
            CASE WHEN c_custkey % 13 = 5 THEN 100 ELSE 0 END AS vb
        FROM customer WHERE c_custkey % 17 <> 3
        UNION ALL
        SELECT c_custkey + 10000000 AS bk, 4242 AS vb
        FROM customer WHERE c_custkey % 29 = 7),
      d AS (
        SELECT coalesce(k, bk) AS key, va, vb,
          CASE WHEN k IS NULL THEN 'added'
               WHEN bk IS NULL THEN 'removed'
               WHEN va <> vb THEN 'changed'
               ELSE 'same' END AS status
        FROM a FULL OUTER JOIN b ON a.k = b.bk)
      SELECT status, count(*) AS n_rows,
        CAST(sum(key) AS BIGINT) AS key_checksum,
        CAST(sum(coalesce(vb, 0) - coalesce(va, 0)) AS BIGINT) AS delta_cents
      FROM d GROUP BY status ORDER BY status""",
    "q107_bloom_join" -> """
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        count(*) AS n_items,
        CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT)
          AS revenue_cents,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
      GROUP BY 1 ORDER BY 1""",
    "q92_record_linkage" -> """
      WITH feed AS (
        SELECT c_custkey AS f_id,
          CASE c_custkey % 5
            WHEN 0 THEN c_name
            WHEN 1 THEN substring(c_name, 1, length(c_name) - 1)
            WHEN 2 THEN concat(substring(c_name, 1, 14), 'X', substring(c_name, 16))
            WHEN 3 THEN concat('ZZ', c_name)
            ELSE reverse(c_name) END AS nm_f,
          CAST(CASE WHEN c_custkey % 3 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS BIGINT) AS nation_f,
          (CASE WHEN c_custkey % 2 = 0 THEN CAST(round(c_acctbal*100,0) AS BIGINT)
                ELSE CAST(round(c_acctbal*100,0) AS BIGINT) + 150000 END
           + 1000000) // 100000 AS bucket_f
        FROM customer WHERE (c_custkey // 3) % 3 = 0),
      m AS (SELECT c_custkey AS j, c_name,
              CAST(c_nationkey AS BIGINT) AS nation_m,
              (CAST(round(c_acctbal*100,0) AS BIGINT) + 1000000) // 100000 AS bucket_m
            FROM customer),
      pairs AS (
        SELECT f_id AS i, j, levenshtein(nm_f, c_name) AS dist,
          nation_f, nation_m, bucket_f, bucket_m
        FROM feed CROSS JOIN m
        WHERE levenshtein(nm_f, c_name) <= 2),
      scored AS (
        SELECT i, j,
          (CASE WHEN dist = 0 THEN 40 WHEN dist = 1 THEN 25 ELSE 10 END
           + CASE WHEN nation_f = nation_m THEN 20 ELSE -5 END
           + CASE WHEN bucket_f = bucket_m THEN 10 ELSE -2 END) AS score
        FROM pairs)
      SELECT CASE WHEN score >= 60 THEN 'match'
                  WHEN score >= 35 THEN 'possible'
                  ELSE 'review' END AS decision,
        count(*) AS n_pairs, CAST(sum(i) AS BIGINT) AS i_checksum,
        CAST(sum(j) AS BIGINT) AS j_checksum,
        CAST(sum(score) AS BIGINT) AS score_sum
      FROM scored GROUP BY 1 ORDER BY 1""",
    "q86_hamming_profile" -> """
      SELECT CAST(h AS BIGINT) AS h, count(*) AS n,
        CAST(sum(c_custkey) AS BIGINT) AS key_checksum
      FROM (SELECT c_custkey,
              hamming(c_name, translate(c_name, '89', '98')) AS h
            FROM customer)
      GROUP BY 1 ORDER BY 1""",
    "q79_fuzzy_join" -> """
      SELECT CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
        count(*) AS n_pairs,
        CAST(sum(a.c_custkey) AS BIGINT) AS i_sum,
        CAST(sum(b.c_custkey) AS BIGINT) AS j_sum
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
        AND abs(length(a.c_name) - length(b.c_name)) <= 2
      WHERE levenshtein(a.c_name, b.c_name) BETWEEN 1 AND 2
      GROUP BY 1 ORDER BY 1""",
    "q69_merge_upsert" -> """
      WITH base AS (
        SELECT o_orderkey AS k, CAST(round(o_totalprice*100,0) AS BIGINT) AS cents
        FROM orders),
      changes AS (
        SELECT k AS ck, cents + 100 AS ccents FROM base WHERE k % 10 = 3
        UNION ALL
        SELECT k + 100000000 AS ck, cents AS ccents FROM base WHERE k % 10 = 7),
      merged AS (
        SELECT coalesce(b.k, c.ck) AS key,
          coalesce(c.ccents, b.cents) AS cents_final,
          CASE WHEN b.k IS NULL THEN 'inserted'
               WHEN c.ck IS NULL THEN 'kept'
               ELSE 'updated' END AS action
        FROM base b FULL JOIN changes c ON b.k = c.ck)
      SELECT action, count(*) AS n_rows,
        CAST(sum(cents_final) AS BIGINT) AS cents_total,
        min(key) AS min_key, max(key) AS max_key
      FROM merged GROUP BY action ORDER BY action""",
    "q19_join_full" -> """
      SELECT coalesce(a.k_big, b.k_urg) AS custkey, a.n_big, a.big_cents, b.n_urgent
      FROM (SELECT o_custkey AS k_big, count(*) AS n_big,
              CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS big_cents
            FROM orders WHERE o_totalprice > 300000 GROUP BY 1) a
      FULL JOIN (SELECT o_custkey AS k_urg, count(*) AS n_urgent
                 FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1) b
        ON a.k_big = b.k_urg
      ORDER BY custkey""",
    "q68_join_right" -> """
      SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        CAST(coalesce(sum(CAST(round(o_totalprice*100,0) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
      FROM (SELECT * FROM orders WHERE o_totalprice > 350000) o
      RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q49_null_keys" -> """
      WITH c AS (
        SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_custkey, c_acctbal
        FROM customer),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY seg ORDER BY c_custkey) AS rn
        FROM c),
      a AS (
        SELECT seg, count(*) AS n_cust,
          CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS bal_cents,
          CAST(max(rn) AS BIGINT) AS max_rn
        FROM r GROUP BY seg),
      b AS (
        SELECT seg AS seg_b, max(c_custkey) AS max_custkey FROM c GROUP BY seg)
      SELECT a.seg, a.n_cust, a.bal_cents, a.max_rn, b.max_custkey
      FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg_b
      ORDER BY seg NULLS FIRST""",
    "q11_join_inner" -> """
      SELECT c_custkey, c_name, count(*) AS n_orders,
        CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q12_join_left" -> """
      SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        CAST(coalesce(sum(CAST(round(o_totalprice*100,0) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q13_join_semi" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "q14_join_anti" -> """
      SELECT c_mktsegment, count(*) AS n_customers,
        CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS acctbal_cents
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q15_broadcast_star" -> """
      SELECT r_name, n_name, count(*) AS n_customers,
        CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS BIGINT) AS acctbal_cents
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q16_shipping_priority" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS revenue_tenk
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue_tenk DESC, l_orderkey LIMIT 20""",
    "q17_region_volume" -> """
      SELECT n_name,
        CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000,0) AS BIGINT)) AS BIGINT) AS revenue_tenk,
        count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue_tenk DESC, n_name""",
    "q18_range_join" -> """
      SELECT band, count(*) AS n_parts,
        CAST(sum(CAST(round(p_retailprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents
      FROM part
      JOIN (VALUES ('p00_925', 0.0, 925.0), ('p925_975', 925.0, 975.0),
                   ('p975_up', 975.0, 99999.0)) bands(band, lo, hi)
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band ORDER BY band""")
}
