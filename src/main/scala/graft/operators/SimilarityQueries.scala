package graft.operators

import graft.QueryModule
import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Components are quantized to integer millionths so dot products and norms
  * are exact BIGINT arithmetic — both engines then derive bit-identical
  * cosines (double division of exact integers), which is what makes these
  * oracle-checkable at all.
  *
  * Scale design: q55 is the brute-force baseline — a broadcast of the (small)
  * query set against a full corpus scan, one pass, no shuffle until the
  * per-query top-k (TakeOrdered-sized). q56 is the scale path: bit-sampling
  * LSH (sign pattern of leading components) buckets both sides, so the join
  * degenerates to an equi-join on the bucket key and each probe touches
  * 1/2^bits of the corpus, trading recall for a bounded candidate set. q57
  * is IVF-style: coarse quantization to the per-label centroid (computed in
  * one aggregation), probe the nearest cell only.
  */
/** Mergeable GRAM-MATRIX accumulator: one flat d×d Long array per partial
  * state, reduce = rank-1 outer-product add (v·vᵀ), merge = element-wise sum
  * — the X^T·X building block of covariance/PCA/whitening, computed in ONE
  * corpus pass with d²-sized states crossing the exchange instead of row
  * data (the same mergeable-summary discipline as MisraGries/HLL). Exact
  * BIGINT arithmetic over integer-millionth components, so any engine
  * reproduces it bit-for-bit; products are ≤ ~1.6e13 per row, safe to ~5e5
  * rows per final sum — beyond that a production run merges per-shard
  * matrices hierarchically or rescales components first (documented trade:
  * exactness here buys oracle parity). */
object GramMatrix
    extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Long], Array[Long], Array[Long]] {
  val dim = 64
  def zero: Array[Long] = new Array[Long](dim * dim)
  def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < dim) {
      val vi = v(i)
      val off = i * dim
      var j = 0
      while (j < dim) { b(off + j) += vi * v(j); j += 1 }
      i += 1
    }
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object SimilarityQueries extends QueryModule {

  private[graft] def quantized(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("q"))
      .withColumn("n2", expr("dot_long(q, q)"))
  }

  private val dotExpr = expr("dot_long(qq, qc)")

  /** q55 — brute-force cosine top-k: 5 query vectors (vec_id < 5) against the
    * whole corpus; per-query top-10 via window rank. The query side is tiny →
    * Catalyst broadcasts it; corpus side never shuffles until the top-k. */
  val q55KnnBrute: Q = (s, dir) => {
    val e = quantized(s, dir)
    val queries = broadcast(e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2")))
    val corpus = e.select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("cn2"))
    val scored = queries.join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.select(col("qid"), col("cid"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 10)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q56 — LSH-bucketed ANN: bucket = sign pattern of components 0..3 (bit
    * sampling). Probe joins only its own bucket → each query scans ~1/16 of
    * the corpus. Top-5 within bucket; recall < 1 by design, but deterministic,
    * so the oracle reproduces it exactly. */
  val q56KnnLsh: Q = (s, dir) => {
    val e = quantized(s, dir)
    val bucketed = e.withColumn("bkt",
      (0 until 4).map(i =>
        when(element_at(col("q"), i + 1) >= 0, lit(1 << i)).otherwise(lit(0)))
        .reduce(_ + _))
    val queries = broadcast(bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"),
        col("bkt").as("qbkt")))
    val corpus = bucketed.select(col("vec_id").as("cid"), col("q").as("qc"),
      col("n2").as("cn2"), col("bkt").as("cbkt"))
    val scored = queries.join(corpus,
        col("qbkt") === col("cbkt") && col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.select(col("qid"), col("cid"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q57 — IVF-style coarse search: centroids = per-label mean of quantized
    * components (one aggregation); each query probes only its nearest
    * centroid's cell. Output: per query, its cell and the top-3 in-cell
    * neighbours. Centroid arithmetic stays in exact integers (floor-averaged)
    * for oracle parity. */
  val q57KnnIvf: Q = (s, dir) => knnIvf(s, dir, nprobe = 1)

  /** q75 — MULTI-PROBE IVF: identical index, but each query probes its
    * `nprobe` = 2 nearest cells and ranks top-3 over the union. Single-probe
    * recall falls exactly for queries near a cell boundary (their true
    * neighbours sit just across it); probing the runner-up cell recovers
    * them at 2× the candidate cost — still a corpus fraction, never a scan.
    * Recall can only improve: the candidate set grows, and cosine is the
    * global ranking metric, so any true-top-k vector displaced from the
    * top-3 is displaced by vectors that are truly better (spec asserts
    * recall ≥ single-probe against the brute-force truth). `nprobe` tunes
    * the recall/cost curve at 100 TB; the plan shape never changes. */
  val q75KnnIvfMultiprobe: Q = (s, dir) => knnIvf(s, dir, nprobe = 2)

  /** Shared IVF engine: build integer centroids, assign each query to its
    * `nprobe` nearest cells, score only those cells' members. Cells
    * partition the corpus (one label per vector), so multi-probe candidates
    * are naturally distinct — no dedup shuffle needed. */
  private def knnIvf(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val e = quantized(s, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val corpus = e.select(col("vec_id").as("cid"), col("label"),
      col("q").as("qc"), col("n2").as("cn2"))
    ivfProbe(queries, corpus, broadcast(ivfCentroids(e)), nprobe)
  }

  /** The IVF coarse quantizer: per-label element-wise floor(avg) integer
    * centroids — exact in any engine, and the frame a persisted index
    * stores (see [[writeIvfIndex]]). */
  private def ivfCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(floor(avg(col("v"))).cast("long").as("cv"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col("label").as("clabel"), expr("transform(pc, p -> p.cv)").as("cvec"))
      .withColumn("cn2", expr("dot_long(cvec, cvec)"))

  /** The IVF probe: assign each query to its `nprobe` nearest centroids by
    * cosine, score only those cells' members, rank top-3 per query. Shared
    * verbatim by the in-query path (q57/q75) and the stored-index path
    * ([[knnIvfStored]]) — "index once, query many" must not change the
    * scoring plan. */
  private def ivfProbe(queries: DataFrame, corpus: DataFrame,
      cents: DataFrame, nprobe: Int): DataFrame = {
    val assigned = queries.join(cents)
      .select(col("qid"), col("qq"), col("qn2"), col("clabel"),
        (expr("dot_long(qq, cvec)") /
          (sqrt(col("qn2")) * sqrt(col("cn2")))).as("ccos"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("clabel"))
    val cell = assigned.select(col("qid"), col("qq"), col("qn2"), col("clabel"),
        row_number().over(wq).as("r"))
      .filter(col("r") <= nprobe).drop("r")
    val scored = cell.join(corpus,
        col("clabel") === col("label") && col("qid") =!= col("cid"))
      .select(col("qid"), col("clabel").cast("long").as("cell"), col("cid"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.select(col("qid"), col("cell"), col("cid"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Persist the IVF index: centroids to one small parquet, the corpus to
    * a parquet table PARTITIONED BY CELL. q57/q75 rebuild the quantizer
    * per query — right for a one-shot; a vector-search service builds the
    * index once and amortizes it over every later query, re-reading the
    * centroid table (K rows) per probe and touching only the probed
    * cells' partitions of the corpus. */
  def writeIvfIndex(e: DataFrame, path: String): Unit = {
    ivfCentroids(e).write.mode("overwrite").parquet(s"$path/centroids")
    e.select(col("vec_id"), col("q"), col("n2"), col("label").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells")
  }

  /** Probe a STORED IVF index ([[writeIvfIndex]]): centroids come back
    * from the index (broadcast, K rows), and the corpus side reads the
    * cell-partitioned table — the probed cells' partition filter reaches
    * the scan as DYNAMIC PARTITION PRUNING (the probe set is
    * data-dependent, so static pruning cannot apply; the spec asserts the
    * executed plan pruned). Scoring is [[ivfProbe]] verbatim, so the
    * stored probe equals the in-query-built probe row for row. */
  def knnIvfStored(s: SparkSession, dir: String, indexPath: String,
      nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cents = broadcast(s.read.parquet(s"$indexPath/centroids"))
    val corpus = s.read.parquet(s"$indexPath/cells")
      .select(col("vec_id").as("cid"), col("cell").as("label"),
        col("q").as("qc"), col("n2").as("cn2"))
    val queries = quantized(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    ivfProbe(queries, corpus, cents, nprobe)
  }

  /** q72 — k-means Lloyd STEP over the embedding corpus: assign every vector
    * to its nearest seed centroid (exact squared-Euclidean on quantized
    * integers: ‖v‖² − 2⟨v,c⟩ + ‖c‖², all BIGINT), then emit the full centroid
    * UPDATE table — per (cluster, component): member count, exact component
    * sum, and the floor-averaged new coordinate. This is the workhorse of
    * embedding-space curation (cluster-then-sample, cluster balancing,
    * semantic dedup seeding) expressed as the two shuffles it minimally
    * needs: seeds broadcast against a single corpus scan (assignment is
    * map-side, ties broken by seed id), one partial-aggregated shuffle for
    * the per-component sums. Iterating = re-running with the emitted
    * centroids; K and dim scale the broadcast (K×dim longs), never the
    * corpus path. Seeds are the first K=4 vectors — deterministic and
    * data-derived, so both engines assign identically.
    *
    * Nearest-centroid selection is a `min_by` AGGREGATE, not a window: the
    * K candidate rows per vector are co-located in the task that produced
    * them (broadcast join), so partial aggregation collapses K·n rows to n
    * map-side and the exchange carries one row per vector — a
    * `row_number().over(partitionBy(vec_id))` window would shuffle and
    * sort all K·n rows instead. Ties are impossible: the ordering key is
    * (d2, cid) and cid differs across candidates. */
  val q72KMeansStep: Q = (s, dir) => {
    val e = quantized(s, dir).select(col("vec_id"), col("q"), col("n2"))
    val seeds = broadcast(e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2")))
    val best = e.join(seeds)
      .select(col("vec_id"), col("q"), col("cid"),
        (col("n2") - lit(2L) * expr("dot_long(q, cq)") + col("cn2")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("q")), struct(col("d2"), col("cid"))).as("b"))
      .select(col("b.cid").as("cid"), col("b.q").as("q"))
    best.select(col("cid").as("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(count(lit(1)).as("n_members"), sum(col("v")).as("sum_v"))
      .select(col("cluster"), col("pos").cast("long").as("pos"),
        col("n_members"), col("sum_v"),
        floor(col("sum_v") / col("n_members")).cast("long").as("new_cv"))
      .orderBy(col("cluster"), col("pos"))
  }

  /** Iterated k-means (Lloyd) over a (vec_id, q: array<bigint>) frame —
    * q72 is ONE step; this is the driver a cluster-then-sample curation
    * pipeline actually runs. Seeds are the k lowest vec_ids (deterministic,
    * data-derived). Each round is q72's two shuffles: seeds broadcast
    * against one corpus scan (nearest centroid via `min_by`, exact integer
    * squared-Euclidean, ties broken by cid), then one partial-aggregated
    * shuffle for per-component floor-averaged means. An empty cluster keeps
    * its previous centroid (the standard Lloyd's degenerate-case choice
    * that never loses a center).
    *
    * Same resource discipline as the CC drivers ([[graft.engine.Pin]]):
    * every round's centroid frame is pinned behind a leaf plan — so the
    * iterated plan stays one broadcast-join deep instead of replanning
    * k-deep lineage — and the previous round is unpersisted the moment its
    * successor materializes: O(1) storage over any iteration count. The
    * corpus frame is cached once and released before returning.
    * Convergence is CHECKED (zero centroids moved — exact integer
    * comparison, so a fixpoint is a true fixpoint) and the cap is LOUD:
    * floor-averaged integer centroids cannot cycle silently into an
    * accepted result. Returns the converged (cid, cq) centroid frame,
    * backed by the final round's pinned blocks (freed by the session's
    * next `releasePinned` sweep). */
  def kmeans(vecs: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, "k must be positive")
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    import graft.engine.Pin.pin
    val e = vecs.select(col("vec_id"), col("q"))
      .withColumn("n2", expr("dot_long(q, q)")).cache()
    val seedRows = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    var (cents, centsPin) = pin(seedRows)
    var moved = 1L
    var iter = 0
    while (moved > 0 && iter < maxIters) {
      iter += 1
      val (next, nextPin) = pin(lloydStep(e, cents))
      moved = next.filter(col("cq") =!= col("prev_cq")).count()
      centsPin.unpersist(blocking = false)
      cents = next.select(col("cid"), col("cq"))
      centsPin = nextPin
    }
    e.unpersist(blocking = false)
    require(moved == 0,
      s"kmeans did not converge in $maxIters iterations " +
        s"($moved centroids still moving); raise maxIters")
    cents
  }

  /** One Lloyd update over (vec_id, q, n2) corpus `e` and (cid, cq)
    * centroids: broadcast-assign every vector to its nearest centroid
    * (exact integer squared-Euclidean, ties by cid), floor-average the
    * members per component, and keep an empty cluster's previous centroid.
    * Emits (cid, cq, prev_cq) so callers check movement for free. Shared
    * by the [[kmeans]] driver and the oracle-checked q76. */
  private def lloydStep(e: DataFrame, cents: DataFrame): DataFrame = {
    val withN2 = broadcast(cents.withColumn("cn2", expr("dot_long(cq, cq)")))
    val assigned = e.join(withN2)
      .select(col("vec_id"), col("q"), col("cid"),
        (col("n2") - lit(2L) * expr("dot_long(q, cq)") + col("cn2")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("q")), struct(col("d2"), col("cid"))).as("b"))
    val means = assigned
      .select(col("b.cid").as("cid"), posexplode(col("b.q")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("cv"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col("cid"), expr("transform(pc, p -> p.cv)").as("new_cq"))
    cents.join(means, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("new_cq"), col("cq")).as("cq"),
        col("cq").as("prev_cq"))
  }

  /** q76 — TWO chained Lloyd iterations, oracle-checked: q72 proves one
    * step's update table, the kmeans spec proves the driver's convergence
    * mechanics, and this pins the part neither covers under the hash gate —
    * RE-SEEDING, i.e. step 2 assigning against step 1's floor-averaged
    * output rather than the original seeds (a wrong empty-cluster rule, a
    * missed floor, or a components-out-of-order rebuild diverges here). Two
    * steps is the minimal chain exhibiting re-seeding while staying
    * expressible as straight-line SQL for DuckDB (the oracle repeats the
    * step CTE block; it cannot iterate to a data-dependent fixpoint). */
  val q76KMeansIter: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val e = quantized(s, dir).select(col("vec_id"), col("q"), col("n2"))
    val seeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val c1 = lloydStep(e, seeds).select(col("cid"), col("cq"))
    val c2 = lloydStep(e, c1).select(col("cid"), col("cq"))
    c2.select(col("cid").as("cluster"), posexplode(col("cq")).as(Seq("pos", "cv")))
      .select(col("cluster"), col("pos").cast("long").as("pos"), col("cv"))
      .orderBy(col("cluster"), col("pos"))
  }

  /** Within-cluster embedding near-dup against a given centroid frame —
    * the verification half of SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023:
    * cluster the embedding space, then search for near-duplicates only
    * inside each cluster). Every vector broadcast-assigns to its nearest
    * centroid (exact integer squared-Euclidean via `min_by`, q72's
    * assignment shape), and q54's tiled exact all-pairs then runs with the
    * tile key EXTENDED by the cluster id — pair work drops from n²/2 to
    * Σ|cluster|²/2 (k× less at balanced k), and the DECLARED recall trade
    * is exactly SemDeDup's: a near-dup pair straddling a cluster boundary
    * is not flagged. Tasks stay evenly sized ((cluster, tile) grid, no
    * CartesianProduct/BNL — PlansSpec), B scales with the cluster fleet,
    * and k scales with corpus size, which is what makes embedding dedup
    * affordable at 100 TB where global all-pairs (q54) is not. */
  def withinClusterNearDup(e: DataFrame, cents: DataFrame,
      b: Int, minCos: Double): DataFrame =
    withinCellNearDup(
      assignToCells(e, cents).withColumn("is_new", lit(false)),
      b, minCos, newGate = false)

  /** Broadcast-assign every (vec_id, q, n2) vector to its nearest centroid
    * (exact integer squared-Euclidean via `min_by`, ties by cid) —
    * (vec_id, cid, q, n2). Shared by the one-shot semantic dedup, the
    * incremental variant (which persists this frame as its cell store),
    * and anything else that needs a cell id per vector. */
  private[graft] def assignToCells(e: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(e.sparkSession)
    val withN2 = broadcast(cents.withColumn("cn2", expr("dot_long(cq, cq)")))
    e.join(withN2)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"),
        (col("n2") - lit(2L) * expr("dot_long(q, cq)") + col("cn2")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("q"), col("n2")),
        struct(col("d2"), col("cid"))).as("bst"))
      .select(col("vec_id"), col("bst.cid").as("cid"), col("bst.q").as("q"),
        col("bst.n2").as("n2"))
  }

  /** The tiled within-cell exact-cosine pair pass over an assigned
    * (vec_id, cid, q, n2, is_new) frame. With `newGate` the candidate join
    * keeps only pairs with at least one new side INSIDE the join — q74's
    * incremental gate transplanted to the embedding family: old×old
    * pairs, the bulk of the pair space, are never materialized. */
  private def withinCellNearDup(assigned: DataFrame, b: Int, minCos: Double,
      newGate: Boolean): DataFrame = {
    import assigned.sparkSession.implicits._
    graft.functions.GraftFunctions.register(assigned.sparkSession)
    val keyed = assigned.withColumn("g", pmod(col("vec_id"), lit(b)))
    val tiles = (for { p <- 0 until b; q <- p until b } yield (p * b + q, p, q))
      .toDF("tid", "tp", "tq")
    val rows = keyed.join(broadcast(tiles), col("g") === col("tp"))
      .select(col("cid"), col("tid"), col("tp"), col("tq"),
        col("vec_id").as("ri"), col("q").as("qi"), col("n2").as("n2i"),
        col("is_new").as("ni"))
    val cols = keyed.join(broadcast(tiles), col("g") === col("tq"))
      .select(col("cid").as("ccid"), col("tid").as("ctid"),
        col("vec_id").as("rj"), col("q").as("qj"), col("n2").as("n2j"),
        col("is_new").as("nj"))
    val base = col("cid") === col("ccid") && col("tid") === col("ctid")
    rows.join(cols, if (newGate) base && (col("ni") || col("nj")) else base)
      .filter(col("tp") =!= col("tq") || col("ri") < col("rj"))
      .select(col("cid").as("cluster"),
        least(col("ri"), col("rj")).as("i"),
        greatest(col("ri"), col("rj")).as("j"),
        expr("dot_long(qi, qj)").as("dot"), col("n2i"), col("n2j"))
      .withColumn("cos", col("dot") / (sqrt(col("n2i")) * sqrt(col("n2j"))))
      .filter(col("cos") >= minCos)
      .select(col("cluster"), col("i"), col("j"), col("dot"), col("cos"))
      .orderBy(col("i"), col("j"))
  }

  /** q80 — SEMANTIC DEDUP, oracle-checked: two Lloyd iterations from the
    * deterministic seeds (the q76 chain — straight-line expressible for
    * DuckDB, which cannot iterate to a data-dependent fixpoint), then
    * [[withinClusterNearDup]] at q54's threshold. The bridge between the
    * k-means and dedup families: same centroids, same assignment math,
    * same exact cosine verification — only the candidate space changes
    * (within-cluster instead of global). The CONVERGED-centroid variant is
    * the same composition with [[kmeans]] supplying `cents`; the spec pins
    * it against a driver-side brute force since the fixpoint's round count
    * is data-dependent. */
  val q80SemanticDedup: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val e = quantized(s, dir).select(col("vec_id"), col("q"), col("n2"))
    val seeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val c2 = lloydStep(e, lloydStep(e, seeds).select(col("cid"), col("cq")))
      .select(col("cid"), col("cq"))
    withinClusterNearDup(e, c2, b = 8, minCos = 0.45)
  }

  /** q83 — INCREMENTAL semantic dedup over a PERSISTED cell index: q74's
    * ingest cost model transplanted to the embedding family. The centroid
    * table and the old corpus's cell-assigned vectors are written to
    * parquet (centroids small, cells partitioned by cluster id) and READ
    * BACK inside the oracle-checked path; only the NEW batch (vec_id ≡ 1
    * mod 3) computes assignments from payloads, against the STORED
    * centroids. The within-cell pair join is gated at-least-one-side-new
    * INSIDE the join, so old×old pairs — the bulk — never materialize.
    * Centroids come from the OLD corpus only (one Lloyd step from its 4
    * lowest ids — the production truth that the index predates the batch;
    * the iteration CHAIN is q76/q80's subject, the INDEX is this one's),
    * so per ingest batch the cost is one assignment pass over the batch,
    * one parquet append, and a pair join whose output is
    * |new|-proportional. Oracle: the full old-centroid within-cluster
    * pair set restricted to new-involving pairs. */
  val q83SemanticDedupIncremental: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val e = quantized(s, dir).select(col("vec_id"), col("q"), col("n2"))
    val isNew = col("vec_id") % 3 === 1
    val old = e.filter(!isNew)
    val seeds = old.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val c1 = lloydStep(old, seeds).select(col("cid"), col("cq"))
    val idxPath = graft.engine.Scratch.dir(s, "q83_cell_index")
    // coalesce(1) sizes the write to THIS corpus (one file per cell dir
    // instead of one per shuffle partition per cell); at 100 TB the
    // parallel write is the point and the coalesce goes away
    c1.coalesce(1).write.mode("overwrite").parquet(s"$idxPath/centroids")
    assignToCells(old, c1).coalesce(1)
      .write.partitionBy("cid").mode("overwrite").parquet(s"$idxPath/cells")
    val storedCents = s.read.parquet(s"$idxPath/centroids")
    val oldAssigned = s.read.parquet(s"$idxPath/cells")
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("q"), col("n2"))
      .withColumn("is_new", lit(false))
    val newAssigned = assignToCells(e.filter(isNew), storedCents)
      .withColumn("is_new", lit(true))
    withinCellNearDup(oldAssigned.unionByName(newAssigned),
      b = 8, minCos = 0.45, newGate = true)
  }

  /** Bootstrap the persisted semantic cell index from the initial corpus —
    * q83's index-build step as a durable artifact for the STREAMING ingest
    * path: centroids from one Lloyd step over the 4 lowest ids (the
    * production truth that the index predates every ingest batch), cells =
    * the corpus assigned against them. The cell store is partitioned by
    * `ingest_batch` with the bootstrap at -1, so streaming batch ids
    * (0,1,…) can never dynamic-overwrite the base corpus. */
  def writeSemanticCellIndex(oldCorpus: DataFrame, indexPath: String): Unit = {
    val seeds = oldCorpus.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val c1 = lloydStep(oldCorpus, seeds).select(col("cid"), col("cq"))
    c1.coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
    assignToCells(oldCorpus, c1)
      .withColumn("ingest_batch", lit(-1L))
      .coalesce(1).write.partitionBy("ingest_batch").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(s"$indexPath/cells")
  }

  /** One micro-batch of STREAMING incremental semantic dedup — the
    * foreachBatch body behind
    * [[graft.streaming.StreamOps.semanticDedupStream]], mirroring
    * [[graft.operators.DedupQueries.incrementalDedupBatch]]'s replay-safe
    * state discipline on the embedding family:
    *
    *  - centroids NEVER move on ingest (q83's model — re-clustering is a
    *    batch maintenance job, not a per-batch side effect);
    *  - the batch assigns against the STORED centroids, then pairs against
    *    the STORED cells with the at-least-one-side-new gate, so per batch
    *    the cost is one assignment pass + a pair join whose output is
    *    |new|-proportional — old×old never materializes;
    *  - emitted pairs are PINNED before the batch's cells are appended
    *    (the cell read is lazy; appending first would feed this batch's
    *    own vectors back in as "old" rows);
    *  - the append is batch-id-partitioned with dynamic overwrite, so a
    *    failure replay overwrites its own partition instead of duplicating
    *    rows. All durable state is the two parquet tables: restarts resume
    *    from the index, executor memory stays flat over an unbounded
    *    stream. */
  def semanticDedupBatch(batch: DataFrame, batchId: Long, indexPath: String)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val s = batch.sparkSession
    graft.functions.GraftFunctions.register(s)
    val storedCents = s.read.parquet(s"$indexPath/centroids")
    val oldAssigned = s.read.parquet(s"$indexPath/cells")
      .select(col("vec_id"), col("cid"), col("q"), col("n2"))
      .withColumn("is_new", lit(false))
    val newAssigned = assignToCells(batch, storedCents)
    val (pairs, pin) = graft.engine.Pin.pin(withinCellNearDup(
      oldAssigned.unionByName(newAssigned.withColumn("is_new", lit(true))),
      b = 8, minCos = 0.45, newGate = true))
    newAssigned.withColumn("ingest_batch", lit(batchId))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(s"$indexPath/cells")
    (pairs, pin)
  }

  /** q113 — HARD-NEGATIVE MINING: for each query vector, the top-5 most
    * cosine-similar vectors carrying a DIFFERENT label — the contrastive /
    * metric-learning training-pair op (the negatives that matter are the
    * ones the embedding currently confuses). Same tiled-broadcast shape as
    * q55's brute top-k with the label disequality folded into the join;
    * the scale path is exactly q57/q75's IVF probe (mine within the
    * query's nearest cells, filter labels at probe time) — brute is the
    * recall-1.0 baseline those variants are spec'd against. Exact integer
    * dots via the codegen'd `dot_long`; ties broken by candidate id. */
  val q113HardNegatives: Q = (s, dir) => {
    val e = quantized(s, dir)
    val queries = broadcast(e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("q").as("qq"), col("n2").as("qn2")))
    val corpus = e.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("q").as("qc"), col("n2").as("cn2"))
    val scored = queries.join(corpus, col("qlabel") =!= col("clabel"))
      .select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        col("cos"), row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q114 — hard-negative mining, IVF-PROBED (the scale path q113
    * declares, coded): each query probes its 3 nearest DIFFERENT-label
    * cells — with per-label centroids, "most confusable other-label
    * vectors" live precisely in the nearest other-label cells, so the
    * label filter and the probe are the same act — and scores only those
    * cells' members. At 100 TB this is the stored-index shape
    * ([[writeIvfIndex]]/[[knnIvfStored]]): centroids broadcast (K rows),
    * only probed cell partitions are read (DPP-pruned), the full corpus
    * never joins the query side. Brute q113 is the recall baseline; the
    * spec measures q114's top-5 overlap against it and pins the floor. */
  val q114HardNegativesIvf: Q = (s, dir) => {
    val e = quantized(s, dir)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("q").as("qq"), col("n2").as("qn2"))
    val corpus = e.select(col("vec_id").as("cid"), col("label"),
      col("q").as("qc"), col("n2").as("cn2"))
    val assigned = queries.join(broadcast(ivfCentroids(e)),
        col("clabel") =!= col("qlabel"))
      .select(col("qid"), col("qlabel"), col("qq"), col("qn2"), col("clabel"),
        (expr("dot_long(qq, cvec)") /
          (sqrt(col("qn2")) * sqrt(col("cn2")))).as("ccos"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("clabel"))
    val cell = assigned.select(col("qid"), col("qlabel"), col("qq"), col("qn2"),
        col("clabel"), row_number().over(wq).as("r"))
      .filter(col("r") <= 3).drop("r")
    val scored = cell.join(corpus, col("clabel") === col("label"))
      .select(col("qid"), col("qlabel"), col("cid"),
        col("clabel").cast("long").as("clabel"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        col("cos"), row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q117 — SCALAR-QUANTIZED (SQ8) ANN with exact rerank: the
    * memory-bandwidth path a 100-TB vector corpus actually scans. Each
    * dimension is affinely mapped to an 8-bit code using per-dimension
    * corpus min/max (one 64-row aggregate, broadcast back) — integer-exact
    * arithmetic, so any engine codes identically. The candidate pass ranks
    * by the dot product of CENTERED codes (`dot_long` over code−128, exact
    * BIGINT) — an 8× smaller scan than full precision (64 bytes vs 512 per
    * vector here; 4× for float32 corpora) — and only the top-32 candidates
    * per query fetch their full-precision vectors for the exact cosine
    * rerank. Quantization error can reorder near-ties, so recall < 1 by
    * design (spec pins recall@5 vs the q55 brute truth); determinism makes
    * the whole two-stage plan oracle-checkable, approx scores included.
    *
    * Scale shape: codes are the ONLY thing the candidate stage reads — at
    * 100 TB they live in their own parquet column (written once, like the
    * IVF index), the scan is sequential and codegen'd, and the full-vector
    * fetch is a candidate-sized equi-join, never a second scan. Composes
    * with IVF (probe cells, then SQ8-scan within the cell — IVF-SQ). */
  val q117KnnSq8: Q = (s, dir) => {
    val e = quantized(s, dir)
    val coded = sq8Coded(e)
    // candidate stage reads codes ONLY (the compressed scan)
    val queryCodes = broadcast(coded.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("code").as("qcode")))
    val corpusCodes = coded.select(col("vec_id").as("cid"), col("code").as("ccode"))
    val approx = queryCodes.join(corpusCodes, col("qid") =!= col("cid"))
      .withColumn("approx", expr(
        "dot_long(transform(qcode, x -> x - 128), transform(ccode, x -> x - 128))"))
    val wa = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("cid"))
    val cand = approx
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= 32)
      .select(col("qid"), col("cid"), col("approx"))
    // rerank stage: candidate-sized joins fetch the full-precision vectors
    val full = e.select(col("vec_id"), col("q"), col("n2"))
    val rer = cand
      .join(broadcast(full.filter(col("vec_id") < 5))
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2")), "qid")
      .join(full.select(col("vec_id").as("cid"), col("q").as("qc"),
        col("n2").as("cn2")), "cid")
      .select(col("qid"), col("cid"), col("approx"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    rer.select(col("qid"), col("cid"), col("approx"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-dimension corpus min/max → 8-bit code column, shared by q117/q123.
    * Integer-exact (BIGINT affine + truncating div), so any engine codes
    * identically. */
  private def sq8Coded(e: DataFrame): DataFrame = {
    val ranges = e.select(posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("pmn"),
        array_sort(collect_list(struct(col("pos"), col("mx")))).as("pmx"))
      .select(expr("transform(pmn, p -> p.mn)").as("mns"),
        expr("transform(pmx, p -> p.mx)").as("mxs"))
    e.crossJoin(broadcast(ranges))
      .withColumn("code", expr(
        """zip_with(zip_with(q, mns, (v, m) -> v - m),
          |         zip_with(mxs, mns, (a, b) -> a - b),
          |         (d, s) -> CASE WHEN s > 0 THEN (d * 255) div s ELSE 0 END)"""
          .stripMargin))
      .drop("mns", "mxs")
  }

  /** q123 — IVF × SQ8 COMPOSED ANN: the two scale techniques q57/q75 and
    * q117 prove separately, composed the way a production vector index
    * actually runs (FAISS's IVF-SQ): probe each query's 2 nearest cells by
    * exact centroid cosine, scan ONLY those cells' 8-bit code column for
    * candidates (centered-code `dot_long`), then exact-rerank the top-16
    * union to the final top-3. Cost per query = 2 cells × corpus-fraction
    * × 64 code bytes, vs the full-precision cell scan of q75 or the
    * full-corpus code scan of q117 — multiplicative pruning, same plan
    * shape at any corpus size (cells come from the stored index / DPP path,
    * codes from their own parquet column). Both pruning layers are
    * deterministic, so the composition stays oracle-checkable end to end;
    * the recall trade (cell boundary misses × quantization reorders) is
    * spec-pinned against both parents. */
  val q123KnnIvfSq8: Q = (s, dir) => {
    val e = quantized(s, dir)
    val coded = sq8Coded(e)
    val cents = broadcast(ivfCentroids(e))
    val q2 = coded.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"),
        col("code").as("qcode"))
    // cell assignment: exact centroid cosine, top-2 per query (q75's probe)
    val assigned = broadcast(q2).join(cents)
      .select(col("qid"), col("qq"), col("qn2"), col("qcode"), col("clabel"),
        (expr("dot_long(qq, cvec)") /
          (sqrt(col("qn2")) * sqrt(col("cn2")))).as("ccos"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("clabel"))
    val cell = assigned
      .withColumn("r", row_number().over(wq)).filter(col("r") <= 2)
      .select(col("qid"), col("qq"), col("qn2"), col("qcode"), col("clabel"))
    // candidate stage: code scan of the probed cells only
    val corpus = coded.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("q").as("qc"), col("n2").as("cn2"), col("code").as("ccode"))
    val approx = cell.join(corpus, Seq("clabel"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("approx", expr(
        "dot_long(transform(qcode, x -> x - 128), transform(ccode, x -> x - 128))"))
    val wa = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("cid"))
    val cand = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= 16)
    // exact rerank of the candidate union
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand
      .select(col("qid"), col("cid"), col("approx"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
      .select(col("qid"), col("cid"), col("approx"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** PQ subspace decomposition: each 64-dim vector explodes into `m`
    * contiguous (64/m)-dim sub-vectors — the rows every PQ stage (training,
    * coding, LUT build) operates on. `sub` is the subspace index. */
  private[graft] def pqParts(e: DataFrame, m: Int): DataFrame = {
    val w = 64 / m
    e.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(CAST(s AS BIGINT) AS sub, slice(q, s * $w + 1, $w) AS sv))")).as("p"))
      .select(col("vec_id"), col("p.sub").as("sub"), col("p.sv").as("sv"))
  }

  /** One Lloyd step over ALL subspaces at once: centroids are keyed
    * (sub, cid), assignment joins on `sub` (broadcast — the codebook is
    * m×k rows), argmin by exact reduced integer distance
    * cn2 − 2·⟨sv, cv⟩ (the ‖sv‖² term is constant per row) with cid
    * tie-break, floor-averaged integer re-estimation; empty centroids keep
    * their previous position (q72's convention). */
  private def pqLloydStep(sv: DataFrame, cents: DataFrame): DataFrame = {
    val withN2 = broadcast(cents.withColumn("cn2", expr("dot_long(cv, cv)")))
    val assigned = sv.join(withN2, Seq("sub"))
      .select(col("vec_id"), col("sub"), col("sv"), col("cid"),
        (col("cn2") - lit(2L) * expr("dot_long(sv, cv)")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(struct(col("cid"), col("sv")), struct(col("d2"), col("cid"))).as("b"))
    val means = assigned
      .select(col("sub"), col("b.cid").as("cid"), posexplode(col("b.sv")).as(Seq("pos", "v")))
      .groupBy(col("sub"), col("cid"), col("pos"))
      .agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("cv1"))
      .groupBy(col("sub"), col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv1")))).as("pc"))
      .select(col("sub"), col("cid"), expr("transform(pc, p -> p.cv1)").as("new_cv"))
    cents.join(means, Seq("sub", "cid"), "left")
      .select(col("sub"), col("cid"), coalesce(col("new_cv"), col("cv")).as("cv"))
  }

  /** PQ codebook: per subspace, k centroids trained with TWO Lloyd steps
    * from deterministic seeds (the first k vectors' sub-vectors) — the
    * q76 convention that keeps training straight-line-expressible for the
    * DuckDB oracle (which cannot iterate to a data-dependent fixpoint);
    * the checked-fixpoint [[kmeans]] driver is the production variant. */
  private[graft] def pqCodebook(e: DataFrame, m: Int, k: Int): DataFrame = {
    val sv = pqParts(e, m)
    val seeds = pqParts(e.filter(col("vec_id") < k), m)
      .select(col("sub"), col("vec_id").as("cid"), col("sv").as("cv"))
    pqLloydStep(sv, pqLloydStep(sv, seeds))
  }

  /** q184 — PRODUCT-QUANTIZED ANN with ADC lookup tables (Jégou et al.,
    * TPAMI 2011 — the FAISS `PQ` index; q117's SQ8 is the scalar little
    * sibling): vectors compress to m=4 subspace CODES (8-entry codebook
    * per subspace, 2-step-Lloyd-trained — 8⁴ = 4096 distinct cells, 12
    * bits per vector), queries build a per-query LUT of
    * ⟨query-subvector, codebook-centroid⟩ partial dots, and the candidate
    * scan scores a vector by TWO map lookups + an add — never touching the
    * vector itself. Exact top-16 by ADC score, exact cosine rerank to
    * top-3 (q117's two-stage contract). Everything is exact BIGINT, so
    * codebook, codes, LUT and scores replay bit-identically in DuckDB —
    * a fully oracle-checked PQ pipeline.
    *
    * Scale shape: the LUT (queries × m × k rows) broadcasts; the corpus
    * side of the candidate stage carries ONLY the code arrays (2 bytes of
    * information per vector here vs 512 full-precision: the compression
    * PQ exists for) — at 100 TB codes live in their own parquet column,
    * written once like q117's SQ8 column and the stored IVF index, and
    * the approx score is map-side `aggregate` over broadcast maps; the
    * only exchange is the per-query top-k. The code-building groupBy is
    * index-build cost, paid once at write time, not per query. */
  val q184KnnPq: Q = (s, dir) => {
    val M = 4
    val K = 8
    val e = quantized(s, dir)
    val book = pqCodebook(e, M, K)
    val sv = pqParts(e, M)
    // coding: nearest codebook centroid per (vector, subspace) — the
    // stored representation; pk packs (sub, code) into one lookup key
    val codes = sv
      .join(broadcast(book.withColumn("cn2", expr("dot_long(cv, cv)"))), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cid"),
        (col("cn2") - lit(2L) * expr("dot_long(sv, cv)")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(col("sub") * K + col("code"))).as("pks"))
    // per-query ADC lookup table: partial dot against every codebook entry
    val qsv = pqParts(e.filter(col("vec_id") < 5), M)
      .select(col("vec_id").as("qid"), col("sub"), col("sv").as("qsv"))
    val lut = broadcast(qsv.join(book, Seq("sub"))
      .select(col("qid"), (col("sub") * K + col("cid")).as("pk"),
        expr("dot_long(qsv, cv)").as("pd"))
      .groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(col("pk"), col("pd")))).as("lut")))
    val approx = codes.crossJoin(lut)
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr("aggregate(pks, 0L, (a, p) -> a + lut[p])").as("approx"))
    val wa = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("cid"))
    val cand = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= 16)
      .select(col("qid"), col("cid"), col("approx"))
    // exact rerank of the ADC top-16 (q117's discipline)
    val full = e.select(col("vec_id"), col("q"), col("n2"))
    val rer = cand
      .join(broadcast(full.filter(col("vec_id") < 5))
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2")), "qid")
      .join(full.select(col("vec_id").as("cid"), col("q").as("qc"),
        col("n2").as("cn2")), "cid")
      .select(col("qid"), col("cid"), col("approx"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    rer.select(col("qid"), col("cid"), col("approx"), col("cos"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q187 — IVF × PQ COMPOSED, RESIDUAL-CODED (FAISS's `IVFPQ`, the
    * production vector-index default): the coarse quantizer (q57's
    * per-label centroids) routes each query to its 2 nearest cells, and
    * within cells vectors are ranked by PQ codes of their RESIDUAL
    * x − centroid[cell] — residual coding is what separates IVFPQ from
    * q184's flat PQ: residual magnitudes are much smaller than raw
    * vectors, so the same codebook budget spends its resolution where the
    * cell didn't already explain the data. One global residual codebook
    * (FAISS default), trained with the q184 machinery (2 grouped Lloyd
    * steps, deterministic seeds); each probed (query, cell) pair gets its
    * OWN ADC lookup table from the query's residual against that cell —
    * candidates score by M map lookups, top-16 union across probed cells,
    * exact cosine rerank to top-3. All integer BIGINT throughout, so the
    * triple composition — coarse probe × residual codebook × ADC — replays
    * bit-identically in DuckDB. Scale shape: codes + cell labels are the
    * only corpus-side candidate state (stored columns at 100 TB, like the
    * IVF index + SQ8 columns); LUTs broadcast at queries × cells × m × k
    * rows; the only exchange is the per-query top-k. */
  val q187KnnIvfPq: Q = (s, dir) => {
    val M = 4
    val K = 8
    val w = 64 / M
    val e = quantized(s, dir)
    val cents = broadcast(ivfCentroids(e))
    // corpus residuals against each vector's OWN cell centroid
    val res = e.join(cents, col("label") === col("clabel"))
      .select(col("vec_id"), col("label"),
        expr("zip_with(q, cvec, (a, b) -> a - b)").as("q"))
    val book = pqCodebook(res.select(col("vec_id"), col("q")), M, K)
    val rsv = pqParts(res.select(col("vec_id"), col("q")), M)
    val codes = rsv
      .join(broadcast(book.withColumn("bn2", expr("dot_long(cv, cv)"))), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cid"),
        (col("bn2") - lit(2L) * expr("dot_long(sv, cv)")).as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(col("sub") * K + col("code"))).as("pks"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
    // coarse probe: top-2 cells by exact centroid cosine (q123's block)
    val q2 = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    val assigned = broadcast(q2).join(cents)
      .select(col("qid"), col("qq"), col("clabel"), col("cvec"),
        (expr("dot_long(qq, cvec)") /
          (sqrt(col("qn2")) * sqrt(col("cn2")))).as("ccos"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("clabel"))
    val probed = assigned.withColumn("r", row_number().over(wq))
      .filter(col("r") <= 2)
      .select(col("qid"), col("clabel"),
        expr("zip_with(qq, cvec, (a, b) -> a - b)").as("qr"))
    // per-(query, cell) ADC LUT from the query's residual in that cell
    val qrsv = probed.select(col("qid"), col("clabel"), explode(expr(
        s"transform(sequence(0, ${M - 1}), s -> struct(CAST(s AS BIGINT) AS sub, slice(qr, s * $w + 1, $w) AS sv))")).as("p"))
      .select(col("qid"), col("clabel"), col("p.sub").as("sub"), col("p.sv").as("sv"))
    val lut = broadcast(qrsv.join(book, Seq("sub"))
      .select(col("qid"), col("clabel"), (col("sub") * K + col("cid")).as("pk"),
        expr("dot_long(sv, cv)").as("pd"))
      .groupBy(col("qid"), col("clabel"))
      .agg(map_from_entries(collect_list(struct(col("pk"), col("pd")))).as("lut")))
    val approx = codes.join(lut, col("label") === col("clabel"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        expr("aggregate(pks, 0L, (a, p) -> a + lut[p])").as("approx"))
    val wa = Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("cid"))
    val cand = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= 16)
      .select(col("qid"), col("cid"), col("approx"))
    val full = e.select(col("vec_id"), col("q"), col("n2"))
    val rer = cand
      .join(broadcast(full.filter(col("vec_id") < 5))
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2")), "qid")
      .join(full.select(col("vec_id").as("cid"), col("q").as("qc"),
        col("n2").as("cn2")), "cid")
      .select(col("qid"), col("cid"), col("approx"),
        (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
    val wr = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    rer.select(col("qid"), col("cid"), col("approx"), col("cos"),
        row_number().over(wr).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** q126 — exact GRAM MATRIX of the embedding corpus (X^T·X over the
    * integer-millionth components): the linear-algebra primitive under
    * covariance, PCA, and whitening — the preprocessing a production
    * embedding pipeline runs before ANN indexing or semantic dedup. One
    * corpus scan through the [[GramMatrix]] typed Aggregator: each task
    * folds its rows into a d² array map-side, partial states (32 KB) merge
    * on the exchange, and NOTHING row-sized shuffles — at any corpus size
    * the exchange carries #partitions × 32 KB. The d×d result is
    * driver-small by construction (the whole point: eigen-decomposition of
    * a 64×64 matrix is free once the distributed pass has reduced 100 TB
    * to it). Output: upper triangle as (i, j, s) rows plus the row count
    * riding along — all exact BIGINTs, oracle-checked cell by cell. */
  val q126GramMatrix: Q = (s, dir) => {
    val sess = s
    import sess.implicits._
    val e = quantized(s, dir)
    val n = e.agg(count(lit(1)).as("n_rows"))
    e.select(col("q")).as[Seq[Long]]
      .select(GramMatrix.toColumn.name("g"))
      .select(posexplode(col("g")).as(Seq("idx", "s")))
      .select(expr(s"idx div ${GramMatrix.dim}").cast("long").as("i"),
        pmod(col("idx"), lit(GramMatrix.dim)).cast("long").as("j"), col("s"))
      .filter(col("i") <= col("j"))
      .crossJoin(broadcast(n))
      .orderBy(col("i"), col("j"))
  }

  /** q144 — LABEL-CENTROID SIMILARITY MATRIX: pairwise cosine between the
    * per-label centroids — the class-confusion readout that tells a
    * metric-learning pipeline WHICH label pairs crowd each other (where
    * q113/q114's hard negatives will concentrate, and which IVF cells
    * multi-probe must pair). The corpus collapses to k centroids in one
    * aggregation (q57's exact floor-averaged integers), and the k×k matrix
    * is arithmetic on a LABEL-CARDINALITY frame — the cross product here
    * is k², never corpus², which is the entire point of centroid
    * summaries: at 100 TB, k stays human-sized while the corpus doesn't.
    * Micro-unit cosine from exact integer dots (correctly-rounded IEEE
    * sqrt/division on exact BIGINTs — engine-identical). */
  val q144CentroidSimilarity: Q = (s, dir) => {
    val cents = ivfCentroids(quantized(s, dir))
    val a = cents.select(col("clabel").cast("long").as("label_a"),
      col("cvec").as("va"), col("cn2").as("na"))
    val b = cents.select(col("clabel").cast("long").as("label_b"),
      col("cvec").as("vb"), col("cn2").as("nb"))
    a.crossJoin(broadcast(b)).filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        expr("CAST(round(dot_long(va, vb) / (sqrt(na) * sqrt(nb)) * 1000000, 0) AS BIGINT)")
          .as("cos_micro"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** q198 — RANDOM-PROJECTION (Johnson–Lindenstrauss) ANN with recall
    * audit: project the 64-dim corpus to 16 dims through a deterministic
    * ±1 sign matrix (Achlioptas 2003's database-friendly JL variant —
    * sign(b) from the portable md5 hash of "jl:i:j", so BOTH engines
    * derive the identical matrix with no stored artifact), run the brute
    * top-10 in the PROJECTED space, and mark each hit against the exact
    * top-10 (q55's truth) — the recall audit a pipeline runs before
    * trusting a cheaper index. Every projected component is an exact
    * BIGINT (±1 × integer-millionth components, |p_i| ≤ 64e6, dot ≤
    * 6.6e16 — overflow-safe), so cosines are the usual deterministic
    * double over exact ints.
    *
    * Shape at 100 TB: the matrix is 16×64 LITERALS broadcast once;
    * projection is pure map-side array arithmetic at the scan (a 4×
    * narrower vector into every downstream exchange/index — the point of
    * JL), and the audit joins two per-query top-10 lists. The projected
    * column is what q57/q117/q187's index family would ingest; this query
    * IS the measurement that says whether 16 dims kept enough recall. */
  val q198KnnJl: Q = (s, dir) => {
    val e = quantized(s, dir)
    val signs = s.range(16).select(col("id").as("i"))
      .crossJoin(s.range(64).select(col("id").as("j")))
      .withColumn("sgn", when(expr(
        "CAST(conv(substring(md5(concat('jl:', i, ':', j)), 1, 15), 16, 10) AS BIGINT) % 2 = 0"),
        lit(1L)).otherwise(lit(-1L)))
    val mat = broadcast(signs
      .groupBy(col("i"))
      .agg(expr("transform(array_sort(collect_list(struct(j, sgn))), x -> x.sgn)").as("r"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(i, r))), x -> x.r)").as("mat")))
    val proj = e.crossJoin(mat)
      .withColumn("p", expr(
        """transform(mat, r -> aggregate(zip_with(r, q, (a, b) -> a * b),
          |CAST(0 AS BIGINT), (acc, x) -> acc + x))""".stripMargin))
      .withColumn("pn2", expr("dot_long(p, p)"))
      .select(col("vec_id"), col("p"), col("pn2"))
    val queries = broadcast(proj.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("p").as("pq"), col("pn2").as("qn2")))
    val corpus = proj.select(col("vec_id").as("cid"), col("p").as("pc"),
      col("pn2").as("cn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosp").desc, col("cid"))
    val jl = queries.join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (expr("dot_long(pq, pc)") / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cosp"))
      .select(col("qid"), col("cid"), col("cosp"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 10)
    val exact = q55KnnBrute(s, dir)
      .select(col("qid"), col("cid"), lit(1L).as("in_exact"))
    jl.join(exact, Seq("qid", "cid"), "left")
      .select(col("qid"), col("rnk"), col("cid"), col("cosp"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** q199 — MMR DIVERSIFIED RERANK (Maximal Marginal Relevance, Carbonell
    * & Goldstein, SIGIR 1998): from each query's exact top-10 (q55's
    * candidate list), greedily select 3 results maximizing
    * λ·rel(c) − (1−λ)·max_{p∈picked} sim(c,p) with λ = 0.7 — the
    * standard redundancy-removal step between retrieval and a training /
    * RAG consumer, which plain top-k lacks (its hits cluster). The greedy
    * argmax is UNROLLED into 3 fixed rounds (the q189 relaxation-layer
    * discipline): round 1 is the rel-argmax, each later round joins the
    * remaining candidates to the picked set's pairwise-similarity rows
    * and takes the windowed top-1. rel and sim are the usual
    * deterministic doubles over exact-integer dots; ordering ties break
    * on cid, and scores surface as integer micros.
    *
    * Shape at 100 TB: candidate generation is the already-scaled
    * retrieval operator; everything after it touches only 5 queries ×
    * 10 candidates — the k×k similarity frame and every round-join are
    * broadcast-sized and CORPUS-INDEPENDENT, so reranking cost is O(k²)
    * per query no matter how big the corpus that produced the
    * candidates. Fixed unroll depth = fixed plan depth, no iteration. */
  val q199MmrRerank: Q = (s, dir) => {
    val e = quantized(s, dir)
    val queries = broadcast(e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2")))
    val wRel = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("cid"))
    val cand = queries
      .join(e.select(col("vec_id").as("cid"), col("q").as("qc"),
        col("n2").as("cn2")), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qc"), col("cn2"),
        (expr("dot_long(qq, qc)") / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("rel"))
      .withColumn("rnk", row_number().over(wRel))
      .filter(col("rnk") <= 10)
    val simsA = cand.select(col("qid"), col("cid").as("ca"),
      col("qc").as("va"), col("cn2").as("na"))
    val simsB = cand.select(col("qid"), col("cid").as("cb"),
      col("qc").as("vb"), col("cn2").as("nb"))
    val sims = simsA.join(broadcast(simsB), Seq("qid"))
      .filter(col("ca") =!= col("cb"))
      .select(col("qid"), col("ca"), col("cb"),
        (expr("dot_long(va, vb)") / (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
    val p1 = cand.filter(col("rnk") === 1)
      .select(col("qid"), col("cid").as("pc1"), col("rel").as("mmr1"))
    val wMmr = Window.partitionBy(col("qid")).orderBy(col("mmr").desc, col("cid"))
    val s1 = sims.select(col("qid").as("sq1"), col("ca").as("ca1"),
      col("cb").as("cb1"), col("sim").as("sim1"))
    val s2 = sims.select(col("qid").as("sq2"), col("ca").as("ca2"),
      col("cb").as("cb2"), col("sim").as("sim2"))
    val r2 = cand.select(col("qid"), col("cid"), col("rel"))
      .join(broadcast(p1), Seq("qid"))
      .filter(col("cid") =!= col("pc1"))
      .join(broadcast(s1), col("sq1") === col("qid") &&
        col("ca1") === col("cid") && col("cb1") === col("pc1"))
      .select(col("qid"), col("cid"), expr("0.7 * rel - 0.3 * sim1").as("mmr"))
    val p2 = r2.withColumn("rk", row_number().over(wMmr)).filter(col("rk") === 1)
      .select(col("qid"), col("cid").as("pc2"), col("mmr").as("mmr2"))
    val r3 = cand.select(col("qid"), col("cid"), col("rel"))
      .join(broadcast(p1), Seq("qid")).join(broadcast(p2), Seq("qid"))
      .filter(col("cid") =!= col("pc1") && col("cid") =!= col("pc2"))
      .join(broadcast(s1), col("sq1") === col("qid") &&
        col("ca1") === col("cid") && col("cb1") === col("pc1"))
      .join(broadcast(s2), col("sq2") === col("qid") &&
        col("ca2") === col("cid") && col("cb2") === col("pc2"))
      .select(col("qid"), col("cid"),
        expr("0.7 * rel - 0.3 * greatest(sim1, sim2)").as("mmr"))
    val p3 = r3.withColumn("rk", row_number().over(wMmr)).filter(col("rk") === 1)
      .select(col("qid"), col("cid").as("pc3"), col("mmr").as("mmr3"))
    val micro = (c: org.apache.spark.sql.Column) =>
      round(c * 1000000, 0).cast("long").as("mmr_micro")
    p1.select(col("qid"), lit(1L).as("pick"), col("pc1").as("cid"), micro(col("mmr1")))
      .unionByName(p2.select(col("qid"), lit(2L).as("pick"),
        col("pc2").as("cid"), micro(col("mmr2"))))
      .unionByName(p3.select(col("qid"), lit(3L).as("pick"),
        col("pc3").as("cid"), micro(col("mmr3"))))
      .orderBy(col("qid"), col("pick"))
  }

  /** q201 — DOMINANT PRINCIPAL COMPONENT by distributed POWER ITERATION,
    * with the ABTT variance accounting (Mu & Viswanath, ICLR 2018,
    * "All-but-the-Top": embedding quality improves when the dominant
    * direction — which encodes corpus-wide frequency bias, not meaning —
    * is measured and removed). Four unrolled rounds of v ← CᵀCv over the
    * mean-centered quantized corpus, then the explained-variance share of
    * the final direction — the measurement a pipeline runs before deciding
    * to debias, whiten, or drop a projection dimension.
    *
    * Determinism discipline (the q126/q184 exact-integer playbook, extended
    * to an iterated matvec): the mean vector rounds ONCE to integer micros;
    * every per-row projection c·v is an exact BIGINT dot (`dot_long`);
    * BOTH unbounded aggregations — the mean-vector component sum and
    * u_j = Σᵢ c_ij·eᵢ — sum 64-key DECIMAL(38,0) partial aggregates
    * (DuckDB's BIGINT sum is already exact HUGEINT, so both engines carry
    * the sums exactly at ANY corpus size — the places a raw LONG sum
    * would silently wrap); normalization
    * rescales through the exact max |u_j| to 8 significant digits, takes
    * one exact integer ‖w‖², and rounds each component once — so every
    * double op in the loop is a single correctly-rounded IEEE expression
    * over exact integers, shared textually with the oracle, and round-4's
    * state is replayed bit-for-bit.
    *
    * Shape at 100 TB: per round, ONE corpus scan computes the projections
    * map-side (v is a 64-long broadcast), and one 64-key partial-aggregated
    * shuffle carries the component sums — wire cost is dim-bounded and
    * corpus-independent; the centered corpus is cached once (q72's
    * discipline) and rounds are a fixed unrolled DAG, no driver loop. */
  val q201TopPc: Q = (s, dir) => powerIterationPc(quantized(s, dir), rounds = 4)

  /** The shared ABTT core: mean vector (1-row `m`), cached centered corpus
    * (`vec_id`, `c`), and the round-`rounds` iteration state (`v`, `mx`,
    * `nrm2`). q201 reports on it; q202 applies it. */
  private[graft] def abttParts(vecsIn: DataFrame, rounds: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(vecsIn.sparkSession)
    val e = vecsIn.select(col("vec_id"), col("q"))
    val nF = e.agg(count(lit(1)).as("n"))
    // the component sum is the OTHER unbounded aggregation here: carry it
    // in DECIMAL(38,0) like u_j below (DuckDB's BIGINT sum is HUGEINT), so
    // neither engine can wrap at any corpus size; it only ever feeds the
    // CAST-AS-DOUBLE mean, so no schema leaks
    val meanF = e.select(posexplode(col("q")))
      .groupBy(col("pos")).agg(sum(expr("CAST(col AS DECIMAL(38,0))")).as("sj"))
      .crossJoin(broadcast(nF))
      .select(col("pos"), expr("CAST(round(CAST(sj AS DOUBLE) / n) AS BIGINT)").as("mj"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(pos, mj))), x -> x.mj)").as("m"))
    val cent = e.crossJoin(broadcast(meanF))
      .select(col("vec_id"), expr("zip_with(q, m, (a, b) -> a - b)").as("c"))
      .cache()
    val v0 = meanF.select(expr("transform(m, x -> CAST(125000 AS BIGINT))").as("v"),
      lit(0L).cast("decimal(38,0)").as("mx"), lit(0L).as("nrm2"))
    def step(vPrev: DataFrame): DataFrame = {
      val d = cent.crossJoin(broadcast(vPrev.select(col("v"))))
        .select(col("c"), expr(
          "CAST(round(CAST(dot_long(c, v) AS DOUBLE) / 1000000.0) AS BIGINT)").as("e"))
      val u = d.select(col("e"), posexplode(col("c")))
        .groupBy(col("pos"))
        .agg(sum(expr("CAST(col * e AS DECIMAL(38,0))")).as("uj"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(pos, uj))), x -> x.uj)").as("u"))
      u.select(col("u"), expr("array_max(transform(u, x -> abs(x)))").as("mx"))
        .select(col("mx"), expr(
          "transform(u, x -> CAST(round((CAST(x AS DOUBLE) * 100000000.0) / CAST(mx AS DOUBLE)) AS BIGINT))").as("w"))
        .select(col("mx"), col("w"), expr("dot_long(w, w)").as("nrm2"))
        .select(expr(
          "transform(w, x -> CAST(round((CAST(x AS DOUBLE) * 1000000.0) / sqrt(CAST(nrm2 AS DOUBLE))) AS BIGINT))").as("v"),
          col("mx"), col("nrm2"))
    }
    (meanF, cent, (1 to rounds).foldLeft(v0)((acc, _) => step(acc)))
  }

  /** q201's engine over any (vec_id, q: array<bigint>) frame. */
  private[graft] def powerIterationPc(vecsIn: DataFrame, rounds: Int): DataFrame = {
    val (meanF, cent, last) = abttParts(vecsIn, rounds)
    val scalars = broadcast(last.select(col("v"), expr(
      "CAST(round(sqrt(CAST(nrm2 AS DOUBLE)) * CAST(mx AS DOUBLE) / 100000000.0) AS BIGINT)").as("unorm")))
    val stats = cent.crossJoin(scalars)
      .select(expr("dot_long(c, c)").as("cc"), expr(
        "CAST(round(CAST(dot_long(c, v) AS DOUBLE) / 1000000000.0) AS BIGINT)").as("g"))
      .agg(sum(expr("CAST(cc AS DECIMAL(38,0))")).as("tv"),
        sum(expr("CAST(g * g AS DECIMAL(38,0))")).as("ps"))
      .select(col("tv").cast("long").as("tot_var"), col("ps").cast("long").as("proj_scaled"),
        expr("CAST(round(CAST(ps AS DOUBLE) * 1000000000000.0 / CAST(tv AS DOUBLE)) AS BIGINT)")
          .as("share_micro"))
    meanF.crossJoin(scalars).crossJoin(broadcast(stats))
      .select(posexplode(expr("arrays_zip(m, v)")) +: Seq(col("unorm"), col("tot_var"),
        col("proj_scaled"), col("share_micro")): _*)
      .select(col("pos").cast("long").as("j"), col("col.m").as("mean_micro"),
        col("col.v").as("v_micro"), col("unorm"), col("tot_var"),
        col("proj_scaled"), col("share_micro"))
      .orderBy(col("j"))
  }

  /** q202 — ALL-BUT-THE-TOP DEBIAS APPLY + retrieval-delta audit: remove the
    * q201-measured dominant component from every centered vector
    * (c′ = c − (c·v̂)v̂, each product a single correctly-rounded IEEE op over
    * exact integers) and report, per query, the top-3 cosine neighbours
    * BEFORE (centered) and AFTER (debiased) side by side with a moved flag —
    * the validation a pipeline runs after q201 says "debias" and before the
    * cheaper index is rebuilt on the debiased column (Mu & Viswanath 2018
    * report neighbour quality improving exactly here).
    *
    * Shape at 100 TB: the direction comes from q201's dimension-bounded
    * iteration; debias is pure map-side array arithmetic under a broadcast
    * 64-long v (at scale it is written once as a stored column beside the
    * SQ8/IVF codes, q117's discipline); each audit leg is the q55/q198
    * broadcast-query scan ending in a per-partition top-k window cut, and
    * the before/after join is k-row-bounded per query. */
  /** q202's debias frame: (vec_id, c, c2, n2c, n2d) — centered vector, its
    * all-but-the-top residual c′ = c − (c·v̂)v̂ (two single-rounded integer
    * ops, oracle-replayable), and both exact squared norms. Cached: both
    * audit legs scan it. */
  private[graft] def abttDebiased(vecsIn: DataFrame, rounds: Int): DataFrame = {
    val (_, cent, last) = abttParts(vecsIn, rounds)
    cent.crossJoin(broadcast(last.select(col("v"))))
      .withColumn("g", expr(
        "CAST(round(CAST(dot_long(c, v) AS DOUBLE) / 1000000.0) AS BIGINT)"))
      .select(col("vec_id"), col("c"), expr(
        """zip_with(c, v, (a, b) ->
          |a - CAST(round(CAST(g AS DOUBLE) * CAST(b AS DOUBLE) / 1000000.0) AS BIGINT))"""
          .stripMargin).as("c2"))
      .select(col("vec_id"), col("c"), col("c2"),
        expr("dot_long(c, c)").as("n2c"), expr("dot_long(c2, c2)").as("n2d"))
      .cache()
  }

  val q202AbttDebias: Q = (s, dir) => {
    val deb = abttDebiased(quantized(s, dir), rounds = 4)
    def top3(vecCol: String, n2Col: String, suffix: String): DataFrame = {
      val queries = broadcast(deb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col(vecCol).as("qq"), col(n2Col).as("qn2")))
      val corpus = deb.select(col("vec_id").as("cid"), col(vecCol).as("qc"),
        col(n2Col).as("cn2"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      queries.join(corpus, col("qid") =!= col("cid") && col("cn2") > 0 && col("qn2") > 0)
        .select(col("qid"), col("cid"),
          (dotExpr / (sqrt(col("qn2")) * sqrt(col("cn2")))).as("cos"))
        .select(col("qid"), col("cid"), col("cos"),
          row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("cid").as(s"cid_$suffix"),
          col("cos").as(s"cos_$suffix"))
    }
    top3("c", "n2c", "cent").join(top3("c2", "n2d", "deb"), Seq("qid", "rnk"))
      .select(col("qid"), col("rnk"), col("cid_cent"), col("cos_cent"),
        col("cid_deb"), col("cos_deb"),
        when(col("cid_cent") === col("cid_deb"), lit(0L)).otherwise(lit(1L)).as("moved"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** q203 — LINEAR CLASSIFIER TRAINING by batch perceptron (Rosenblatt 1958;
    * the distributed-trainable core of the fastText-style label/quality
    * filters of Joulin et al. 2017 that LLM corpus pipelines run over every
    * document): four unrolled batch rounds of w ← w + Σ_misclassified y·x
    * over centi-quantized embeddings (binary target: label ≤ 4), reporting
    * the final integer weights/bias beside each round's misclassified count
    * — the training curve and the model in one frame.
    *
    * Determinism discipline: centi quantization (one rounding at the scan)
    * keeps every margin, update, and count EXACT BIGINT end to end — no
    * float enters training at all, so DuckDB replays all four rounds
    * bit-for-bit (q201's playbook with zero IEEE expressions). The
    * misclassified mask folds into conditional aggregates over ALL rows
    * (never a filtered-empty frame), so a separable round degrades to a
    * zero delta, not a missing one.
    *
    * Shape at 100 TB: per round ONE scan of the cached (y, x) corpus
    * projects margins map-side under the broadcast 64-long w, and the only
    * exchange is ONE 65-key partial-aggregated delta sum (the bias update
    * rides position 64 as a synthetic all-ones feature, the error count is
    * the per-key row count) — wire cost dimension-bounded and
    * corpus-independent, the q201 iterated profile; rounds are a fixed
    * unrolled DAG, no driver loop. */
  val q203Perceptron: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.load(s, dir, "embeddings").select(
      expr("CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END").as("y"),
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT))").as("x"))
    perceptronRounds(e, rounds = 4)
  }

  /** q203's engine over any (y: ±1 bigint, x: array<bigint>) frame,
    * reported as one row per weight position. */
  private[graft] def perceptronRounds(labeled: DataFrame, rounds: Int): DataFrame = {
    val last = perceptronFit(labeled, rounds)
    last.select(posexplode(col("w")) +: Seq(col("b"), col("errs")): _*)
      .select(col("pos").cast("long").as("j"), col("col").as("w_cj"),
        col("b").as("bias"), expr("errs[0]").as("err1"), expr("errs[1]").as("err2"),
        expr("errs[2]").as("err3"), expr("errs[3]").as("err4"))
      .orderBy(col("j"))
  }

  /** The trained model as a 1-row frame (w: array<bigint>, b, errs). */
  private[graft] def perceptronFit(labeled: DataFrame, rounds: Int): DataFrame = {
    graft.functions.GraftFunctions.register(labeled.sparkSession)
    val e = labeled.select(col("y"), col("x")).cache()
    val w0 = e.groupBy().agg(count(lit(1)).as("n"))
      .select(expr("transform(sequence(1, 64), i -> CAST(0 AS BIGINT))").as("w"),
        lit(0L).as("b"), expr("CAST(array() AS ARRAY<BIGINT>)").as("errs"))
    def step(prev: DataFrame): DataFrame = {
      val m = e.crossJoin(broadcast(prev.select(col("w"), col("b"))))
        .withColumn("mis", when(
          col("y") * (expr("dot_long(x, w)") + col("b")) <= 0, lit(1L)).otherwise(lit(0L)))
      // ONE 65-key exchange per round: the bias update rides position 64 as
      // a synthetic all-ones feature, and every position group sees every
      // row, so the misclassified count is the same sum at any key.
      val agg = m.select(col("mis"), col("y"),
          posexplode(expr("concat(x, array(CAST(1 AS BIGINT)))")))
        .groupBy(col("pos"))
        // accumulate the delta in DECIMAL(38,0) (exact at any corpus size —
        // partial sums cannot wrap), cast back once: the final value must
        // fit BIGINT anyway for the BIGINT weights to be meaningful, and a
        // non-ANSI decimal→bigint overflow surfaces as NULL, never as a
        // silently wrapped weight; errp is bounded by the row count
        .agg(expr("CAST(sum(CAST(mis * y * col AS DECIMAL(38,0))) AS BIGINT)").as("dj"),
          sum(col("mis")).as("errp"))
        .groupBy()
        .agg(expr("transform(array_sort(collect_list(struct(pos, dj))), s -> s.dj)").as("dall"),
          max(col("errp")).as("err"))
      prev.crossJoin(broadcast(agg))
        .select(expr("zip_with(w, slice(dall, 1, 64), (a, c) -> a + c)").as("w"),
          (col("b") + expr("dall[64]")).as("b"),
          expr("concat(errs, array(err))").as("errs"))
    }
    (1 to rounds).foldLeft(w0)((acc, _) => step(acc))
  }

  /** q204 — HELD-OUT CLASSIFIER EVALUATION, the other half of q203 and the
    * gate every filter model passes before it scores a corpus: fit the
    * batch perceptron on the EVEN vec_ids, score the odd held-out half
    * under the broadcast model, and report the confusion matrix with
    * single-rounded integer-micro accuracy / precision / recall / F1 — F1
    * computed directly from counts (2tp/(2tp+fp+fn)), never from the
    * already-rounded precision/recall, so each metric is one IEEE op over
    * exact integers (the q129 discipline).
    *
    * Shape at 100 TB: training is q203's dimension-bounded loop on its
    * split; evaluation is ONE map-side scan of the held-out split under the
    * broadcast 64-long model and a single 4-cell conditional rollup — no
    * exchange carries corpus rows. Zero-denominator cells degrade to 0, not
    * null, replicated in the oracle. */
  val q204ClassifierEval: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val all = Tables.load(s, dir, "embeddings").select(col("vec_id"),
      expr("CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END").as("y"),
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT))").as("x"))
    val model = perceptronFit(
      all.filter(col("vec_id") % 2 === 0).select(col("y"), col("x")), rounds = 4)
    classifierEval(model, all.filter(col("vec_id") % 2 === 1))
  }

  /** q204's scorer: confusion matrix + single-rounded micro metrics of a
    * 1-row (w, b) model over a held-out (y, x) frame. */
  private[graft] def classifierEval(model: DataFrame, held: DataFrame): DataFrame = {
    val cm = held
      .crossJoin(broadcast(model.select(col("w"), col("b"))))
      .select(col("y"), when(expr("dot_long(x, w)") + col("b") > 0, lit(1L))
        .otherwise(lit(-1L)).as("p"))
      .agg(
        sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === -1 && col("p") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("p") === -1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === -1 && col("p") === -1, 1L).otherwise(0L)).as("tn"))
    cm.select(col("tp"), col("fp"), col("fn"), col("tn"),
      expr("CAST(round((tp + tn) * 1000000.0 / (tp + fp + fn + tn)) AS BIGINT)")
        .as("acc_micro"),
      expr("CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(round(tp * 1000000.0 / (tp + fp)) AS BIGINT) END").as("prec_micro"),
      expr("CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(round(tp * 1000000.0 / (tp + fn)) AS BIGINT) END").as("rec_micro"),
      expr("CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(round(2 * tp * 1000000.0 / (2 * tp + fp + fn)) AS BIGINT) END").as("f1_micro"))
  }

  /** q205 — PRECISION/RECALL OPERATING CURVE over the held-out margins: the
    * threshold-selection table a pipeline reads between q204's single-point
    * eval and actually filtering a corpus ("keep the top-k% by classifier
    * margin — at what precision and recall?"). Sixteen evenly spaced
    * rank cutoffs k_i = ⌈n·i/16⌉ over the margin-sorted held-out half, each
    * reporting the margin at the cutoff, cumulative true positives, and
    * single-rounded integer-micro precision/recall.
    *
    * Shape at 100 TB: the model is q203's dimension-bounded training; the
    * curve sorts ONLY the held-out evaluation sample (bounded by design —
    * an eval set is a sample, never the corpus), so the single-partition
    * rank window is over thousands of rows while the corpus-sized work
    * stays map-side; the 16 cutoffs join against a broadcast 16-row frame.
    * Ties break on vec_id so both engines rank identically. */
  val q205ThresholdCurve: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val all = Tables.load(s, dir, "embeddings").select(col("vec_id"),
      expr("CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END").as("y"),
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT))").as("x"))
    val model = perceptronFit(
      all.filter(col("vec_id") % 2 === 0).select(col("y"), col("x")), rounds = 4)
    thresholdCurve(model, all.filter(col("vec_id") % 2 === 1))
  }

  /** q205's curve: 16 rank-cutoff rows of a 1-row (w, b) model's margins
    * over a held-out (vec_id, y, x) frame. */
  private[graft] def thresholdCurve(model: DataFrame, held: DataFrame): DataFrame = {
    val scored = held.crossJoin(broadcast(model.select(col("w"), col("b"))))
      .select(col("vec_id"), col("y"), (expr("dot_long(x, w)") + col("b")).as("margin"))
    val ord = Window.orderBy(col("margin").desc, col("vec_id"))
    val ranked = scored
      .select(col("y"), col("margin"), row_number().over(ord).cast("long").as("rnk"),
        sum(when(col("y") === 1, 1L).otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_tp"))
    val st = scored.agg(count(lit(1)).as("n"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("pos"))
    val ks = broadcast(scored.sparkSession.range(1, 17).select(col("id").as("i"))
      .crossJoin(broadcast(st))
      .select(col("i"), expr("CAST((n * i + 15) DIV 16 AS BIGINT)").as("k"), col("pos")))
    ks.join(ranked, col("k") === col("rnk"))
      .select(col("i"), col("k"), col("margin").as("margin_at_k"), col("cum_tp"),
        expr("CAST(round(cum_tp * 1000000.0 / k) AS BIGINT)").as("prec_micro"),
        expr("CASE WHEN pos = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "CAST(round(cum_tp * 1000000.0 / pos) AS BIGINT) END").as("rec_micro"))
      .orderBy(col("i"))
  }

  /** q216 — ISOTONIC CALIBRATION (pool-adjacent-violators) of the held-out
    * reliability table: the step a filter model takes between q205's
    * operating curve and production use — raw margins are NOT
    * probabilities, so the pipeline bins the held-out margins, reads the
    * empirical positive rate per bin, and fits the best monotone
    * (isotonic) rate curve; the fitted value is the calibrated score a
    * corpus-filter threshold actually means. PAV is computed EXACTLY via
    * its minimax characterization fit_i = max_{j≤i} min_{k≥i} A(j,k)
    * (A = pooled positive rate over bins j..k) — on B = 16 bins that is a
    * bounded B³ enumeration evaluated in ONE projection over the collected
    * bin array (nested transform/aggregate HOFs), a shape identical at any
    * corpus size, instead of the sequential pool-merge loop that does not
    * distribute. All rates are floor-ppm integers; `gap_mass =
    * |raw − iso|·n` is the monotonicity-violation mass a drifting
    * classifier alarms on.
    *
    * Shape at 100 TB: training is q203's dimension-bounded loop; scoring
    * the held-out sample is map-side under the broadcast model; binning
    * ranks only the bounded eval sample (q205's declared caveat); the PAV
    * enumeration touches a single 16-element array — no corpus exchange,
    * no self-joins (each self-join would recompute the training upstream).
    * Ties break on vec_id so both engines bin identically. */
  val q216CalibrationIso: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    val all = Tables.load(s, dir, "embeddings").select(col("vec_id"),
      expr("CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END").as("y"),
      expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT))").as("x"))
    val model = perceptronFit(
      all.filter(col("vec_id") % 2 === 0).select(col("y"), col("x")), rounds = 4)
    isotonicCalibration(model, all.filter(col("vec_id") % 2 === 1))
  }

  /** q216's fit: 16 reliability-table rows with the exact PAV (minimax)
    * isotonic rate, from a 1-row (w, b) model over a held-out frame.
    * Bins are explicit rank arithmetic `(rnk−1)·B DIV n + 1` (ascending
    * margin), not ntile, so both engines bin identically by construction. */
  private[graft] def isotonicCalibration(model: DataFrame, held: DataFrame): DataFrame = {
    val scored = held.crossJoin(broadcast(model.select(col("w"), col("b"))))
      .select(col("vec_id"), col("y"), (expr("dot_long(x, w)") + col("b")).as("margin"))
    val ord = Window.orderBy(col("margin"), col("vec_id"))
    // total count rides the SAME single-partition window stage as the rank
    // (a separate count().crossJoin would re-run the scoring + training
    // lineage a second time), keeping the whole fit one linear pass
    val withN = scored
      .select(col("y"), col("margin"), row_number().over(ord).cast("long").as("rnk"),
        count(lit(1)).over(ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n"))
    val bins = withN
      .select(col("y"), col("margin"), expr("(rnk - 1) * 16 DIV n + 1").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        min(col("margin")).as("margin_lo"),
        max(col("margin")).as("margin_hi"))
    // the whole B³ minimax runs in ONE projection over the collected
    // 16-element bin array (A(j,k) = pooled floor-ppm rate over bins
    // j..k via aggregate-over-slice) — no self-joins, so the expensive
    // upstream (training + scoring + rank) is computed exactly once
    bins
      .agg(expr("array_sort(collect_list(struct(bin, n, n_pos, margin_lo, margin_hi)))")
        .as("bs"))
      .select(expr(
        """transform(sequence(1, size(bs)), i ->
          |  array_max(transform(sequence(1, i), j ->
          |    array_min(transform(sequence(i, size(bs)), k ->
          |      aggregate(slice(bs, j, k - j + 1),
          |        named_struct('p', 0L, 'cnt', 0L),
          |        (acc, x) -> named_struct('p', acc.p + x.n_pos,
          |                                 'cnt', acc.cnt + x.n),
          |        acc -> acc.p * 1000000 DIV acc.cnt)))))) """.stripMargin).as("iso"),
        col("bs"))
      .select(expr(
        """inline(zip_with(bs, iso, (b, s) -> named_struct(
          |  'bin', b.bin, 'n', b.n, 'n_pos', b.n_pos,
          |  'margin_lo', b.margin_lo, 'margin_hi', b.margin_hi,
          |  'raw_ppm', b.n_pos * 1000000 DIV b.n, 'iso_ppm', s,
          |  'gap_mass', abs(b.n_pos * 1000000 DIV b.n - s) * b.n)))""".stripMargin))
      .orderBy(col("bin"))
  }

  def queries: Map[String, Q] = Map(
    "q216_calibration_iso" -> q216CalibrationIso,
    "q205_threshold_curve" -> q205ThresholdCurve,
    "q204_classifier_eval" -> q204ClassifierEval,
    "q203_perceptron" -> q203Perceptron,
    "q202_abtt_debias" -> q202AbttDebias,
    "q201_top_pc" -> q201TopPc,
    "q199_mmr_rerank" -> q199MmrRerank,
    "q198_knn_jl" -> q198KnnJl,
    "q144_centroid_similarity" -> q144CentroidSimilarity,
    "q117_knn_sq8" -> q117KnnSq8,
    "q187_knn_ivf_pq" -> q187KnnIvfPq,
    "q184_knn_pq" -> q184KnnPq,
    "q123_knn_ivf_sq8" -> q123KnnIvfSq8,
    "q126_gram_matrix" -> q126GramMatrix,
    "q114_hard_negatives_ivf" -> q114HardNegativesIvf,
    "q113_hard_negatives" -> q113HardNegatives,
    "q83_semantic_dedup_incremental" -> q83SemanticDedupIncremental,
    "q55_knn_brute" -> q55KnnBrute,
    "q56_knn_lsh"   -> q56KnnLsh,
    "q57_knn_ivf"   -> q57KnnIvf,
    "q75_knn_ivf_multiprobe" -> q75KnnIvfMultiprobe,
    "q72_kmeans_step" -> q72KMeansStep,
    "q76_kmeans_iter" -> q76KMeansIter,
    "q80_semantic_dedup" -> q80SemanticDedup)

  /** Shared DuckDB replay of the ABTT core (q201 measure / q202 apply):
    * quantize → exact-zero-rounded mean → centered corpus `cent` → four
    * power-iteration rounds, each round one exact HUGEINT component sum
    * (DuckDB's BIGINT-sum default, mirroring Spark's DECIMAL(38,0)) →
    * max-rescale to 8 digits → exact ||w||² → unit micro vector. Binds
    * `cent`, `mean`, and round-4 state `v4`/`m4`/`nn4`. */
  private val duckAbtt: String = {
    def rnd(k: Int, prev: String): String = s"""
      d$k AS MATERIALIZED (
        SELECT c, CAST(round(CAST(list_sum([c[i] * v[i] for i in range(1, 65)]) AS DOUBLE)
          / 1000000.0) AS BIGINT) AS e
        FROM cent, $prev),
      u$k AS MATERIALIZED (SELECT j, sum(c[j+1] * e) AS uj FROM d$k, range(64) t(j) GROUP BY j),
      m$k AS MATERIALIZED (SELECT max(abs(uj)) AS mx FROM u$k),
      w$k AS MATERIALIZED (SELECT j, CAST(round((CAST(uj AS DOUBLE) * 100000000.0)
          / CAST(mx AS DOUBLE)) AS BIGINT) AS wj FROM u$k, m$k),
      nn$k AS MATERIALIZED (SELECT CAST(sum(wj * wj) AS BIGINT) AS nrm2 FROM w$k),
      v$k AS MATERIALIZED (SELECT list(CAST(round((CAST(wj AS DOUBLE) * 1000000.0)
          / sqrt(CAST(nrm2 AS DOUBLE))) AS BIGINT) ORDER BY j) AS v FROM w$k, nn$k)"""
    s"""q AS MATERIALIZED (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      cnt AS (SELECT count(*) AS n FROM q),
      sums AS (SELECT j, sum(qv[j+1]) AS sj FROM q, range(64) t(j) GROUP BY j),
      mean AS (SELECT j, CAST(round(CAST(sj AS DOUBLE) / n) AS BIGINT) AS mj
               FROM sums, cnt),
      meanv AS (SELECT list(mj ORDER BY j) AS m FROM mean),
      cent AS MATERIALIZED (SELECT vec_id, [qv[i] - m[i] for i in range(1, 65)] AS c
               FROM q, meanv),
      v0 AS (SELECT [CAST(125000 AS BIGINT) for i in range(64)] AS v),
      ${rnd(1, "v0")},
      ${rnd(2, "v1")},
      ${rnd(3, "v2")},
      ${rnd(4, "v3")}"""
  }

  /** Shared DuckDB replay of the batch-perceptron training loop (q203 train
    * / q204 train-then-eval): expects a bound CTE `e` (y: ±1, x: centi
    * list); emits w0 and four MATERIALIZED rounds — margins over ALL rows
    * with a 0/1 mask (a separable round gives a zero delta, never an empty
    * frame), 64-key delta sum, 1-row (db, err) rollup, updated weight list
    * — all exact BIGINT, no floats anywhere. Binds w1..w4 and s1..s4. */
  private val duckPerceptron: String = {
    def rnd(k: Int, prev: String): String = s"""
      mar$k AS MATERIALIZED (
        SELECT y, x, CASE WHEN y * (CAST(list_sum([x[i] * w[i]
            for i in range(1, 65)]) AS BIGINT) + b) <= 0 THEN 1 ELSE 0 END AS mis
        FROM e, $prev),
      d$k AS MATERIALIZED (
        SELECT j, CAST(sum(mis * y * x[j+1]) AS BIGINT) AS dj
        FROM mar$k, range(64) t(j) GROUP BY j),
      s$k AS MATERIALIZED (
        SELECT CAST(sum(mis * y) AS BIGINT) AS db, CAST(sum(mis) AS BIGINT) AS err
        FROM mar$k),
      w$k AS MATERIALIZED (
        SELECT list(p.w[d.j+1] + d.dj ORDER BY d.j) AS w, min(p.b + s.db) AS b
        FROM d$k d, $prev p, s$k s)"""
    s"""w0 AS (SELECT [CAST(0 AS BIGINT) for i in range(64)] AS w,
             CAST(0 AS BIGINT) AS b),
      ${rnd(1, "w0")},
      ${rnd(2, "w1")},
      ${rnd(3, "w2")},
      ${rnd(4, "w3")}"""
  }

  /** One DuckDB Lloyd step as a CTE block: centroids `$from` → `c$step`,
    * mirroring [[lloydStep]] exactly (assign by (d2, cid), floor means,
    * empty cluster keeps its centroid via the left-join coalesce). */
  private def duckLloyd(step: Int, from: String): String = s"""
      s${step}n AS (
        SELECT cid, cq, CAST(list_sum([x * x for x in cq]) AS BIGINT) AS cn2
        FROM $from),
      d$step AS (
        SELECT n.vec_id, n.qv, s.cid,
          n.n2 - 2 * CAST(list_sum([n.qv[k] * s.cq[k]
                                    for k in range(1, len(n.qv)+1)]) AS BIGINT)
               + s.cn2 AS d2
        FROM n, s${step}n s),
      b$step AS (
        SELECT vec_id, qv, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS r
          FROM d$step) WHERE r = 1),
      m$step AS (
        SELECT cid, pos, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        FROM (SELECT cid, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM b$step)
        GROUP BY cid, pos),
      c$step AS (
        SELECT s.cid, coalesce(m.cq2, s.cq) AS cq
        FROM $from s LEFT JOIN
          (SELECT cid, list(cv ORDER BY pos) AS cq2 FROM m$step GROUP BY cid) m
          USING (cid))"""

  private val duckQuant = """
    q AS (
      SELECT vec_id, label,
        [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
      FROM embeddings),
    n AS (
      SELECT vec_id, label, qv,
        CAST(list_sum([x * x for x in qv]) AS BIGINT) AS n2 FROM q)"""

  /** One grouped-by-subspace DuckDB Lloyd step for the PQ oracle: codebook
    * `$from` (sub, cid, cv) → `pb$step`, mirroring [[pqLloydStep]] exactly
    * (reduced distance cn2 − 2·dot, (d2, cid) tie-break, floor means,
    * empty centroid keeps its position). */
  private def duckPqLloyd(step: Int, from: String): String = s"""
      pd$step AS (
        SELECT v.vec_id, v.sub, v.sv, c.cid,
          CAST(list_sum([c.cv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT)
            - 2 * CAST(list_sum([v.sv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT) AS d2
        FROM sv v JOIN $from c ON v.sub = c.sub),
      pa$step AS (
        SELECT vec_id, sub, sv, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS r
          FROM pd$step) WHERE r = 1),
      pm$step AS (
        SELECT sub, cid, pos, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cvi
        FROM (SELECT sub, cid, generate_subscripts(sv, 1) AS pos, unnest(sv) AS v
              FROM pa$step)
        GROUP BY sub, cid, pos),
      pb$step AS (
        SELECT s.sub, s.cid, coalesce(m.cv2, s.cv) AS cv
        FROM $from s LEFT JOIN
          (SELECT sub, cid, list(cvi ORDER BY pos) AS cv2 FROM pm$step
           GROUP BY sub, cid) m
          ON s.sub = m.sub AND s.cid = m.cid)"""

  def oracles: Map[String, String] = Map(
    // the full IVFPQ replay: per-label coarse centroids, corpus residuals,
    // 2 grouped Lloyd steps on residual subvectors, residual coding,
    // per-(query, cell) LUTs, ADC over probed cells, exact rerank
    "q187_knn_ivf_pq" -> s"""
      WITH $duckQuant,
      comp AS (
        SELECT label, pos, CAST(floor(avg(v)) AS BIGINT) AS cv
        FROM (SELECT label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM n)
        GROUP BY label, pos),
      centn AS (
        SELECT CAST(label AS BIGINT) AS clabel, list(cv ORDER BY pos) AS cvec,
          CAST(list_sum([c2 * c2 for c2 in list(cv ORDER BY pos)]) AS BIGINT)
            AS cn2
        FROM comp GROUP BY label),
      res AS (
        SELECT v.vec_id, CAST(v.label AS BIGINT) AS label,
          [v.qv[k] - c.cvec[k] for k in range(1, 65)] AS rv
        FROM n v JOIN centn c ON CAST(v.label AS BIGINT) = c.clabel),
      sv AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub, rv[s*16+1 : s*16+16] AS sv
        FROM res, range(0, 4) r(s)),
      seed AS (SELECT sub, vec_id AS cid, sv AS cv FROM sv WHERE vec_id < 8),
      ${duckPqLloyd(1, "seed")},
      ${duckPqLloyd(2, "pb1")},
      dc AS (
        SELECT v.vec_id, v.sub, c.cid,
          CAST(list_sum([c.cv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT)
            - 2 * CAST(list_sum([v.sv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT) AS d2
        FROM sv v JOIN pb2 c ON v.sub = c.sub),
      codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS r
          FROM dc) WHERE r = 1),
      qasg AS (
        SELECT a.vec_id AS qid, c.clabel, c.cvec,
          CAST(list_sum([a.qv[k] * c.cvec[k] for k in range(1, 65)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(c.cn2)) AS ccos
        FROM n a JOIN centn c ON a.vec_id < 5),
      probed AS (
        SELECT qid, clabel, cvec FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, clabel) AS r
          FROM qasg) WHERE r <= 2),
      qres AS (
        SELECT p.qid, p.clabel, [a.qv[k] - p.cvec[k] for k in range(1, 65)] AS qr
        FROM probed p JOIN n a ON a.vec_id = p.qid),
      qsv AS (
        SELECT qid, clabel, CAST(s AS BIGINT) AS sub, qr[s*16+1 : s*16+16] AS sv
        FROM qres, range(0, 4) r(s)),
      lut AS (
        SELECT q2.qid, q2.clabel, c.sub, c.cid AS code,
          CAST(list_sum([q2.sv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT) AS pd
        FROM qsv q2 JOIN pb2 c ON q2.sub = c.sub),
      ap AS (
        SELECT l.qid, x.vec_id AS cid, CAST(sum(l.pd) AS BIGINT) AS approx
        FROM codes x
        JOIN res rr ON rr.vec_id = x.vec_id
        JOIN lut l ON l.clabel = rr.label AND x.sub = l.sub AND x.code = l.code
        WHERE l.qid <> x.vec_id
        GROUP BY 1, 2),
      cand AS (
        SELECT qid, cid, approx FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arnk
          FROM ap) WHERE arnk <= 16),
      rer AS (
        SELECT c.qid, c.cid, c.approx,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, 65)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM cand c JOIN n a ON a.vec_id = c.qid JOIN n b ON b.vec_id = c.cid),
      ranked AS (
        SELECT qid, cid, approx, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM rer)
      SELECT qid, cid, approx, cos, rnk FROM ranked WHERE rnk <= 3
      ORDER BY qid, rnk""",
    // full PQ replay: subspace split, 2 grouped Lloyd steps, coding, LUT,
    // ADC scoring, exact rerank — every stage exact BIGINT like the engine
    "q184_knn_pq" -> s"""
      WITH $duckQuant,
      sv AS (
        SELECT vec_id, CAST(s AS BIGINT) AS sub, qv[s*16+1 : s*16+16] AS sv
        FROM q, range(0, 4) r(s)),
      seed AS (SELECT sub, vec_id AS cid, sv AS cv FROM sv WHERE vec_id < 8),
      ${duckPqLloyd(1, "seed")},
      ${duckPqLloyd(2, "pb1")},
      dc AS (
        SELECT v.vec_id, v.sub, c.cid,
          CAST(list_sum([c.cv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT)
            - 2 * CAST(list_sum([v.sv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT) AS d2
        FROM sv v JOIN pb2 c ON v.sub = c.sub),
      codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS r
          FROM dc) WHERE r = 1),
      lut AS (
        SELECT v.vec_id AS qid, c.sub, c.cid AS code,
          CAST(list_sum([v.sv[k] * c.cv[k] for k in range(1, 17)]) AS BIGINT) AS pd
        FROM sv v JOIN pb2 c ON v.sub = c.sub
        WHERE v.vec_id < 5),
      ap AS (
        SELECT l.qid, x.vec_id AS cid, CAST(sum(l.pd) AS BIGINT) AS approx
        FROM codes x JOIN lut l ON x.sub = l.sub AND x.code = l.code
        WHERE l.qid <> x.vec_id
        GROUP BY 1, 2),
      cand AS (
        SELECT qid, cid, approx FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arnk
          FROM ap) WHERE arnk <= 16),
      rer AS (
        SELECT c.qid, c.cid, c.approx,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, 65)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM cand c JOIN n a ON a.vec_id = c.qid JOIN n b ON b.vec_id = c.cid),
      ranked AS (
        SELECT qid, cid, approx, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM rer)
      SELECT qid, cid, approx, cos, rnk FROM ranked WHERE rnk <= 3
      ORDER BY qid, rnk""",
    "q144_centroid_similarity" -> s"""
      WITH $duckQuant,
      comp AS (
        SELECT label, pos, CAST(floor(avg(v)) AS BIGINT) AS cv
        FROM (SELECT label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM n)
        GROUP BY label, pos),
      cents AS (
        SELECT CAST(label AS BIGINT) AS label, list(cv ORDER BY pos) AS cvec,
          CAST(list_sum([c2 * c2 for c2 in list(cv ORDER BY pos)]) AS BIGINT)
            AS cn2
        FROM comp GROUP BY label)
      SELECT a.label AS label_a, b.label AS label_b,
        CAST(round(
          CAST(list_sum([a.cvec[k] * b.cvec[k]
                         for k in range(1, len(a.cvec)+1)]) AS BIGINT)
            / (sqrt(a.cn2) * sqrt(b.cn2)) * 1000000, 0) AS BIGINT) AS cos_micro
      FROM cents a, cents b WHERE a.label < b.label
      ORDER BY label_a, label_b""",
    "q126_gram_matrix" -> """
      WITH q AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      ex AS (
        SELECT vec_id, generate_subscripts(qv, 1) - 1 AS p, unnest(qv) AS v
        FROM q),
      g AS (
        SELECT a.p AS i, b.p AS j, CAST(sum(a.v * b.v) AS BIGINT) AS s
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.p <= b.p
        GROUP BY 1, 2),
      n AS (SELECT count(*) AS n_rows FROM q)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, s, n_rows
      FROM g, n ORDER BY i, j""",
    "q123_knn_ivf_sq8" -> s"""
      WITH $duckQuant,
      rg AS (
        SELECT pos, min(v) AS mn, max(v) AS mx
        FROM (SELECT generate_subscripts(qv, 1) AS pos, unnest(qv) AS v FROM n)
        GROUP BY pos),
      rr AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
             FROM rg),
      coded AS (
        SELECT vec_id, label, qv, n2,
          [CASE WHEN (rr.mxs[k] - rr.mns[k]) > 0
                THEN ((qv[k] - rr.mns[k]) * 255) // (rr.mxs[k] - rr.mns[k])
                ELSE 0 END
           for k in range(1, len(qv)+1)] AS code
        FROM n, rr),
      comp AS (
        SELECT label, pos, CAST(floor(avg(v)) AS BIGINT) AS cv
        FROM (SELECT label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM n)
        GROUP BY label, pos),
      cents AS (
        SELECT label AS clabel, list(cv ORDER BY pos) AS cvec,
          CAST(list_sum([c2 * c2 for c2 in list(cv ORDER BY pos)]) AS BIGINT) AS cn2
        FROM comp GROUP BY label),
      assigned AS (
        SELECT a.vec_id AS qid, a.qv, a.n2, a.code, c.clabel,
          CAST(list_sum([a.qv[k] * c.cvec[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(c.cn2)) AS ccos
        FROM coded a, cents c WHERE a.vec_id < 5),
      cell AS (
        SELECT qid, qv, n2, code, clabel FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, clabel) AS r
          FROM assigned) WHERE r <= 2),
      ap AS (
        SELECT cell.qid, b.vec_id AS cid,
          cell.qv AS aqv, cell.n2 AS an2, b.qv AS bqv, b.n2 AS bn2,
          CAST(list_sum([(cell.code[k] - 128) * (b.code[k] - 128)
                         for k in range(1, len(cell.code)+1)]) AS BIGINT) AS approx
        FROM cell JOIN coded b ON cell.clabel = b.label AND cell.qid != b.vec_id),
      cand AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arnk
          FROM ap) WHERE arnk <= 16),
      rer AS (
        SELECT qid, cid, approx,
          CAST(list_sum([aqv[k] * bqv[k] for k in range(1, len(aqv)+1)]) AS BIGINT)
            / (sqrt(an2) * sqrt(bn2)) AS cos
        FROM cand),
      ranked AS (
        SELECT qid, cid, approx, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM rer)
      SELECT qid, cid, approx, cos, rnk FROM ranked WHERE rnk <= 3
      ORDER BY qid, rnk""",
    "q117_knn_sq8" -> s"""
      WITH $duckQuant,
      rg AS (
        SELECT pos, min(v) AS mn, max(v) AS mx
        FROM (SELECT generate_subscripts(qv, 1) AS pos, unnest(qv) AS v FROM n)
        GROUP BY pos),
      rr AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
             FROM rg),
      coded AS (
        SELECT vec_id, qv, n2,
          [CASE WHEN (rr.mxs[k] - rr.mns[k]) > 0
                THEN ((qv[k] - rr.mns[k]) * 255) // (rr.mxs[k] - rr.mns[k])
                ELSE 0 END
           for k in range(1, len(qv)+1)] AS code
        FROM n, rr),
      ap AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
          CAST(list_sum([(a.code[k] - 128) * (b.code[k] - 128)
                         for k in range(1, len(a.code)+1)]) AS BIGINT) AS approx
        FROM coded a JOIN coded b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
      cand AS (
        SELECT qid, cid, approx FROM (
          SELECT qid, cid, approx,
            row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS arnk
          FROM ap) WHERE arnk <= 32),
      rer AS (
        SELECT c.qid, c.cid, c.approx,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM cand c JOIN n a ON a.vec_id = c.qid JOIN n b ON b.vec_id = c.cid),
      ranked AS (
        SELECT qid, cid, approx, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM rer)
      SELECT qid, cid, approx, cos, rnk FROM ranked WHERE rnk <= 5
      ORDER BY qid, rnk""",
    // centroids from the OLD corpus only (the index predates the batch);
    // assignment of ALL vectors against them; pairs restricted to
    // new-involving — exactly what the incremental gated join computes
    "q83_semantic_dedup_incremental" -> s"""
      WITH q0 AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      alln AS (SELECT vec_id, qv,
              CAST(list_sum([x * x for x in qv]) AS BIGINT) AS n2 FROM q0),
      n AS (SELECT * FROM alln WHERE vec_id % 3 <> 1),
      seeds AS (SELECT vec_id AS cid, qv AS cq FROM n ORDER BY vec_id LIMIT 4),
      ${duckLloyd(1, "seeds")},
      fcn AS (
        SELECT cid, cq, CAST(list_sum([x * x for x in cq]) AS BIGINT) AS cn2
        FROM c1),
      fd AS (
        SELECT a.vec_id, a.qv, a.n2, c.cid,
          a.n2 - 2 * CAST(list_sum([a.qv[k] * c.cq[k]
                                    for k in range(1, len(a.qv)+1)]) AS BIGINT)
               + c.cn2 AS d2
        FROM alln a, fcn c),
      fasg AS (
        SELECT vec_id, qv, n2, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS r
          FROM fd) WHERE r = 1)
      SELECT a.cid AS cluster, a.vec_id AS i, b.vec_id AS j,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT) AS dot,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(a.n2) * sqrt(b.n2)) AS cos
      FROM fasg a JOIN fasg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE (a.vec_id % 3 = 1 OR b.vec_id % 3 = 1)
        AND CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(a.n2) * sqrt(b.n2)) >= 0.45
      ORDER BY i, j""",
    "q80_semantic_dedup" -> s"""
      WITH q AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      n AS (SELECT vec_id, qv,
              CAST(list_sum([x * x for x in qv]) AS BIGINT) AS n2 FROM q),
      seeds AS (SELECT vec_id AS cid, qv AS cq FROM n WHERE vec_id < 4),
      ${duckLloyd(1, "seeds")},
      ${duckLloyd(2, "c1")},
      fcn AS (
        SELECT cid, cq, CAST(list_sum([x * x for x in cq]) AS BIGINT) AS cn2
        FROM c2),
      fd AS (
        SELECT n.vec_id, n.qv, n.n2, c.cid,
          n.n2 - 2 * CAST(list_sum([n.qv[k] * c.cq[k]
                                    for k in range(1, len(n.qv)+1)]) AS BIGINT)
               + c.cn2 AS d2
        FROM n, fcn c),
      fasg AS (
        SELECT vec_id, qv, n2, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS r
          FROM fd) WHERE r = 1)
      SELECT a.cid AS cluster, a.vec_id AS i, b.vec_id AS j,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT) AS dot,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(a.n2) * sqrt(b.n2)) AS cos
      FROM fasg a JOIN fasg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(a.n2) * sqrt(b.n2)) >= 0.45
      ORDER BY i, j""",
    "q76_kmeans_iter" -> s"""
      WITH q AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      n AS (SELECT vec_id, qv,
              CAST(list_sum([x * x for x in qv]) AS BIGINT) AS n2 FROM q),
      seeds AS (SELECT vec_id AS cid, qv AS cq FROM n WHERE vec_id < 4),
      ${duckLloyd(1, "seeds")},
      ${duckLloyd(2, "c1")}
      SELECT cid AS cluster,
        CAST(generate_subscripts(cq, 1) - 1 AS BIGINT) AS pos, unnest(cq) AS cv
      FROM c2 ORDER BY cluster, pos""",
    "q72_kmeans_step" -> """
      WITH q AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      n AS (SELECT vec_id, qv,
              CAST(list_sum([x * x for x in qv]) AS BIGINT) AS n2 FROM q),
      seeds AS (SELECT vec_id AS cid, qv AS cq, n2 AS cn2 FROM n WHERE vec_id < 4),
      d AS (
        SELECT n.vec_id, n.qv, s.cid,
          n.n2 - 2 * CAST(list_sum([n.qv[k] * s.cq[k]
                                    for k in range(1, len(n.qv)+1)]) AS BIGINT)
               + s.cn2 AS d2
        FROM n, seeds s),
      best AS (
        SELECT vec_id, qv, cid FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS r
          FROM d) WHERE r = 1),
      ex AS (
        -- positions derived from the list itself (generate_subscripts), not a
        -- hard-coded dim, so the oracle tracks the data like the Spark side
        SELECT cid AS cluster,
          CAST(generate_subscripts(qv, 1) - 1 AS BIGINT) AS pos, unnest(qv) AS v
        FROM best)
      SELECT cluster, pos, count(*) AS n_members,
        CAST(sum(v) AS BIGINT) AS sum_v,
        CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS new_cv
      FROM ex GROUP BY cluster, pos ORDER BY cluster, pos""",
    "q114_hard_negatives_ivf" -> s"""
      WITH $duckQuant,
      comp AS (
        SELECT label, pos, CAST(floor(avg(v)) AS BIGINT) AS cv
        FROM (SELECT label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM n)
        GROUP BY label, pos),
      cents AS (
        SELECT label AS clabel, list(cv ORDER BY pos) AS cvec,
          CAST(list_sum([c2 * c2 for c2 in list(cv ORDER BY pos)]) AS BIGINT) AS cn2
        FROM comp GROUP BY label),
      assigned AS (
        SELECT a.vec_id AS qid, a.label AS qlabel, a.qv, a.n2, c.clabel,
          CAST(list_sum([a.qv[k] * c.cvec[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(c.cn2)) AS ccos
        FROM n a, cents c WHERE a.vec_id < 20 AND c.clabel != a.label),
      cell AS (
        SELECT * FROM (
          SELECT qid, qlabel, qv, n2, clabel,
            row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, clabel) AS r
          FROM assigned) WHERE r <= 3),
      scored AS (
        SELECT cell.qid, cell.qlabel, b.vec_id AS cid,
          CAST(cell.clabel AS BIGINT) AS clabel,
          CAST(list_sum([cell.qv[k] * b.qv[k] for k in range(1, len(cell.qv)+1)]) AS BIGINT)
            / (sqrt(cell.n2) * sqrt(b.n2)) AS cos
        FROM cell JOIN n b ON cell.clabel = b.label),
      ranked AS (
        SELECT qid, qlabel, cid, clabel, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT * FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q113_hard_negatives" -> s"""
      WITH $duckQuant,
      scored AS (
        SELECT a.vec_id AS qid, a.label AS qlabel,
          b.vec_id AS cid, b.label AS clabel,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM n a JOIN n b ON a.vec_id < 20 AND a.label != b.label),
      ranked AS (
        SELECT qid, qlabel, cid, clabel, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT * FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q203_perceptron" -> s"""
      WITH e AS MATERIALIZED (
        SELECT CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings),
      $duckPerceptron
      SELECT CAST(t.j AS BIGINT) AS j, w4.w[t.j+1] AS w_cj, w4.b AS bias,
        s1.err AS err1, s2.err AS err2, s3.err AS err3, s4.err AS err4
      FROM range(64) t(j), w4, s1, s2, s3, s4 ORDER BY j""",
    // the exact PAV fit replayed through its minimax characterization on
    // the same rank-arithmetic bins: every rate is a floor-ppm integer, so
    // a pooling or tie-break slip anywhere mismatches whole bins
    "q216_calibration_iso" -> s"""
      WITH e AS MATERIALIZED (
        SELECT CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 0),
      $duckPerceptron,
      ev AS MATERIALIZED (
        SELECT vec_id,
          CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 1),
      scd AS MATERIALIZED (
        SELECT vec_id, y,
          CAST(list_sum([x[i] * w[i] for i in range(1, 65)]) AS BIGINT) + b AS margin
        FROM ev, w4),
      rk AS (SELECT y, margin,
          row_number() OVER (ORDER BY margin, vec_id) AS rnk,
          count(*) OVER () AS n
        FROM scd),
      bins AS MATERIALIZED (
        SELECT CAST((rnk - 1) * 16 // n + 1 AS BIGINT) AS bin,
          count(*) AS n,
          CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          CAST(min(margin) AS BIGINT) AS margin_lo,
          CAST(max(margin) AS BIGINT) AS margin_hi
        FROM rk GROUP BY 1),
      ranges AS (
        SELECT j.bin AS j, k.bin AS k,
          CAST(sum(b.n_pos) * 1000000 // sum(b.n) AS BIGINT) AS a_ppm
        FROM bins j, bins k, bins b
        WHERE j.bin <= k.bin AND b.bin BETWEEN j.bin AND k.bin
        GROUP BY 1, 2),
      iso AS (
        SELECT i, CAST(max(mn) AS BIGINT) AS iso_ppm FROM (
          SELECT ib.bin AS i, r.j, min(r.a_ppm) AS mn
          FROM bins ib JOIN ranges r ON r.j <= ib.bin AND r.k >= ib.bin
          GROUP BY 1, 2)
        GROUP BY 1)
      SELECT b.bin, b.n, b.n_pos, b.margin_lo, b.margin_hi,
        CAST(b.n_pos * 1000000 // b.n AS BIGINT) AS raw_ppm, iso.iso_ppm,
        CAST(abs(b.n_pos * 1000000 // b.n - iso.iso_ppm) * b.n AS BIGINT) AS gap_mass
      FROM bins b JOIN iso ON iso.i = b.bin ORDER BY b.bin""",
    "q205_threshold_curve" -> s"""
      WITH e AS MATERIALIZED (
        SELECT CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 0),
      $duckPerceptron,
      ev AS MATERIALIZED (
        SELECT vec_id,
          CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 1),
      scd AS MATERIALIZED (
        SELECT vec_id, y,
          CAST(list_sum([x[i] * w[i] for i in range(1, 65)]) AS BIGINT) + b AS margin
        FROM ev, w4),
      rk AS MATERIALIZED (
        SELECT y, margin,
          row_number() OVER (ORDER BY margin DESC, vec_id) AS rnk,
          sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) OVER (ORDER BY margin DESC, vec_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp
        FROM scd),
      st AS (SELECT count(*) AS n,
        CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos FROM scd),
      ks AS (SELECT t.i + 1 AS i,
        CAST((n * (t.i + 1) + 15) // 16 AS BIGINT) AS k, pos
        FROM range(16) t(i), st)
      SELECT CAST(ks.i AS BIGINT) AS i, ks.k, rk.margin AS margin_at_k,
        CAST(rk.cum_tp AS BIGINT) AS cum_tp,
        CAST(round(rk.cum_tp * 1000000.0 / ks.k) AS BIGINT) AS prec_micro,
        CASE WHEN ks.pos = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(round(rk.cum_tp * 1000000.0 / ks.pos) AS BIGINT) END AS rec_micro
      FROM ks JOIN rk ON rk.rnk = ks.k ORDER BY i""",
    "q204_classifier_eval" -> s"""
      WITH e AS MATERIALIZED (
        SELECT CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 0),
      $duckPerceptron,
      ev AS MATERIALIZED (
        SELECT CASE WHEN label <= 4 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
          [CAST(round(CAST(v AS DOUBLE) * 100) AS BIGINT) for v in embedding] AS x
        FROM embeddings WHERE vec_id % 2 = 1),
      sc AS MATERIALIZED (
        SELECT y, CASE WHEN CAST(list_sum([x[i] * w[i] for i in range(1, 65)]) AS BIGINT)
          + b > 0 THEN 1 ELSE -1 END AS p
        FROM ev, w4),
      cm AS (
        SELECT CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(sum(CASE WHEN y = -1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(sum(CASE WHEN y = 1 AND p = -1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(sum(CASE WHEN y = -1 AND p = -1 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM sc)
      SELECT tp, fp, fn, tn,
        CAST(round((tp + tn) * 1000000.0 / (tp + fp + fn + tn)) AS BIGINT) AS acc_micro,
        CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(round(tp * 1000000.0 / (tp + fp)) AS BIGINT) END AS prec_micro,
        CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(round(tp * 1000000.0 / (tp + fn)) AS BIGINT) END AS rec_micro,
        CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(round(2 * tp * 1000000.0 / (2 * tp + fp + fn)) AS BIGINT) END AS f1_micro
      FROM cm""",
    "q202_abtt_debias" -> s"""
      WITH $duckAbtt,
      deb AS MATERIALIZED (
        SELECT vec_id, c,
          CAST(round(CAST(list_sum([c[i] * v[i] for i in range(1, 65)]) AS DOUBLE)
            / 1000000.0) AS BIGINT) AS g
        FROM cent, v4),
      deb2 AS MATERIALIZED (
        SELECT vec_id, c,
          [c[i] - CAST(round(CAST(g AS DOUBLE) * CAST(v[i] AS DOUBLE)
            / 1000000.0) AS BIGINT) for i in range(1, 65)] AS c2
        FROM deb, v4),
      nrm AS MATERIALIZED (
        SELECT vec_id, c, c2,
          CAST(list_sum([x * x for x in c]) AS BIGINT) AS n2c,
          CAST(list_sum([x * x for x in c2]) AS BIGINT) AS n2d
        FROM deb2),
      r_cent AS MATERIALIZED (
        SELECT * FROM (
          SELECT qid, cid, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
          FROM (
            SELECT a.vec_id AS qid, b.vec_id AS cid,
              CAST(list_sum([a.c[k] * b.c[k] for k in range(1, 65)]) AS BIGINT)
                / (sqrt(a.n2c) * sqrt(b.n2c)) AS cos
            FROM nrm a JOIN nrm b ON a.vec_id < 5 AND a.vec_id != b.vec_id
              AND a.n2c > 0 AND b.n2c > 0))
        WHERE rnk <= 3),
      r_deb AS MATERIALIZED (
        SELECT * FROM (
          SELECT qid, cid, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
          FROM (
            SELECT a.vec_id AS qid, b.vec_id AS cid,
              CAST(list_sum([a.c2[k] * b.c2[k] for k in range(1, 65)]) AS BIGINT)
                / (sqrt(a.n2d) * sqrt(b.n2d)) AS cos
            FROM nrm a JOIN nrm b ON a.vec_id < 5 AND a.vec_id != b.vec_id
              AND a.n2d > 0 AND b.n2d > 0))
        WHERE rnk <= 3)
      SELECT c.qid, c.rnk, c.cid AS cid_cent, c.cos AS cos_cent,
        d.cid AS cid_deb, d.cos AS cos_deb,
        CAST(CASE WHEN c.cid = d.cid THEN 0 ELSE 1 END AS BIGINT) AS moved
      FROM r_cent c JOIN r_deb d ON c.qid = d.qid AND c.rnk = d.rnk
      ORDER BY c.qid, c.rnk""",
    "q201_top_pc" -> s"""
      WITH $duckAbtt,
      sc AS (
        SELECT v, CAST(round(sqrt(CAST(nrm2 AS DOUBLE)) * CAST(mx AS DOUBLE)
          / 100000000.0) AS BIGINT) AS unorm
        FROM v4, m4, nn4),
      st AS (
        SELECT CAST(sum(cc) AS BIGINT) AS tot_var,
          CAST(sum(g * g) AS BIGINT) AS proj_scaled,
          CAST(round(CAST(sum(g * g) AS DOUBLE) * 1000000000000.0
            / CAST(sum(cc) AS DOUBLE)) AS BIGINT) AS share_micro
        FROM (
          SELECT CAST(list_sum([c[i] * c[i] for i in range(1, 65)]) AS BIGINT) AS cc,
            CAST(round(CAST(list_sum([c[i] * v[i] for i in range(1, 65)]) AS DOUBLE)
              / 1000000000.0) AS BIGINT) AS g
          FROM cent, sc))
      SELECT CAST(mean.j AS BIGINT) AS j, mean.mj AS mean_micro,
        sc.v[mean.j + 1] AS v_micro, sc.unorm, st.tot_var, st.proj_scaled,
        st.share_micro
      FROM mean, sc, st ORDER BY j""",
    "q199_mmr_rerank" -> s"""
      WITH $duckQuant,
      scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid, b.qv AS qc, b.n2 AS cn2,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS rel
        FROM n a JOIN n b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
      cand AS (
        SELECT * FROM (
          SELECT qid, cid, qc, cn2, rel,
            row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rnk
          FROM scored) WHERE rnk <= 10),
      sims AS (
        SELECT a.qid, a.cid AS ca, b.cid AS cb,
          CAST(list_sum([a.qc[k] * b.qc[k] for k in range(1, len(a.qc)+1)]) AS BIGINT)
            / (sqrt(a.cn2) * sqrt(b.cn2)) AS sim
        FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid != b.cid),
      p1 AS (SELECT qid, cid AS pc1, rel AS mmr1 FROM cand WHERE rnk = 1),
      r2 AS (
        SELECT c.qid, c.cid, 0.7 * c.rel - 0.3 * s.sim AS mmr
        FROM cand c
        JOIN p1 ON c.qid = p1.qid AND c.cid != p1.pc1
        JOIN sims s ON s.qid = c.qid AND s.ca = c.cid AND s.cb = p1.pc1),
      p2 AS (
        SELECT qid, cid AS pc2, mmr AS mmr2 FROM (
          SELECT qid, cid, mmr,
            row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, cid) AS rk
          FROM r2) WHERE rk = 1),
      r3 AS (
        SELECT c.qid, c.cid, 0.7 * c.rel - 0.3 * greatest(s1.sim, s2.sim) AS mmr
        FROM cand c
        JOIN p1 ON c.qid = p1.qid
        JOIN p2 ON c.qid = p2.qid
        JOIN sims s1 ON s1.qid = c.qid AND s1.ca = c.cid AND s1.cb = p1.pc1
        JOIN sims s2 ON s2.qid = c.qid AND s2.ca = c.cid AND s2.cb = p2.pc2
        WHERE c.cid != p1.pc1 AND c.cid != p2.pc2),
      p3 AS (
        SELECT qid, cid AS pc3, mmr AS mmr3 FROM (
          SELECT qid, cid, mmr,
            row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, cid) AS rk
          FROM r3) WHERE rk = 1)
      SELECT qid, pick, cid, mmr_micro FROM (
        SELECT qid, CAST(1 AS BIGINT) AS pick, pc1 AS cid,
          CAST(round(mmr1 * 1000000, 0) AS BIGINT) AS mmr_micro FROM p1
        UNION ALL
        SELECT qid, CAST(2 AS BIGINT), pc2,
          CAST(round(mmr2 * 1000000, 0) AS BIGINT) FROM p2
        UNION ALL
        SELECT qid, CAST(3 AS BIGINT), pc3,
          CAST(round(mmr3 * 1000000, 0) AS BIGINT) FROM p3)
      ORDER BY qid, pick""",
    "q198_knn_jl" -> s"""
      WITH $duckQuant,
      sg AS (
        SELECT i, j,
          CASE WHEN ('0x' || substr(md5('jl:' || i || ':' || j), 1, 15))::BIGINT % 2 = 0
               THEN 1 ELSE -1 END AS sgn
        FROM range(16) t1(i), range(64) t2(j)),
      rws AS (SELECT i, list(sgn ORDER BY j) AS r FROM sg GROUP BY i),
      matx AS (SELECT list(r ORDER BY i) AS mat FROM rws),
      pn AS (
        SELECT vec_id, p, CAST(list_sum([x * x for x in p]) AS BIGINT) AS pn2
        FROM (
          SELECT vec_id,
            [CAST(list_sum([mat[i+1][j+1] * qv[j+1] for j in range(64)]) AS BIGINT)
             for i in range(16)] AS p
          FROM n, matx)),
      scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
          CAST(list_sum([a.p[k] * b.p[k] for k in range(1, len(a.p)+1)]) AS BIGINT)
            / (sqrt(a.pn2) * sqrt(b.pn2)) AS cosp
        FROM pn a JOIN pn b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
      jl AS (
        SELECT qid, cid, cosp, CAST(rnk AS BIGINT) AS rnk FROM (
          SELECT qid, cid, cosp,
            row_number() OVER (PARTITION BY qid ORDER BY cosp DESC, cid) AS rnk
          FROM scored) WHERE rnk <= 10),
      escored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM n a JOIN n b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
      exact AS (
        SELECT qid, cid, 1 AS in_exact FROM (
          SELECT qid, cid,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
          FROM escored) WHERE rnk <= 10)
      SELECT jl.qid, jl.rnk, jl.cid, jl.cosp,
        CAST(coalesce(exact.in_exact, 0) AS BIGINT) AS in_exact
      FROM jl LEFT JOIN exact ON jl.qid = exact.qid AND jl.cid = exact.cid
      ORDER BY jl.qid, jl.rnk""",
    "q55_knn_brute" -> s"""
      WITH $duckQuant,
      scored AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
          CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(b.n2)) AS cos
        FROM n a JOIN n b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
      ranked AS (
        SELECT qid, cid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT * FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""",
    "q56_knn_lsh" -> s"""
      WITH $duckQuant,
      b AS (
        SELECT *,
          (CASE WHEN qv[1] >= 0 THEN 1 ELSE 0 END) +
          (CASE WHEN qv[2] >= 0 THEN 2 ELSE 0 END) +
          (CASE WHEN qv[3] >= 0 THEN 4 ELSE 0 END) +
          (CASE WHEN qv[4] >= 0 THEN 8 ELSE 0 END) AS bkt
        FROM n),
      scored AS (
        SELECT a.vec_id AS qid, c.vec_id AS cid,
          CAST(list_sum([a.qv[k] * c.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(c.n2)) AS cos
        FROM b a JOIN b c ON a.vec_id < 5 AND a.bkt = c.bkt AND a.vec_id != c.vec_id),
      ranked AS (
        SELECT qid, cid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT * FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q57_knn_ivf" -> duckIvf(nprobe = 1),
    "q75_knn_ivf_multiprobe" -> duckIvf(nprobe = 2))

  /** Shared IVF oracle, parameterized exactly like [[knnIvf]]. */
  private def duckIvf(nprobe: Int): String = s"""
      WITH $duckQuant,
      comp AS (
        SELECT label, pos, CAST(floor(avg(v)) AS BIGINT) AS cv
        FROM (SELECT label, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
              FROM n)
        GROUP BY label, pos),
      cents AS (
        SELECT label AS clabel, list(cv ORDER BY pos) AS cvec,
          CAST(list_sum([c2 * c2 for c2 in list(cv ORDER BY pos)]) AS BIGINT) AS cn2
        FROM comp GROUP BY label),
      assigned AS (
        SELECT a.vec_id AS qid, a.qv, a.n2, c.clabel,
          CAST(list_sum([a.qv[k] * c.cvec[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
            / (sqrt(a.n2) * sqrt(c.cn2)) AS ccos
        FROM n a, cents c WHERE a.vec_id < 5),
      cell AS (
        SELECT * FROM (
          SELECT qid, qv, n2, clabel,
            row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, clabel) AS r
          FROM assigned) WHERE r <= $nprobe),
      scored AS (
        SELECT cell.qid, CAST(cell.clabel AS BIGINT) AS cell, b.vec_id AS cid,
          CAST(list_sum([cell.qv[k] * b.qv[k] for k in range(1, len(cell.qv)+1)]) AS BIGINT)
            / (sqrt(cell.n2) * sqrt(b.n2)) AS cos
        FROM cell JOIN n b ON cell.clabel = b.label AND cell.qid != b.vec_id),
      ranked AS (
        SELECT qid, cell, cid, cos,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
        FROM scored)
      SELECT * FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk"""
}
