package graft.operators

import graft.QueryModule
import graft.engine.Tables
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families over `documents`: exact (hash groupBy), MinHash+LSH banding,
  * SimHash + chunk banding, and character-n-gram Jaccard with length blocking.
  * All are shuffle-bounded designs: candidate generation is an equi-join on a
  * compact blocking key (band hash / signature chunk / length bucket), never a
  * cross join, so at 100 TB the pair space is pruned to near-linear before the
  * exact verification join runs. Verification always recomputes the exact
  * similarity, so LSH parameters only affect recall, not precision. With 32
  * hashes banded 8×4, a pair at Jaccard s is missed with (1-s⁴)⁸: ~1.5e-2
  * right AT the 0.8 threshold, 2.3e-4 at 0.9, 1.4e-6 at 0.95 — real
  * near-duplicates cluster high (fixture minima: 0.80 token / 0.83 char-gram,
  * and every ground-truth pair is found at both check scales), and recall at
  * the exact threshold boundary is tunable by adding bands without touching
  * the verify stage.
  */
object DedupQueries extends QueryModule {

  /** Distinct 3-token shingles of the whitespace-tokenized text: captures
    * token ORDER, which is what separates near-duplicates from the merely
    * same-vocabulary (token-set Jaccard is degenerate on bounded vocab). */
  /** `spread = true` parallelizes the single-split corpus scan before the
    * per-row shingling (graft.engine.Spread scaladoc; no-op on any
    * properly-split corpus). Opt-IN per consumer, by measurement: the
    * shingle-dominated operators (q134 7.45→6.35 s, q59 3.23→2.92 s at
    * sf0.1) win; ledger-style consumers whose cost sits in later joins
    * (q181, q116, q137, q73) measured SLOWER with the extra exchange and
    * keep the plain scan. */
  private def shingled(s: SparkSession, dir: String,
      spread: Boolean = false): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    shingledDocs(
      if (spread) graft.engine.Spread.byKey(docs, "doc_id") else docs)
  }

  /** Same shingling over any (doc_id, text) frame — the streaming
    * incremental-dedup path shingles micro-batches and doc-store reads. */
  private[graft] def shingledDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3) // sequence(0, n) needs n >= 0
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as("sh"))

  /** Exact-Jaccard verification of candidate (i, j) pairs against 0.8. */
  private def verifyPairs(cand: DataFrame, sh: DataFrame): DataFrame = {
    val a = sh.select(col("doc_id").as("i"), col("sh").as("sh_i"))
    val b = sh.select(col("doc_id").as("j"), col("sh").as("sh_j"))
    cand.join(a, "i").join(b, "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("long").as("inter"),
        size(array_union(col("sh_i"), col("sh_j"))).cast("long").as("uni"))
      .filter(col("inter") >= col("uni") * 0.8)
      .withColumn("jac", col("inter") / col("uni"))
      .orderBy(col("i"), col("j"))
  }

  /** q50 — exact dedup: deterministic representative (min doc_id) per distinct
    * text + survivor/dropped accounting. One hash aggregation; the 100 TB
    * variant groups on a 128-bit text digest instead of the raw string. */
  val q50Exact: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum(col("n_copies")).as("n_docs"),
        sum(col("n_copies") - 1).as("n_dropped"),
        min(col("keep_id")).as("min_keep_id"))

  /** Per-doc LSH band rows for a (doc_id, items: array<string>) frame:
    * 32 independent min-hashes (min over per-item seeded xxhash64), banded
    * 8×4 → 8 (doc_id, band, band-hash) rows per doc, with any `meta` columns
    * carried through for join-time gating. Items sharing any band hash become
    * candidates via an equi-join on (band, band-hash) — the only shuffle that
    * matters. At estimated Jaccard s a true pair is missed with probability
    * (1-s⁴)⁸ (see the object doc for the honest curve), and downstream exact
    * verification keeps precision at 1, so LSH parameters only affect recall.
    *
    * `winnowMod` > 1 applies content-defined gram sampling BEFORE the 32-hash
    * signature: only items with `h0 % winnowMod == 0` enter the min. Both docs
    * of a pair sample by the same rule, so the sampled sets' Jaccard
    * concentrates on the true Jaccard while signature volume drops winnowMod×
    * — the standard fingerprinting/winnowing move for char-gram dedup, where
    * gram volume is ~n_chars per doc (~10× token-shingle volume). */
  private[graft] def lshBands(items: DataFrame, itemsCol: String,
      winnowMod: Int = 1, meta: Seq[String] = Nil): DataFrame =
    bandRows(minhashSigs(items, itemsCol, winnowMod, meta), meta)

  /** The signature half of [[lshBands]]: (doc_id, meta..., sig) with the
    * whole 32-hash signature folded in ONE codegen'd map-side pass per doc
    * (native minhash_sig: item hashed once, 32 seed mixes, winnow applied
    * inline) — no item explosion, no 32-column min aggregation, no shuffle.
    * Docs with every item winnowed away yield a NULL signature and drop
    * out, exactly like an empty group in the aggregate formulation.
    *
    * This frame IS the persisted-signature shape: at 100 TB it is written
    * once to parquet (32 longs/doc ≈ 0.3% of a 100 KB doc) and reused by
    * every later dedup run — see [[q74IncrementalDedup]]. */
  private[graft] def minhashSigs(items: DataFrame, itemsCol: String,
      winnowMod: Int = 1, meta: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(items.sparkSession)
    val keys = col("doc_id") +: meta.map(col)
    items
      .select(keys :+ expr(s"minhash_sig($itemsCol, $winnowMod)").as("sig"): _*)
      .filter(col("sig").isNotNull)
  }

  /** The banding half of [[lshBands]]: 8 (doc_id, meta..., band, band-hash)
    * rows per signature — derivable from a persisted signature table, so
    * banding parameters can change without re-reading payloads. */
  private[graft] def bandRows(sigs: DataFrame, meta: Seq[String] = Nil): DataFrame = {
    val keys = col("doc_id") +: meta.map(col)
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        xxhash64((4 * b until 4 * b + 4).map(i =>
          element_at(col("sig"), i + 1)): _*).as("bh"))
    }
    sigs.select(keys :+ explode(array(bandCols: _*)).as("bb"): _*)
      .select(keys :+ col("bb.band").as("band") :+ col("bb.bh").as("bh"): _*)
  }

  /** Distinct candidate (i, j) pairs from band rows: equi-join on
    * (band, band-hash) plus an optional extra join-time gate evaluated on the
    * x/y aliases (e.g. a length window) — gating inside the join beats
    * re-joining a meta table onto the pair list afterwards.
    *
    * `maxBandSize` is the HOT-BUCKET CAP — the dedup-side skew defense AQE
    * cannot provide: a bucket of n docs emits n² candidate rows, and that
    * blowup is join OUTPUT, not partition size, so runtime skew splitting
    * never sees it. Boilerplate corpora produce exactly this (thousands of
    * near-identical short docs collapse to one signature, so every one of
    * their buckets goes hot). With a cap, buckets larger than `cap` are
    * dropped BEFORE the self-join (one extra aggregation over the 8-per-doc
    * band frame), bounding per-bucket work at cap² — the standard
    * production LSH guard. Semantics are a DECLARED recall trade: a pair is
    * kept iff it shares at least one sub-cap bucket, so pairs living ONLY
    * in hot buckets (the boilerplate cluster itself) are not flagged —
    * which is why production pipelines run exact dedup (q50) before
    * near-dup, leaving hot buckets populated only by the boilerplate tail
    * exact-dedup already collapsed. Off by default; the oracle-checked
    * queries keep full LSH semantics and the spec pins both sides of the
    * trade (normal pairs unaffected, hot-only pairs dropped, candidate
    * volume bounded). */
  private[graft] def bandPairs(bands: DataFrame, gate: Option[Column] = None,
      maxBandSize: Option[Int] = None): DataFrame = {
    val pruned = maxBandSize match {
      case Some(cap) =>
        val keep = bands.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
          .select(col("band"), col("bh"))
        bands.join(keep, Seq("band", "bh"), "left_semi")
      case None => bands
    }
    val base = col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
      col("x.doc_id") < col("y.doc_id")
    pruned.as("x").join(pruned.as("y"), gate.map(base && _).getOrElse(base))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct()
  }

  /** q51 — MinHash + LSH near-dup detection over token 3-shingles, exact
    * Jaccard verification of the candidates. Oracle = brute-force Jaccard.
    *
    * The caches are deliberate and QUERY-SCOPED (the harness frees them
    * between queries): a cache-free variant — streaming signature pass,
    * verify arrays recomputed for candidate docs only — was built and
    * measured at sf0.1 and came out 6–9× slower across q51/q53/q59
    * (total 28.5→50.7 s): without the materialized band frame the
    * self-join loses its size stats (no broadcast, SMJ instead) and the
    * shingle→signature pipeline re-executes per join side. At 100 TB the
    * cache's role is played by a PERSISTED signature table reused across
    * runs, not by within-query recompute. */
  val q51MinHashLsh: Q = (s, dir) => {
    val sh = shingled(s, dir).cache()
    // band rows are 8 small rows/doc — cached so the self-join and any rerun
    // read the signature pipeline once (at scale: a persisted signature table)
    val bands = lshBands(sh, "sh").cache()
    verifyPairs(bandPairs(bands), sh)
  }

  /** q52 — SimHash near-dup (Manku-style): 64-bit fingerprint from
    * per-shingle hash bit votes; candidates from 4×16-bit chunk equality
    * (pigeonhole: Hamming ≤ 3 ⇒ at least one identical chunk, so the banding
    * is LOSSLESS for the declared threshold); verification is an exact
    * popcount on the fingerprint XOR — no payload ever re-read, which is why
    * this is the cheapest near-dup pass at 100 TB.
    *
    * FULL-ORACLE CONTRACT: the driver-contract config uses the PORTABLE
    * feature hash — the top 60 bits of `md5(shingle)` — which both engines
    * compute bit-identically (Spark `conv(substring(md5(x),1,15),16,10)`,
    * DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`), so the fingerprints and
    * therefore the exact pair set are engine-independent. The DuckDB oracle
    * recomputes the fingerprints from scratch and takes the BRUTE-FORCE
    * Hamming ≤ 3 pair set over all docs — so a green hash-match also proves
    * the pigeonhole losslessness claim, not just the verify arithmetic.
    * (The default `portableHash = false` path hashes shingles inline with
    * XXH64 inside the codegen'd `simhash64` — no md5 allocation, the faster
    * production config; DedupSpec pins that both hash choices agree on the
    * planted near-dup pairs.) */
  val q52SimHash: Q = (s, dir) =>
    simHashNearDup(s, dir, nChunks = 4, maxHam = 3, portableHash = true)

  /** Parameterized SimHash near-dup. `nChunks` splits the 64-bit fingerprint
    * into equal-width chunk keys; pigeonhole keeps the banding LOSSLESS
    * whenever `nChunks > maxHam`. The 100-TB configuration is a CONFIG, not a
    * rewrite: 16-bit chunks give 65k buckets and go quadratic-in-bucket
    * around 10⁸–10⁹ docs, so at that scale pass `nChunks = 8` (8-bit grid —
    * or layer Manku-style rotated permutation tables on top) and tighten
    * `maxHam` per table while keeping `nChunks > maxHam` for losslessness.
    * `portableHash` swaps the inline XXH64 feature hash for the md5-top-60-bit
    * hash the DuckDB oracle can replay (see [[q52SimHash]]). */
  def simHashNearDup(s: SparkSession, dir: String,
      nChunks: Int, maxHam: Int, portableHash: Boolean = false): DataFrame = {
    require(nChunks > maxHam, s"pigeonhole needs nChunks > maxHam")
    require(64 % nChunks == 0, "chunk width must divide 64")
    graft.functions.GraftFunctions.register(s)
    val width = 64 / nChunks
    val mask = if (width == 64) -1L else (1L << width) - 1
    // cache the shingle arrays: the self-join (and the IsNotNull constraints
    // Catalyst derives from the chunk join keys) would otherwise inline the
    // full tokenize+shingle pipeline into every fingerprint reference and
    // recompute split(text) per shingle element — the cache is an optimizer
    // barrier as much as a reuse (at scale: a persisted shingle table)
    val sh = shingled(s, dir).cache()
    // fingerprints fold map-side in one codegen'd pass per doc (native
    // simhash64 Expression folding the bit votes) — no shingle explosion,
    // no 64-column vote aggregation, no shuffle until the tiny chunk-key
    // candidate join. The portable path pre-hashes each shingle to the top
    // 60 bits of its md5 (both engines agree bit-for-bit) and feeds
    // simhash64's array<bigint> branch; the default path lets simhash64
    // hash the strings inline with XXH64 (no md5/conv allocation).
    // md5_hi60 = the native form of transform(sh, x ->
    // cast(conv(substring(md5(x),1,15),16,10) as bigint)) — spec-pinned
    // equal; digest → long directly, no hex string / conv parse per element
    val fexpr =
      if (portableHash) "simhash64(md5_hi60(sh))"
      else "simhash64(sh)"
    val simhash = sh.select(col("doc_id"), expr(fexpr).as("f"))
    val chunkCols = (0 until nChunks).map { c =>
      struct(lit(c).as("chunk"),
        col("f").bitwiseAND(lit(mask << (width * c))).as("cv"))
    }
    val chunks = simhash.select(col("doc_id"), col("f"),
        explode(array(chunkCols: _*)).as("cc"))
      .select(col("doc_id"), col("f"), col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        bit_count(col("x.f").bitwiseXOR(col("y.f"))).cast("long").as("ham"))
      .distinct()
      .filter(col("ham") <= maxHam)
      .orderBy(col("i"), col("j"))
  }

  /** q53 — character-5-gram Jaccard near-dup: the same LSH candidate engine
    * as q51 but at character granularity (robust to tokenization), with
    * winnowed (h0 % 4 == 0) gram sampling feeding the signatures and a
    * |Δn_chars| ≤ 20 length gate applied INSIDE the band self-join (n_chars
    * rides along on the band rows, so no post-hoc joins back to a meta
    * table), verified with exact Jaccard over the full gram sets. (A plain
    * length-bucket block was tried first and discarded: on narrow length
    * distributions it degenerates to O(n²) array intersections, and the
    * char-gram inverted index degenerates too because hot grams appear in
    * most docs — banding is the design that survives scale on any
    * distribution.) */
  val q53NgramJaccard: Q = (s, dir) => {
    // spread the single-split scan before the 5-gram explode + minhash
    // (graft.engine.Spread)
    val g = graft.engine.Spread.byKey(
        Tables.load(s, dir, "documents"), "doc_id")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), col("n_chars"),
        array_distinct(expr(
          "transform(sequence(0, length(text)-5), i -> substring(text, i+1, 5))"))
          .as("g5")).cache()
    val bands = lshBands(g, "g5", winnowMod = 4, meta = Seq("n_chars")).cache()
    val cand = bandPairs(bands,
      gate = Some(abs(col("x.n_chars") - col("y.n_chars")) <= 20))
    val a = g.select(col("doc_id").as("i"), col("g5").as("g5_i"))
    val b = g.select(col("doc_id").as("j"), col("g5").as("g5_j"))
    cand.join(a, "i").join(b, "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("g5_i"), col("g5_j"))).cast("long").as("inter"),
        size(array_union(col("g5_i"), col("g5_j"))).cast("long").as("uni"))
      .filter(col("inter") >= col("uni") * 0.8)
      .withColumn("jac", col("inter") / col("uni"))
      .orderBy(col("i"), col("j"))
  }

  /** q53 cold-cost ledger — two candidate optimizations were built and
    * MEASURED at sf0.1 (5000 docs, cold caches between reps, Dev probes),
    * and both rejected for this scale; recorded so the next tuning pass
    * doesn't re-run them:
    *
    *  1. Size-ratio verify gate (the sound bound J ≤ min|A|,|B| /
    *     max|A|,|B| added to the band join): with |Δn_chars| ≤ 20 already
    *     gating, it pruned 45 of 4692 candidates (~1%) and moved cold
    *     timings within noise (3.2–3.3 s both ways). Worth revisiting only
    *     if the length gate is loosened.
    *  2. Candidates-only gram materialization (native
    *     [[graft.functions.ChargramMinHash]] signatures straight off the
    *     string bytes — spec-pinned byte-identical to the array
    *     formulation — plus a broadcast semi-join so verify builds gram
    *     arrays only for candidate docs): SLOWER here, 4.2–5.1 s vs
    *     3.2–3.3 s. Mechanism: 3167 of 5000 docs (63%) reach the verify
    *     stage on this dense synthetic fixture, so the semi-join saves
    *     little gram work while adding three stages whose fixed cost
    *     (~0.5 s each at 32 partitions) dominates at this corpus size.
    *     The expression stays: at production candidate densities (≪1% of
    *     a 100 TB corpus) the corpus-wide array materialization is the
    *     term that matters and the candidates-only structure wins; the
    *     crossover is candidate-density-driven, not SF-driven. */

  /** q54 — embedding near-dup by cosine ≥ 0.45 over integer-quantized
    * components (×1e6): dot and norms are exact BIGINT sums, so both engines
    * derive bit-identical cosines.
    *
    * Scale design — tiled exact all-pairs. At the declared threshold (0.45,
    * ~63° — the fixture's qualifying pairs sit at 0.4501 against a 0.4497
    * background) NO candidate-pruning scheme can be both complete and
    * sub-quadratic: random-hyperplane LSH needs 2-bit bands for full recall
    * at that angle, which prunes nothing, and metric blocking cannot separate
    * cells whose angular radii exceed the 63° match radius. Exact all-pairs
    * is inherently Θ(n²) compute; what CAN be engineered is the distribution:
    * vectors are assigned to B blocks (`pmod(vec_id, B)`), a B(B+1)/2-row
    * tile table fans each block out to its tile row/column, and pairs
    * materialize as an EQUI-join on tile id — Θ(n·B) shuffle, Θ(B²) evenly
    * sized tasks, bounded (n/B-row) per-task memory, no CartesianProduct or
    * BroadcastNestedLoopJoin anywhere in the plan (asserted by PlansSpec).
    * B scales with cluster size; at high thresholds (≥0.8) where pruning IS
    * sound, q51/q56's banded LSH is the cheaper declared path. */
  val q54EmbeddingDup: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val B = 8 // tile grid: B(B+1)/2 tasks; sized to cores here, 1000s on a cluster
    val tiles = (for { p <- 0 until B; q <- p until B } yield (p * B + q, p, q))
      .toDF("tid", "tp", "tq")
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("q"))
      .select(col("vec_id"), col("q"), expr("dot_long(q, q)").as("n2"),
        pmod(col("vec_id"), lit(B)).as("g"))
    val rows = e.join(broadcast(tiles), col("g") === col("tp"))
      .select(col("tid"), col("tp"), col("tq"), col("vec_id").as("ri"),
        col("q").as("qi"), col("n2").as("n2i"))
    val cols = e.join(broadcast(tiles), col("g") === col("tq"))
      .select(col("tid").as("ctid"), col("vec_id").as("rj"),
        col("q").as("qj"), col("n2").as("n2j"))
    rows.join(cols, col("tid") === col("ctid"))
      // diagonal tiles see each unordered pair twice; off-diagonal once
      .filter(col("tp") =!= col("tq") || col("ri") < col("rj"))
      .select(least(col("ri"), col("rj")).as("i"),
        greatest(col("ri"), col("rj")).as("j"),
        expr("dot_long(qi, qj)").as("dot"), col("n2i"), col("n2j"))
      .withColumn("cos", col("dot") / (sqrt(col("n2i")) * sqrt(col("n2j"))))
      .filter(col("cos") >= 0.45)
      .select(col("i"), col("j"), col("dot"), col("cos"))
      .orderBy(col("i"), col("j"))
  }

  /** Connected components over an undirected pair list `(i, j)` by min-label
    * propagation to a CHECKED fixpoint: each round is one equi-join + one
    * partial aggregation; iteration stops when a round changes zero labels
    * and fails loudly at `maxRounds` (label propagation needs `diameter`
    * rounds, so a silent cap would fragment any component with a longer
    * chain — over-retention with no error raised).
    *
    * Scale notes, all load-bearing at 100 TB:
    *  - adjacency carries SELF-LOOPS so min-over-neighbors-including-self
    *    references the previous labels exactly once per round (a
    *    labels-union-neighbors formulation references it twice and doubles
    *    the plan every round — 2^k Catalyst blowup);
    *  - every round's labels are pinned (RDD-level persist behind a leaf
    *    plan): the iterated plan stays ONE join deep instead of replanning
    *    k-deep lineage (and the upstream LSH pipeline is never replayed) —
    *    and pinning at the RDD level (not `Dataset.localCheckpoint`, whose
    *    blocks only the ContextCleaner can free) keeps an explicit handle,
    *    so each round UNPERSISTS the previous round's blocks the moment its
    *    successor is materialized, and `adj` is freed at convergence.
    *    Block-manager storage held across the whole call is therefore one
    *    adjacency frame plus two label frames, regardless of round count —
    *    in a long-running session (a bench pass, a real pipeline job) an
    *    unreleased block per round is a session-lifetime leak that starves
    *    every query scheduled after it;
    *  - the convergence probe is a count over the (small) label frame —
    *    the canonical iterative-driver pattern (GraphX Pregel does the
    *    same); it is NOT a data-path collect.
    * The returned frame is backed by the final round's pinned blocks (a
    * leaf plan, nothing upstream replayed); they are freed by the session's
    * next `releasePinned`/`clearCache` sweep (see [[graft.engine.Sessions]]).
    * The O(log n)-round scale variant (alternating large-star/small-star,
    * Kiveris et al., "Connected Components in MapReduce") uses the same
    * join-shaped building blocks; plain propagation is right while observed
    * near-dup diameters stay small, and the fixpoint check makes the
    * assumption self-verifying. */
  /** Round materialization for the iterative drivers — see
    * [[graft.engine.Pin]] for the leaf-plan/unpersist discipline shared
    * with the k-means driver. */
  private def pin(df: DataFrame): (DataFrame, RDD[Row]) = graft.engine.Pin.pin(df)

  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame =
    propagateMinLabel(pairs, maxRounds).getOrElse(
      throw new IllegalArgumentException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          "(component diameter exceeds the cap); raise maxRounds or use " +
          "connectedComponentsStar (O(log n) rounds, diameter-independent)"))

  /** The propagation loop behind [[connectedComponents]], returning None on
    * cap-hit (with every pinned block already freed) instead of throwing —
    * the hook [[connectedComponentsAuto]] needs to fall back cleanly. */
  private def propagateMinLabel(pairs: DataFrame, maxRounds: Int)
      : Option[DataFrame] = {
    val edges = pairs.select(col("i"), col("j"))
      .union(pairs.select(col("j").as("i"), col("i").as("j")))
    val nodes = edges.select(col("i").as("id")).distinct()
    val (adj, adjPin) = pin(edges
      .union(nodes.select(col("id").as("i"), col("id").as("j"))))
    var (labels, labelsPin) = pin(nodes.select(col("id"), col("id").as("lbl")))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      // the self-loop row (nbr == id) carries the node's PREVIOUS label, so
      // the change-count falls out of the same aggregate — no second join
      val (next, nextPin) = pin(adj.join(labels, adj("j") === labels("id"))
        .select(adj("i").as("id"), labels("id").as("nbr"), col("lbl"))
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"),
          min(when(col("nbr") === col("id"), col("lbl"))).as("prev_lbl")))
      changed = next.filter(col("lbl") =!= col("prev_lbl")).count()
      labelsPin.unpersist(blocking = false)
      labels = next.select(col("id"), col("lbl"))
      labelsPin = nextPin
    }
    adjPin.unpersist(blocking = false)
    if (changed == 0) Some(labels)
    else { labelsPin.unpersist(blocking = false); None }
  }

  /** Connected components with AUTOMATIC driver selection — the default
    * entry the dedup queries use. Min-label propagation is the cheapest
    * per round (one join + one partial aggregate) but needs `diameter`
    * rounds; star contraction costs ~2× per round but logarithmically many
    * regardless of diameter. Diameter is unknowable without running, so:
    * propagate up to `propagationCap` rounds (detection costs diameter + 1
    * rounds, so the default covers diameters to 11 — every observed
    * near-dup diameter with slack), and on cap-hit — a long-chain
    * component, where propagation is the WRONG driver — discard its labels
    * (blocks already freed) and rerun via [[connectedComponentsStar]]
    * instead of failing loudly. The wasted capped rounds are bounded and
    * cheap relative to a propagation that would have needed
    * diameter >> cap rounds; both drivers are spec-pinned equivalent, so
    * the fallback changes cost, never results. */
  def connectedComponentsAuto(pairs: DataFrame, propagationCap: Int = 12): DataFrame =
    propagateMinLabel(pairs, propagationCap)
      .getOrElse(connectedComponentsStar(pairs))

  /** Connected components in O(log n) rounds via alternating large-star /
    * small-star edge contractions (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the declared scale path when
    * component diameters are NOT small: min-label propagation needs
    * `diameter` rounds, this needs logarithmically many regardless of
    * diameter (a 10⁶-long chain converges in ~20 rounds, not 10⁶).
    *
    * Each operator is one neighborhood aggregate + one equi-join over the
    * current edge set: large-star hangs every larger neighbor of `u` onto
    * the minimum of Γ(u) ∪ {u}; small-star does the same for the smaller
    * neighbors. Components contract monotonically into stars centered at
    * their minimum node, which are fixpoints of both operators; convergence
    * is CHECKED (edge set unchanged), never assumed. Both operators only
    * ever emit edges between nodes already connected, so every intermediate
    * state is connectivity-equivalent to the input (the star/plain
    * equivalence spec pins this on chains and random graphs).
    *
    * Same resource discipline as [[connectedComponents]]: every round's
    * edge set is pinned at the RDD level and the previous round freed the
    * moment its successor materializes — O(1) storage over O(log n)
    * rounds. */
  def connectedComponentsStar(pairs: DataFrame, maxRounds: Int = 60): DataFrame = {
    // node universe from ALL input endpoints (self-pairs included): canon()
    // drops self-loops from the edge set, so a node appearing only as (i, i)
    // would otherwise vanish from the output — connectedComponents labels it,
    // and the two drivers must agree on any input (the equivalence spec
    // includes a self-pair-only node)
    val nodes = pairs.select(col("i").as("id"))
      .union(pairs.select(col("j").as("id"))).distinct()
    // canonical undirected edge set: (i, j) with i > j, no self-loops
    def canon(df: DataFrame): DataFrame =
      df.select(greatest(col("i"), col("j")).as("i"),
          least(col("i"), col("j")).as("j"))
        .filter(col("i") =!= col("j")).distinct()
    def sym(e: DataFrame): DataFrame =
      e.select(col("i").as("u"), col("j").as("v"))
        .union(e.select(col("j").as("u"), col("i").as("v")))
    // m(u) = min(Γ(u) ∪ {u}), joined back onto the neighborhood rows
    def withMin(se: DataFrame): DataFrame =
      se.join(se.groupBy(col("u")).agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m")), "u")
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val se = sym(e)
      val hung = withMin(se)
        .filter(if (large) col("v") > col("u") else col("v") <= col("u"))
        .select(col("v").as("i"), col("m").as("j"))
      // (u, m) keeps u itself attached to its neighborhood minimum
      val self = withMin(se).select(col("u").as("i"), col("m").as("j"))
      canon(hung.union(self))
    }
    var (edges, edgesPin) = pin(canon(pairs))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val (next, nextPin) = pin(star(star(edges, large = true), large = false))
      // both sides are distinct sets: equal counts + empty one-sided anti
      // join ⇔ set equality
      changed = next.count() - edges.count() match {
        case 0L => next.join(edges, Seq("i", "j"), "left_anti").count()
        case d  => math.abs(d)
      }
      edgesPin.unpersist(blocking = false)
      edges = next
      edgesPin = nextPin
    }
    require(changed == 0,
      s"connectedComponentsStar did not converge in $maxRounds rounds")
    // fixpoint is a forest of stars centered at component minima:
    // children point at the center, centers label themselves, and isolated
    // nodes (no surviving edge — e.g. self-pair-only input) label themselves
    val labeled = edges.select(col("i").as("id"), col("j").as("lbl"))
      .union(edges.select(col("j").as("id"), col("j").as("lbl")).distinct())
    labeled.union(
      nodes.join(labeled.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("lbl")))
  }

  /** q59 — near-dup CLUSTERING: connected components over the verified
    * MinHash pair graph (q51's candidates + exact-Jaccard verify), survivor
    * = min doc_id per component. A dedup pipeline needs this step — pairs
    * alone over-drop on chains (a~b, b~c, a≁c must keep ONE doc, not run
    * two independent removals). Components come from [[connectedComponents]]
    * — min-label propagation iterated to a checked fixpoint. Oracle: DuckDB
    * WITH RECURSIVE transitive closure over the same brute-force pair
    * graph. */
  val q59DedupClusters: Q = (s, dir) => {
    val sh = shingled(s, dir, spread = true).cache()
    val bands = lshBands(sh, "sh").cache()
    val pairs = verifyPairs(bandPairs(bands), sh).select(col("i"), col("j"))
    // the iterative driver runs EAGERLY inside connectedComponents, so by
    // the time it returns the candidate pipeline has been fully consumed
    // (pairs are pinned into adj) — release the caches here, not at some
    // hoped-for later point; the returned plan reads only the pinned labels
    val labels = connectedComponentsAuto(pairs)
    sh.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    labels
      .groupBy(col("lbl").as("keep_id"))
      .agg(count(lit(1)).as("n_members"),
        max(col("id")).as("max_id"),
        sum(col("id")).as("id_sum"))
      .withColumn("n_dropped", col("n_members") - 1)
      .orderBy(col("keep_id"))
  }

  /** q74 — INCREMENTAL near-dup dedup over a PERSISTED signature index: the
    * production ingest shape, where a new batch arrives and must be deduped
    * against a corpus whose signatures were computed by earlier runs. The
    * old docs' (doc_id, sig) frame is written to parquet and READ BACK (the
    * round-trip is inside the oracle-checked path — a signature that
    * doesn't survive parquet would hash-mismatch here); only the NEW
    * batch's signatures are computed from payloads. Banding unions the two
    * with an `is_new` flag, and the candidate self-join is gated on "at
    * least one side new" INSIDE the join — old×old pairs, the bulk of the
    * pair space, are never materialized. Exact-Jaccard verification is
    * unchanged, so precision stays 1 and the result equals the full-corpus
    * run restricted to new-involving pairs (spec'd, and the oracle is
    * exactly that restriction).
    *
    * At 100 TB this is THE dedup cost model: per ingest batch, one
    * signature pass over the batch (map-side), one parquet append, and a
    * band join whose output is |new|-proportional — the full corpus is
    * re-read never, its signatures (32 longs ≈ 0.3% of a 100 KB doc)
    * always. The new batch here is the doc_id ≡ 3 (mod 7) slice —
    * arbitrary but deterministic, so both engines agree. */
  val q74IncrementalDedup: Q = (s, dir) => {
    val isNew = col("doc_id") % 7 === 3
    val sh = shingled(s, dir).cache()
    // app-scoped scratch (overwritten per rep, deleted at JVM exit), not a
    // fresh never-deleted temp dir per invocation — bench/verify reps must
    // not accumulate index copies under /tmp
    val indexPath = graft.engine.Scratch.dir(s, "q74_sig_index")
    minhashSigs(sh.filter(!isNew), "sh")
      .write.mode("overwrite").parquet(indexPath)
    val oldSigs = s.read.parquet(indexPath).withColumn("is_new", lit(false))
    val newSigs = minhashSigs(sh.filter(isNew), "sh").withColumn("is_new", lit(true))
    val bands = bandRows(oldSigs.unionByName(newSigs), meta = Seq("is_new"))
    val cand = bandPairs(bands, gate = Some(col("x.is_new") || col("y.is_new")))
    verifyPairs(cand, sh)
  }

  /** One micro-batch of STREAMING incremental dedup — the foreachBatch body
    * behind [[graft.streaming.StreamOps.incrementalDedupStream]], reusing
    * q74's machinery with durable, replay-safe state:
    *
    *  - the batch lands in the doc store FIRST, partitioned by ingest batch
    *    with dynamic partition overwrite — a replayed micro-batch (Structured
    *    Streaming's foreachBatch is at-least-once on failure) overwrites its
    *    own partition instead of duplicating rows, which is the standard
    *    idempotent-sink recipe;
    *  - prior-corpus signatures come from the persisted index (never from
    *    payloads), the batch's signatures are computed map-side, and the
    *    candidate join is gated at-least-one-side-new exactly like q74;
    *  - emitted pairs are PINNED (materialized) before the batch's
    *    signatures are appended to the index — the index read is lazy, so
    *    appending first would let this batch's own signatures flow back in
    *    as "old" rows;
    *  - state is therefore the parquet index + doc store, NOT the state
    *    store: executor memory stays flat however many batches stream
    *    through, restarts resume from the index, and each near-dup pair is
    *    flagged exactly once (when its later doc arrives) — spec-asserted
    *    equal, across batches, to the full-corpus q51 pair set. */
  def incrementalDedupBatch(batch: DataFrame, batchId: Long,
      docStorePath: String, indexPath: String): (DataFrame, RDD[Row]) = {
    val s = batch.sparkSession
    graft.functions.GraftFunctions.register(s)
    batch.select(col("doc_id"), col("text"))
      .withColumn("ingest_batch", lit(batchId))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(docStorePath)
    val newSigs = minhashSigs(shingledDocs(batch), "sh")
    val oldSigs = readSigIndex(s, indexPath)
    val bands = bandRows(
      oldSigs.withColumn("is_new", lit(false))
        .unionByName(newSigs.withColumn("is_new", lit(true))),
      meta = Seq("is_new"))
    val cand = bandPairs(bands, gate = Some(col("x.is_new") || col("y.is_new")))
    val store = s.read.parquet(docStorePath).select(col("doc_id"), col("text"))
    // the pin handle is RETURNED, not discarded: the streaming driver frees
    // each batch's blocks after onPairs returns — one leaked
    // MEMORY_AND_DISK RDD per micro-batch over an unbounded stream is a
    // session-lifetime storage leak (disk blocks never auto-evict)
    val (pairs, pairsPin) = graft.engine.Pin.pin(verifyPairs(cand, shingledDocs(store)))
    newSigs.withColumn("ingest_batch", lit(batchId))
      .write.partitionBy("ingest_batch").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(indexPath)
    (pairs, pairsPin)
  }

  /** The signature index, or an empty frame before the first batch. */
  private def readSigIndex(s: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(path).select(col("doc_id"), col("sig"))
    else s.createDataFrame(s.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
  }

  /** q73 — the composed TRAINING-DATA PIPELINE, end to end in one query:
    * near-dup removal (q59's verified-pair connected components, keep the
    * min doc per cluster) → quality gate (≥ 50 tokens) → decontamination
    * (drop the eval slice and every doc sharing an 8-token gram with it,
    * q70's broadcast gram index) → stratified source-mixing sample (q71's
    * portable per-stratum hash rates). Emits per-stage doc counts and
    * id-checksums — the retention ledger a production pipeline publishes.
    *
    * The point is COMPOSITION: every stage is the already-proven operator
    * reused verbatim, all narrowing filters are anti-joins/semi-predicates
    * on broadcast-sized key sets, and the corpus is scanned once per stage
    * with nothing corpus-sized materialized. Stage order is the cost-aware
    * one (cheap high-mass drops first, sampling last so earlier stages see
    * the full distribution). */
  val q73Pipeline: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    // stage 1 — near-dup survivors via clustered pair graph (min per cluster)
    val sh = shingled(s, dir).cache()
    val bands = lshBands(sh, "sh").cache()
    val pairs = verifyPairs(bandPairs(bands), sh).select(col("i"), col("j"))
    val labels = connectedComponentsAuto(pairs)
    sh.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    val dupDropped = labels.filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"))
    val s1 = docs.join(broadcast(dupDropped), Seq("doc_id"), "left_anti")
    // stage 2 — quality gate
    val s2 = s1.filter(size(split(col("text"), " ")) >= 50)
    // stage 3 — decontamination vs the doc_id % 20 eval slice
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(t)-8), i -> concat_ws(' ', slice(t, i+1, 8)))")))
        .as("g"))
    val benchGrams = grams(docs.filter(col("doc_id") % 20 === 0))
      .select(col("g")).distinct()
    val contaminated = grams(s2.filter(col("doc_id") % 20 =!= 0))
      .join(broadcast(benchGrams), "g")
      .select(col("doc_id")).distinct()
    val s3 = s2.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    // stage 4 — stratified source-mixing sample (q71 rates)
    val s4 = s3.filter(
      pmod(pmod(col("doc_id"), lit(999983)) * 2654435761L, lit(1000)) <
        lit(100L) + pmod(expr("substring(source, 4)").cast("long"), lit(4L)) * 200L)
    Seq("0_input" -> docs, "1_dedup" -> s1, "2_quality" -> s2,
        "3_decontam" -> s3, "4_sample" -> s4)
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
          .select(lit(name).as("stage"), col("n_docs"), col("id_sum"))
      }
      .reduce(_ union _)
      .orderBy(col("stage"))
  }

  /** q115 — duplicate-SPAN removal (the C4/CCNet move): dedup happens BELOW
    * document granularity. Each document is cut map-side into consecutive
    * 8-word blocks (`transform` over `sequence`, no shuffle), and every block
    * TEXT keeps only its globally first occurrence — ordered by (doc_id,
    * block index), so boilerplate repeated across documents (and repeated
    * spans within one document) is dropped everywhere but its first site,
    * while the surrounding unique text survives. This is the operator
    * document-level dedup cannot express: two documents 30% identical are no
    * one's near-duplicates, yet a third of the corpus' tokens are copies.
    *
    * One exchange on the block text (the window's partition key) does the
    * first-occurrence arbitration; reassembly groups by doc_id — block-count
    * rows, not token rows, and each block row carries ≤ 8 words. At 100 TB
    * both keys (block text / doc id) are high-cardinality and skew-free by
    * construction (a block repeated billions of times is exactly what the
    * operator deletes — its window computes one row_number partition, which
    * AQE skew handling splits; the kept/dropped DECISION needs only rank 1).
    * Output pins per-doc block accounting AND the exact surviving text. */
  /** Map-side 8-word block explosion shared by the span-dedup family:
    * (doc_id, bidx, btext), one row per consecutive block. */
  private[graft] def spanBlocks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(t)-1) div 8), b -> concat_ws(' ', slice(t, b*8+1, 8)))")))
      .withColumnRenamed("pos", "bidx").withColumnRenamed("col", "btext")

  /** Shared reassembly: per-doc block accounting + exact surviving text from
    * a (doc_id, bidx, btext, kept) frame. */
  private def spanReassemble(marked: DataFrame): DataFrame =
    marked
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN struct(bidx, btext) END)), x -> x.btext)"),
          " ").as("kept_text"))
      .orderBy(col("doc_id"))

  val q115SpanDedup: Q = (s, dir) => {
    val firstSite = Window.partitionBy(col("btext"))
      .orderBy(col("doc_id"), col("bidx"))
    spanReassemble(spanBlocks(Tables.load(s, dir, "documents"))
      .withColumn("kept", row_number().over(firstSite) === 1))
  }

  /** One ingest step of INCREMENTAL span dedup against a persisted span
    * store: blocks of `batch` keep a site iff their text is absent from the
    * store AND first within the batch (arrival order wins — the store was
    * there first, which is the production semantics; a global re-run could
    * prefer a later-arriving smaller doc_id, so the contract is
    * arrival-ordered, not corpus-ordered). The batch's surviving spans are
    * APPENDED to the store afterwards as (btext, first doc_id, first bidx)
    * rows — the store is the FIRST-SITE REGISTRY of every span ever seen,
    * not a bare membership set, and that provenance is what makes replay
    * self-absorbing: a failed batch whose append DID land replays against a
    * store that already contains its own sites, and the "store's first site
    * IS this row" disjunct reproduces the identical output (a membership-
    * only store would flip every replayed first site to dropped). Duplicate
    * appends collapse under the min-site aggregate. No batch-id keying, no
    * dynamic overwrite — the algebra absorbs replays, like the rolling-DAU
    * sketch union.
    *
    * Scale: one equi-join of batch blocks against the store (at 100 TB the
    * store keys on a 128-bit text digest — ~32 bytes/span with its site —
    * and partitions by digest range so the probe join co-locates), one
    * within-batch window over batch-sized data, one batch-sized append.
    * The old corpus is re-read never. */
  private[graft] def spanDedupBatch(batch: DataFrame, storePath: String)
      : DataFrame = {
    val s = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val store =
      if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
        s.read.parquet(storePath)
      else s.createDataFrame(s.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("btext",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("bidx",
            org.apache.spark.sql.types.IntegerType))))
    val firstSites = store
      .groupBy(col("btext"))
      .agg(min(struct(col("doc_id"), col("bidx"))).as("s0"))
    val firstSite = Window.partitionBy(col("btext"))
      .orderBy(col("doc_id"), col("bidx"))
    val marked = spanBlocks(batch)
      .join(firstSites, Seq("btext"), "left")
      .withColumn("kept",
        (col("s0").isNull && row_number().over(firstSite) === 1) ||
          (col("s0.doc_id") === col("doc_id") && col("s0.bidx") === col("bidx")))
    val out = spanReassemble(marked.select(
      col("doc_id"), col("bidx"), col("btext"), col("kept")))
    // persist the result BEFORE appending: `out` must not observe the store
    // rows its own batch is about to add
    val (pinned, _) = graft.engine.Pin.pin(out)
    marked.filter(col("s0").isNull && col("kept"))
      .select(col("btext"), col("doc_id"), col("bidx"))
      .write.mode("append").parquet(storePath)
    pinned
  }

  /** q121 — INCREMENTAL span dedup over the PERSISTED span store: the
    * sub-document twin of q74's signature index. The old corpus
    * (doc_id % 7 ≠ 3) seeds the store — written to parquet and READ BACK,
    * so the round-trip sits inside the checked path — and the new batch
    * (doc_id % 7 = 3) ingests via [[spanDedupBatch]]: boilerplate already
    * seen by the store is dropped at zero re-scan cost, new boilerplate
    * arbitrates within the batch, and the store grows by exactly the
    * batch's surviving spans. Streaming twin: `StreamOps.spanDedupStream`
    * (same ingest per micro-batch; spec pins micro-batch invariance and
    * replay idempotence). */
  val q121SpanDedupIncremental: Q = (s, dir) => {
    val isNew = col("doc_id") % 7 === 3
    val docs = Tables.load(s, dir, "documents")
    val storePath = graft.engine.Scratch.dir(s, "spanstore") + "/spans"
    spanBlocks(docs.filter(!isNew))
      .groupBy(col("btext"))
      .agg(min(struct(col("doc_id"), col("bidx"))).as("s0"))
      .select(col("btext"), col("s0.doc_id").as("doc_id"), col("s0.bidx").as("bidx"))
      .write.mode("overwrite").parquet(storePath)
    spanDedupBatch(docs.filter(isNew), storePath)
  }

  /** q116 — LEAKAGE-SAFE train/val/test split: the assignment unit is the
    * near-duplicate CLUSTER (connected components over the q51-verified
    * MinHash pair graph — the q59 machinery), not the document. A naive
    * per-doc hash split puts two near-identical documents on opposite sides
    * of the train/eval boundary — the classic contamination leak that
    * inflates eval scores. Splitting on the cluster representative's
    * portable hash (80/10/10) makes that impossible by construction, and the
    * output MEASURES what the construction prevented: per split, the number
    * of multi-doc clusters whose members' naive per-doc hashes would have
    * landed in ≥ 2 different splits.
    *
    * Scale shape: the cluster labels come from the audited CC drivers
    * (auto-selected propagation/star-contraction); everything after is one
    * broadcast-sized left join (labels frame is pair-graph-sized, corpus
    * never re-shuffles on text) + two integer aggregations. Split assignment
    * is the q29 engine-portable multiplicative hash, so ANY engine -- and
    * any re-run at any cluster size — deals identical docs to identical
    * splits: the property that makes a 100-TB training mix reproducible. */
  val q116LeakSafeSplit: Q = (s, dir) => {
    def h10(c: Column): Column =
      pmod(pmod(c, lit(999983)) * 2654435761L, lit(10))
    def splitName(c: Column): Column =
      when(h10(c) < 8, "train").when(h10(c) === 8, "val").otherwise("test")
    val sh = shingled(s, dir).cache()
    val bands = lshBands(sh, "sh").cache()
    val pairs = verifyPairs(bandPairs(bands), sh).select(col("i"), col("j"))
    val labels = connectedComponentsAuto(pairs)
    sh.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    val docs = Tables.load(s, dir, "documents")
      .join(labels.select(col("id").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("lbl"), col("doc_id")).as("cluster"))
    docs
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_sum"),
        sum(size(split(col("text"), " ")).cast("long")).as("toks"),
        countDistinct(splitName(col("doc_id"))).as("n_naive"))
      .groupBy(splitName(col("cluster")).as("split"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("n")).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("id_sum")).as("id_checksum"),
        sum(when(col("n") > 1 && col("n_naive") > 1, 1L).otherwise(0L))
          .as("n_leaks_prevented"))
      .orderBy(col("split"))
  }

  /** q134 — INCREMENTAL CONNECTED COMPONENTS over a persisted LABEL store:
    * the cluster-maintenance half of incremental dedup. q74 keeps the PAIR
    * discovery |new|-proportional; this keeps the CLUSTER state
    * |new|-proportional too — the old corpus' components persist as (id,
    * label) rows, an arriving batch contributes only its new-involving
    * verified pairs (q74's gated banding, old×old never materializes), and
    * the merge runs CC over `stored-label edges ∪ new pairs`: a frame of
    * component-count + batch-pair size, NOT corpus-pair size. Because old
    * labels are already component minima, the merged labels equal the
    * full-corpus q59 run EXACTLY (same survivors, same rollup) — the
    * oracle is literally q59's, which is the whole claim: index once,
    * ingest forever, never recluster from scratch.
    *
    * The label store round-trips parquet inside the checked path (a label
    * that doesn't survive storage would hash-mismatch); at 100 TB it is
    * the only cluster state that exists — component-count-sized, id-keyed,
    * rewritten merge-by-merge. */
  val q134CcIncremental: Q = (s, dir) => {
    def isNewId(c: org.apache.spark.sql.Column) = c % 7 === 3
    // shingle + sign the corpus ONCE (r13), and — new in r14 — band,
    // enumerate, and VERIFY once too: the bootstrap needs the old-old
    // pairs and the ingest the new-involving pairs, which are a disjoint
    // partition of ONE verified pair set. Band-bucket membership is
    // per-doc, so old-old co-membership in the full band frame equals
    // co-membership in the old-only band frame (the old two-pass form
    // banded the old 6/7 twice and ran the broadcast verify twice); and
    // is_new is a pure function of doc_id, so the split is a filter on
    // the pair columns, not a meta join. Guide §1.2: one banding, one
    // pair enumeration, one verify — identical pair sets by construction.
    val sh = shingled(s, dir, spread = true).cache()
    val sigs = minhashSigs(sh, "sh").cache()
    val allPairs = verifyPairs(bandPairs(bandRows(sigs)), sh)
      .select(col("i"), col("j")).cache()
    // bootstrap: old-only graph → labels → persisted store
    val pairsOld = allPairs
      .filter(!isNewId(col("i")) && !isNewId(col("j")))
    val labelStore = graft.engine.Scratch.dir(s, "cc_labels") + "/labels"
    connectedComponentsAuto(pairsOld)
      .write.mode("overwrite").parquet(labelStore)
    // ingest: new-involving pairs only (q74's gating, now a filter)
    val pairsNew = allPairs
      .filter(isNewId(col("i")) || isNewId(col("j")))
    // merge: stored labels as edges + the batch's pairs
    val storedEdges = s.read.parquet(labelStore)
      .select(col("id").as("i"), col("lbl").as("j"))
    val labels = connectedComponentsAuto(storedEdges.union(pairsNew))
    sh.unpersist(blocking = false)
    sigs.unpersist(blocking = false)
    allPairs.unpersist(blocking = false)
    labels
      .groupBy(col("lbl").as("keep_id"))
      .agg(count(lit(1)).as("n_members"),
        max(col("id")).as("max_id"),
        sum(col("id")).as("id_sum"))
      .withColumn("n_dropped", col("n_members") - 1)
      .orderBy(col("keep_id"))
  }

  /** q135 — CONTAINMENT (excerpt) detection: directed near-duplicate
    * containment — is ≥ 80% of document A's shingle set inside document B?
    * Jaccard dedup (q51/q53) misses exactly this case: a short document
    * quoted whole inside a long one has tiny Jaccard but containment ≈ 1,
    * and training pipelines drop the excerpt, not the host. Candidate
    * generation is the df-capped postings self-join (the prefix-filter
    * family of set-similarity joins): explode shingles, keep grams with
    * document frequency ≤ 20 (a gram in half the corpus prunes nothing and
    * fans out quadratically — the cap IS the scale control), equi-join the
    * rare-gram postings, verify with the exact intersect. The declared
    * blocking contract: pairs sharing ONLY ubiquitous grams are invisible
    * — such text is corpus boilerplate, q115's department — and the oracle
    * replicates the cap, so the contract itself is what's checked. Both
    * directions emit independently (A-in-B and B-in-A are different
    * facts); precision of the emitted rows is exact.
    *
    * 100-TB CONFIG CARD — `dfCap` (default 20, oracle-replicated):
    *  - cap: grams with document frequency > dfCap never enter the
    *    postings self-join;
    *  - candidate bound: Σ_{df ≤ cap} df² by construction — SkewStressSpec
    *    measures a 400-doc corpus sharing one boilerplate shingle emitting
    *    ALL 79 800 pairs uncapped vs exactly the 1 rare-gram pair at
    *    cap 20;
    *  - recall trade, exact and part of the checked contract: pairs
    *    sharing ONLY ubiquitous grams are invisible — such text is corpus
    *    boilerplate (q115's department), and the DuckDB oracle applies the
    *    same cap, so the contract itself is what the hash-compare checks.
    *    Raise dfCap for higher recall at Σdf² cost; the knob moves the
    *    bound, never the exactness of verification. */
  /** q135's df-capped candidate generator, factored for the skew-stress
    * spec: pairs of docs sharing at least one gram with document frequency
    * ≤ `dfCap`. The cap IS the scale control — an ultra-common gram
    * (boilerplate in most docs) would fan out quadratically; capped, it
    * generates NOTHING and candidate volume is bounded by Σ_rare df² by
    * construction (SkewStressSpec pins both the bound and the recall
    * contract: pairs sharing only ubiquitous grams are invisible). */
  private[graft] def containmentCandidates(sh: DataFrame, dfCap: Int): DataFrame = {
    // ONE exchange, not a postings self-join (the fuzzyPairsDeletion shape,
    // r13): `sh` is array_distinct per doc, so a gram's document frequency
    // IS its posting-set size — one gram-keyed aggregation collects the
    // posting set, the df cap becomes a size() filter on it, and the ≤
    // C(cap,2) pairs per bucket enumerate AFTER the exchange with a HOF
    // over the sorted member list. The old plan aggregated df, joined the
    // rare grams back onto the postings, and self-joined the keyed rows —
    // three exchanges of the exploded gram stream plus a duplicated
    // subtree; this one shuffles the compact (doc_id, g) rows once.
    // Numbered repartition spreads the pair fan-out (join/explode OUTPUT,
    // which AQE coalescing cannot anticipate — the spreadForFanout
    // rationale) and the groupBy reuses its exchange. Candidate set and
    // recall contract are IDENTICAL: pairs sharing ≥ 1 gram with df ≤ cap
    // (SkewStressSpec pins the bound and the capped-recall trade).
    // pairs ride the distinct exchange packed as one 8-byte long — the
    // q79/q92 packing (JoinQueries.dedupPackedPairs: guarded pack,
    // UNSIGNED decode), applied to this operator's 1.12M-distinct-pair
    // volume term at sf0.1
    val grams = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    graft.operators.JoinQueries.dedupPackedPairs(grams.repartition(
        grams.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("g"))
      .groupBy(col("g")).agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= dfCap)
      .select(explode(expr(
        s"""flatten(transform(ds, (xi, i) ->
             transform(slice(ds, i + 2, size(ds)), xj ->
               ${graft.operators.JoinQueries.packPairExpr})))""")).as("pk")))
  }

  val q135Containment: Q = (s, dir) => {
    val sh = shingled(s, dir, spread = true).cache()
    val cand = containmentCandidates(sh, 20)
    // verify: stream the (large) candidate pair set through two BROADCAST
    // joins against the doc→shingle-array frame, so the pair stream — the
    // volume term, Σdf² candidates (1.12M distinct pairs at sf0.1) — never
    // shuffles or sorts with 1 KB arrays attached; only the doc frame
    // moves. Stage-profiled at sf0.1 (Dev q135prof): the broadcast verify
    // costs 0.8 s for all 1.12M pairs; candidate generation (3.6 s) is the
    // dominant term and is already the declared df-cap contract. At 100 TB
    // the corpus arrays exceed broadcast, but the frame that must
    // broadcast is only the docs APPEARING IN CANDIDATES (semi-join
    // first), and a candidate set dense enough to break that is a corpus
    // q115/q50 should have collapsed — the boilerplate contract the df cap
    // declares.
    val verified = cand
      .join(broadcast(sh.select(col("doc_id").as("i"), col("sh").as("sh_i"))), "i")
      .join(broadcast(sh.select(col("doc_id").as("j"), col("sh").as("sh_j"))), "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("long").as("inter"),
        size(col("sh_i")).cast("long").as("n_i"),
        size(col("sh_j")).cast("long").as("n_j"))
    val out = verified.select(explode(array(
        struct(col("i").as("contained"), col("j").as("container"),
          col("inter"), col("n_i").as("n_contained")),
        struct(col("j").as("contained"), col("i").as("container"),
          col("inter"), col("n_j").as("n_contained")))).as("d"))
      .select(col("d.contained").as("contained"), col("d.container").as("container"),
        col("d.inter").as("inter"), col("d.n_contained").as("n_contained"))
      .withColumn("cont_ppm", expr("inter * 1000000 div n_contained"))
      .filter(col("cont_ppm") >= 800000)
      .orderBy(col("contained"), col("container"))
    sh.unpersist(blocking = false)
    out
  }

  /** q137 — SURVIVOR SELECTION over the near-dup cluster graph: the step
    * that turns q59's clusters into a deduplicated CORPUS. Each cluster
    * keeps exactly one document — the argmax by (n_chars, then min doc_id),
    * i.e. the longest member with a deterministic tie-break — and every
    * other member drops; documents in no verified pair are their own
    * singleton cluster and always survive. Reported per source: docs seen,
    * docs kept, kept-id checksum, and the character mass dropped — the
    * ledger a pipeline owner reads to see WHICH feeds lose volume to
    * dedup.
    *
    * Shuffle shape at 100 TB: the label frame is pair-graph-sized (only
    * docs incident to a verified pair), so the corpus joins it on doc_id
    * once; the survivor argmax folds into ONE cluster-keyed aggregation
    * via max(struct(quality, -id)) — no per-cluster window sort — and the
    * cluster-keyed survivor join reuses the aggregation's partitioning.
    * Oracle: recursive-CTE transitive closure (q59's) + a per-cluster
    * rank-1 window. */
  val q137DedupSurvivors: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val sh = shingled(s, dir).cache()
    val bands = lshBands(sh, "sh").cache()
    val pairs = verifyPairs(bandPairs(bands), sh).select(col("i"), col("j"))
    val labels = connectedComponentsAuto(pairs)
    sh.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    val clustered = docs
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc_id")))
    val survivors = clustered.groupBy(col("cluster"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster"), (-col("best.neg_id")).as("keep_id"))
    clustered.join(survivors, "cluster")
      .withColumn("kept", (col("doc_id") === col("keep_id")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        sum(when(col("kept") === 1L, col("doc_id")).otherwise(0L))
          .as("kept_id_sum"),
        sum(when(col("kept") === 0L, col("n_chars")).otherwise(0L))
          .as("dropped_chars"))
      .orderBy(col("source"))
  }

  /** q138 — EXACT set-similarity self-join via PREFIX FILTERING (the
    * AllPairs/PPJoin family — Bayardo et al., WWW'07; Xiao et al.,
    * WWW'08): every pair at token-3-shingle Jaccard ≥ 0.8, with a
    * COMPLETENESS GUARANTEE q51's LSH cannot give (banding misses a pair
    * at threshold with prob (1−s⁴)⁸ > 0; prefix filtering misses none).
    * Pigeonhole: J(a,b) ≥ τ forces |a∩b| ≥ ⌈τ·|a|⌉, so under ANY global
    * token order the first |a| − ⌈τ·|a|⌉ + 1 tokens of a (its PREFIX)
    * must hit a∩b — two qualifying docs always share a prefix token. The
    * global order is ascending document frequency (ties by token), so
    * prefixes hold each doc's RAREST grams and posting lists stay short —
    * df-ordering IS the skew control, where q135 needed a df cap.
    *
    * Plan: df from one gram-keyed aggregation; per-doc prefix via a rank
    * window partitioned by doc (the token stream shuffles once by doc_id,
    * q64's discipline); candidates from the prefix-postings equi-join on
    * the gram, with the 5·min ≥ 4·max length gate folded into the join;
    * exact-Jaccard verify unchanged from q51. Oracle: the brute-force
    * pair set — q138 must reproduce it EXACTLY, not approximately. */
  val q138AllPairsJaccard: Q = (s, dir) => {
    val sh = shingled(s, dir).cache()
    val grams = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("g"))
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // prefix length |s| − ⌈0.8|s|⌉ + 1, integer-exact: ⌈4n/5⌉ = (4n+4) div 5
    val rankW = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefix = grams.join(df, "g")
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= col("n") - expr("(4*n + 4) div 5") + 1)
      .select(col("g"), col("doc_id"), col("n"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n"), col("y.n")) * 5 >= greatest(col("x.n"), col("y.n")) * 4)
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct()
    verifyPairs(cand, sh)
  }

  /** q179 — CROSS-SOURCE DUPLICATION MATRIX: which feeds duplicate each
    * other — q51's verified near-dup pair set (LSH banding + exact Jaccard
    * ≥ 0.8, the recall-complete-on-fixture path its own oracle pins)
    * joined to each side's source and rolled up per unordered source pair.
    * The report a corpus owner reads before buying a new feed: a heavy
    * off-diagonal cell means the feed is mostly recycled content. Pair
    * generation is the one LSH exchange; the source joins are doc-keyed;
    * the matrix is sources²-bounded. Oracle pays the brute all-pairs
    * Jaccard (q51's) plus the same source rollup. */
  val q179SourceDupMatrix: Q = (s, dir) => {
    val shd = shingled(s, dir).cache()
    // band rows cached: the self-join reads the signature pipeline once
    // (q51's discipline — uncached, both join sides recompute it)
    val bands = lshBands(shd, "sh").cache()
    // PIN the verified pairs EAGERLY while the shingle/band caches are warm
    // (q80's discipline): unpersisting the inputs before the caller runs
    // the lazy result would otherwise strip the caches from the executed
    // plan — measured 2× slower at sf0.1 (8.1 s vs 4.5 s). The pinned
    // blocks are freed by the session's next releasePinned sweep.
    val (pairs, _) = graft.engine.Pin.pin(
      verifyPairs(bandPairs(bands), shd).select(col("i"), col("j")))
    val src = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val out = pairs
      .join(src.select(col("doc_id").as("i"), col("source").as("src_i")), "i")
      .join(src.select(col("doc_id").as("j"), col("source").as("src_j")), "j")
      .select(least(col("src_i"), col("src_j")).as("src_a"),
        greatest(col("src_i"), col("src_j")).as("src_b"),
        col("i"), col("j"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("i") + col("j")).as("id_sum"))
      .orderBy(col("src_a"), col("src_b"))
    shd.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    out
  }

  /** q181 — DEDUP YIELD CURVE: the size distribution of near-dup clusters
    * over the WHOLE corpus (singletons included via the left join) and
    * what each size contributes in dropped documents — the chart that
    * answers "how much volume does dedup actually buy, and is it a few
    * giant families or a long tail of pairs?" before anyone commits to
    * running it at 100 TB. Composes q51's verified pairs and q59's
    * auto-selected connected components; the rollup is cluster-size-keyed
    * (tiny). Oracle replays the recursive-CTE closure and the same
    * histogram. */
  val q181DedupYield: Q = (s, dir) => {
    val shd = shingled(s, dir).cache()
    val bands = lshBands(shd, "sh").cache() // q51's discipline, see q179
    val pairs = verifyPairs(bandPairs(bands), shd)
      .select(col("i"), col("j"))
    val labels = connectedComponentsAuto(pairs)
    shd.unpersist(blocking = false)
    bands.unpersist(blocking = false)
    val sizes = Tables.load(s, dir, "documents").select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .select(coalesce(col("lbl"), col("doc_id")).as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
    sizes.groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
      .select(col("csize"), col("n_clusters"),
        (col("csize") * col("n_clusters")).as("n_docs"),
        ((col("csize") - 1L) * col("n_clusters")).as("n_dropped"))
      .orderBy(col("csize"))
  }

  /** q200 — EXACT SUBSTRING DUPLICATE COVERAGE (Lee et al., ACL 2022,
    * "Deduplicating Training Data Makes Language Models Better"): mark, for
    * every document, the maximal character spans covered by some ≥30-char
    * substring that also occurs elsewhere in the corpus (another document OR
    * another offset of the same document) — the character-level, UNALIGNED
    * dedup that q115's aligned 8-word blocks cannot express: a copied
    * sentence starting mid-block is invisible to block dedup but is exactly
    * a run of duplicated 30-grams here. The published implementation builds
    * a corpus suffix array; the identity this operator uses instead is that
    * the union of duplicated-L-gram windows IS the set of characters inside
    * duplicated substrings of length ≥ L — so hashed L-gram multiplicity +
    * interval merge computes the same coverage with only equi-shuffles.
    *
    * Every position's 30-gram is hashed map-side to 60 bits (`md5_hi60`, the
    * q52/q197 portable hash — DuckDB replays it bit-for-bit, so collisions,
    * were any to occur, affect both engines identically); a gram is
    * duplicated iff its hash occurs at ≥ 2 (doc, pos) sites. Coverage
    * windows [pos, pos+29] then merge per document by the classic
    * gaps-and-islands fold: a running max of covered-end over a
    * pos-ordered window, a new island when a window starts past it, and a
    * prefix-sum island id — pure window arithmetic, no self-join.
    *
    * Shape at 100 TB: the position stream is O(total chars) rows of
    * (doc_id, pos, hash) — 20 bytes each, the same order of bytes the
    * suffix-array approach sorts — crossing ONE exchange keyed on the hash
    * and one keyed on doc_id for the merge. Multiplicity is a map-side-
    * combined groupBy joined back (NOT a count-over-hash window: a
    * boilerplate gram repeated 10⁹ times would pin one window partition,
    * while the groupBy collapses it map-side and AQE skew-splits the join).
    * Output is per-document accounting (spans, duplicated chars, micro
    * ratio, an exact span-boundary checksum), never the text. */
  val q200SubstringDedup: Q = (s, dir) => {
    graft.functions.GraftFunctions.register(s)
    // spread the single-split corpus scan before the per-position md5
    // stage — the dominant, previously single-task cost (graft.engine.
    // Spread scaladoc; no-op on any properly-split corpus)
    substringCoverage(graft.engine.Spread.byKey(
      Tables.load(s, dir, "documents"), "doc_id"), 30)
  }

  /** q200's engine over any (doc_id, text) frame — factored so the spec can
    * drive crafted fixtures (mid-block copies, overlapping-gram merges,
    * intra-document repeats) through the exact production path. */
  private[graft] def substringCoverage(docsIn: DataFrame, L: Int): DataFrame = {
    val grams = gramPositions(docsIn, L)
    val dupH = grams.groupBy(col("h")).agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("h"))
    val dup = grams.join(dupH, Seq("h")).select(col("doc_id"), col("doc_len"), col("pos"))
    coverageFromPositions(dup, L)
  }

  /** The hashed L-gram position stream (doc_id, doc_len, pos, h) — shared
    * by batch q200 and the incremental ingest. */
  private def gramPositions(docsIn: DataFrame, L: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docsIn.sparkSession)
    docsIn
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("doc_len"))
      .filter(col("doc_len") >= L)
      .select(col("doc_id"), col("doc_len"), posexplode(expr(
        s"md5_hi60(transform(sequence(1, length(text) - ${L - 1}), i -> substring(text, i, $L)))")))
      .select(col("doc_id"), col("doc_len"), (col("pos") + 1L).as("pos"), col("col").as("h"))
  }

  /** Islands merge + per-doc accounting over duplicated gram positions
    * (doc_id, doc_len, pos) — the second half of q200, shared with the
    * incremental serve path. */
  private[graft] def coverageFromPositions(dup: DataFrame, L: Int): DataFrame = {
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = dup
      .withColumn("cov_end", col("pos") + lit(L - 1L))
      .withColumn("new_isl",
        when(col("pos") > coalesce(max(col("cov_end")).over(wRun), lit(-1L)) + 1L, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("new_isl")).over(wIsl))
    islands.groupBy(col("doc_id"), col("isl"))
      .agg(max(col("doc_len")).as("doc_len"),
        min(col("pos")).as("span_start"), max(col("cov_end")).as("span_end"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1L).as("dup_chars"),
        max(col("doc_len")).as("doc_len"),
        sum(col("span_start") * 100003L + col("span_end")).as("span_checksum"))
      .select(col("doc_id"), col("n_spans"), col("dup_chars"), col("doc_len"),
        expr("CAST(round(dup_chars * 1000000.0 / doc_len) AS BIGINT)").as("dup_micro"),
        col("span_checksum"))
      .orderBy(col("doc_id"))
  }

  /** One ingest step of INCREMENTAL substring-duplicate coverage — q200's
    * twin of [[spanDedupBatch]], with one structural difference: substring
    * coverage is BIDIRECTIONAL (a site is duplicated by occurrences that
    * arrive LATER too), so the design is two stores and a serve-time read
    * instead of per-batch final answers:
    *
    *  - `gramStorePath` — the FIRST-SITE REGISTRY of every gram hash ever
    *    seen: one (h, doc_id, pos, doc_len) row per new hash, appended at
    *    the batch that first sees it (duplicate appends collapse under the
    *    min-site read aggregate — q121's replay discipline);
    *  - `dupSitesPath` — append-only DUPLICATED POSITIONS (doc_id, doc_len,
    *    pos): a batch site lands here when its hash is already registered
    *    at some OTHER site or repeats within the batch, and a REGISTERED
    *    first site lands here (possibly again — serve dedups) the moment a
    *    later batch re-sees its hash, which is exactly how a forward
    *    duplicate retroactively covers its first occurrence.
    *
    * The self-site guards (`≠ s0` everywhere) make a replayed batch — whose
    * registry append already landed — reproduce its appends verbatim
    * instead of counting ITSELF as the duplicate evidence; serving distincts
    * the site store, so replayed appends are absorbed. The identity that
    * makes serve == batch q200 exact: a site is in the distinct dup-site
    * store iff its hash occurs at ≥ 2 sites across ALL ingested batches —
    * same-batch pairs land at their batch, cross-batch pairs land when the
    * second side arrives (plus the retro-append of the first).
    *
    * Scale: a batch pays its own position stream through ONE hash-keyed
    * exchange (map-side-combined counts) and one registry probe join (store
    * hash-partitioned at 100 TB → co-located); appends are batch-sized;
    * the old corpus is re-read never. Serving reads ONLY duplicated
    * positions — coverage-sized, not corpus-sized. */
  private[graft] def substringDedupBatch(batch: DataFrame,
      gramStorePath: String, dupSitesPath: String, L: Int = 30): Unit = {
    val s = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val store =
      if (fs.exists(new org.apache.hadoop.fs.Path(gramStorePath)))
        s.read.parquet(gramStorePath)
      else s.createDataFrame(s.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_len",
            org.apache.spark.sql.types.LongType))))
    val firstSites = store.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"), col("doc_len"))).as("s0"))
    val grams = gramPositions(batch, L)
    val counts = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"), col("doc_len"))).as("smin"))
    // batch sites that are duplicated: repeat within the batch, or the
    // registry holds this hash at a DIFFERENT site (self = replayed append)
    val dupBatchSites = grams
      .join(firstSites, Seq("h"), "left")
      .join(counts.select(col("h"), col("c")), Seq("h"))
      .filter(col("c") >= 2 ||
        (col("s0").isNotNull &&
          !(col("s0.doc_id") === col("doc_id") && col("s0.pos") === col("pos"))))
      .select(col("doc_id"), col("doc_len"), col("pos"))
    // retro-append: a registered first site becomes duplicated when this
    // batch brings real evidence — a repeat, or a site other than itself
    val retroSites = counts.join(firstSites, Seq("h"))
      .filter(col("c") >= 2 ||
        !(col("smin.doc_id") === col("s0.doc_id") && col("smin.pos") === col("s0.pos")))
      .select(col("s0.doc_id").as("doc_id"), col("s0.doc_len").as("doc_len"),
        col("s0.pos").as("pos"))
    // write order matters for the failure window: dup sites first (their
    // derivation must see the PRE-append registry), then the registry
    // append — a crash between the two replays into identical appends
    dupBatchSites.union(retroSites).write.mode("append").parquet(dupSitesPath)
    counts.join(firstSites, Seq("h"), "left_anti")
      .select(col("h"), col("smin.doc_id").as("doc_id"),
        col("smin.pos").as("pos"), col("smin.doc_len").as("doc_len"))
      .write.mode("append").parquet(gramStorePath)
  }

  /** Serve per-document substring-duplicate coverage from the incremental
    * dup-site store: distinct (replay/retro-append absorption), then
    * exactly batch q200's island merge and accounting. */
  private[graft] def substringCoverageFromStore(s: SparkSession,
      dupSitesPath: String, L: Int = 30): DataFrame =
    coverageFromPositions(
      s.read.parquet(dupSitesPath)
        .select(col("doc_id"), col("doc_len"), col("pos")).distinct(), L)

  def queries: Map[String, Q] = Map(
    "q200_substring_dedup" -> q200SubstringDedup,
    "q181_dedup_yield" -> q181DedupYield,
    "q137_dedup_survivors" -> q137DedupSurvivors,
    "q138_allpairs_jaccard" -> q138AllPairsJaccard,
    "q135_containment" -> q135Containment,
    "q134_cc_incremental" -> q134CcIncremental,
    "q115_span_dedup"     -> q115SpanDedup,
    "q116_leak_safe_split" -> q116LeakSafeSplit,
    "q121_span_dedup_incremental" -> q121SpanDedupIncremental,
    "q73_pipeline"        -> q73Pipeline,
    "q59_dedup_clusters"  -> q59DedupClusters,
    "q50_dedup_exact"     -> q50Exact,
    "q179_source_dup_matrix" -> q179SourceDupMatrix,
    "q51_dedup_minhash"   -> q51MinHashLsh,
    "q52_dedup_simhash"   -> q52SimHash,
    "q53_dedup_ngram"     -> q53NgramJaccard,
    "q54_dedup_embedding" -> q54EmbeddingDup,
    "q74_dedup_incremental" -> q74IncrementalDedup)

  /** Shared DuckDB fragment: distinct 3-token shingles, 1-based lists. */
  private val duckShingles =
    """sh AS (
      SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]
                                    for i in range(1, len(t)-1)]) AS ss
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))"""

  private val duckPairJaccard =
    s"""WITH $duckShingles
      SELECT a.doc_id AS i, b.doc_id AS j,
        CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS inter,
        CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS BIGINT) AS uni,
        CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) /
          CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS BIGINT) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(a.ss) > 0 AND len(b.ss) > 0
        AND len(list_intersect(a.ss, b.ss)) >=
            len(list_distinct(list_concat(a.ss, b.ss))) * 0.8
      ORDER BY i, j"""

  def oracles: Map[String, String] = Map(
    "q200_substring_dedup" -> """
      WITH d AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS doc_len
        FROM documents WHERE length(text) >= 30),
      g AS (
        SELECT doc_id, doc_len, CAST(pos AS BIGINT) AS pos,
          ('0x' || substr(md5(substr(text, pos, 30)), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, doc_len, text,
                unnest(range(1, length(text) - 28)) AS pos FROM d)),
      duph AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
      dup AS (SELECT doc_id, doc_len, pos FROM g SEMI JOIN duph USING (h)),
      isl AS (
        SELECT doc_id, doc_len, pos, pos + 29 AS cov_end,
          CASE WHEN pos > coalesce(max(pos + 29) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
               THEN 1 ELSE 0 END AS new_isl
        FROM dup),
      isl2 AS (
        SELECT doc_id, doc_len, pos, cov_end,
          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i
        FROM isl),
      spans AS (
        SELECT doc_id, i, max(doc_len) AS doc_len,
          min(pos) AS span_start, max(cov_end) AS span_end
        FROM isl2 GROUP BY doc_id, i)
      SELECT doc_id, count(*) AS n_spans,
        CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_chars,
        max(doc_len) AS doc_len,
        CAST(round(sum(span_end - span_start + 1) * 1000000.0 / max(doc_len))
          AS BIGINT) AS dup_micro,
        CAST(sum(span_start * 100003 + span_end) AS BIGINT) AS span_checksum
      FROM spans GROUP BY doc_id ORDER BY doc_id""",
    "q181_dedup_yield" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS lbl FROM reach GROUP BY id),
      cl AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      sizes AS (SELECT cluster, count(*) AS csize FROM cl GROUP BY 1)
      SELECT CAST(csize AS BIGINT) AS csize, count(*) AS n_clusters,
        CAST(csize * count(*) AS BIGINT) AS n_docs,
        CAST((csize - 1) * count(*) AS BIGINT) AS n_dropped
      FROM sizes GROUP BY csize ORDER BY csize""",
    "q179_source_dup_matrix" -> s"""
      WITH $duckShingles,
      p AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8)
      SELECT least(da.source, db.source) AS src_a,
        greatest(da.source, db.source) AS src_b,
        count(*) AS n_pairs, CAST(sum(i + j) AS BIGINT) AS id_sum
      FROM p JOIN documents da ON i = da.doc_id
      JOIN documents db ON j = db.doc_id
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q137_dedup_survivors" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS lbl FROM reach GROUP BY id),
      cl AS (
        SELECT d.doc_id, d.source, d.n_chars,
          coalesce(c.lbl, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM cl)
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN rn = 1 THEN doc_id ELSE 0 END) AS BIGINT)
          AS kept_id_sum,
        CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE n_chars END) AS BIGINT)
          AS dropped_chars
      FROM ranked GROUP BY source ORDER BY source""",
    // exact join ⇒ the oracle is the brute-force pair set verbatim (q51's
    // oracle is the SAME SQL but checks an approximate engine path)
    "q138_allpairs_jaccard" -> duckPairJaccard,
    "q135_containment" -> s"""
      WITH $duckShingles,
      g AS (SELECT doc_id, unnest(ss) AS g FROM sh),
      df AS (SELECT g, count(*) AS df FROM g GROUP BY 1),
      rare AS (SELECT g.doc_id, g.g FROM g JOIN df USING (g) WHERE df.df <= 20),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id),
      v AS (
        SELECT i, j,
          CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) AS inter,
          CAST(len(x.ss) AS BIGINT) AS n_i, CAST(len(y.ss) AS BIGINT) AS n_j
        FROM cand JOIN sh x ON x.doc_id = cand.i JOIN sh y ON y.doc_id = cand.j),
      d AS (
        SELECT i AS contained, j AS container, inter, n_i AS n_contained FROM v
        UNION ALL
        SELECT j AS contained, i AS container, inter, n_j AS n_contained FROM v)
      SELECT contained, container, inter, n_contained,
        CAST(inter * 1000000 // n_contained AS BIGINT) AS cont_ppm
      FROM d WHERE inter * 1000000 // n_contained >= 800000
      ORDER BY contained, container""",
    "q115_span_dedup" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      b AS (SELECT doc_id, u.bidx, u.btext FROM (
        SELECT doc_id,
          unnest([{'bidx': x, 'btext': array_to_string(t[x*8+1:x*8+8], ' ')}
                  for x in range(0, (len(t)-1)//8 + 1)]) AS u
        FROM w)),
      r AS (SELECT doc_id, bidx, btext,
              row_number() OVER (PARTITION BY btext ORDER BY doc_id, bidx) AS rnk
            FROM b)
      SELECT doc_id, count(*) AS n_blocks,
        CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        coalesce(string_agg(CASE WHEN rnk = 1 THEN btext END, ' ' ORDER BY bidx), '')
          AS kept_text
      FROM r GROUP BY doc_id ORDER BY doc_id""",
    // arrival-order contract: a new-batch block survives iff its text is in
    // NO old doc and it is the first (doc_id, bidx) site within the batch
    "q121_span_dedup_incremental" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      b AS (SELECT doc_id, u.bidx, u.btext FROM (
        SELECT doc_id,
          unnest([{'bidx': x, 'btext': array_to_string(t[x*8+1:x*8+8], ' ')}
                  for x in range(0, (len(t)-1)//8 + 1)]) AS u
        FROM w)),
      oldb AS (SELECT DISTINCT btext FROM b WHERE doc_id % 7 <> 3),
      newb AS (SELECT * FROM b WHERE doc_id % 7 = 3),
      r AS (SELECT n.doc_id, n.bidx, n.btext,
              row_number() OVER (PARTITION BY n.btext
                ORDER BY n.doc_id, n.bidx) AS rnk,
              o.btext IS NOT NULL AS in_old
            FROM newb n LEFT JOIN oldb o ON n.btext = o.btext)
      SELECT doc_id, count(*) AS n_blocks,
        CAST(sum(CASE WHEN NOT in_old AND rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        coalesce(string_agg(CASE WHEN NOT in_old AND rnk = 1 THEN btext END,
                            ' ' ORDER BY bidx), '') AS kept_text
      FROM r GROUP BY doc_id ORDER BY doc_id""",
    "q116_leak_safe_split" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS keep_id FROM reach GROUP BY id),
      cl AS (SELECT d.doc_id, d.text, coalesce(c.keep_id, d.doc_id) AS cluster
             FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      g AS (SELECT cluster, count(*) AS n,
              CAST(sum(doc_id) AS BIGINT) AS id_sum,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
              count(DISTINCT CASE
                WHEN ((doc_id % 999983) * 2654435761) % 10 < 8 THEN 'train'
                WHEN ((doc_id % 999983) * 2654435761) % 10 = 8 THEN 'val'
                ELSE 'test' END) AS n_naive
            FROM cl GROUP BY cluster)
      SELECT CASE
          WHEN ((cluster % 999983) * 2654435761) % 10 < 8 THEN 'train'
          WHEN ((cluster % 999983) * 2654435761) % 10 = 8 THEN 'val'
          ELSE 'test' END AS split,
        count(*) AS n_clusters, CAST(sum(n) AS BIGINT) AS n_docs,
        CAST(sum(toks) AS BIGINT) AS n_tokens,
        CAST(sum(id_sum) AS BIGINT) AS id_checksum,
        CAST(sum(CASE WHEN n > 1 AND n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_leaks_prevented
      FROM g GROUP BY 1 ORDER BY split""",
    "q73_pipeline" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS keep_id FROM reach GROUP BY id),
      s1 AS (SELECT * FROM documents
             WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> keep_id)),
      s2 AS (SELECT * FROM s1 WHERE len(string_split(text, ' ')) >= 50),
      bgrams AS (
        SELECT DISTINCT unnest(list_distinct([array_to_string(t[i:i+7], ' ')
                                for i in range(1, len(t)-6)])) AS g
        FROM (SELECT string_split(text, ' ') AS t FROM documents
              WHERE doc_id % 20 = 0)
        WHERE len(t) >= 8),
      cgrams AS (
        SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+7], ' ')
                                for i in range(1, len(t)-6)])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM s2
              WHERE doc_id % 20 <> 0)
        WHERE len(t) >= 8),
      contaminated AS (
        SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (g)),
      s3 AS (SELECT * FROM s2 WHERE doc_id % 20 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      s4 AS (SELECT * FROM s3
             WHERE ((doc_id % 999983) * 2654435761) % 1000 <
                   100 + (CAST(substring(source, 4) AS BIGINT) % 4) * 200)
      SELECT stage, n_docs, id_sum FROM (
        SELECT '0_input' AS stage, count(*) AS n_docs,
          CAST(sum(doc_id) AS BIGINT) AS id_sum FROM documents
        UNION ALL SELECT '1_dedup', count(*), CAST(sum(doc_id) AS BIGINT) FROM s1
        UNION ALL SELECT '2_quality', count(*), CAST(sum(doc_id) AS BIGINT) FROM s2
        UNION ALL SELECT '3_decontam', count(*), CAST(sum(doc_id) AS BIGINT) FROM s3
        UNION ALL SELECT '4_sample', count(*), CAST(sum(doc_id) AS BIGINT) FROM s4)
      ORDER BY stage""",
    // q134's whole claim is exact equality with the from-scratch clustering,
    // so it shares q59's oracle verbatim
    "q134_cc_incremental" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS keep_id FROM reach GROUP BY id)
      SELECT keep_id, count(*) AS n_members, max(id) AS max_id,
        CAST(sum(id) AS BIGINT) AS id_sum, count(*) - 1 AS n_dropped
      FROM comp GROUP BY keep_id ORDER BY keep_id""",
    "q59_dedup_clusters" -> s"""
      WITH RECURSIVE $duckShingles,
      pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.ss) > 0 AND len(b.ss) > 0
          AND len(list_intersect(a.ss, b.ss)) >=
              len(list_distinct(list_concat(a.ss, b.ss))) * 0.8),
      edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION ALL SELECT j AS a, i AS b FROM pairs),
      reach(id, r) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id, min(r) AS keep_id FROM reach GROUP BY id)
      SELECT keep_id, count(*) AS n_members, max(id) AS max_id,
        CAST(sum(id) AS BIGINT) AS id_sum, count(*) - 1 AS n_dropped
      FROM comp GROUP BY keep_id ORDER BY keep_id""",
    "q50_dedup_exact" -> """
      SELECT count(*) AS n_distinct_texts,
        CAST(sum(n_copies) AS BIGINT) AS n_docs,
        CAST(sum(n_copies - 1) AS BIGINT) AS n_dropped,
        min(keep_id) AS min_keep_id
      FROM (SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY text)""",
    "q51_dedup_minhash" -> duckPairJaccard,
    // the incremental run must equal the full brute-force pair set
    // restricted to pairs with at least one side in the new batch
    "q74_dedup_incremental" -> s"""WITH $duckShingles
      SELECT a.doc_id AS i, b.doc_id AS j,
        CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS inter,
        CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS BIGINT) AS uni,
        CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) /
          CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS BIGINT) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE (a.doc_id % 7 = 3 OR b.doc_id % 7 = 3)
        AND len(a.ss) > 0 AND len(b.ss) > 0
        AND len(list_intersect(a.ss, b.ss)) >=
            len(list_distinct(list_concat(a.ss, b.ss))) * 0.8
      ORDER BY i, j""",
    // Full replay of the SimHash pipeline: portable md5-top-60-bit feature
    // hash, per-bit majority vote, then the BRUTE-FORCE Hamming ≤ 3 pair set
    // (no banding) — a hash-match proves the chunk banding is lossless.
    // Bits 60–63 of every feature are 0, so the vote loop stops at 60.
    "q52_dedup_simhash" -> s"""WITH $duckShingles,
      feat AS (
        SELECT doc_id, [('0x' || substr(md5(s),1,15))::BIGINT for s in ss] AS hs
        FROM sh WHERE len(ss) > 0),
      fp AS (
        SELECT doc_id,
          CAST(list_sum([CASE WHEN list_sum(
                   [CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) > 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END
               for b in range(0, 60)]) AS BIGINT) AS f
        FROM feat)
      SELECT x.doc_id AS i, y.doc_id AS j,
        CAST(bit_count(xor(x.f, y.f)) AS BIGINT) AS ham
      FROM fp x JOIN fp y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.f, y.f)) <= 3
      ORDER BY i, j""",
    "q53_dedup_ngram" -> """
      WITH g AS (
        SELECT doc_id, n_chars,
          list_distinct([substring(text, i, 5) for i in range(1, length(text)-3)]) AS g5
        FROM documents WHERE length(text) >= 5)
      SELECT a.doc_id AS i, b.doc_id AS j,
        CAST(len(list_intersect(a.g5, b.g5)) AS BIGINT) AS inter,
        CAST(len(list_distinct(list_concat(a.g5, b.g5))) AS BIGINT) AS uni,
        CAST(len(list_intersect(a.g5, b.g5)) AS BIGINT) /
          CAST(len(list_distinct(list_concat(a.g5, b.g5))) AS BIGINT) AS jac
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE abs(a.n_chars - b.n_chars) <= 20
        AND len(list_intersect(a.g5, b.g5)) >=
            len(list_distinct(list_concat(a.g5, b.g5))) * 0.8
      ORDER BY i, j""",
    "q54_dedup_embedding" -> """
      WITH q AS (
        SELECT vec_id,
          [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        FROM embeddings),
      n AS (
        SELECT vec_id, qv, list_sum([x * x for x in qv]) AS n2 FROM q)
      SELECT a.vec_id AS i, b.vec_id AS j,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT) AS dot,
        CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(CAST(a.n2 AS BIGINT)) * sqrt(CAST(b.n2 AS BIGINT))) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE CAST(list_sum([a.qv[k] * b.qv[k] for k in range(1, len(a.qv)+1)]) AS BIGINT)
          / (sqrt(CAST(a.n2 AS BIGINT)) * sqrt(CAST(b.n2 AS BIGINT))) >= 0.45
      ORDER BY i, j""")
}
