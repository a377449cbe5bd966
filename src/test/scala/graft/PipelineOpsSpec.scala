package graft

import org.apache.spark.sql.functions._

/** Law tests for the round-9 pipeline operators (q103–q106) on crafted
  * corpora. Queries are exercised BLACK-BOX: a synthetic `documents.parquet`
  * is written into a temp fixture dir and the production query function runs
  * against it unchanged — so these pin the operator's semantics on inputs
  * whose expected outputs are computable by hand, independent of the DuckDB
  * oracle (which checks the driver fixtures, not edge shapes). */
class PipelineOpsSpec extends SparkSpec {

  /** Write a synthetic documents table (full fixture schema) to a temp
    * fixture dir and return the dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q115 span dedup: cross-doc and within-doc duplicate blocks drop, first site survives") {
    // doc 1: 10 words → blocks [a1..a8], [a9 a10] — both first-sited, kept.
    // doc 2: same first 8 words + distinct tail → first block is a cross-doc
    //        duplicate (removed), tail survives.
    // doc 3: the same 8 words twice → second block is a WITHIN-doc duplicate.
    val b1 = (1 to 8).map("a" + _).mkString(" ")
    val d3b = (1 to 8).map("c" + _).mkString(" ")
    val dir = docsDir(Seq(
      (1L, b1 + " a9 a10", "en", "s"),
      (2L, b1 + " b9 b10", "en", "s"),
      (3L, d3b + " " + d3b, "en", "s")))
    val out = graft.operators.DedupQueries.q115SpanDedup(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, b1 + " a9 a10")), "doc1 keeps everything")
    assert(out(2L) == ((2L, 1L, "b9 b10")), "doc2 loses the shared block")
    assert(out(3L) == ((2L, 1L, d3b)), "doc3 loses its self-repeat")
  }

  test("q116 leak-safe split: a near-dup pair straddling naive splits lands whole, leak counted") {
    // h10(k) = ((k % 999983) * 2654435761) % 10 = k % 10 for small k (the
    // multiplier ends in 1), so naive split is doc_id mod 10: <8 train,
    // 8 val, 9 test. Docs 7 & 8 are near-identical → one cluster, rep 7 →
    // whole cluster goes to train, and it counts as 1 prevented leak
    // (members' naive splits were train vs val). Docs 0 and 9 are loners.
    val base = (1 to 40).map("w" + _).mkString(" ")
    val dir = docsDir(Seq(
      (0L, "solo zero " + (1 to 20).map("z" + _).mkString(" "), "en", "s"),
      (7L, base, "en", "s"),
      (8L, base + " tail8", "en", "s"),
      (9L, "solo nine " + (1 to 20).map("y" + _).mkString(" "), "en", "s")))
    val rows = graft.operators.DedupQueries.q116LeakSafeSplit(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // train: clusters {0} and {7,8} → 2 clusters, 3 docs, ids 0+7+8, 1 leak
    val (c, d, tok, ids, leaks) = rows("train")
    assert(c == 2L && d == 3L && ids == 15L && leaks == 1L)
    assert(tok == 22L + 40L + 41L, "token conservation in train")
    // test: cluster {9} alone; no val row (no cluster rep hashes to 8)
    assert(rows("test") == ((1L, 1L, 22L, 9L, 0L)))
    assert(!rows.contains("val"))
    // conservation: every doc lands in exactly one split
    assert(rows.values.map(_._2).sum == 4L)
  }

  test("q121 incremental span dedup: store suppresses old spans, arrival order wins in-batch") {
    // old corpus (ids ≢ 3 mod 7): doc 1 registers block A. new batch (ids ≡
    // 3 mod 7): doc 3 = A ++ B (A store-dropped, B first-sited), doc 10 = B
    // ++ C (B lost to doc 3 — in-batch arbitration — C kept).
    val A = (1 to 8).map("a" + _).mkString(" ")
    val B = (1 to 8).map("b" + _).mkString(" ")
    val C = (1 to 8).map("c" + _).mkString(" ")
    val dir = docsDir(Seq(
      (1L, A, "en", "s"),
      (3L, A + " " + B, "en", "s"),
      (10L, B + " " + C, "en", "s")))
    val out = graft.operators.DedupQueries.q121SpanDedupIncremental(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(3L, 10L), "only the new batch is emitted")
    assert(out(3L) == ((2L, 1L, B)), "A suppressed by store, B kept")
    assert(out(10L) == ((2L, 1L, C)), "B lost to doc 3, C kept")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q120 bigram LM: two identical two-word docs score ln(3/4) exactly") {
    // corpus: "a b" ×2 → c2(a,b)=2, c1(a)=2, V=2 → per-bigram
    // ln((2+1)/(2+2)) = ln(0.75); lp_micro = round(ln(0.75)*1e6) = -287682
    val dir = docsDir(Seq((1L, "a b", "en", "s"), (2L, "a b", "en", "s")))
    val rows = graft.operators.TextQueries.q120BigramLm(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, "one bigram per doc")
      assert(r.getLong(2) == -287682L, s"ln(3/4) micro, got ${r.getLong(2)}")
    }
  }

  test("q135 containment: catches a full excerpt that Jaccard dedup misses; q51 pairs are covered") {
    // A's 10 tokens open B verbatim → every A-shingle is in B, containment 1.0;
    // Jaccard is ~8/48 — far under the q51 threshold
    val a = (1 to 10).map("w" + _).mkString(" ")
    val b = a + " " + (11 to 50).map("w" + _).mkString(" ")
    val dir = docsDir(Seq((1L, a, "en", "s"), (2L, b, "en", "s")))
    val rows = graft.operators.DedupQueries.q135Containment(spark, dir).collect()
    val dirs = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(dirs.exists { case (c, h, ppm) => c == 1L && h == 2L && ppm == 1000000L },
      "A-in-B must be reported at containment 1.0")
    assert(!dirs.exists { case (c, h, _) => c == 2L && h == 1L },
      "B is not contained in A")
    // on the fixture: every symmetric near-dup pair implies both containments
    val jac = graft.operators.DedupQueries.q51MinHashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = graft.operators.DedupQueries.q135Containment(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    jac.foreach { case (i, j) =>
      assert(cont((i, j)) && cont((j, i)),
        s"jaccard>=0.8 pair ($i,$j) must be contained both ways")
    }
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q136 interval join equals a plain-Scala brute overlap of sessions x campaigns") {
    val evs = graft.engine.Tables.load(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sess = evs.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._2))
      val splits = scala.collection.mutable.Buffer[scala.collection.mutable.Buffer[Long]]()
      var last = Long.MinValue
      sorted.foreach { e =>
        if (last == Long.MinValue || e._3 - last > 600)
          splits += scala.collection.mutable.Buffer(e._3)
        else splits.last += e._3
        last = e._3
      }
      splits.zipWithIndex.map { case (ts, i) => (u, (i + 1).toLong, ts.min, ts.max) }
    }
    val camps = (0 until 40).map(k =>
      (k.toLong, 1704067200L + k * 61200L, 1704067200L + k * 61200L + 64800L))
    val want = camps.map { case (c, bs, be) =>
      val ov = sess.filter { case (_, _, as_, ae) => as_ <= be && bs <= ae }
      c -> ((ov.size.toLong,
        ov.map(_._1).distinct.size.toLong,
        ov.map { case (u, sid, _, _) => u * 100 + sid }.sum,
        ov.map { case (_, _, as_, ae) => math.min(ae, be) - math.max(as_, bs) }.sum))
    }.filter(_._2._1 > 0).toMap
    val got = graft.operators.JoinQueries.q136IntervalJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.exists(_._1 > 0))
  }

  test("q134 incremental CC over the stored labels equals the from-scratch q59 clustering") {
    val want = graft.operators.DedupQueries.q59DedupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = graft.operators.DedupQueries.q134CcIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq,
      "persisted-label merge must reproduce the full reclustering exactly")
    assert(want.nonEmpty)
    graft.engine.Sessions.releasePinned(spark)
  }

  test("q129 quality blend equals a plain-Scala recompute of metrics, ranks, and gate") {
    val stop = Set("the", "a", "an", "and", "of", "is", "to", "in")
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, src, tx) => (id, src, tx.split(" ").toSeq) }
    val mq = toks.map { case (id, _, t) =>
      id -> halfUp((t.count(stop).toDouble / t.size * 0.5 +
        math.min(t.size.toDouble / 200.0, 1.0) * 0.5) * 1000000)
    }.toMap
    val mr = toks.map { case (id, _, t) =>
      val ng = if (t.size >= 3) t.size - 2 else 0
      val nd = if (ng > 0) ng - t.sliding(3).map(_.mkString(" ")).toSeq.distinct.size else 0
      id -> (1000000L - (if (ng > 0) nd.toLong * 1000000 / ng else 0L))
    }.toMap
    val bg = toks.flatMap { case (id, _, t) => t.sliding(2).collect {
      case Seq(a, b) => (id, a, b) } }
    val c2 = bg.groupBy(x => (x._2, x._3)).map { case (k, xs) => k -> xs.size }
    val c1 = toks.flatMap(_._3).groupBy(identity).map { case (k, xs) => k -> xs.size }
    val vocab = c1.size
    val ml = bg.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map { case (_, a, b) =>
        math.log((c2((a, b)) + 1).toDouble / (c1(a) + vocab)) }.sum
      id -> (halfUp(s / xs.size * 1000000) + 10000000L)
    }
    def rank(m: Map[Long, Long]): Map[Long, Long] = {
      val bins = m.values.groupBy(_ / 4096).map { case (b, xs) => b -> xs.size.toLong }
      val sorted = bins.toSeq.sortBy(_._1)
      // prefix sums pair each bin with the count of all strictly-lower bins
      val cums = sorted.map(_._2).scanLeft(0L)(_ + _)
      val belowMap = sorted.map(_._1).zip(cums).toMap
      m.map { case (id, v) => id -> belowMap(v / 4096) * 1000000 / m.size }
    }
    val (rq, rr, rl) = (rank(mq), rank(mr), rank(ml))
    val comp = rq.keys.filter(ml.contains)
      .map(id => id -> (rq(id) + rr(id) + rl(id)) / 3).toMap
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val want = comp.groupBy { case (id, _) => srcOf(id) }.map { case (src, m) =>
      val kept = m.filter(_._2 >= 500000).keys
      src -> ((m.size.toLong, kept.size.toLong,
        if (kept.isEmpty) None else Some(kept.sum),
        m.values.min, m.values.max))
    }
    val got = graft.operators.TextQueries.q129QualityBlend(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    assert(got.values.map(_._2).sum > 0, "the gate must keep someone")
    assert(got.values.map(_._1).sum > got.values.map(_._2).sum,
      "the gate must drop someone")
  }

  test("q127 PMI: a three-token doc yields the three window pairs at ln(3/4) each") {
    // "a b c" → pairs (a,b), (a,c), (b,c); every word fills 2 window slots,
    // T=3 → PMI = ln(3·1/(2·2)) = ln(0.75) for all three
    val dir = docsDir(Seq((1L, "a b c", "en", "s")))
    val rows = graft.operators.TextQueries.q127PmiCooccurrence(spark, dir)
      .collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    rows.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == 2L && r.getLong(4) == 2L)
      assert(r.getLong(5) == -287682L, s"ln(3/4) micro, got ${r.getLong(5)}")
    }
  }

  test("q105 repetition: all-repeated doc flags at 750000 ppm, all-distinct doc at 0") {
    // "x x x x x x" → four 3-grams, all equal → 3 dup / 4 grams = 750000 ppm
    // "a b c d e f" → four distinct 3-grams → 0 ppm
    val dir = docsDir(Seq(
      (1L, "x x x x x x", "en", "rep"),
      (2L, "a b c d e f", "en", "uniq")))
    val out = graft.operators.TextQueries.q105Repetition(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("rep") == ((3L, 4L, 1L, 750000L)),
      "dup_grams=3, grams=4, flagged, ppm*doc_id=750000*1")
    assert(out("uniq") == ((0L, 4L, 0L, 0L)))
  }

  test("q105 repetition: docs under three tokens are excluded") {
    val dir = docsDir(Seq((1L, "one two", "en", "s"), (2L, "a b c", "en", "s")))
    val rows = graft.operators.TextQueries.q105Repetition(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 1L, "only the 3-token doc counts")
  }

  test("q106 chunking: stride-48/size-64 windows cover 100 tokens as 64+52+4") {
    // starts 0,48,96; lens 64,52,4 → 3 chunks, 120 chunk-tokens, 1 full
    val text100 = (1 to 100).map(_ => "t").mkString(" ")
    val dir = docsDir(Seq((1L, text100, "en", "s")))
    val r = graft.operators.TextQueries.q106Chunking(spark, dir).collect()(0)
    assert(r.getLong(1) == 3L, "n_chunks")
    assert(r.getLong(2) == 1L, "n_docs")
    assert(r.getLong(3) == 120L, "chunk_tokens = 64+52+4")
    assert(r.getLong(4) == 1L, "full_chunks")
    // checksum: doc_id=1, token "t" len 1 at each start → (0+1)+(48+1)+(96+1)
    assert(r.getLong(5) == 147L, "boundary checksum")
  }

  test("q106 chunking: a one-token doc yields exactly one one-token chunk") {
    val dir = docsDir(Seq((7L, "solo", "en", "s")))
    val r = graft.operators.TextQueries.q106Chunking(spark, dir).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(3) == 1L && r.getLong(4) == 0L)
  }

  test("q104 pii scrub: doc_id=105 injects email+phone+ip and all are redacted") {
    // 105 ≡ 0 mod 3,5,7 → all three PII forms appended to the text
    val dir = docsDir(Seq((105L, "hello world", "en", "s")))
    val r = graft.operators.TextQueries.q104PiiScrub(spark, dir).collect()(0)
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1L,
      "one email, one phone, one ip detected")
    assert(r.getLong(6) < r.getLong(5), "redaction must shrink the text")
  }

  test("q104 pii scrub: clean text keeps no raw email/phone/ip substrings") {
    val dir = docsDir(Seq((105L, "hello world", "en", "s")))
    // reproduce the scrub projection up to the aggregate: clean must contain
    // the placeholders and none of the injected literals
    val base = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit(" user105@mail.example.com 555-105-0105 10.0.105.15"))
          .as("raw"))
      .withColumn("clean", regexp_replace(regexp_replace(regexp_replace(
        col("raw"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "[EMAIL]"),
        "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "[IP]"),
        "[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"))
      .collect()(0).getString(2)
    assert(base.contains("[EMAIL]") && base.contains("[PHONE]") && base.contains("[IP]"))
    assert(!base.contains("@") && !base.contains("555-"))
  }

  test("q103 compaction plan: bins are contiguous per partition and conserve bytes") {
    val plan = graft.operators.CoreQueries.q103CompactionPlan(spark, sfDir).collect()
    val perLang = plan.groupBy(_.getString(0))
    perLang.foreach { case (lang, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0L && bins.last == bins.length - 1,
        s"$lang: bin ids must be 0..${bins.length - 1} with no gaps")
    }
    val planned = plan.map(_.getLong(3)).sum
    val total = graft.engine.Tables.load(spark, sfDir, "documents")
      .agg(sum(col("n_chars")).cast("long")).collect()(0).getLong(0)
    assert(planned == total, "every byte of every file is assigned to exactly one bin")
  }

  test("q109 mixture: smallest source keeps everything, rates never exceed 1000‰ and fall with size") {
    val rows = graft.operators.CoreQueries.q109MixtureSample(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall { case (_, rate, _) => rate >= 1L && rate <= 1000L })
    val minDocs = rows.map(_._1).min
    rows.filter(_._1 == minDocs).foreach { case (n, rate, sampled) =>
      assert(rate == 1000L && sampled == n,
        "the rarest source defines the mixture floor and is kept whole")
    }
    // α=1/2 temperature: bigger sources never get a higher keep-rate
    rows.sortBy(_._1).sliding(2).foreach {
      case Array((n1, r1, _), (n2, r2, _)) if n1 <= n2 => assert(r1 >= r2)
      case _ =>
    }
  }

  test("q110 skew profile: integer invariants hold for every profiled key") {
    graft.operators.CoreQueries.q110KeySkew(spark, sfDir).collect().foreach { r =>
      val (nRows, nKeys, maxK) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (top1, heavyPpm, heavyKeys) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(maxK <= nRows && maxK * nKeys >= nRows,
        "max per key sits between the mean and the total")
      assert(heavyKeys <= nKeys && top1 <= 1000000L && heavyPpm <= 1000000L)
      assert(top1 == maxK * 1000000L / nRows)
    }
  }

  test("q112 attribution: every purchase lands in exactly one touch bucket, revenue conserved") {
    val out = graft.operators.AnalyticQueries.q112Attribution(spark, sfDir).collect()
    val purchases = graft.engine.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
    assert(out.map(_.getLong(1)).sum == purchases.count(),
      "attribution partitions the purchase set")
    val totalCents = purchases
      .agg(sum(expr("CAST(round(value*100,0) AS BIGINT)"))).collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum == totalCents, "revenue is conserved across buckets")
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("click", "view", "none")))
  }

  test("q108 shard audit: shards conserve the corpus and audit fields agree") {
    val audit = graft.operators.CoreQueries.q108ShardAudit(spark, sfDir).collect()
    val nDocs = audit.map(_.getLong(1)).sum
    val total = graft.engine.Tables.load(spark, sfDir, "documents").count()
    assert(nDocs == total, "each doc lands in exactly one shard")
    assert(audit.map(_.getLong(0)).distinct.length == audit.length, "unique shard ids")
    assert(audit.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
  }
}
