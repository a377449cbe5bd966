package graft

import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Text-pipeline operators with non-SQL-shaped ground truths. The DuckDB
  * oracle is the main gate for q60–q64/q70; here q70's index-join shape is
  * checked against an independent pairwise formulation, and its scale
  * posture (broadcast bench side) is asserted on the physical plan. */
class TextSpec extends SparkSpec {

  test("q213 entropy/TTR/rep4 gates equal an independent per-doc reference") {
    import graft.operators.TextQueries
    val alphabet = ("abcdefghijklmnopqrstuvwxyz".toSeq.map(_.toString) :+ " ")
    // independent reference: plain-Scala per-doc signals with Spark's own
    // rounding discipline (BigDecimal HALF_UP, like round(x, 0))
    def microRound(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.length >= 4)
    case class Sig(src: String, h: Long, ttr: Long, rep4: Long, docId: Long)
    val ref = docs.map { case (id, src, text) =>
      val n = text.length.toLong
      val cnts = alphabet.map(ch => text.count(_.toString == ch).toLong)
      val cnts2 = cnts :+ (n - cnts.sum)
      val h = cnts2.map { c =>
        if (c > 0) microRound(-(c.toDouble / n) * math.log(c.toDouble / n) * 1e6)
        else 0L
      }.sum
      val toks = text.split(" ", -1)
      val ttr = toks.distinct.length.toLong * 1000000L / toks.length
      val grams = (0 to text.length - 4).map(i => text.substring(i, i + 4))
      val rep4 = (n - 3 - grams.distinct.length) * 1000000L / (n - 3)
      Sig(src, h, ttr, rep4, id)
    }
    val expected = ref.groupBy(_.src).map { case (src, xs) =>
      (src, xs.length.toLong,
        xs.count(_.h < 2750000L).toLong,
        xs.count(_.rep4 > 450000L).toLong,
        xs.count(x => x.h < 2750000L || x.rep4 > 450000L).toLong,
        xs.map(_.h).sum, xs.map(_.ttr).sum, xs.map(_.rep4).sum,
        xs.map(x => x.h * (x.docId % 97 + 1)).sum)
    }.toSeq.sortBy(_._1)
    val got = TextQueries.q213EntropyQuality(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == expected, "engine signals must equal the plain-Scala reference")
    // and the gates must genuinely select (a threshold nobody crosses
    // tests nothing)
    assert(expected.map(_._5).sum > 0, "some docs must be flagged at sf0.001")
    assert(expected.map(_._5).sum < expected.map(_._2).sum, "not all docs flagged")
  }

  test("q220 span corruption equals an independent md5-anchor reference") {
    import graft.operators.TextQueries
    def md5hi60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    case class M(src: String, id: Long, nTok: Long, nMasked: Long, nSpans: Long, ck: Long)
    val ref = docs.map { case (id, src, text) =>
      val n = text.split(" ", -1).length
      val hs = (1 to n).map(p => md5hi60(s"$id:$p"))
      val starts = (1 to n).filter(p => hs(p - 1) % 20 == 0)
      val masked = starts.flatMap(st =>
        st to math.min(st + (hs(st - 1) / 20 % 3).toInt + 1, n)).distinct.sorted
      val spans = masked.zipWithIndex.count { case (m, i) =>
        i == 0 || m != masked(i - 1) + 1 }
      M(src, id, n, masked.length, spans, masked.map(m => m.toLong * m).sum)
    }
    val expected = ref.groupBy(_.src).map { case (src, xs) =>
      (src, xs.length.toLong, xs.map(_.nTok).sum, xs.map(_.nMasked).sum,
        xs.map(_.nSpans).sum,
        xs.map(_.nMasked).sum * 1000000L / xs.map(_.nTok).sum,
        xs.map(x => x.ck * (x.id % 13 + 1)).sum)
    }.toSeq.sortBy(_._1)
    val got = TextQueries.q220SpanCorruption(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, "mask layout must equal the md5-anchor reference")
    // the objective's contract: coverage lands in the 10–20% band and
    // overlapping anchors genuinely merged somewhere (spans < anchors
    // would fail if no merge ever happened on 500 docs)
    val rate = expected.map(_._4).sum.toDouble / expected.map(_._3).sum
    assert(rate > 0.10 && rate < 0.20, s"mask rate out of band: $rate")
    assert(ref.map(_.nSpans).sum > 0)
  }

  test("q186 packing equals a sequential greedy reference regardless of partitioning") {
    // independent reference: greedy close-when-overflow per shard in
    // doc_id order — q186 must reproduce it even though Spark scatters the
    // docs across partitions before the shard-clustered scan; covers
    // oversize docs (own sequence, overflow recorded) and shard isolation
    val cap = 256
    val docs = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expect = docs.groupBy(_._1 % 8).map { case (shard, ds) =>
      var seqs = List.empty[(Long, Long)] // (fill, docs)
      ds.sortBy(_._1).foreach { case (_, n) =>
        seqs match {
          case (fill, k) :: rest if fill + n <= cap => seqs = (fill + n, k + 1) :: rest
          case _ => seqs = (n, 1L) :: seqs
        }
      }
      shard -> (seqs.size.toLong, ds.size.toLong, ds.map(_._2).sum,
        seqs.map(s => math.max(0L, cap - s._1)).sum,
        seqs.count(_._1 > cap).toLong)
    }
    val got = graft.operators.TextQueries.q186SeqPacking(spark, sfDir01)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expect, s"packing mismatch: $got vs $expect")
    assert(got.nonEmpty && got.values.exists(_._4 > 0), "padding must be observable")
  }

  test("q188 epoch shuffle: reproducible, epochs decorrelate, shards cover the corpus") {
    val out = graft.operators.TextQueries.q188EpochShuffle(spark, sfDir01).collect()
    val again = graft.operators.TextQueries.q188EpochShuffle(spark, sfDir01).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "assignment must be a pure function of (epoch, doc_id)")
    val byEpoch = out.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    // every epoch partitions the whole corpus (doc counts and id checksums
    // sum to the same totals), but into DIFFERENT shard memberships —
    // the key_mod_sum profile must not repeat across epochs
    val nDocs = graft.engine.Tables.load(spark, sfDir01, "documents").count()
    byEpoch.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sum == nDocs)
      assert(rows.map(_.getLong(1)).toSet.subsetOf((0L until 32L).toSet))
    }
    val profiles = byEpoch.values
      .map(_.map(r => (r.getLong(1), r.getLong(5))).toSet).toSeq
    assert(profiles.distinct.size == 3, "epochs must scatter docs differently")
  }

  test("BPE round: greedy left-to-right non-overlap on self-pair chains") {
    import spark.implicits._
    // 5×'a': pairs (a,a)=4 beat (b,c)=2; greedy merges offsets 0 and 2 of
    // the run, leaving the odd trailing 'a' — the overlap case the oracle's
    // even-offset window formulation must match
    val toks = Seq(
      (1L, Seq("a", "a", "a", "a", "a")),
      (2L, Seq("b", "c", "b", "c"))).toDF("doc_id", "t")
    val (rewritten, best) = graft.operators.TextQueries.bpeRound(toks)
    assert(best.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq(("a", "a", 4L)))
    val got = rewritten.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a_a", "a_a", "a"), s"got ${got(1L)}")
    assert(got(2L) == Seq("b", "c", "b", "c"), "non-matching doc must pass through")
  }

  test("q190 stored-merge apply equals the training loop's final segmentation (law)") {
    import spark.implicits._
    // corpus chosen to exercise the rewrite's hard cases: self-pair runs
    // (odd/even lengths), merges whose OUTPUT participates in later merges
    // (nested '_' tokens), singleton docs, and docs untouched by any merge
    val docs = Seq(
      (1L, Seq("a", "a", "a", "a", "a")),
      (2L, Seq("a", "a", "b", "a", "a", "b")),
      (3L, Seq("x")),
      (4L, Seq("q", "r", "s")),
      (5L, Seq("a", "a", "a", "a", "b", "b", "a", "a"))).toDF("doc_id", "t")
    // training loop: iterate bpeRound, keeping the adopted merges AND the
    // successively rewritten corpus — the segmentation training itself ends at
    var cur = docs
    val merges = Seq.newBuilder[(Long, String, String)]
    (1 to 3).foreach { r =>
      val (rewritten, best) = graft.operators.TextQueries.bpeRound(cur)
      val b = best.collect()
      if (b.nonEmpty) {
        merges += ((r.toLong, b(0).getString(0), b(0).getString(1)))
        cur = rewritten.cache()
        cur.count()
      }
    }
    val trained = cur.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // apply path: the SAME merges as a rank-ordered table, folded over the
    // ORIGINAL corpus in one pass — must land on the identical segmentation
    val applied = graft.operators.TextQueries.bpeApply(
        docs, merges.result().toDF("rank", "w1", "w2"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(applied == trained,
      s"apply(stored merges) diverged from training:\n$applied\nvs\n$trained")
    // and the merges really nested (round 2+ consumed a round-1 output),
    // otherwise this law never exercised rank ordering
    assert(merges.result().exists(m => m._2.contains("_") || m._3.contains("_")),
      s"fixture too weak: ${merges.result()}")
  }

  test("q70 decontamination equals brute-force pairwise gram intersection") {
    val g = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t)-8), i -> concat_ws(' ', slice(t, i+1, 8)))"))
        .as("gs"))
    val bench = g.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("bench_id"), col("gs").as("gs_b"))
    val corpus = g.filter(col("doc_id") % 20 =!= 0)
    // independent path: full pairwise array_intersect (no inverted-index
    // join, no broadcast hint) — viable only at fixture scale, which is
    // exactly why q70 itself uses the gram-index broadcast join
    val want = corpus.join(bench, expr("size(array_intersect(gs, gs_b)) > 0"))
      .select(col("doc_id"), col("bench_id"),
        explode(array_intersect(col("gs"), col("gs_b"))).as("g"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_refs"),
        countDistinct(col("g")).as("n_shared_grams"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val got = graft.operators.TextQueries.q70Decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain contaminated docs")
  }

  test("batch-incremental decontamination over a stored gram index equals full-corpus q70") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_gramidx").toString
    graft.operators.TextQueries.writeEvalGramIndex(
      docs.filter(col("doc_id") % 20 === 0), dir)
    // the index must round-trip parquet losslessly: same (bench_id, gram)
    // set as a fresh in-memory derivation
    val stored = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fresh = graft.operators.TextQueries.grams8(
        docs.filter(col("doc_id") % 20 === 0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(stored == fresh && stored.nonEmpty)
    // THREE ingest batches (a different split than q81's oracle-checked
    // two): per-doc results are batch-independent, so the union must equal
    // the full-corpus q70 exactly
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val got = (0 until 3)
      .map(b => graft.operators.TextQueries.decontaminateAgainstIndex(
        corpus.filter(pmod(col("doc_id"), lit(3)) === b), dir))
      .reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = graft.operators.TextQueries.q70Decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q196 RRF equals an independent fusion of the two legs") {
    // rebuild both rank lists OUTSIDE the operator: the sparse leg from the
    // shared BM25 scorer collected and ranked in Scala, the dense leg
    // straight off the parquet embeddings — then fuse with the RRF formula
    // and compare the full 15-row result
    val sparse = graft.operators.TextQueries.bm25ScoredFrame(spark, sfDir01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, sc) => (-sc, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vecs = graft.engine.Tables.load(spark, sfDir01, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray))
    val q0 = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val dense = vecs.filter(_._1 != 0L).map { case (id, v) => (id, cos(q0, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expect = (sparse.keySet ++ dense.keySet).toSeq.map { id =>
      val score = sparse.get(id).map(r => 1000000.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1000000.0 / (60 + r)).getOrElse(0.0)
      (id, sparse.get(id), dense.get(id), math.round(score))
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(15)
    val got = graft.operators.TextQueries.q196HybridRrf(spark, sfDir01)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))).toSeq
    assert(got == expect, s"fusion mismatch:\n$got\nvs\n$expect")
    // genuine fusion: both legs must be represented, and at least one doc
    // must score from both legs at once
    assert(got.exists(_._2.isDefined) && got.exists(_._3.isDefined))
    assert(got.exists(r => r._2.isDefined && r._3.isDefined),
      "no document was retrieved by both legs — fixture no longer exercises fusion")
  }

  test("q197 DSIR equals an independent hashed-importance reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = graft.engine.Tables.load(spark, sfDir01, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def buckets(text: String): Seq[Long] =
      text.split(" ", -1).toSeq.map(t =>
        graft.functions.Md5Hi60.hash(UTF8String.fromString(t)) % 64)
    val tgt = docs.filter(_._2 == "src0").flatMap(d => buckets(d._3))
    val raw = docs.filter(_._2 != "src0").flatMap(d => buckets(d._3))
    val tc = tgt.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rc = raw.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val (nt, nr) = (tgt.size.toLong, raw.size.toLong)
    def lw(b: Long): Long = {
      val x = (math.log((tc.getOrElse(b, 0L) + 1.0) / (nt + 64.0)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (nr + 64.0))) * 1000000
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expect = docs.filter(_._2 != "src0").map { case (id, _, text) =>
      val bs = buckets(text)
      (id, bs.size.toLong, bs.map(lw).sum)
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(30).toSeq
    val got = graft.operators.TextQueries.q197DsirSelect(spark, sfDir01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"DSIR mismatch:\n$got\nvs\n$expect")
    // the selection must actually discriminate: scores are not all equal
    assert(got.map(_._3).distinct.size > 1)
  }

  test("stored-profile language ID separates crafted languages through the persisted store") {
    import spark.implicits._
    // two synthetic languages with DISJOINT trigram alphabets, plus one
    // mixed doc dominated 2:1 by language A — training on even ids,
    // scoring everything from the store read back off parquet (q192's
    // round-trip discipline: the persisted profile IS the model)
    val aText = "abc bca cab " * 10
    val bText = "xyz yzx zxy " * 10
    val docs = ((0 until 20).map { i =>
      if (i % 4 < 2) (i.toLong, "aa", aText) else (i.toLong, "bb", bText)
    } :+ ((20L, "aa", aText.take(24) + bText.take(12))))
      .toDF("doc_id", "lang", "text")
    val store = java.nio.file.Files.createTempDirectory("graft_langprof").toString
    graft.operators.TextQueries.langProfileTrain(
      docs.filter(col("doc_id") % 2 === 0), store)
    val prof = spark.read.parquet(store + "/profiles")
    // the store holds both languages' profiles, disjoint trigram sets
    val byLang = prof.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("aa", "bb"))
    val out = graft.operators.TextQueries.langIdScore(docs, prof)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // every pure doc — trained AND held-out odd ids — classifies correctly
    // with a strictly positive margin; the mixed doc follows its majority
    (0 until 21).foreach { i =>
      val (lang, pred, _, margin) = out(i.toLong)
      assert(pred == lang, s"doc $i predicted $pred, labelled $lang")
      assert(margin > 0L, s"doc $i margin must be positive, got $margin")
    }
  }

  test("winnowing guarantee: every ≥ w+k−1-char shared substring shares a fingerprint") {
    import spark.implicits._
    // the SWA 2003 theorem for k=8, w=4: a shared substring of length
    // ≥ 11 forces ≥ 4 consecutive shared gram hashes — one full window —
    // so SOME window min is shared. Pin it for EVERY alignment of the
    // planted span (robustness to offset is the whole point vs mod
    // sampling), against deterministic pseudo-random carriers
    def rndText(seed: Long, n: Int): String = {
      val sb = new StringBuilder
      var x = seed
      (0 until n).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + math.floorMod(x >>> 33, 26)).toChar
      }
      sb.toString
    }
    val span = "GUARANTEEDSPAN0" // 15 chars ≥ 11, alphabet disjoint from carriers
    val base = (0L, rndText(7L, 60) + span + rndText(8L, 40))
    val copies = (1 to 12).map { off =>
      val carrier = rndText(100L + off, 80)
      (off.toLong, carrier.substring(0, off) + span + carrier.substring(off))
    }
    val digitsOnly = (99L, "0123456789" * 8) // disjoint alphabet control
    val df = (Seq(base) ++ copies :+ digitsOnly).toDF("doc_id", "text")
    val fps = graft.operators.TextQueries.winnowFingerprints(df, 8, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    copies.foreach { case (id, _) =>
      assert((fps(0L) & fps(id)).nonEmpty,
        s"planted span at offset $id must share a fingerprint with the source")
    }
    assert((fps(0L) & fps(99L)).isEmpty,
      "disjoint-alphabet control must share nothing")
  }

  test("q70 plans the bench gram set as the broadcast side") {
    val p = graft.operators.TextQueries.q70Decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "decontamination must stream the corpus through a broadcast join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }
}
