package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** LongArrayDot: eval and codegen paths vs reference arithmetic. */
class FunctionsSpec extends SparkSpec {

  private def dotRef(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).foldLeft(0L) { case (acc, (x, y)) => acc + x * y }

  test("dot_long matches reference fold on random arrays (codegen path)") {
    val gen = for {
      n <- Gen.choose(0, 80)
      a <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      b <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    } yield (a, b)
    val cases = (1 to 40).flatMap(i => gen.sample).toList
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = cases.toDF("a", "b").selectExpr("a", "b", "dot_long(a, b) AS d")
    val got = df.collect().map(r => r.getLong(2))
    val want = cases.map { case (a, b) => dotRef(a, b) }
    assert(got.toSeq == want)
  }

  test("dot_long agrees with the HOF aggregate/zip_with formulation") {
    graft.functions.GraftFunctions.register(spark)
    val df = graft.engine.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS q")
      .selectExpr("dot_long(q, q) AS fast",
        "aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (a, v) -> a + v) AS slow")
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    assert(df.count() > 0)
  }

  /** Reference SimHash: per-bit majority vote over feature hashes. */
  private def simhashRef(hs: Seq[Long]): Long = {
    val votes = Array.fill(64)(0)
    hs.foreach { h =>
      (0 until 64).foreach(b => votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
    }
    (0 until 64).foldLeft(0L)((f, b) => if (votes(b) > 0) f | (1L << b) else f)
  }

  test("simhash64 matches reference vote fold on random hash arrays") {
    val gen = for {
      n <- Gen.choose(1, 120)
      hs <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield hs
    val cases = (1 to 40).flatMap(_ => gen.sample).toList
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val got = cases.toDF("hs").selectExpr("simhash64(hs) AS f")
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(simhashRef))
  }

  test("md5_hi60 equals the conv(substring(md5)) SQL formulation, nulls preserved") {
    graft.functions.GraftFunctions.register(spark)
    // corpus shingles + crafted edge strings (empty, unicode, null element)
    val sh = graft.engine.Tables.load(spark, sfDir, "documents")
      .selectExpr("array_distinct(split(text, ' ')) AS a")
      .limit(50)
      .union(spark.sql(
        "SELECT array('', 'a', 'ü£', cast(null as string), repeat('x', 500)) AS a"))
    val rows = sh.selectExpr(
        "md5_hi60(a) AS fast",
        "transform(a, x -> cast(conv(substring(md5(x),1,15), 16, 10) as bigint)) AS slow")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"mismatch: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}") }
    assert(rows.exists(_.getSeq[Any](0).contains(null)), "null element preserved")
  }

  test("simhash64 equals the explode + 64-vote-aggregate formulation on documents") {
    graft.functions.GraftFunctions.register(spark)
    val sh = graft.engine.Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .filter(size(col("t")) >= 3)
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh")
    // string path: inline XXH64 must agree with the SQL xxhash64 builtin
    val fast = sh.selectExpr("doc_id", "simhash64(sh) AS f")
    val ex = sh.selectExpr("doc_id", "explode(sh) AS s")
      .selectExpr("doc_id", "xxhash64(s) AS h")
    val bitCols = (0 until 64).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"v$b"))
    val slow = ex.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("f2"))
    val joined = fast.join(slow, "doc_id")
    assert(joined.filter(col("f") =!= col("f2")).count() == 0)
    assert(joined.count() > 0)
  }

  test("minhash_sig equals the explode + 32-min-aggregate formulation, winnowed and not") {
    graft.functions.GraftFunctions.register(spark)
    val sh = graft.engine.Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS t")
      .filter(size(col("t")) >= 3)
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh")
    for (mod <- Seq(1, 4)) {
      val fast = sh.selectExpr("doc_id", s"minhash_sig(sh, $mod) AS sig")
        .filter(col("sig").isNotNull)
      val ex0 = sh.selectExpr("doc_id", "explode(sh) AS s")
        .selectExpr("doc_id", "xxhash64(s) AS h0")
      val ex = if (mod > 1) ex0.filter(pmod(col("h0"), lit(mod)) === 0) else ex0
      val sigCols = (0 until 32).map(i =>
        min(xxhash64(lit(i.toLong), col("h0"))).as(s"h$i"))
      val slow = ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .select(col("doc_id"), array((0 until 32).map(i => col(s"h$i")): _*).as("sig2"))
      val joined = fast.join(slow, "doc_id")
      assert(joined.count() == slow.count(), s"doc coverage must match (mod=$mod)")
      assert(joined.filter(col("sig") =!= col("sig2")).count() == 0, s"mod=$mod")
      assert(joined.count() > 0)
    }
  }

  test("chargram_minhash equals minhash_sig over materialized gram arrays") {
    graft.functions.GraftFunctions.register(spark)
    // the native string-walking path must produce BYTE-IDENTICAL signatures
    // to the array formulation (same per-gram xxhash64, same winnow, same
    // slot folds) — this is what guarantees q53's candidate set did not
    // change when the gram-array materialization was optimized away
    for (mod <- Seq(1, 4)) {
      val both = graft.engine.Tables.load(spark, sfDir, "documents")
        .filter(length(col("text")) >= 5)
        .selectExpr("doc_id",
          s"chargram_minhash(text, 5, $mod) AS fast",
          s"""minhash_sig(transform(sequence(0, length(text)-5),
              i -> substring(text, i+1, 5)), $mod) AS slow""")
      assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0,
        s"mod=$mod")
      assert(both.filter(col("fast").isNotNull).count() > 0)
    }
    // shorter than one gram → NULL, like an empty feature set
    val r = spark.sql("SELECT chargram_minhash('abcd', 5, 1) AS s").collect()
    assert(r.head.isNullAt(0))
    // multi-byte codepoints: windows count CHARACTERS, not bytes — pin the
    // equivalence on non-ASCII too
    val uni = spark.sql(
      """SELECT chargram_minhash('héllo wörld déjà vu', 5, 1) AS fast,
           minhash_sig(transform(sequence(0, length('héllo wörld déjà vu')-5),
             i -> substring('héllo wörld déjà vu', i+1, 5)), 1) AS slow""").collect()
    assert(uni.head.getSeq[Long](0) == uni.head.getSeq[Long](1))
  }

  test("chargram_minhash rejects bad parameters at analysis, not per-row") {
    graft.functions.GraftFunctions.register(spark)
    // gramLen < 1 used to throw ArithmeticException per row (mod 0 on the
    // ring buffer); a null literal NPE'd inside codegen — both must be
    // analysis-time type-check failures instead
    for (sql <- Seq(
        "SELECT chargram_minhash('abc', -1, 4)",
        "SELECT chargram_minhash('abc', 0, 4)",
        "SELECT chargram_minhash('abc', CAST(NULL AS INT), 4)",
        "SELECT chargram_minhash('abc', 5, CAST(NULL AS INT))")) {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.toLowerCase.contains("gramlen") ||
        e.getMessage.toLowerCase.contains("chargram"), s"$sql -> ${e.getMessage}")
    }
    // winnowMod <= 1 is valid (means "no winnowing") — must still work
    assert(!spark.sql("SELECT chargram_minhash('abcdef', 5, 0) AS s")
      .collect().head.isNullAt(0))
  }

  test("hamming_str matches reference codepoint comparison; null on length mismatch") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    def ref(a: String, b: String): Option[Int] = {
      val ca = a.codePoints().toArray; val cb = b.codePoints().toArray
      if (ca.length != cb.length) None
      else Some(ca.zip(cb).count { case (x, y) => x != y })
    }
    val gen = for {
      n <- Gen.choose(0, 12)
      m <- Gen.oneOf(Gen.const(n), Gen.choose(0, 12)) // half equal-length
      // BMP chars only: picking Chars from a string would split a
      // supplementary codepoint into lone surrogates (covered by a fixed
      // anchor below instead)
      a <- Gen.listOfN(n, Gen.oneOf("abéλxy ".toList)).map(_.mkString)
      b <- Gen.listOfN(m, Gen.oneOf("abéλxy ".toList)).map(_.mkString)
    } yield (a, b)
    val cases = (1 to 60).flatMap(_ => gen.sample).toList
    val got = cases.toDF("a", "b")
      .selectExpr("hamming_str(a, b) AS h")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val want = cases.map { case (a, b) => ref(a, b) }
    assert(got.toSeq == want)
    // fixed anchors incl. the multibyte mixed-width case
    assert(spark.sql("SELECT hamming_str('abc', 'abd')").collect().head.getInt(0) == 1)
    assert(spark.sql("SELECT hamming_str('aé', 'aa')").collect().head.getInt(0) == 1)
    // supplementary-plane codepoint (4-byte UTF-8) aligns as ONE position
    assert(spark.sql("SELECT hamming_str('a🎉', 'ab')").collect().head.getInt(0) == 1)
    assert(spark.sql("SELECT hamming_str('ab', 'abc')").collect().head.isNullAt(0))
    // truncated UTF-8 (lead byte declaring more bytes than remain) must
    // degrade deterministically, not read past the buffer
    val trunc = spark.sql(
      """SELECT hamming_str(CAST(unhex('41C3') AS STRING),
                            CAST(unhex('41C2') AS STRING)) AS h""").collect()
    assert(trunc.head.getInt(0) == 1)
    val e = intercept[Exception](spark.sql("SELECT hamming_str(1, 'a')").collect())
    assert(e.getMessage.toLowerCase.contains("hamming_str"))
  }

  test("dot_long propagates null arrays") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L, 2L)) AS d").collect()
    assert(r.head.isNullAt(0))
  }

  test("dot_long rejects wrong input types at analysis") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT dot_long(array('x'), array(1L))").collect())
    assert(e.getMessage.toLowerCase.contains("dot_long"))
  }

  test("char_class_counts equals the 27-replace formulation, unicode counted once") {
    graft.functions.GraftFunctions.register(spark)
    val alphaSql = ("abcdefghijklmnopqrstuvwxyz".toSeq.map(_.toString) :+ " ")
      .map(c => s"'$c'").mkString("array(", ", ", ")")
    // corpus texts + crafted edges: empty, uppercase, digits, multi-byte
    // unicode (each non-alphabet CODE POINT must count exactly once as
    // "other" — a byte-counting bug would count ü/£ twice, 😀 four times)
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .selectExpr("text").limit(50)
      .union(spark.sql(
        "SELECT '' UNION ALL SELECT 'ABC xyz 123' UNION ALL " +
        "SELECT 'aü£b 😀 z'"))
    val rows = docs.selectExpr(
        "char_class_counts(text) AS fast",
        s"""concat(
           |  transform($alphaSql, ch ->
           |    CAST(length(text) - length(replace(text, ch, '')) AS BIGINT)),
           |  array(CAST(length(text) AS BIGINT) - aggregate(
           |    transform($alphaSql, ch ->
           |      CAST(length(text) - length(replace(text, ch, '')) AS BIGINT)),
           |    0L, (a, x) -> a + x))) AS slow""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
    // the unicode row: 'a','b','z' + 2 spaces classified; ü, £, 😀 → 3 others
    val uni = spark.sql("SELECT char_class_counts('aü£b 😀 z') AS c")
      .collect().head.getSeq[Long](0)
    assert(uni(0) == 1 && uni(1) == 1 && uni(25) == 1 && uni(26) == 2 && uni(27) == 3,
      s"unicode classes: $uni")
    // null propagates
    assert(spark.sql("SELECT char_class_counts(CAST(NULL AS STRING))")
      .collect().head.isNullAt(0))
  }
}
