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
}
