package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** ScalaCheck round-trip laws on generated data (SURVEY.md §7.5): exchange
  * and sort invariants that must hold for ANY input, not just fixtures. */
class PropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(Long, String, Double)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(-50L, 50L)
      s <- Gen.oneOf("a", "b", "c", "d", "")
      v <- Gen.choose(-1000, 1000).map(_ / 100.0)
    } yield (k, s, v))
  } yield rows

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, r.status.toString)
  }

  test("repartition preserves the row multiset for arbitrary data and widths") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen, Gen.choose(1, 40)) { (rows, parts) =>
      val df = rows.toDF("k", "s", "v")
      val back = df.repartition(parts, col("k")).collect()
      back.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap ==
        rows.map(r => Seq[Any](r._1, r._2, r._3)).groupBy(identity).view.mapValues(_.length).toMap
    })
  }

  test("orderBy emits an ordered permutation for arbitrary data") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val sorted = df.orderBy(col("k"), col("s"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
      sorted.sorted == sorted && sorted.sorted == rows.sorted
    })
  }

  test("distinct equals set semantics for arbitrary data") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      df.distinct().collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet == rows.toSet
    })
  }

  test("groupBy count equals multiset cardinality for arbitrary data") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val got = df.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      got == rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    })
  }
}
