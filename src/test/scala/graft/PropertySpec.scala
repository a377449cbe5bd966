package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** ScalaCheck round-trip laws on generated data (SURVEY.md §7.5): exchange
  * and sort invariants that must hold for ANY input, not just fixtures.
  *
  * Keys are NULLABLE (~1 in 6 rows): the reference pushes null keys and
  * values through its sorter explicitly (RemoteSorterSuite.scala:220-243),
  * so every law here must hold with nulls flowing through exchange,
  * aggregation, sort, and distinct. */
class PropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(Option[Long], String, Double)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      k <- Gen.frequency(
        5 -> Gen.choose(-50L, 50L).map(Some(_): Option[Long]),
        1 -> Gen.const(None: Option[Long]))
      s <- Gen.oneOf("a", "b", "c", "d", "")
      v <- Gen.choose(-1000, 1000).map(_ / 100.0)
    } yield (k, s, v))
  } yield rows

  private def key(r: Row): Option[Long] =
    if (r.isNullAt(0)) None else Some(r.getLong(0))

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, r.status.toString)
  }

  test("repartition preserves the row multiset for arbitrary data and widths") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen, Gen.choose(1, 40)) { (rows, parts) =>
      val df = rows.toDF("k", "s", "v")
      val back = df.repartition(parts, col("k")).collect()
        .map(r => (key(r), r.getString(1), r.getDouble(2)))
      back.groupBy(identity).view.mapValues(_.length).toMap ==
        rows.groupBy(identity).view.mapValues(_.length).toMap
    })
  }

  test("orderBy emits an ordered permutation for arbitrary data (nulls first)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val sorted = df.orderBy(col("k"), col("s"), col("v")).collect()
        .map(r => (key(r), r.getString(1), r.getDouble(2))).toList
      // Scala's Option ordering (None < Some) == Spark's asc nulls-first
      sorted.sorted == sorted && sorted.sorted == rows.sorted
    })
  }

  test("distinct equals set semantics for arbitrary data") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      df.distinct().collect().map(r => (key(r), r.getString(1), r.getDouble(2)))
        .toSet == rows.toSet
    })
  }

  test("equi-join drops null keys, null-safe join matches them (multiset counts)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val lf = l.toDF("k", "s", "v")
      val rf = r.toDF("k2", "s2", "v2")
      val lCnt = l.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val rCnt = r.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val equiWant = lCnt.collect {
        case (Some(k), n) => n * rCnt.getOrElse(Some(k), 0L)
      }.sum
      val safeWant = equiWant +
        lCnt.getOrElse(None, 0L) * rCnt.getOrElse(None, 0L)
      val equiGot = lf.join(rf, col("k") === col("k2")).count()
      val safeGot = lf.join(rf, col("k") <=> col("k2")).count()
      equiGot == equiWant && safeGot == safeWant
    })
  }

  test("groupBy count equals multiset cardinality (null keys form one group)") {
    import spark.implicits._
    holds(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "s", "v")
      val got = df.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
        .map(r => (key(r), r.getLong(1))).toMap
      got == rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    })
  }
}
