package graft

import org.apache.spark.sql.functions._

/** Exchange/sort/agg operator laws, mirroring the reference's own end-to-end
  * suite shapes (RemoteShuffleManagerSuite: repartition round-trip, sortBy
  * global order, groupBy sum — SURVEY.md §5.1). */
class CoreOpsSpec extends SparkSpec {
  import graft.engine.Tables

  test("repartition preserves the row multiset (P2)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val before = li.agg(count(lit(1)), sum(col("l_orderkey")), sum(col("l_quantity")))
      .collect().head
    val after = li.repartition(17, col("l_partkey"))
      .agg(count(lit(1)), sum(col("l_orderkey")), sum(col("l_quantity")))
      .collect().head
    assert(before == after)
  }

  test("orderBy yields a globally sorted permutation (S3)") {
    val o = Tables.load(spark, sfDir, "orders")
    val sorted = o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(sorted.length == o.count())
    assert(sorted.toSet == o.select("o_orderkey").collect().map(_.getLong(0)).toSet)
    val prices = o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("groupBy aggregation equals per-key recomputation (A1/A2)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val agg = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = li.select("l_returnflag").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(agg == naive)
  }

  test("limit/top-k agrees with full sort prefix (S6)") {
    val c = Tables.load(spark, sfDir, "customer")
    val topk = c.orderBy(col("c_acctbal").desc, col("c_custkey")).limit(10)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    val full = c.orderBy(col("c_acctbal").desc, col("c_custkey"))
      .select("c_custkey").collect().map(_.getLong(0)).take(10).toSeq
    assert(topk == full)
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("z-order range partitioning bounds BOTH dim spans; a plain sort only one (q93)") {
    // the q93 scale claim made concrete: range-partition the z (Morton) key
    // into 16 "files" and measure each file's per-dimension bounding box.
    // Z-clustering must keep BOTH normalized spans well under full width
    // (min/max stats can prune on either predicate dimension); the x-sorted
    // baseline is perfect on x but leaves y at full width — the layout
    // difference that makes multi-dim data skipping work. sf0.01 so every
    // partition is populated densely enough for span stats to be stable.
    val d = Tables.load(spark, sfDir01, "part")
      .select(col("p_partkey"),
        (col("p_size").cast("long") * 5).as("x"), // scale to 8 active bits
        expr("(CAST(round(p_retailprice*100,0) AS BIGINT) - 90000) div 40").as("y"))
    val z = (0 until 8).map(b =>
        s"shiftleft(shiftright(x, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright(y, $b) & 1, ${2 * b + 1})")
      .mkString("(", " + ", ")")
    val zd = d.withColumn("z", expr(z))
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Double, Double)] =
      df.select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg((max(col("x")) - min(col("x"))).as("xs"),
          (max(col("y")) - min(col("y"))).as("ys"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble)).toSeq
    val Seq((gx, gy)) = spans(zd.coalesce(1))
    def avg(v: Seq[Double]) = v.sum / v.size
    val zSpans = spans(zd.repartitionByRange(16, col("z")))
    val xSpans = spans(zd.repartitionByRange(16, col("x"), col("p_partkey")))
    assert(avg(zSpans.map(_._1)) / gx < 0.7, "z-clustering should bound x spans")
    assert(avg(zSpans.map(_._2)) / gy < 0.7, "z-clustering should bound y spans")
    assert(avg(xSpans.map(_._1)) / gx < 0.3, "x-sort is perfect on x")
    assert(avg(xSpans.map(_._2)) / gy > 0.85, "x-sort leaves y at full width")
  }

  test("q124 snapshot diff equals a plain-Scala reconstruction of both snapshots") {
    import org.apache.spark.sql.functions._
    val cust = graft.engine.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), round(col("c_acctbal") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = cust.toMap
    val b = cust.filter(_._1 % 17 != 3)
      .map { case (k, v) => k -> (v + (if (k % 13 == 5) 100L else 0L)) }.toMap ++
      cust.filter(_._1 % 29 == 7).map { case (k, _) => (k + 10000000L) -> 4242L }
    val want = (a.keySet ++ b.keySet).toSeq.map { k =>
      val st = (a.get(k), b.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(x), Some(y)) => if (x != y) "changed" else "same"
      }
      (st, k, b.getOrElse(k, 0L) - a.getOrElse(k, 0L))
    }.groupBy(_._1).map { case (st, xs) =>
      st -> ((xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
    }
    val got = graft.operators.JoinQueries.q124SnapshotDiff(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    assert(Set("added", "removed", "changed").subsetOf(got.keySet),
      "fixture must exercise every change class")
  }

  test("q125 rolling anomaly: integer z-test equals a plain-Scala trailing-window recompute") {
    import org.apache.spark.sql.functions._
    val daily = graft.engine.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val got = graft.operators.WindowQueries.q125RollingAnomaly(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty)
    byType.foreach { case (t, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      m.keys.foreach { d =>
        val win = m.filter { case (d2, _) => d2 >= d - 7 && d2 <= d - 1 }.values.toSeq
        val (n, sm, sq) = (win.size.toLong, win.sum, win.map(v => v * v).sum)
        val x = m(d)
        val flag = n == 7 && (n * x - sm) * (n * x - sm) > 9 * (n * sq - sm * sm)
        assert(got((t, d)) == ((n, sm, sq, if (flag) 1L else 0L)),
          s"window mismatch at ($t, $d)")
      }
    }
  }

  test("q128 label propagation equals a plain-Scala synchronous 3-round recompute") {
    import org.apache.spark.sql.functions._
    val li = graft.engine.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    li.groupBy(_._1).values.foreach { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length) {
        val e = (parts(i), parts(j))
        pairCount(e) = pairCount.getOrElse(e, 0) + 1
      }
    }
    val nbrs = scala.collection.mutable.Map.empty[Long, List[Long]]
    pairCount.foreach { case ((a, b), c) =>
      if (c >= 2) {
        nbrs(a) = b :: nbrs.getOrElse(a, Nil)
        nbrs(b) = a :: nbrs.getOrElse(b, Nil)
      }
    }
    var lbl: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    (1 to 3).foreach { _ =>
      val prev = lbl
      lbl = nbrs.iterator.map { case (v, ns) =>
        val votes = ns.map(prev).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        v -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
      }.toMap
    }
    val want = lbl.groupBy(_._2).map { case (c, m) =>
      c -> ((m.size.toLong, m.keys.min, m.keys.sum))
    }
    val got = graft.operators.AnalyticQueries.q128LabelPropagation(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    assert(got.size < lbl.size, "propagation must actually merge some communities")
    graft.engine.Sessions.releasePinned(spark)
  }

  test("every declared query runs at sf0.001 and matching oracle keys exist") {
    val qs = SparkEntry.queries
    val orc = SparkEntry.oracleSql
    assert(orc.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      withClue(s"$name should produce rows at sf0.001: ") { assert(n >= 0) }
    }
  }
}
