package graft

import org.apache.spark.sql.functions._

/** The custom Catalyst as-of operator (AsOfJoinPlan/Exec/Strategy): crafted
  * strictness/null semantics, equality with the q26 window composition, and
  * the physical plan actually running through AsOfJoinExec. */
class AsOfPlanSpec extends SparkSpec {

  test("as-of exec: strictly-before semantics, null extension, key isolation") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"),
      (3L, 7L, "l4")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 99L, "r99"))
      .toDF("rk", "rt", "rtag")
    val got = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    assert(got == Set(
      ("l1", null),  // rt=10 is NOT strictly before t=10
      ("l2", "r15"), // the largest rt < 20 wins, not the first
      ("l3", null),  // key 2's only right row is in the future
      ("l4", null))) // key 3 absent from the right side entirely
  }

  test("as-of exec: right pointer folds forward through many candidates") {
    import spark.implicits._
    // one key, many rights before each left: candidate must be the LATEST
    val left = (1 to 5).map(i => (7L, i * 100L, i)).toDF("k", "t", "i")
    val right = (1 to 400).map(j => (7L, j.toLong, j)).toDF("rk", "rt", "j")
    val got = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("i"), col("j")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(got == Map(1 -> 99, 2 -> 199, 3 -> 299, 4 -> 399, 5 -> 400))
  }

  test("as-of exec: non-strict mode admits ties; tolerance nulls far matches") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 500L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15")).toDF("rk", "rt", "rtag")
    def run(strict: Boolean, tol: Option[Long]) =
      graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt", strict, tol)
        .select(col("tag"), col("rtag")).collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
        .toSet
    // inclusive: the tie row rt=10 now matches l1
    assert(run(strict = false, None) ==
      Set(("l1", "r10"), ("l2", "r15"), ("l3", "r15")))
    // tolerance 100: l3's nearest candidate (rt=15, gap 485) nulls out —
    // and since it is the NEAREST, no other right row could qualify
    assert(run(strict = true, Some(100L)) ==
      Set(("l1", null), ("l2", "r15"), ("l3", null)))
  }

  test("as-of forward: smallest strictly-later right row, per key, tolerant") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 15L, "l2"), (1L, 400L, "l3"),
      (2L, 1L, "l4")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 300L, "r300"),
      (3L, 2L, "r2")).toDF("rk", "rt", "rtag")
    val got = graft.plans.AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    assert(got == Set(
      ("l1", "r15"),  // rt=10 is not strictly later; nearest later is 15
      ("l2", "r300"), // skips the tie at 15
      ("l3", null),   // nothing later within key 1
      ("l4", null)))  // key 2 absent on the right
    // forward tolerance bounds rt - t
    val tol = graft.plans.AsOf.joinForward(left, right, Seq("k" -> "rk"),
        "t", "rt", strict = true, tolerance = Some(10L))
      .select(col("tag"), col("rtag")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    assert(tol == Set(("l1", "r15"), ("l2", null), ("l3", null), ("l4", null)))
    // helper columns do not leak into the caller-visible schema
    val cols = graft.plans.AsOf.joinForward(left, right, Seq("k" -> "rk"), "t", "rt")
      .columns.toSet
    assert(cols == Set("k", "t", "tag", "rk", "rt", "rtag"))
  }

  test("broadcast as-of equals the merge exec and never shuffles the left side") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"),
      (3L, 7L, "l4"), (1L, 15L, "l5")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 99L, "r99"))
      .toDF("rk", "rt", "rtag")
    def run(bcast: Boolean) =
      graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
          broadcast = Some(bcast))
        .select(col("tag"), col("rtag")).collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
        .toSet
    assert(run(bcast = true) == run(bcast = false))
    val df = graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
      broadcast = Some(true))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"expected broadcast exec:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "the right side must ship via a broadcast exchange")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the broadcast variant must not shuffle either side:\n$plan")
  }

  test("strategy picks broadcast vs merge from right-side stats, flag overrides") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (2L, 5L, "l2")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (2L, 1L, "r1")).toDF("rk", "rt", "rtag")
    def plan(threshold: String, flag: Option[Boolean]) = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try graft.plans.AsOf.join(left, right, Seq("k" -> "rk"), "t", "rt",
        broadcast = flag).queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    // dimension-sized right under the default 10 MB threshold → broadcast,
    // without the caller saying anything
    val auto = plan("10485760", None)
    assert(auto.contains("BroadcastAsOfJoin") && auto.contains("BroadcastExchange"),
      s"stats say broadcast, strategy must pick it:\n$auto")
    // right side's size estimate exceeds a 1-byte threshold → merge exec;
    // this is the STATS COMPARISON, not a constant choice
    val above = plan("1", None)
    assert(above.contains("AsOfJoin") && !above.contains("BroadcastAsOfJoin"),
      s"stats above threshold must pick the merge exec:\n$above")
    // -1 disables auto-broadcast entirely (Spark's convention)
    val disabled = plan("-1", None)
    assert(!disabled.contains("BroadcastAsOfJoin"),
      s"threshold -1 must never auto-broadcast:\n$disabled")
    // the explicit flag overrides stats in BOTH directions
    val forced = plan("-1", Some(true))
    assert(forced.contains("BroadcastAsOfJoin"),
      s"Some(true) must beat a disabled threshold:\n$forced")
    val suppressed = plan("10485760", Some(false))
    assert(!suppressed.contains("BroadcastAsOfJoin"),
      s"Some(false) must beat a qualifying size:\n$suppressed")
  }

  test("broadcast as-of probe index builds ONCE per executor per join, not per task") {
    import spark.implicits._
    // a 16-task fact side: before the per-executor cache, EVERY task paid a
    // full group+sort of the broadcast dimension (16 builds here); the
    // cache admits exactly one build per (join, broadcast) per JVM
    val fact = (1 to 4000).map(i => (i % 13L, i.toLong, i))
      .toDF("k", "t", "i").repartition(16)
    val dim = (1 to 500).map(j => (j % 13L, j * 7L, j)).toDF("rk", "rt", "j")
    val before = graft.plans.ProbeIndexCache.builds.get()
    val bcast = graft.plans.AsOf.join(fact, dim, Seq("k" -> "rk"), "t", "rt",
      broadcast = Some(true))
    val got = bcast.collect()
    assert(graft.plans.ProbeIndexCache.builds.get() - before == 1,
      "a 16-task probe stage must trigger exactly one index build")
    // and the cached index answers identically to the merge exec
    val merge = graft.plans.AsOf.join(fact, dim, Seq("k" -> "rk"), "t", "rt",
      broadcast = Some(false)).collect()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      r.getInt(2), if (r.isNullAt(4)) -1L else r.getLong(4))
    assert(got.map(key).sorted.toSeq == merge.map(key).sorted.toSeq)
  }

  test("q148 equals q26 row for row, and its executed plan contains AsOfJoinExec") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val native = graft.operators.WindowQueries.q148AsofNative(spark, sfDir01)
    val composed = graft.operators.WindowQueries.q26AsofJoin(spark, sfDir01)
    assert(rows(native) == rows(composed),
      "custom operator and window composition must agree exactly")
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"expected the custom exec in the plan:\n$plan")
  }
}
