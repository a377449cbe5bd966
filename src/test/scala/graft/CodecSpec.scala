package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-transport codec × encryption matrix (reference test strategy:
  * writer suites run {LZF, LZ4, Snappy, none} × encryption,
  * RemoteUnsafeShuffleWriterSuite.java:165-418). The engine's shuffle bytes
  * move through whatever `spark.io.compression.codec` says — a codec that
  * corrupts, truncates, or mis-frames blocks shows up as wrong rows, not as
  * an exception — so the same shuffle-heavy queries (wide exchange + external
  * sort + join) are re-run under every codec, plus uncompressed and
  * encrypted transports, and asserted row-identical to the default-config
  * result.
  *
  * Codec/encryption are CONTEXT-level settings (read by the block transfer
  * and spill paths at SparkEnv creation, not per-query), so each cell builds
  * its own SparkContext sequentially; the suite runs in its own forked test
  * JVM (`Test / testGrouping`) to keep the shared-session suites isolated. */
class CodecSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** (label, extra context configs) — lz4 is Spark's default and serves as
    * the reference cell; zstd is the long-haul 100-TB choice (best ratio for
    * cold shuffle), lzf/snappy complete the reference's matrix, `none`
    * exercises the uncompressed framing path, and `encrypted` runs AES on
    * the shuffle files. */
  private val cells: Seq[(String, Map[String, String])] = Seq(
    "lz4" -> Map("spark.io.compression.codec" -> "lz4"),
    "snappy" -> Map("spark.io.compression.codec" -> "snappy"),
    "zstd" -> Map("spark.io.compression.codec" -> "zstd"),
    "lzf" -> Map("spark.io.compression.codec" -> "lzf"),
    "none" -> Map(
      "spark.shuffle.compress" -> "false",
      "spark.shuffle.spill.compress" -> "false"),
    "encrypted" -> Map(
      "spark.io.compression.codec" -> "lz4",
      "spark.io.encryption.enabled" -> "true"))

  /** Canonical row images of the shuffle-heavy probes: global sort (external
    * sort + range exchange), hash aggregation (partial→final exchange), and
    * an equi-join (two-sided exchange). */
  private def probes(s: SparkSession): Map[String, List[Seq[Any]]] = Map(
    "q03_sort_global" -> graft.operators.CoreQueries.q03SortGlobal(s, sfDir)
      .collect().map(_.toSeq).toList,
    "q08_groupby_sum" -> graft.operators.CoreQueries.q08GroupBySum(s, sfDir)
      .collect().map(_.toSeq).toList,
    "q11_join_inner" -> graft.operators.JoinQueries.q11JoinInner(s, sfDir)
      .collect().map(_.toSeq).toList)

  private def withSession[A](configs: Map[String, String])(f: SparkSession => A): A = {
    val b = SparkSession.builder()
      .appName("graft-codec")
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    configs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try f(s) finally s.stop()
  }

  test("shuffle-heavy queries are row-identical across codec/encryption matrix") {
    val results = cells.map { case (label, configs) =>
      val r = withSession(configs) { s =>
        // confirm the cell really took effect at the context level
        configs.foreach { case (k, v) =>
          assert(s.sparkContext.getConf.get(k) == v, s"$label: $k not applied")
        }
        probes(s)
      }
      r.foreach { case (q, rows) => assert(rows.nonEmpty, s"$label/$q empty") }
      label -> r
    }
    val (refLabel, reference) = results.head
    results.tail.foreach { case (label, r) =>
      reference.foreach { case (q, want) =>
        assert(r(q) == want, s"$q differs between $refLabel and $label")
      }
    }
  }

  /** Sum of every `spillSize` metric in the executed (non-adaptive) plan —
    * the SpillSpec helper, repeated here because this suite builds its own
    * sessions. */
  private def spillBytes(df: org.apache.spark.sql.DataFrame): Long = {
    var total = 0L
    df.queryExecution.executedPlan.foreach { n =>
      n.metrics.get("spillSize").foreach(m => total += m.value)
    }
    total
  }

  test("forced-spill paths are row-identical across compression codecs") {
    // SpillSpec's forced-spill bodies re-run under each codec: the SPILL
    // files themselves are compressed with the io codec
    // (spark.shuffle.spill.compress, on by default), so a codec that
    // mis-frames a spill block corrupts rows only on the external path —
    // the layer the query-level matrix above never reaches. Per the
    // reference's merge-x-codec cells (RemoteUnsafeShuffleWriterSuite
    // .java:165-418): window buffer spill, SMJ match-buffer spill, and the
    // hash-agg sort-fallback, each asserted spilled (where metered) and
    // row-identical across {lz4, snappy, zstd}.
    val spillConfs = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "8",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "8",
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "100")
    val codecs = Seq("lz4", "snappy", "zstd")
    val results = codecs.map { codec =>
      val r = withSession(
        spillConfs + ("spark.io.compression.codec" -> codec)) { s =>
        import org.apache.spark.sql.functions.{col, count, lit, sum}
        val window = graft.operators.WindowQueries.q23CumSum(s, "/root/testdata/sf0.01")
        val windowRows = window.collect().map(_.toSeq).toList
        assert(spillBytes(window) > 0,
          s"$codec: window buffer must have spilled to disk")
        val c = graft.engine.Tables.load(s, sfDir, "customer")
        val smj = c.as("a")
          .join(c.as("b"), col("a.c_mktsegment") === col("b.c_mktsegment"))
          .groupBy(col("a.c_mktsegment"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("b.c_custkey")).as("k_sum"))
          .orderBy(col("a.c_mktsegment"))
        val smjRows = smj.collect().map(_.toSeq).toList
        assert(spillBytes(smj) > 0,
          s"$codec: SMJ match buffer must have spilled to disk")
        // agg fallback has no spillSize metric of its own at this scale —
        // the fallback path is forced by the conf; equality is the check
        val aggRows = graft.operators.CoreQueries.q01Agg(s, sfDir)
          .collect().map(_.toSeq).toList
        Map("window" -> windowRows, "smj" -> smjRows, "agg" -> aggRows)
      }
      r.foreach { case (q, rows) => assert(rows.nonEmpty, s"$codec/$q empty") }
      codec -> r
    }
    val (refLabel, reference) = results.head
    results.tail.foreach { case (label, r) =>
      reference.foreach { case (q, want) =>
        assert(r(q) == want, s"spill body $q differs between $refLabel and $label")
      }
    }
  }
}
