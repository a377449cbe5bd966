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
}
