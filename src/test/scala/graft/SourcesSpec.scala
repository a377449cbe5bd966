package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.5 IO12): parquet / csv / json
  * round-trips preserve values, and partitioned parquet writes prune. */
class SourcesSpec extends SparkSpec {
  import graft.engine.Tables

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parquet round-trip preserves the nation table exactly") {
    val n = Tables.load(spark, sfDir, "nation")
    val dir = tmp("graft_pq")
    n.write.mode("overwrite").parquet(s"$dir/nation")
    val back = spark.read.parquet(s"$dir/nation")
    assert(back.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)
  }

  test("orc round-trip preserves the supplier table exactly") {
    val s0 = Tables.load(spark, sfDir, "supplier")
    val dir = tmp("graft_orc")
    s0.write.mode("overwrite").orc(s"$dir/supplier")
    val back = spark.read.orc(s"$dir/supplier")
    assert(back.collect().map(_.toSeq).toSet == s0.collect().map(_.toSeq).toSet)
  }

  test("csv round-trip with header and explicit schema preserves values") {
    val c = Tables.load(spark, sfDir, "customer")
    val dir = tmp("graft_csv")
    c.write.mode("overwrite").option("header", "true").csv(s"$dir/customer")
    val back = spark.read.option("header", "true").schema(c.schema).csv(s"$dir/customer")
    assert(back.agg(count(lit(1)), sum("c_custkey"), sum("c_acctbal")).collect().head ==
      c.agg(count(lit(1)), sum("c_custkey"), sum("c_acctbal")).collect().head)
  }

  test("json lines round-trip preserves values") {
    val r = Tables.load(spark, sfDir, "region")
    val dir = tmp("graft_json")
    r.write.mode("overwrite").json(s"$dir/region")
    val back = spark.read.schema(r.schema).json(s"$dir/region")
    assert(back.collect().map(_.toSeq).toSet == r.collect().map(_.toSeq).toSet)
  }

  test("hive-partitioned write enables partition pruning at the scan") {
    val o = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val dir = tmp("graft_part")
    o.write.mode("overwrite").partitionBy("o_year").parquet(s"$dir/orders")
    val pruned = spark.read.parquet(s"$dir/orders").filter(col("o_year") === 1995)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("o_year"))
    assert(pruned.count() ==
      o.filter(col("o_year") === 1995).count())
  }

  test("q108 shard write: one directory per shard, membership round-trips") {
    // the physical half of q108's audit: deal documents into training
    // shards with the portable hash, write partitionBy(shard), and check
    // the files on disk agree with the audit's per-shard membership
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .withColumn("shard", expr("((doc_id % 999983) * 2654435761) % 64"))
    val dir = tmp("graft_shards")
    docs.write.mode("overwrite").partitionBy("shard").parquet(s"$dir/shards")
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == docs.count())
    val onDisk = new java.io.File(s"$dir/shards").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).length.toLong
    val audit = graft.operators.CoreQueries.q108ShardAudit(spark, sfDir).collect()
    assert(onDisk == audit.length.toLong, "one partition directory per audited shard")
    val diskSums = back.groupBy(col("shard"))
      .agg(sum(col("doc_id")).as("ck")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    audit.foreach { r =>
      assert(diskSums(r.getLong(0)) == r.getLong(4),
        s"shard ${r.getLong(0)}: on-disk membership checksum must match the audit")
    }
  }
}
