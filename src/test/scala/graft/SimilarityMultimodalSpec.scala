package graft

import graft.operators.{MediaBlob, MultimodalQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

class SimilarityMultimodalSpec extends SparkSpec {

  test("brute-force knn top-1 equals direct argmax for query 0") {
    val rows = SimilarityQueries.q55KnnBrute(spark, sfDir01)
      .filter(col("qid") === 0 && col("rnk") === 1).collect()
    assert(rows.length == 1)
    val top = rows.head
    // independent recomputation with plain HOFs
    graft.functions.GraftFunctions.register(spark)
    val e = graft.engine.Tables.load(spark, sfDir01, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS q")
      .selectExpr("vec_id", "q",
        "aggregate(q, 0L, (a, x) -> a + x * x) AS n2")
    val q0 = e.filter(col("vec_id") === 0).collect().head
    val best = e.filter(col("vec_id") =!= 0).collect().map { r =>
      val a = q0.getSeq[Long](1); val b = r.getSeq[Long](1)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      (r.getLong(0), dot / (math.sqrt(q0.getLong(2).toDouble) * math.sqrt(r.getLong(2).toDouble)))
    }.maxBy { case (id, cos) => (cos, -id) }
    assert(top.getLong(1) == best._1)
    assert(math.abs(top.getDouble(2) - best._2) < 1e-12)
  }

  test("lsh knn results are a same-bucket subset of brute-force scoring") {
    val lsh = SimilarityQueries.q56KnnLsh(spark, sfDir01).collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0))
  }

  test("fakeDecode computes exact byte statistics") {
    val blob = MediaBlob(7L, "img/1", Array[Byte](65, 66, 67, -1))
    val f = MultimodalQueries.fakeDecode(blob)
    assert(f.n_bytes == 4)
    assert(f.first_byte == 65)
    assert(f.byte_sum == 65 + 66 + 67 + 255)
    assert(f.width == 4 % 640 && f.height == f.byte_sum % 480)
  }

  test("multimodal pipeline aggregates all media types") {
    val rows = MultimodalQueries.q65Multimodal(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("img/0", "img/1", "img/2"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables.load(spark, sfDir, "documents").count())
  }
}
