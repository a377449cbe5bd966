package graft.operators

import graft.QueryModule
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata —
  * the schema shape a 100 TB image/audio/video corpus would use (payload as
  * parquet `binary`, metadata as scalar columns alongside). */
case class MediaBlob(doc_id: Long, media_type: String, payload: Array[Byte])

/** Deterministic per-blob features standing in for a real decoder's output. */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    first_byte: Long, byte_sum: Long, width: Long, height: Long)

/** Multimodal-column operators: binary payloads + typed metadata, batch
  * feature extraction via `mapPartitions`.
  *
  * The decode step is a clearly-marked deterministic STUB (`fakeDecode`) —
  * image/audio codecs aren't available here — but the Spark-side plumbing is
  * real and what matters at scale: payloads travel as parquet `binary` (never
  * strings), extraction runs once per partition with zero driver involvement,
  * and the feature schema is a typed case class so downstream ops are
  * columnar again. Swapping `fakeDecode` for a JNI/codec call changes no
  * plan shape.
  */
object MultimodalQueries extends QueryModule {

  /** STUB decoder: byte statistics + a fake geometry derived from the payload
    * length. A real implementation would parse the codec header here. */
  private[graft] def fakeDecode(b: MediaBlob): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < b.payload.length) { sum += b.payload(i) & 0xFF; i += 1 }
    val n = b.payload.length.toLong
    MediaFeatures(b.doc_id, b.media_type, n,
      if (n > 0) (b.payload(0) & 0xFF).toLong else -1L,
      sum, width = n % 640, height = (sum % 480))
  }

  /** q65 — binary feature extraction: documents' text bytes stand in for
    * media payloads (`cast(text as binary)` = UTF-8 bytes); media_type cycles
    * deterministically. mapPartitions batches the "decode"; output aggregates
    * per media_type so results stay bounded at any corpus size. */
  val q65Multimodal: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("img/"), (col("doc_id") % 3).cast("string")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaBlob]
      .mapPartitions(_.map(fakeDecode))
      .toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).as("tot_bytes"),
        sum(col("byte_sum")).as("tot_byte_sum"),
        min(col("first_byte")).as("min_first"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
      .orderBy(col("media_type"))
  }

  /** q67 — frame sampling: chunk each binary payload into fixed 32-byte
    * "frames" (a video decoder's GOP analogue), keep every 4th, fingerprint
    * each kept frame with the engine's polynomial hash. All chunking runs
    * inside mapPartitions on raw bytes — the shape a real frame-sampler has —
    * and because the fixture payloads are ASCII text, DuckDB reproduces the
    * byte arithmetic with substring folds, making even this op
    * oracle-checkable. */
  val q67FrameSample: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("img/"), (col("doc_id") % 3).cast("string")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaBlob]
      .mapPartitions(_.flatMap { b =>
        b.payload.grouped(32).zipWithIndex.collect {
          case (bytes, idx) if idx % 4 == 0 =>
            var h = 0L
            bytes.foreach(c => h = (h * 31 + (c & 0xFF)) % 2147483647L)
            (b.doc_id, idx.toLong, bytes.length.toLong, h)
        }
      })
      .toDF("doc_id", "frame_idx", "frame_len", "fhash")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  def queries: Map[String, Q] = Map(
    "q65_multimodal" -> q65Multimodal,
    "q67_frame_sample" -> q67FrameSample)

  /** The fixture text is ASCII, so byte stats equal character-code stats —
    * which DuckDB can compute without a binary decoder. */
  def oracles: Map[String, String] = Map(
    "q65_multimodal" -> """
      WITH f AS (
        SELECT doc_id,
          'img/' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
          CAST(length(text) AS BIGINT) AS n_bytes,
          CAST(unicode(text[1]) AS BIGINT) AS first_byte,
          CAST(list_sum([unicode(text[i]) for i in range(1, length(text)+1)]) AS BIGINT) AS byte_sum
        FROM documents)
      SELECT media_type, count(*) AS n_blobs,
        CAST(sum(n_bytes) AS BIGINT) AS tot_bytes,
        CAST(sum(byte_sum) AS BIGINT) AS tot_byte_sum,
        min(first_byte) AS min_first,
        max(n_bytes % 640) AS max_width,
        max(byte_sum % 480) AS max_height
      FROM f GROUP BY media_type ORDER BY media_type""",
    "q67_frame_sample" -> """
      WITH f AS (
        SELECT doc_id, i AS frame_idx, substring(text, i*32 + 1, 32) AS fr
        FROM documents, range(0, 1000) r(i)
        WHERE i*32 < length(text) AND i % 4 = 0)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        CAST(length(fr) AS BIGINT) AS frame_len,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
            [CAST(unicode(fr[j]) AS BIGINT) for j in range(1, length(fr)+1)]),
          (a, b) -> (a * 31 + b) % 2147483647) AS fhash
      FROM f ORDER BY doc_id, frame_idx""")
}
