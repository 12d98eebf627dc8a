package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The corpus has no image/audio files, so the payload is the document
  * text's UTF-8 bytes — the POINT is the Spark-side plumbing: BinaryType
  * columns, metadata structs, content hashing, byte slicing
  * ("frame sampling"), and a clearly-marked STUB decode step where a real
  * pipeline would call an image/audio codec (the codec libraries are not
  * in this container; see `decodeStub`).
  *
  * At 100 TB, payloads stay opaque bytes end-to-end (no row-level codec
  * in the scan path); metadata extraction is a map-only scan, and
  * payloads co-partition with their keys for any downstream join.
  */
object MultimodalOps {

  /** STUB decode: a real implementation would decode image bytes and
    * return (width, height, channels). Here: a deterministic fake derived
    * from the byte length, keeping the schema and the Spark plumbing
    * (struct columns over binary payloads) real and testable.
    */
  def decodeStub(payload: org.apache.spark.sql.Column) = struct(
    (octet_length(payload) % 640).cast("int").as("width"),
    (octet_length(payload) % 480).cast("int").as("height"),
    lit(3).as("channels"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata extraction + content hash + byte window
    // ("thumbnail"/"frame" slice). Oracle compares the same derivations
    // computed from the text on the DuckDB side (DuckDB v1.0 lacks BLOB
    // substring/md5, so the oracle derives from VARCHAR — identical
    // bytes for this ASCII corpus).
    "q_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "utf-8"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_hash"),
          hex(encode(substring(col("text"), 1, 8), "utf-8")).as("head_hex"),
          col("lang").as("meta_lang"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Decode + "frame sample": stubbed decode struct + strided byte
    // samples (every 64th byte) as the frame-sampling plumbing. No
    // oracle: the decode struct is stub semantics by design. The sample
    // array is emitted CSV-flattened (`frame_csv`) — scalar columns only,
    // so downstream sort/hash harnesses need no array support.
    "q_multimodal_decode" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "utf-8"))
        .withColumn("decoded", decodeStub(col("payload")))
        .withColumn("frame_samples", expr(
          "transform(sequence(1, octet_length(payload), 64), " +
            "i -> ascii(substr(text, i, 1)))"))
        .select(col("doc_id"), col("decoded.width"), col("decoded.height"),
          col("decoded.channels"), size(col("frame_samples")).as("n_frames"),
          array_join(expr("transform(frame_samples, x -> cast(x as string))"),
            ",").as("frame_csv"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // Batched (mapPartitions) decode: typed one-to-many frame extraction
    // with per-partition codec context. Rows-only check (stub decode).
    "q_multimodal_frames" -> ((s, d) => decodeBatched(s, d))
  )

  /** Typed record for the batched decode path. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], meta_lang: String)
  case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, feature: Double)

  /** Batched decode via mapPartitions — the Scala analog of a
    * mapInPandas batch UDF: payloads stream through a per-partition
    * iterator (one codec context per partition, not per row), each
    * emitting zero-or-more frame rows. The codec itself is STUBBED
    * (deterministic pseudo-decode from the bytes — image/audio libraries
    * are not in this container); the partitioning, batch shape, typed
    * schema, and one-to-many row explosion are the real plumbing.
    */
  def decodeBatched(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val records = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
        col("lang").as("meta_lang"))
      .as[MediaRecord]
    records.mapPartitions { it =>
      // STUB: a real implementation opens one decoder per partition here.
      it.flatMap { rec =>
        val nFrames = math.max(1, rec.payload.length / 128)
        (0 until math.min(nFrames, 4)).iterator.map { f =>
          val b = rec.payload(math.min(f * 128, rec.payload.length - 1))
          DecodedFrame(rec.doc_id, f,
            640 - (rec.payload.length % 640) % 640,
            480 - (rec.payload.length % 480) % 480,
            (b & 0xff) / 255.0)
        }
      }
    }.toDF()
      .orderBy(col("doc_id").asc_nulls_first, col("frame_idx").asc_nulls_first)
  }

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  hex(substring(text, 1, 8)) AS head_hex,
        |  lang AS meta_lang
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  )
}
