package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batches via mapPartitions
  * (the Scala analogue of a vectorized pandas-UDF pipeline: one
  * decode-library initialization per partition, not per row).
  *
  * The decode step is a clearly-marked STUB — the container has no
  * image/audio codecs — but the Spark-side plumbing (schema, typed
  * Dataset, per-partition batching, deterministic frame sampling,
  * partition-friendly output) is real and tested.
  *
  * Scale: content bytes never shuffle — decode/feature-extract are
  * map-only over the scan; only the small feature rows move. Binary
  * payloads at 100 TB stay columnar in parquet with metadata columns
  * read independently (column pruning keeps metadata-only queries from
  * touching the blobs).
  */
object Multimodal {

  case class MediaFile(
      doc_id: Long,
      media_type: String,
      content: Array[Byte],
      n_bytes: Long)

  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content_hash: String,
      fake_width: Int,
      fake_height: Int,
      frame_offsets: Seq[Long])

  /** Manufacture a deterministic multimodal table from `documents`:
    * the utf-8 text bytes stand in for encoded media content. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      length(col("text")).cast("long").as("n_bytes"))

  /** STUB decoder: derives deterministic pseudo-features from the raw
    * bytes. A real deployment replaces the body with an actual codec
    * call; the batching shape (one init per partition, loop over rows)
    * is the part that carries to production. */
  def decodeFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // real pipeline: val codec = Codec.open() // once per partition
      batch.map { m =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(m.content).map("%02x".format(_)).mkString
        // STUB: fake decode — dimensions derived from content bytes.
        val w = 16 + (m.content.headOption.getOrElse(0: Byte) & 0x3f)
        val h = 16 + (m.content.lastOption.getOrElse(0: Byte) & 0x3f)
        MediaFeatures(m.doc_id, m.media_type, m.n_bytes, digest, w, h,
          frameOffsets(m.n_bytes, 10))
      }
    }
  }

  /** Deterministic frame sampling: 10 evenly spaced byte offsets. */
  def frameOffsets(nBytes: Long, frames: Int): Seq[Long] =
    (0 until frames).map(i => i * (nBytes / frames))

  /** Typed end-to-end stage used by tests and the oracle query. */
  def mediaFeatures(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    decodeFeatures(mediaTable(documents).as[MediaFile])
      .toDF()
      .orderBy("doc_id")
  }

  /** Metadata + content-hash projection — oracle-checkable (sha256 of
    * utf-8 text bytes ≡ DuckDB sha256(text); frame offsets are pure
    * integer arithmetic, projected as a ','-joined canonical string so
    * the driver's pandas hash-compare can sort the column). */
  def mediaMetadata(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .select(
        col("doc_id"), col("media_type"), col("n_bytes"),
        sha2(col("content"), 256).as("content_hash"),
        array_join(
          expr("transform(sequence(0, 9), i -> CAST(i * (n_bytes DIV 10) AS BIGINT))"),
          ",").as("frame_offsets"))
      .orderBy("doc_id")

  val sqlMediaMetadata: String =
    """SELECT doc_id,
       ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
       CAST(length(text) AS BIGINT) AS n_bytes,
       sha256(text) AS content_hash,
       array_to_string(list_transform(generate_series(0, 9),
         i -> CAST(i * (length(text) // 10) AS BIGINT)), ',') AS frame_offsets
       FROM documents ORDER BY doc_id"""
}
