package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, processed by a batched per-partition "decoder".
  *
  * The real thing would carry image/audio/video bytes and decode with
  * native libs inside `mapPartitions` (or Python's `mapInPandas`);
  * those libs aren't in this container, so the DECODE step is a
  * clearly-marked deterministic fake ([[fakeDecode]]), while
  * everything Spark-level is real and tested: the binary column,
  * the media StructType schema, the partition-batched iterator
  * (decoder state initialized once per partition, not per row — the
  * pattern that matters at scale), and the feature schema coming back.
  *
  * Payloads are synthesized from `documents.text` (UTF-8 bytes) so the
  * whole path is deterministic and the oracle can replicate the
  * arithmetic from `n_chars`/text.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the 100 TB layout
    * (payload stays a single column; metadata is columnar). */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           first_byte: Int)

  /** Synthesize the media table: text bytes as payload, media type
    * round-robin by doc_id. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** STUB DECODER — deterministic fake standing in for an image/audio
    * codec. A real deployment replaces the body with e.g. a JNI/
    * javacv decode; the signature (bytes → features) and the
    * per-partition batching around it are the real contract. */
  def fakeDecode(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    mediaType match {
      case "image" => (n % 640 + 16, n % 480 + 16, 1)
      case "audio" => (0, 0, n % 1000 + 1)
      case _       => (n % 640 + 16, n % 480 + 16, n % 240 + 1)
    }
  }

  /** Feature extraction over partition-batched rows. The decoder
    * "session" (a real codec would be expensive to construct) is
    * created once per partition — the mapPartitions pattern that
    * amortizes setup at scale. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init happens HERE (once), not per row
      rows.map { r =>
        val (w, h, f) = fakeDecode(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, f,
          if (r.payload.isEmpty) -1 else r.payload(0) & 0xFF)
      }
    }
  }

  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Present.sorted(extractFeatures(mediaTable(s, d)).toDF(),
      org.apache.spark.sql.functions.col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures _,
  )

  /** The oracle replicates the fake-decode arithmetic from the text
    * column (ASCII corpus → n_bytes = n_chars, first byte = ascii of
    * first char). */
  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
        |    length(text) AS n_bytes,
        |    ascii(substring(text, 1, 1)) AS first_byte
        |  FROM documents)
        |SELECT doc_id, media_type, n_bytes,
        |  CASE media_type WHEN 'image' THEN n_bytes % 640 + 16
        |    WHEN 'audio' THEN 0 ELSE n_bytes % 640 + 16 END AS width,
        |  CASE media_type WHEN 'image' THEN n_bytes % 480 + 16
        |    WHEN 'audio' THEN 0 ELSE n_bytes % 480 + 16 END AS height,
        |  CASE media_type WHEN 'image' THEN 1
        |    WHEN 'audio' THEN n_bytes % 1000 + 1
        |    ELSE n_bytes % 240 + 1 END AS n_frames,
        |  first_byte
        |FROM m ORDER BY doc_id""".stripMargin,
  )
}
