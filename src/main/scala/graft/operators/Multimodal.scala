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
    Present.sortedUnbounded(extractFeatures(mediaTable(s, d)).toDF(),
      org.apache.spark.sql.functions.col("doc_id"))

  val BoxSize = 224

  /** Resize plan: fit each visual payload into a BoxSize square
    * preserving aspect ratio (the letterbox arithmetic every image
    * pipeline runs before a vision model). The pixel work happens in
    * the stubbed codec; the *plan* — target dims + scale factor per
    * row, audio passed through untouched — is real, columnar, and
    * oracle-checked. Integer math only, so both engines agree. */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    val f = extractFeatures(mediaTable(s, d)).toDF()
    // scale = BoxSize / max(w, h), applied in integer arithmetic:
    // out_dim = dim * BoxSize div max(w, h)
    val mx = greatest(col("width"), col("height"))
    f.select(col("doc_id"), col("media_type"), col("width"), col("height"),
        // integer division: products are small ints, exact in double,
        // and the cast truncates — same floor as the oracle's `//`
        when(col("media_type") === "audio", lit(null))
          .otherwise((col("width") * BoxSize / mx).cast("int"))
          .as("out_w"),
        when(col("media_type") === "audio", lit(null))
          .otherwise((col("height") * BoxSize / mx).cast("int"))
          .as("out_h"))
      .transform(Present.sortedUnbounded(_, col("doc_id")))
  }

  val MaxFrames = 8

  /** Frame sampling: pick ≤ MaxFrames evenly-spaced frame indices per
    * video (stride = ceil(n/MaxFrames)) — one output row per sampled
    * frame via a generated sequence, the shape a frame-extraction
    * stage consumes. Narrow (explode only), no shuffle until the
    * presentation sort. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    val f = extractFeatures(mediaTable(s, d)).toDF()
    val stride = ceil(col("n_frames").cast("double") / MaxFrames).cast("int")
    f.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_no"))
      .transform(Present.sortedUnbounded(_, col("doc_id"), col("frame_no")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_resize"   -> multimodalResize _,
    "multimodal_frames"   -> multimodalFrames _,
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
    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
        |    length(text) AS n
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, media_type,
        |    CASE media_type WHEN 'audio' THEN 0 ELSE n % 640 + 16 END AS width,
        |    CASE media_type WHEN 'audio' THEN 0 ELSE n % 480 + 16 END AS height
        |  FROM m)
        |SELECT doc_id, media_type, width, height,
        |  CASE WHEN media_type = 'audio' THEN NULL
        |    ELSE ((width * 224) // greatest(width, height))::INT END AS out_w,
        |  CASE WHEN media_type = 'audio' THEN NULL
        |    ELSE ((height * 224) // greatest(width, height))::INT END AS out_h
        |FROM dims ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id, length(text) % 240 + 1 AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_frames, f.frame_no
        |FROM v, unnest(range(0, n_frames,
        |  cast(ceil(n_frames / 8.0) AS INT))) AS f(frame_no)
        |ORDER BY doc_id, frame_no""".stripMargin,
  )
}
