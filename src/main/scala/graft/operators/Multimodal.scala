package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, decoded by REAL public codecs inside a partition-batched
  * iterator.
  *
  *   - image  → PNG, encoded and decoded with `javax.imageio`
  *              (DEFLATE-compressed: header-peeking cannot fake the
  *              pixel reads, the decode is genuine).
  *   - audio  → WAV (RIFF/PCM 16-bit mono), decoded with
  *              `javax.sound.sampled.AudioSystem` — frame count and
  *              format come from the parsed container.
  *   - video  → an ANIMATED GIF (GIF89a), written and read with the
  *              JDK's native `javax.imageio` GIF plugin. Frame 0 is
  *              the full key frame; frames 1..n-1 are 1×1-pixel
  *              updates (a legal GIF animation shape — per-frame
  *              image descriptors may cover any sub-rectangle), so
  *              the frame count rides the real container while
  *              encode cost stays O(1) per continuation frame. The
  *              decode walks every frame (`getNumImages(true)` scans
  *              the stream) and reads the key frame's pixels.
  *
  * Payload bytes are synthesized deterministically from
  * (`doc_id`, `n_chars`), so a DuckDB oracle can replicate every
  * *decoded* feature (dims, frame counts, probe pixels) from the
  * documents table by pure arithmetic — while the Spark side only
  * gets those values by actually decoding the binary column.
  *
  * The 100 TB layout: payload stays a single binary column, metadata
  * is columnar, and the decoder session is constructed once per
  * partition (`mapPartitions`), not per row.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Features recovered by decoding the payload. `px00`/`px_corner`
    * are gray probe pixels (−1 for audio). */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Int, height: Int, n_frames: Int,
                           px00: Int, px_corner: Int)

  /** Deterministic synthesis parameters — the contract the oracle
    * replicates. Kept tiny so a 100 TB corpus of real media swaps in
    * without touching the decode path. */
  object Codec {
    def imageW(n: Long): Int = (n % 64).toInt + 16
    def imageH(n: Long): Int = (n % 48).toInt + 16
    def gray(docId: Long): Int = (docId % 256).toInt
    def cornerGray(docId: Long): Int = (gray(docId) + 7) % 256
    def audioSamples(n: Long): Int = (n % 1000).toInt + 1
    def videoFrames(n: Long): Int = (n % 240).toInt + 1

    private def makeImage(docId: Long, n: Long): BufferedImage = {
      val (w, h) = (imageW(n), imageH(n))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val g = gray(docId)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val cg = cornerGray(docId)
      img.setRGB(w - 1, h - 1, (cg << 16) | (cg << 8) | cg)
      img
    }

    private def write(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    def encodePng(docId: Long, n: Long): Array[Byte] =
      write(makeImage(docId, n), "png")

    /** RIFF/WAVE, PCM 16-bit mono 8 kHz, sample i = (docId + i) % 32768. */
    def encodeWav(docId: Long, n: Long): Array[Byte] = {
      val samples = audioSamples(n)
      val dataLen = samples * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)                  // PCM, mono
        .putInt(8000).putInt(8000 * 2)            // rate, byte rate
        .putShort(2).putShort(16)                 // block align, bits
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples) { buf.putShort(((docId + i) % 32768).toShort); i += 1 }
      buf.array()
    }

    /** Animated GIF: key frame + (frames−1) 1×1 continuation frames.
      * GIF palettes are exact for the ≤2 colors used, so the probe
      * pixels survive the round trip losslessly. */
    def encodeVideo(docId: Long, n: Long): Array[Byte] = {
      val frames = videoFrames(n)
      val bos = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        writer.writeToSequence(
          new javax.imageio.IIOImage(makeImage(docId, n), null, null), null)
        if (frames > 1) {
          val dot = new BufferedImage(1, 1, BufferedImage.TYPE_3BYTE_BGR)
          val g = gray(docId)
          dot.setRGB(0, 0, (g << 16) | (g << 8) | g)
          var i = 1
          while (i < frames) {
            writer.writeToSequence(
              new javax.imageio.IIOImage(dot, null, null), null)
            i += 1
          }
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose(); ios.close()
      }
      bos.toByteArray
    }

    /** The genuine decode: parses the container, reads the pixels. */
    def decode(r: MediaRow): MediaFeatures = r.media_type match {
      case "image" =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload doc_id=${r.doc_id}")
        probe(r, img, nFrames = 1)
      case "audio" =>
        val in = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(r.payload))
        try MediaFeatures(r.doc_id, r.media_type, 0, 0,
          in.getFrameLength.toInt, -1, -1)
        finally in.close()
      case _ =>
        require(r.payload.length > 6 &&
          new String(r.payload, 0, 3, "US-ASCII") == "GIF",
          s"bad video magic doc_id=${r.doc_id}")
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(r.payload))
        try {
          reader.setInput(iis)
          // allowSearch=true forces a full stream walk — the frame
          // count comes from parsing every image block, not a header
          val frames = reader.getNumImages(true)
          val img = reader.read(0)
          require(img != null, s"undecodable key frame doc_id=${r.doc_id}")
          probe(r, img, nFrames = frames)
        } finally {
          reader.dispose(); iis.close()
        }
    }

    private def probe(r: MediaRow, img: BufferedImage,
                      nFrames: Int): MediaFeatures =
      MediaFeatures(r.doc_id, r.media_type, img.getWidth, img.getHeight,
        nFrames, img.getRGB(0, 0) & 0xFF,
        img.getRGB(img.getWidth - 1, img.getHeight - 1) & 0xFF)
  }

  /** Synthesize the media table: real encoded payloads, media type
    * round-robin by doc_id. Encoding runs distributed (mapPartitions)
    * — the driver never holds the corpus. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false) // no temp-file cache inside executors
        rows.map { case (id, n) =>
          (id % 3) match {
            case 0 => MediaRow(id, "image", Codec.encodePng(id, n))
            case 1 => MediaRow(id, "audio", Codec.encodeWav(id, n))
            case _ => MediaRow(id, "video", Codec.encodeVideo(id, n))
          }
        }
      }
  }

  /** Feature extraction over partition-batched rows. Decoder setup
    * (ImageIO cache mode; a real codec's native session) happens once
    * per partition — the pattern that amortizes at scale. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map(Codec.decode)
    }
  }

  /** Session-scoped MATERIALIZED FEATURES STORE (the SigStore pattern,
    * `SigStore.scala:37`): encode+decode of the whole corpus is the
    * expensive head shared by all three multimodal queries, and before
    * this store each query re-ran it — a suite paid the codec three
    * times. At 100 TB the production shape is exactly a store: decode
    * once into a landed columnar features table, query it many times;
    * no one re-decodes petabytes of video per downstream query. Keyed
    * by dataset dir; paths are monotonically unique per build so a
    * returned reader never observes its path overwritten, and
    * `computeIfAbsent` serializes the build per key. */
  private val featureStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val storeIds = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Build counter — exposed so MultimodalSpec can pin build-once reuse. */
  private[graft] val featureBuildCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Landed features table for a dataset dir, building on first use.
    * Returns a fresh parquet read bound to the caller's session (the
    * cache holds only paths, so sessions interoperate). */
  def featuresTable(s: SparkSession, d: String): DataFrame = {
    val path = featureStores.computeIfAbsent(d, _ => {
      featureBuildCount.incrementAndGet()
      val out = graft.Scratch.processScoped("graft_mediastore",
        s"m${storeIds.getAndIncrement()}").toString
      extractFeatures(mediaTable(s, d)).toDF()
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    Present.sortedUnbounded(featuresTable(s, d),
      org.apache.spark.sql.functions.col("doc_id"))

  val BoxSize = 224

  /** Resize plan: fit each visual payload into a BoxSize square
    * preserving aspect ratio. Dims come from the REAL decode; the
    * letterbox arithmetic is integer-exact in both engines. */
  def multimodalResize(s: SparkSession, d: String): DataFrame = {
    val f = featuresTable(s, d)
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
    * video (stride = ceil(n/MaxFrames)); the frame count comes from
    * the decoded container header. Narrow (explode only), no shuffle
    * until the presentation sort. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    val f = featuresTable(s, d)
    val stride = ceil(col("n_frames").cast("double") / MaxFrames).cast("int")
    f.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_no"))
      .transform(Present.sortedUnbounded(_, col("doc_id"), col("frame_no")))
  }

  /** Media dedup by DECODED content signature — the multimodal
    * pipeline's dedup step (the LAION-style shape: fingerprint every
    * payload once at ingest, dedup by a GROUP BY on the fingerprint,
    * never pairwise over binaries): two payloads are duplicates iff
    * their decoded signatures agree on every field (type, dims, frame
    * count, probe pixels). The signature comes from the landed
    * features store (decode-once), so dedup itself is one hash
    * aggregation over narrow columns — at 100 TB the binary column is
    * never re-read and nothing quadratic exists. Keep-first rule (the
    * dedup family's convention): the class's lowest doc_id survives,
    * every other member reports dup_of = survivor. The Spark side
    * only knows the signatures by actually DECODING the PNG/WAV/GIF
    * payloads; the oracle replays the synthesis arithmetic. */
  def mediaDedup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(
      "media_type", "width", "height", "n_frames", "px00", "px_corner")
    featuresTable(s, d)
      .withColumn("dup_of", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("dup_of"))
      .select("doc_id", "media_type", "dup_of")
      .transform(Present.sortedUnbounded(_, col("doc_id")))
  }

  /** Images whose decoded intensities differ by at most this. */
  val NearDupEps = 1
  /** Intensity-bucket width for the candidate join — strictly wider
    * than [[NearDupEps]], so a qualifying pair never spans more than
    * ADJACENT buckets. */
  val NearDupBucket = 4

  /** Perceptual near-dup over DECODED image intensity — the
    * pHash-hamming shape of a multimodal pipeline, on this corpus's
    * 1-D signature (probe intensity; a richer perceptual hash slots
    * into the same bucketed frame): pairs of images whose decoded
    * gray differs by ≤ [[NearDupEps]]. The candidate join is
    * BUCKET-LOCAL (each image probes its own + both adjacent
    * intensity buckets — bucket width > ε makes that exhaustive), so
    * candidates are bounded by bucket occupancy and nothing quadratic
    * exists; the exact |diff| ≤ ε check runs only on candidates —
    * the MinHash-LSH band pattern applied to a metric signature. The
    * signatures come from the landed features store (decode-once);
    * the oracle replays the synthesis arithmetic through the naive
    * ground-truth self-join, so a candidate bucket that dropped a
    * qualifying pair hash-fails. */
  def mediaNearDup(s: SparkSession, d: String): DataFrame = {
    val img = featuresTable(s, d)
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("px00").as("g"))
    val a = img.select(col("doc_id").as("doc_a"), col("g").as("g_a"),
      expr(s"g div $NearDupBucket").as("bk"))
    val b = img.select(col("doc_id").as("doc_b"), col("g").as("g_b"),
      explode(array(expr(s"g div $NearDupBucket") - 1,
        expr(s"g div $NearDupBucket"),
        expr(s"g div $NearDupBucket") + 1)).as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("g_a") - col("g_b")) <= NearDupEps)
      .select("doc_a", "doc_b", "g_a", "g_b")
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_resize"   -> multimodalResize _,
    "multimodal_frames"   -> multimodalFrames _,
    "media_dedup"         -> mediaDedup _,
    "media_neardup"       -> mediaNearDup _,
  )

  /** The oracle replicates the synthesis arithmetic from
    * (`doc_id`, `n_chars`); Spark only recovers these values by
    * decoding the PNG/WAV/GFTV payloads. */
  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
        |    n_chars AS n
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  CASE WHEN media_type = 'audio' THEN 0
        |    ELSE (n % 64 + 16)::INT END AS width,
        |  CASE WHEN media_type = 'audio' THEN 0
        |    ELSE (n % 48 + 16)::INT END AS height,
        |  CASE media_type WHEN 'image' THEN 1
        |    WHEN 'audio' THEN (n % 1000 + 1)::INT
        |    ELSE (n % 240 + 1)::INT END AS n_frames,
        |  CASE WHEN media_type = 'audio' THEN -1
        |    ELSE (doc_id % 256)::INT END AS px00,
        |  CASE WHEN media_type = 'audio' THEN -1
        |    ELSE ((doc_id % 256 + 7) % 256)::INT END AS px_corner
        |FROM m ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
        |    n_chars AS n
        |  FROM documents),
        |dims AS (
        |  SELECT doc_id, media_type,
        |    CASE media_type WHEN 'audio' THEN 0 ELSE (n % 64 + 16)::INT END AS width,
        |    CASE media_type WHEN 'audio' THEN 0 ELSE (n % 48 + 16)::INT END AS height
        |  FROM m)
        |SELECT doc_id, media_type, width, height,
        |  CASE WHEN media_type = 'audio' THEN NULL
        |    ELSE ((width * 224) // greatest(width, height))::INT END AS out_w,
        |  CASE WHEN media_type = 'audio' THEN NULL
        |    ELSE ((height * 224) // greatest(width, height))::INT END AS out_h
        |FROM dims ORDER BY doc_id""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id, (n_chars % 240 + 1)::INT AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, n_frames, f.frame_no
        |FROM v, unnest(range(0, n_frames,
        |  cast(ceil(n_frames / 8.0) AS INT))) AS f(frame_no)
        |ORDER BY doc_id, frame_no""".stripMargin,
    // dedup by decoded signature: the synthesis arithmetic rebuilds
    // every signature field the Spark side recovers by decoding, and
    // the keep-first rule replays as a window min over the class
    "media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
        |    n_chars AS n
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, media_type,
        |    CASE WHEN media_type = 'audio' THEN 0
        |      ELSE (n % 64 + 16)::INT END AS width,
        |    CASE WHEN media_type = 'audio' THEN 0
        |      ELSE (n % 48 + 16)::INT END AS height,
        |    CASE media_type WHEN 'image' THEN 1
        |      WHEN 'audio' THEN (n % 1000 + 1)::INT
        |      ELSE (n % 240 + 1)::INT END AS n_frames,
        |    CASE WHEN media_type = 'audio' THEN -1
        |      ELSE (doc_id % 256)::INT END AS px00,
        |    CASE WHEN media_type = 'audio' THEN -1
        |      ELSE ((doc_id % 256 + 7) % 256)::INT END AS px_corner
        |  FROM m),
        |dd AS (
        |  SELECT doc_id, media_type, min(doc_id) OVER (
        |    PARTITION BY media_type, width, height, n_frames,
        |      px00, px_corner) AS dup_of
        |  FROM sig)
        |SELECT doc_id, media_type, dup_of FROM dd
        |WHERE doc_id <> dup_of ORDER BY doc_id""".stripMargin,
    // the GROUND-TRUTH naive self-join: the Spark side's bucketed
    // candidate form is defined equal to it, so a bucket that
    // dropped a qualifying pair hash-fails
    "media_neardup" ->
      """WITH img AS (
        |  SELECT doc_id, (doc_id % 256)::INT AS g
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.g AS g_a, b.g AS g_b
        |FROM img a JOIN img b
        |  ON a.doc_id < b.doc_id AND abs(a.g - b.g) <= 1
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
