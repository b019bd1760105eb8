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
    * are gray probe pixels; `ahash_hi`/`ahash_lo` are the two 32-bit
    * halves of the 8×8 average-hash over the decoded key frame
    * (−1 for audio); `pcm_sig` is the audio spectral fingerprint —
    * 8 quantized per-window PCM energy means packed 6 bits each
    * (−1 for image/video). */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Int, height: Int, n_frames: Int,
                           px00: Int, px_corner: Int,
                           ahash_hi: Long, ahash_lo: Long,
                           pcm_sig: Long)

  /** Deterministic synthesis parameters — the contract the oracle
    * replicates. Kept tiny so a 100 TB corpus of real media swaps in
    * without touching the decode path. Visual payloads carry an 8×8
    * BLOCK pattern (cell (bx, by) is a uniform gray — bx = x·8 div w,
    * by = y·8 div h) so the decoded average-hash has real multi-bit
    * structure while every probe stays integer-exact: an aHash cell's
    * pixel region coincides with a pattern block, so its average IS
    * the block value, no rounding anywhere. */
  object Codec {
    def imageW(n: Long): Int = (n % 64).toInt + 16
    def imageH(n: Long): Int = (n % 48).toInt + 16
    def gray(docId: Long): Int = (docId % 256).toInt
    def audioSamples(n: Long): Int = (n % 1000).toInt + 1
    def videoFrames(n: Long): Int = (n % 240).toInt + 1
    /** Block (bx, by)'s gray — the one formula the oracle replays.
      * The x-step varies with the payload (31 + n mod 5) so hashes
      * differ across documents beyond the base gray alone. */
    def cellGray(docId: Long, n: Long, bx: Int, by: Int): Int =
      ((docId % 256) + (31 + n % 5) * bx + 17 * by).toInt % 256
    def cornerGray(docId: Long, n: Long): Int = cellGray(docId, n, 7, 7)

    /** 256-entry indexed palette, intensity i carried in the RED
      * channel with green/blue deliberately decorrelated: PNG and GIF
      * both store indexed rasters LOSSLESSLY (the JDK GIF writer would
      * quantize a truecolor raster through its own palette builder),
      * and an ALL-GRAY palette must be avoided too — the JDK PNG
      * writer detects it and re-encodes as a grayscale PNG, whose
      * decoded image reads back through a linear-gray color space
      * conversion that shifts every probe value (measured: 6 → 42). */
    private[Multimodal] val cmap: Array[Int] = Array.tabulate(256)(i =>
      (0xFF << 24) | (i << 16) | (((i * 7 + 3) % 256) << 8) |
        ((i * 11 + 5) % 256))
    private val palette: java.awt.image.IndexColorModel =
      new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
    /** Intensity of a decoded pixel = its red channel. */
    def intensity(rgb: Int): Int = (rgb >> 16) & 0xFF

    private def makeImage(docId: Long, n: Long): BufferedImage = {
      val (w, h) = (imageW(n), imageH(n))
      val img = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_INDEXED, palette)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          img.setRGB(x, y, cmap(cellGray(docId, n, x * 8 / w, by)))
          x += 1
        }
        y += 1
      }
      img
    }

    /** DIVERSE visual synthesis (rehearsal-only): cell (bx, by) of the
      * pattern is a deterministic 64-bit mix of (pattern key, cell
      * index) — the splitmix64 finalizer (public domain, Steele et
      * al.) — so every distinct key decodes to an effectively random
      * 64-cell pattern and the aHash space is ~64-bit diverse, unlike
      * the gate synthesis's 1280-class gradient ceiling
      * ([[cellGray]]). The gate corpus keeps the arithmetic form
      * because its DuckDB oracle must replay the hash; the rehearsal
      * needs realistic DIVERSITY, which no corpus staging can conjure
      * out of the 1280-class contract (the round-16 lesson). */
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def divGray(key: Long, bx: Int, by: Int): Int =
      (mix64(key * 64 + by * 8 + bx) & 0xFF).toInt

    /** Planted duplicate-class rate for the diverse mode: every
      * [[DivDupEvery]]-th image (by image ordinal doc_id/3) repeats
      * the PREVIOUS image's pattern — the rare-duplicate structure of
      * a real crawl (~1.6% planted copies, everything else unique). */
    val DivDupEvery = 64L
    /** The pattern key: ordinal ≡ 1 (mod [[DivDupEvery]]) copies the
      * image 3 ids earlier; everyone else patterns on their own id. */
    def divKey(docId: Long): Long =
      if ((docId / 3) % DivDupEvery == 1) docId - 3 else docId

    private def makeImageDiverse(docId: Long, n: Long): BufferedImage = {
      val (w, h) = (imageW(n), imageH(n))
      val key = divKey(docId)
      val img = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_INDEXED, palette)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          img.setRGB(x, y, cmap(divGray(key, x * 8 / w, by)))
          x += 1
        }
        y += 1
      }
      img
    }

    def encodePngDiverse(docId: Long, n: Long): Array[Byte] =
      write(makeImageDiverse(docId, n), "png")

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
          val dot = new BufferedImage(1, 1,
            BufferedImage.TYPE_BYTE_INDEXED, palette)
          dot.setRGB(0, 0, cmap(gray(docId)))
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

    /** 8×8 average-hash of a decoded frame, integer-exact: cell
      * (bx, by) averages the pixels with bx = x·8 div w, by = y·8 div
      * h (integer floor division — each average is exact here because
      * synthesis blocks coincide with hash cells; on real media the
      * floor-average is the standard aHash), the mean is the floor
      * average of the 64 cell values, and bit p = by·8 + bx is set
      * iff its cell exceeds the mean. Packed as two unsigned 32-bit
      * halves (bits 0–31 → lo, 32–63 → hi) so the DuckDB replay never
      * meets a signed-64 shift overflow. */
    def aHash(img: BufferedImage): (Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      val sum = new Array[Long](64); val cnt = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = y * 8 / h
        var x = 0
        while (x < w) {
          val p = by * 8 + x * 8 / w
          sum(p) += intensity(img.getRGB(x, y)); cnt(p) += 1
          x += 1
        }
        y += 1
      }
      val avg = Array.tabulate(64)(i => sum(i) / cnt(i))
      val mean = avg.sum / 64
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 64) {
        if (avg(i) > mean) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      (hi, lo)
    }

    /** The audio SPECTRAL FINGERPRINT over decoded PCM — the coarse
      * per-window energy signature the round-16 verdict named as the
      * audio family's missing half (the Chromaprint/Shazam shape
      * collapsed to its integer-exact core): the sample stream splits
      * into [[PcmWindows]] time windows (window of sample i =
      * ⌊i·W/n⌋), each window's FLOOR-MEAN sample value quantizes to
      * [[PcmQuant]]-wide levels (6 bits for 16-bit PCM), and the 8
      * levels pack little-endian into one BIGINT. Integer-exact end
      * to end: this corpus's synthesized samples are non-negative, so
      * JVM truncating division ≡ DuckDB floor division and the oracle
      * replays the fingerprint from the synthesis contract by pure
      * arithmetic — while the Spark side only gets it by decoding the
      * RIFF container and reading every PCM sample. */
    val PcmWindows = 8
    val PcmQuant = 512
    def pcmSig(samples: Array[Int]): Long = {
      val n = samples.length
      val sums = new Array[Long](PcmWindows)
      val cnts = new Array[Long](PcmWindows)
      var i = 0
      while (i < n) {
        val w = (i.toLong * PcmWindows / n).toInt
        sums(w) += samples(i); cnts(w) += 1
        i += 1
      }
      var sig = 0L; var w = 0
      while (w < PcmWindows) {
        val mu = if (cnts(w) == 0) 0L else sums(w) / cnts(w)
        sig |= (mu / PcmQuant) << (6 * w)
        w += 1
      }
      sig
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
        try {
          val n = in.getFrameLength.toInt
          // decoded PCM: 16-bit little-endian mono, per the parsed
          // format — the fingerprint reads every sample
          val bytes = in.readAllBytes()
          require(bytes.length >= 2 * n,
            s"short PCM read doc_id=${r.doc_id}")
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) = ((bytes(2 * i + 1) << 8) |
              (bytes(2 * i) & 0xFF)).toShort.toInt
            i += 1
          }
          MediaFeatures(r.doc_id, r.media_type, 0, 0, n,
            -1, -1, -1L, -1L, pcmSig(samples))
        } finally in.close()
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
                      nFrames: Int): MediaFeatures = {
      val (hi, lo) = aHash(img)
      MediaFeatures(r.doc_id, r.media_type, img.getWidth, img.getHeight,
        nFrames, intensity(img.getRGB(0, 0)),
        intensity(img.getRGB(img.getWidth - 1, img.getHeight - 1)), hi, lo,
        -1L)
    }
  }

  /** Synthesize the media table: real encoded payloads, media type
    * round-robin by doc_id. Encoding runs distributed (mapPartitions)
    * — the driver never holds the corpus. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] =
    mediaTableOf(s, Tables.documents(s, d))

  /** [[mediaTable]] over an explicit document slice — the incremental
    * ingest's entry point (encode/decode ONLY the arriving batch). */
  private def mediaTableOf(s: SparkSession,
                           docs: DataFrame): Dataset[MediaRow] = {
    import s.implicits._
    docs
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

  // ---------------------------------------------------------------
  // Incremental media ingest: the ∝-batch append path for the
  // features store (the dedup_incremental / bm25_incremental pattern
  // applied to media) — a new media batch decodes and appends its own
  // delta segment; the landed base is NEVER re-decoded. The gated
  // union must hash-equal the full-store replay.
  // ---------------------------------------------------------------

  /** Every MediaIncrEvery-th doc (doc_id % 10 == 7) plays the
    * ARRIVING media batch — the suite's split convention. */
  val MediaIncrEvery = 10L
  val MediaIncrSlot  = 7L

  private val mediaSegStores =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private val mediaSegIds = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Build counter — exposed so MultimodalSpec can pin build-once. */
  private[graft] val mediaSegBuildCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Land the (base, delta) feature segments: base = yesterday's
    * store — a LANDED artifact, so it derives from the existing
    * features store by a narrow filter (no second corpus decode; in
    * production it simply already exists on disk); delta DECODES only
    * the batch — the one codec pass the append actually pays, so
    * ingest is priced ∝ batch (at 100 TB: the nightly media drop
    * decodes overnight's uploads, never the archived petabytes). */
  private def mediaSegRoots(s: SparkSession, d: String): (String, String) =
    mediaSegStores.computeIfAbsent(d, _ => {
      mediaSegBuildCount.incrementAndGet()
      val n = mediaSegIds.getAndIncrement()
      val baseOut = graft.Scratch.processScoped("graft_mediab", s"b$n").toString
      featuresTable(s, d)
        .filter(col("doc_id") % MediaIncrEvery =!= MediaIncrSlot)
        .write.mode("overwrite").parquet(baseOut)
      val deltaOut = graft.Scratch.processScoped("graft_mediad", s"d$n").toString
      extractFeatures(mediaTableOf(s, Tables.documents(s, d)
          .filter(col("doc_id") % MediaIncrEvery === MediaIncrSlot)))
        .toDF().write.mode("overwrite").parquet(deltaOut)
      (baseOut, deltaOut)
    })

  /** The landed delta segment as a fresh read — exposed so the spec
    * can pin |delta| = |batch|. */
  private[graft] def mediaDeltaSegment(s: SparkSession, d: String): DataFrame =
    s.read.parquet(mediaSegRoots(s, d)._2)
  /** The landed base segment as a fresh read — exposed so the spec
    * can pin the batch never reaches the base decode. */
  private[graft] def mediaBaseSegment(s: SparkSession, d: String): DataFrame =
    s.read.parquet(mediaSegRoots(s, d)._1)

  /** INCREMENTAL features — base ∪ delta, read as landed segments:
    * must hash-equal the full-store replay (the oracle IS
    * multimodal_features' arithmetic), so a dropped batch row, a
    * double-decoded doc, or a drifted codec between the build paths
    * hash-fails. */
  def multimodalFeaturesIncremental(s: SparkSession, d: String): DataFrame = {
    val (baseRoot, deltaRoot) = mediaSegRoots(s, d)
    Present.sortedUnbounded(
      s.read.parquet(baseRoot).unionByName(s.read.parquet(deltaRoot)),
      col("doc_id"))
  }

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
  def mediaDedup(s: SparkSession, d: String): DataFrame =
    dedupOver(featuresTable(s, d))

  /** The dedup rule over an arbitrary features relation — shared by
    * the full, masked (delete), and purged (delete-compact) forms so
    * the three can never drift. */
  private def dedupOver(feats: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(
      "media_type", "width", "height", "n_frames", "px00", "px_corner")
    feats
      .withColumn("dup_of", min("doc_id").over(w))
      .filter(col("doc_id") =!= col("dup_of"))
      .select("doc_id", "media_type", "dup_of")
      .transform(Present.sortedUnbounded(_, col("doc_id")))
  }

  // ---------------------------------------------------------------
  // Media delete lifecycle: the REMOVE verb for the features store
  // (the index-family tombstone contract applied to media). A
  // takedown lands a ∝-batch tombstone sidecar; probes mask by a
  // broadcast anti-join; compaction purges the store. At 100 TB a
  // media takedown must neither re-decode the archive nor rewrite it
  // synchronously — the mask is immediate, the purge is the next
  // scheduled compaction's rewrite (priced ∝ store, off-peak, no
  // codec pass: the purge reads SIGNATURES, never payloads).
  // ---------------------------------------------------------------

  /** Every MediaDelEvery-th doc (doc_id % 10 == 3) plays the deleted
    * batch — disjoint from the incremental slot (7), so lifecycle
    * queries compose without aliasing. */
  val MediaDelEvery = 10L
  val MediaDelSlot  = 3L

  private val mediaTombStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val mediaTombIds = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Build counter — exposed so MultimodalSpec can pin build-once. */
  private[graft] val mediaTombBuildCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Landed tombstone sidecar: the deleted doc_ids ONLY, derived
    * index-locally from the features store's narrow id column (a real
    * takedown arrives as an id list; deriving it here keeps the
    * rehearsal deterministic). ∝ batch by construction. */
  private[graft] def mediaTombStore(s: SparkSession, d: String): DataFrame = {
    val path = mediaTombStores.computeIfAbsent(d, _ => {
      mediaTombBuildCount.incrementAndGet()
      val out = graft.Scratch.processScoped("graft_mediatomb",
        s"t${mediaTombIds.getAndIncrement()}").toString
      featuresTable(s, d)
        .filter(col("doc_id") % MediaDelEvery === MediaDelSlot)
        .select("doc_id")
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  private val mediaPurgeStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val mediaPurgeIds = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Build counter — exposed so MultimodalSpec can pin build-once. */
  private[graft] val mediaPurgeBuildCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** The purged single segment: the features store rewritten minus
    * the tombstoned docs — signatures only, NO codec pass (the store
    * already decoded them once), the compaction that turns the
    * probe-time mask into a storage saving. */
  private[graft] def mediaPurgedSegment(s: SparkSession, d: String)
      : DataFrame = {
    val path = mediaPurgeStores.computeIfAbsent(d, _ => {
      mediaPurgeBuildCount.incrementAndGet()
      val out = graft.Scratch.processScoped("graft_mediapurge",
        s"p${mediaPurgeIds.getAndIncrement()}").toString
      featuresTable(s, d)
        .join(broadcast(mediaTombStore(s, d)), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** MASKED media dedup (the delete's probe half): the dedup decision
    * AFTER a takedown — deleted docs neither survive nor anchor any
    * class, so a class whose keep-first survivor was deleted
    * re-anchors to its next-lowest member (what a takedown must do to
    * the dedup decision — the semdedup_delete contract). Mask = one
    * broadcast anti-join of the ∝-batch tombstone sidecar against the
    * store's narrow signature columns; payloads are never touched. */
  def mediaDelete(s: SparkSession, d: String): DataFrame =
    dedupOver(featuresTable(s, d)
      .join(broadcast(mediaTombStore(s, d)), Seq("doc_id"), "left_anti"))

  /** PURGED media dedup (the delete's compaction half): the same
    * answer computed from the purged single segment alone — no
    * tombstone read, no mask, the post-compaction steady state.
    * Answer-identical to [[mediaDelete]] by construction; both gate
    * against the one oracle that replays the rule over the
    * survivors. */
  def mediaDeleteCompact(s: SparkSession, d: String): DataFrame =
    dedupOver(mediaPurgedSegment(s, d))

  /** Image pairs whose 64-bit average-hashes differ in at most this
    * many bits. */
  val HamEps = 2
  /** Hamming LSH bands — [[HamEps]] + 1, the pigeonhole bound: a pair
    * within ε differing bits has at least one band with ZERO differing
    * bits, so band-equality candidate generation is EXHAUSTIVE (the
    * spec pins bands > ε). */
  val HamBands = HamEps + 1

  /** The three band values of an (ahash_hi, ahash_lo) pair — 64 bits
    * split 22/22/20 (bit p = by·8+bx; lo holds 0–31, hi 32–63). One
    * definition shared by the image and video candidate joins. */
  private def hashBands(hi: org.apache.spark.sql.Column,
                        lo: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array(
      lo.bitwiseAND(lit(0x3FFFFFL)),                               // 0–21
      shiftright(lo, 22).bitwiseOR(
        shiftleft(hi.bitwiseAND(lit(0xFFFL)), 10)),                // 22–43
      shiftright(hi, 12))                                          // 44–63

  /** Exact Hamming distance between two landed hashes. */
  private def hamming(hiA: org.apache.spark.sql.Column,
                      loA: org.apache.spark.sql.Column,
                      hiB: org.apache.spark.sql.Column,
                      loB: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB))

  /** Perceptual near-dup over the DECODED key frame's 8×8
    * average-hash — the published pHash-pipeline shape (LAION / CC
    * image dedup): pairs of images whose 64-bit aHashes are within
    * [[HamEps]] Hamming bits. Candidates come from BAND EQUALITY —
    * each hash splits into [[HamBands]] = ε+1 disjoint bands, and by
    * pigeonhole a qualifying pair matches exactly in at least one
    * band, so the equality self-join on (band, value) is exhaustive
    * while nothing quadratic exists (candidates are bounded by band-
    * bucket occupancy — the MinHash-LSH band pattern applied to
    * Hamming space). The exact distance check runs only on
    * candidates; the hashes come from the landed features store
    * (decode-once, binaries never re-read). The oracle replays the
    * synthesis arithmetic through the naive ground-truth self-join,
    * so a band split that dropped a qualifying pair hash-fails. */
  /** Band-exploded image hashes of a features relation, columns
    * tagged — one definition shared by the full self-join and the
    * incremental delta-vs-all probe. */
  private def bandedOf(feats: DataFrame, tag: String): DataFrame =
    feats.filter(col("media_type") === "image")
      .select(
        col("doc_id").as(s"doc_$tag"),
        col("ahash_hi").as(s"hi_$tag"), col("ahash_lo").as(s"lo_$tag"),
        posexplode(hashBands(col("ahash_hi"), col("ahash_lo")))
          .as(Seq("band", "bv")))

  def mediaNearDup(s: SparkSession, d: String): DataFrame =
    nearDupOver(featuresTable(s, d))

  /** The banded-Hamming rule over an arbitrary features relation —
    * ONE definition shared by the gated query and the
    * signature-diverse rehearsal twin, so the rehearsal measures the
    * exact plan the gate pins. */
  private[graft] def nearDupOver(img: DataFrame): DataFrame =
    bandedOf(img, "a").join(bandedOf(img, "b"), Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming(col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
          .as("hamming"))
      .filter(col("hamming") <= HamEps)
      // a pair can match in several bands — one row per pair
      .groupBy("doc_a", "doc_b").agg(max("hamming").as("hamming"))
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))

  // ---------------------------------------------------------------
  // Signature-diverse rehearsal twin (round 17): the gate synthesis
  // caps the decoded-signature space at 1280 classes (the oracle
  // must replay the arithmetic), which makes TRUE near-dup pairs
  // grow ∝ corpus² on ANY staged multiple — so the banded plan's
  // corpus-LINEARITY claim on realistic hash diversity stood on
  // argument alone. This twin keeps the decode path and the banded
  // plan IDENTICAL and swaps only the image synthesis: splitmix64
  // cell patterns (≈64-bit-diverse aHashes) with a ~1.6% planted
  // duplicate-class rate — rare duplicates over a diverse sea, the
  // real crawl shape. Rehearsal-only: not a gated query (the mixer
  // has no reason to be replayed by DuckDB — RehearsalSpec pins
  // diversity + exact planted recovery instead).
  // ---------------------------------------------------------------

  /** [[mediaTableOf]] with images routed through the diverse
    * synthesis; audio/video unchanged (their rungs have their own
    * content signatures). */
  private def mediaTableDiverseOf(s: SparkSession,
                                  docs: DataFrame): Dataset[MediaRow] = {
    import s.implicits._
    docs
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, n) =>
          (id % 3) match {
            case 0 => MediaRow(id, "image", Codec.encodePngDiverse(id, n))
            case 1 => MediaRow(id, "audio", Codec.encodeWav(id, n))
            case _ => MediaRow(id, "video", Codec.encodeVideo(id, n))
          }
        }
      }
  }

  private val divFeatureStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val divStoreIds = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Build counter — exposed so RehearsalSpec can pin build-once. */
  private[graft] val divFeatureBuildCount =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Landed features store for the DIVERSE corpus — the same genuine
    * decode ([[extractFeatures]] — real PNG parse, real pixel reads)
    * over the diverse payloads. */
  def featuresTableDiverse(s: SparkSession, d: String): DataFrame = {
    val path = divFeatureStores.computeIfAbsent(d, _ => {
      divFeatureBuildCount.incrementAndGet()
      val out = graft.Scratch.processScoped("graft_mediastore_div",
        s"m${divStoreIds.getAndIncrement()}").toString
      extractFeatures(mediaTableDiverseOf(s, Tables.documents(s, d))).toDF()
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** The banded near-dup over the diverse store — the rehearsal's
    * measured query (same rule, same plan as the gated
    * [[mediaNearDup]]). */
  def mediaNearDupDiverse(s: SparkSession, d: String): DataFrame =
    nearDupOver(featuresTableDiverse(s, d))

  /** INCREMENTAL banded near-dup — the arriving batch's probe (the
    * dedup_incremental contract applied to the perceptual-hash
    * family): only pairs TOUCHING a batch member are the answer, and
    * only the batch's bands drive the candidate join — one side of
    * the band join is the ∝-batch delta segment, the other the landed
    * base ∪ delta hash index (narrow signature columns; neither side
    * re-decodes a payload — both are landed-segment reads, see
    * [[mediaSegRoots]]). Exhaustive by the same pigeonhole: a
    * qualifying pair with a batch member matches in ≥ 1 band, and
    * that band's (value) row exists on both sides. Defined ≡ the full
    * [[mediaNearDup]] restricted to batch-touching pairs, so the
    * oracle is the naive ground truth + one filter — a dropped
    * cross-segment pair hash-fails. */
  def mediaNearDupIncremental(s: SparkSession, d: String): DataFrame = {
    val all = mediaBaseSegment(s, d).unionByName(mediaDeltaSegment(s, d))
    bandedOf(mediaDeltaSegment(s, d), "a")
      .join(bandedOf(all, "b"), Seq("band", "bv"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(
        least(col("doc_a"), col("doc_b")).as("pa"),
        greatest(col("doc_a"), col("doc_b")).as("pb"),
        hamming(col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
          .as("hamming"))
      .filter(col("hamming") <= HamEps)
      .groupBy(col("pa").as("doc_a"), col("pb").as("doc_b"))
      .agg(max("hamming").as("hamming"))
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))
  }

  /** Audio near-dup tolerance (decoded sample counts) and its
    * candidate-bucket width — width > ε makes own+adjacent buckets
    * exhaustive. */
  val AudioEps = 2
  val AudioBucket = 8

  /** Audio near-dup: pairs whose DECODED sample counts differ by at
    * most [[AudioEps]] — the duration-fingerprint rung of the media
    * family, the cheap prefilter a real pipeline runs before the
    * content rung ([[mediaNearDupAudioSpectral]] below — the
    * decoded-PCM spectral fingerprint, r17). Bucket-local candidate
    * join (own + both adjacent buckets, width > ε ⇒ exhaustive);
    * signatures from the landed store, never a payload re-read. */
  def mediaNearDupAudio(s: SparkSession, d: String): DataFrame = {
    val au = featuresTable(s, d)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("n_frames").as("samples"))
    val a = au.select(col("doc_id").as("doc_a"), col("samples").as("s_a"),
      expr(s"samples div $AudioBucket").as("bk"))
    val b = au.select(col("doc_id").as("doc_b"), col("samples").as("s_b"),
      explode(array(expr(s"samples div $AudioBucket") - 1,
        expr(s"samples div $AudioBucket"),
        expr(s"samples div $AudioBucket") + 1)).as("bk"))
    a.join(b, Seq("bk"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("s_a") - col("s_b")) <= AudioEps)
      .select("doc_a", "doc_b", "s_a", "s_b")
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))
  }

  /** Duration tolerance for the SPECTRAL audio rung — deliberately
    * wider than [[AudioEps]]: the content fingerprint is what makes a
    * looser duration window safe, so this rung finds pairs the
    * duration-only rung cannot reach (Δsamples ∈ (AudioEps,
    * AudioSpecEps] with matching spectra) while rejecting the
    * same-duration different-content pairs it cannot exclude. */
  val AudioSpecEps = 16
  /** Duration bucket width for the spectral candidate join — > ε so
    * own+adjacent buckets are exhaustive. */
  val AudioSpecBucket = 32

  /** CONTENT-based audio near-dup — the real-fingerprint upgrade the
    * duration rung's scaladoc promised: pairs whose decoded-PCM
    * spectral fingerprints ([[Codec.pcmSig]] — banded per-window
    * energy means, landed in the features store) are EQUAL and whose
    * durations sit within [[AudioSpecEps]] samples. The candidate
    * join is bucket-local twice over: fingerprint equality is the
    * primary bucket (content diversity makes these tiny) and the
    * own+adjacent duration bucket bounds the time axis — nothing
    * quadratic at any corpus size. Signatures from the landed store,
    * payloads never re-read; the oracle replays fingerprint +
    * proximity as the naive ground-truth self-join over the synthesis
    * arithmetic. */
  def mediaNearDupAudioSpectral(s: SparkSession, d: String): DataFrame = {
    val au = featuresTable(s, d)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("n_frames").as("samples"), col("pcm_sig"))
    val a = au.select(col("doc_id").as("doc_a"), col("samples").as("s_a"),
      col("pcm_sig"), expr(s"samples div $AudioSpecBucket").as("bk"))
    val b = au.select(col("doc_id").as("doc_b"), col("samples").as("s_b"),
      col("pcm_sig"),
      explode(array(expr(s"samples div $AudioSpecBucket") - 1,
        expr(s"samples div $AudioSpecBucket"),
        expr(s"samples div $AudioSpecBucket") + 1)).as("bk"))
    a.join(b, Seq("pcm_sig", "bk"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("s_a") - col("s_b")) <= AudioSpecEps)
      .select("doc_a", "doc_b", "pcm_sig", "s_a", "s_b")
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))
  }

  /** Video near-dup tolerance (decoded frame counts) and its bucket
    * width. */
  val FrameEps = 8
  val FrameBucket = 16

  /** Video near-dup: pairs with the SAME key-frame average-hash whose
    * DECODED frame counts differ by at most [[FrameEps]] — the
    * key-frame + duration signature (a trimmed/re-encoded copy keeps
    * the key frame and shifts the frame count a little; full
    * frame-sequence signatures land in the same frame). Candidates
    * join on (hash, frame-bucket) equality with the own+adjacent
    * probe — bucket width > ε keeps it exhaustive, and the hash
    * equality makes buckets tiny. Signatures from the landed store. */
  def mediaNearDupVideo(s: SparkSession, d: String): DataFrame = {
    val vid = featuresTable(s, d)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("n_frames"))
    val a = vid.select(col("doc_id").as("doc_a"), col("ahash_hi"),
      col("ahash_lo"), col("n_frames").as("f_a"),
      expr(s"n_frames div $FrameBucket").as("bk"))
    val b = vid.select(col("doc_id").as("doc_b"), col("ahash_hi"),
      col("ahash_lo"), col("n_frames").as("f_b"),
      explode(array(expr(s"n_frames div $FrameBucket") - 1,
        expr(s"n_frames div $FrameBucket"),
        expr(s"n_frames div $FrameBucket") + 1)).as("bk"))
    a.join(b, Seq("ahash_hi", "ahash_lo", "bk"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("f_a") - col("f_b")) <= FrameEps)
      .select("doc_a", "doc_b", "f_a", "f_b")
      .transform(Present.sortedUnbounded(_, col("doc_a"), col("doc_b")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> multimodalFeatures _,
    "multimodal_features_incremental" -> multimodalFeaturesIncremental _,
    "multimodal_resize"   -> multimodalResize _,
    "multimodal_frames"   -> multimodalFrames _,
    "media_dedup"         -> mediaDedup _,
    "media_delete"        -> mediaDelete _,
    "media_delete_compact" -> mediaDeleteCompact _,
    "media_neardup"       -> mediaNearDup _,
    "media_neardup_incremental" -> mediaNearDupIncremental _,
    "media_neardup_audio" -> mediaNearDupAudio _,
    "media_neardup_audio_spectral" -> mediaNearDupAudioSpectral _,
    "media_neardup_video" -> mediaNearDupVideo _,
  )

  /** The aHash replay CTEs (`cells` → `hmean` → `hb`) over an `m`
    * relation carrying (doc_id, n) — the ONE arithmetic twin of
    * [[Codec.cellGray]] + [[Codec.aHash]], shared by every
    * hash-consuming oracle so the bit layout cannot drift. */
  private def ahashCtesSql: String =
    """cells AS (
      |  SELECT m.doc_id, byy.by, bxx.bx,
      |    ((m.doc_id % 256) + (31 + m.n % 5) * bxx.bx + 17 * byy.by) % 256
      |      AS cv
      |  FROM m, unnest(range(0, 8)) AS byy(by),
      |    unnest(range(0, 8)) AS bxx(bx)),
      |hmean AS (SELECT doc_id, sum(cv) // 64 AS mean
      |          FROM cells GROUP BY 1),
      |hb AS (
      |  SELECT c.doc_id,
      |    CAST(sum(CASE WHEN c.cv > h.mean AND c.by * 8 + c.bx >= 32
      |      THEN (1::BIGINT << (c.by * 8 + c.bx - 32)) ELSE 0 END)
      |      AS BIGINT) AS ahash_hi,
      |    CAST(sum(CASE WHEN c.cv > h.mean AND c.by * 8 + c.bx < 32
      |      THEN (1::BIGINT << (c.by * 8 + c.bx)) ELSE 0 END)
      |      AS BIGINT) AS ahash_lo
      |  FROM cells c JOIN hmean h USING (doc_id) GROUP BY 1)""".stripMargin

  /** The PCM spectral-fingerprint replay CTEs (`au` → `pw` → `pmu` →
    * `psig`) over the synthesis contract — the ONE arithmetic twin of
    * [[Codec.pcmSig]] (sample i of audio doc = (doc_id + i) mod
    * 32768, all non-negative, so `//` here ≡ the JVM's truncating
    * division there), shared by every fingerprint-consuming oracle so
    * the window/quantization layout cannot drift. */
  private def pcmSigCtesSql: String =
    s"""au AS (SELECT doc_id, (n_chars % 1000 + 1)::INT AS n
       |       FROM documents WHERE doc_id % 3 = 1),
       |pw AS (
       |  SELECT doc_id, (i * ${Codec.PcmWindows}) // n AS w,
       |    (doc_id + i) % 32768 AS sv
       |  FROM au, unnest(range(0, n)) AS r(i)),
       |pmu AS (SELECT doc_id, w, sum(sv) // count(*) AS mu
       |        FROM pw GROUP BY 1, 2),
       |psig AS (
       |  SELECT doc_id,
       |    CAST(sum((mu // ${Codec.PcmQuant}) << (6 * w)) AS BIGINT)
       |      AS pcm_sig
       |  FROM pmu GROUP BY 1)""".stripMargin

  /** The full features replay — ONE builder for the store query and
    * its incremental (base ∪ delta) twin, whose contract is exactly
    * "hash-equals the full replay". */
  private def featuresOracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
       |    n_chars AS n
       |  FROM documents),
       |$ahashCtesSql,
       |$pcmSigCtesSql
       |SELECT m.doc_id, media_type,
       |  CASE WHEN media_type = 'audio' THEN 0
       |    ELSE (n % 64 + 16)::INT END AS width,
       |  CASE WHEN media_type = 'audio' THEN 0
       |    ELSE (n % 48 + 16)::INT END AS height,
       |  CASE media_type WHEN 'image' THEN 1
       |    WHEN 'audio' THEN (n % 1000 + 1)::INT
       |    ELSE (n % 240 + 1)::INT END AS n_frames,
       |  CASE WHEN media_type = 'audio' THEN -1
       |    ELSE (m.doc_id % 256)::INT END AS px00,
       |  CASE WHEN media_type = 'audio' THEN -1
       |    ELSE ((m.doc_id % 256 + 7 * (31 + n % 5) + 119) % 256)::INT
       |    END AS px_corner,
       |  CASE WHEN media_type = 'audio' THEN -1
       |    ELSE hb.ahash_hi END AS ahash_hi,
       |  CASE WHEN media_type = 'audio' THEN -1
       |    ELSE hb.ahash_lo END AS ahash_lo,
       |  CASE WHEN media_type = 'audio' THEN ps.pcm_sig
       |    ELSE -1 END AS pcm_sig
       |FROM m LEFT JOIN hb ON m.doc_id = hb.doc_id
       |LEFT JOIN psig ps ON m.doc_id = ps.doc_id
       |ORDER BY m.doc_id""".stripMargin

  /** The media_dedup rule replayed from the synthesis arithmetic —
    * `where` restricts the document domain ("" = the full corpus; the
    * delete lifecycle passes the survivor predicate). One builder so
    * the full, masked, and purged forms share the signature fields
    * and the keep-first window verbatim. */
  private def mediaDedupOracleSql(where: String): String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
       |    n_chars AS n
       |  FROM documents $where),
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
       |      ELSE ((doc_id % 256 + 7 * (31 + n % 5) + 119) % 256)::INT
       |      END AS px_corner
       |  FROM m),
       |dd AS (
       |  SELECT doc_id, media_type, min(doc_id) OVER (
       |    PARTITION BY media_type, width, height, n_frames,
       |      px00, px_corner) AS dup_of
       |  FROM sig)
       |SELECT doc_id, media_type, dup_of FROM dd
       |WHERE doc_id <> dup_of ORDER BY doc_id""".stripMargin

  /** The oracle replicates the synthesis arithmetic from
    * (`doc_id`, `n_chars`); Spark only recovers these values by
    * decoding the PNG/WAV/GIF payloads. */
  val oracle: Map[String, String] = Map(
    "multimodal_features" -> featuresOracleSql,
    // incremental ingest must be INVISIBLE in the answer: base ∪
    // delta ≡ the full store, so the oracle is the same full replay —
    // a dropped batch row, a double-decode, or a codec drift between
    // the two build paths hash-fails
    "multimodal_features_incremental" -> featuresOracleSql,
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
    "media_dedup" -> mediaDedupOracleSql(""),
    // the delete lifecycle's one oracle: the rule replayed over the
    // SURVIVORS — a mask leak (deleted doc surviving or anchoring) or
    // a purge that dropped a survivor hash-fails; mask and purge are
    // answer-identical so they share it
    "media_delete" ->
      mediaDedupOracleSql(s"WHERE doc_id % $MediaDelEvery <> $MediaDelSlot"),
    "media_delete_compact" ->
      mediaDedupOracleSql(s"WHERE doc_id % $MediaDelEvery <> $MediaDelSlot"),
    // the GROUND-TRUTH naive Hamming self-join over the arithmetic-
    // replayed hashes: the Spark side's banded candidate form is
    // defined equal to it, so a band split that dropped a qualifying
    // pair hash-fails
    "media_neardup" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars AS n FROM documents
         |  WHERE doc_id % 3 = 0),
         |$ahashCtesSql
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  (bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |   bit_count(xor(a.ahash_lo, b.ahash_lo)))::INT AS hamming
         |FROM hb a JOIN hb b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |      bit_count(xor(a.ahash_lo, b.ahash_lo)) <= $HamEps
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the incremental probe is DEFINED ≡ the full answer restricted
    // to batch-touching pairs: same naive ground truth + one filter —
    // a dropped cross-segment (batch × base) pair hash-fails
    "media_neardup_incremental" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars AS n FROM documents
         |  WHERE doc_id % 3 = 0),
         |$ahashCtesSql
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  (bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |   bit_count(xor(a.ahash_lo, b.ahash_lo)))::INT AS hamming
         |FROM hb a JOIN hb b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |      bit_count(xor(a.ahash_lo, b.ahash_lo)) <= $HamEps
         |  AND (a.doc_id % $MediaIncrEvery = $MediaIncrSlot
         |       OR b.doc_id % $MediaIncrEvery = $MediaIncrSlot)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // naive ground truth over the decoded-sample-count arithmetic
    "media_neardup_audio" ->
      s"""WITH au AS (
         |  SELECT doc_id, (n_chars % 1000 + 1)::INT AS s
         |  FROM documents WHERE doc_id % 3 = 1)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.s AS s_a, b.s AS s_b
         |FROM au a JOIN au b
         |  ON a.doc_id < b.doc_id AND abs(a.s - b.s) <= $AudioEps
         |ORDER BY doc_a, doc_b""".stripMargin,
    // naive ground truth over the decoded-PCM fingerprint arithmetic:
    // fingerprint equality + the wider duration window — the content
    // rung the duration-only oracle cannot express
    "media_neardup_audio_spectral" ->
      s"""WITH $pcmSigCtesSql,
         |sa AS (SELECT a.doc_id, a.n, p.pcm_sig
         |       FROM au a JOIN psig p USING (doc_id))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pcm_sig,
         |  a.n AS s_a, b.n AS s_b
         |FROM sa a JOIN sa b ON a.doc_id < b.doc_id
         |  AND a.pcm_sig = b.pcm_sig AND abs(a.n - b.n) <= $AudioSpecEps
         |ORDER BY doc_a, doc_b""".stripMargin,
    // naive ground truth: key-frame hash equality + frame proximity
    "media_neardup_video" ->
      s"""WITH m AS (
         |  SELECT doc_id, n_chars AS n FROM documents
         |  WHERE doc_id % 3 = 2),
         |$ahashCtesSql,
         |v AS (
         |  SELECT m.doc_id, (m.n % 240 + 1)::INT AS f,
         |    hb.ahash_hi, hb.ahash_lo
         |  FROM m JOIN hb ON m.doc_id = hb.doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.f AS f_a, b.f AS f_b
         |FROM v a JOIN v b ON a.doc_id < b.doc_id
         |  AND a.ahash_hi = b.ahash_hi AND a.ahash_lo = b.ahash_lo
         |  AND abs(a.f - b.f) <= $FrameEps
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
