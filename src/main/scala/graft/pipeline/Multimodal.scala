package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column convention: media travel as opaque `binary` content
 * plus a typed metadata struct — the standard lakehouse layout for
 * image/audio/video corpora at 100 TB (content stays columnar-compressed
 * in parquet; metadata is filterable/prunable without touching bytes).
 *
 *   media: struct<
 *     content  binary,           -- encoded bytes (jpeg/png/wav/...)
 *     meta     struct<format string, width int, height int, size_bytes long>
 *   >
 *
 * Partitioning guidance: content-bearing scans should use
 * `spark.sql.files.maxPartitionBytes` sized so a partition of decoded
 * frames fits executor memory; metadata-only queries prune the content
 * column entirely (verify `ReadSchema` excludes it in `.explain`).
 *
 * Decoding: images are REAL — [[decodeImages]] / [[resizeImages]] run
 * the JDK's own codec stack (`javax.imageio`, pure JVM, headless:
 * PNG/BMP/GIF/JPEG) with per-partition codec init, and
 * [[syntheticImages]] writes genuine PNG bytes whose pixel pattern is a
 * closed form of the id — so a DuckDB oracle can recompute the decoded
 * luminance sums without any image library. Video rides the one
 * multi-frame container the JDK can demux, animated GIF: frame
 * sampling ([[sampleFrames]]) and the video fingerprint
 * ([[videoAHash]]) both run the real `ImageReader` multi-image
 * surface. Formats with no JVM codec (MP4/AVI) need an external
 * demuxer on the executor classpath and are out of scope here — the
 * GIF path pins the exact per-partition reader-init + bounded-explode
 * shape such a demuxer would plug into.
 */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("size_bytes", LongType)))

  /**
   * Wrap a source table into the multimodal convention. Used with the test
   * corpus: document text bytes stand in for encoded media; metadata is
   * derived deterministically.
   */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        concat(lit("fmt"), (col("doc_id") % 3).cast("string")).as("format"),
        (lit(64) + (col("doc_id") % 8) * lit(16)).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * lit(16)).cast("int").as("height"),
        octet_length(col("text").cast("binary")).cast("long").as("size_bytes"))
        .as("meta"))

  /** Metadata-only projection/filter — never reads `content` (column
    * pruning: the parquet scan's ReadSchema excludes the binary). */
  def metaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.size_bytes").as("size_bytes"))
      .filter(col("size_bytes") > 0)

  /** Deterministic luminance of pixel (x, y) in synthetic image `id` — a
    * closed form a SQL oracle can recompute without any image library. */
  @inline private def synthLum(x: Int, y: Int, id: Long): Int =
    (((x + 3L * y + 7L * id) % 256L).toInt + 256) % 256

  /**
   * Write a REAL grayscale PNG per document id: dimensions derive from the
   * id (matching [[fromDocuments]]'s metadata formulas), every pixel's
   * luminance is [[synthLum]]. PNG is lossless, so a decode must
   * reproduce the pattern exactly — that makes full codec round-trips
   * (encode → decode → features, encode → resize → re-decode)
   * oracle-checkable in DuckDB as integer sums over a generate_series
   * grid. Generation is per-partition (`ImageIO` cache off, headless),
   * one encoder per task, narrow over the scan.
   */
  def syntheticImages(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val imgs = docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { d =>
        val w = (64 + (d % 8) * 16).toInt
        val h = (64 + (d % 5) * 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = synthLum(x, y, d)
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (d, bos.toByteArray, w, h)
      }
    }.toDF("media_id", "content", "w", "h")
    imgs.select(col("media_id"), col("content"),
      struct(lit("png").as("format"), col("w").cast("int").as("width"),
        col("h").cast("int").as("height"),
        octet_length(col("content")).cast("long").as("size_bytes")).as("meta"))
  }

  /** Shared decode contract of [[decodeImages]]/[[resizeImages]]/
    * [[imageAHash]]: bytes → BufferedImage, or null for empty/corrupt
    * content. JDK decoders throw RuntimeExceptions (AIOOBE, IAE,
    * NegativeArraySize) on hostile headers, not just IOException — catch
    * NonFatal so a corrupt row flags instead of failing the job. Any
    * codec-hardening fix lands here once, for all three operators. */
  @inline private def decodeOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }

  /** Decoded-image feature row. `ok = false` marks undecodable content
    * (corrupt bytes, unsupported format) — the row survives with zeroed
    * features instead of failing the job, the only sane contract for a
    * 100 TB crawl corpus where some media WILL be broken. */
  case class ImageFeatures(media_id: Long, ok: Boolean, width: Int, height: Int,
                           n_pixels: Long, lum_sum: Long, lum_hist: Array[Long])

  /**
   * REAL image decode via `javax.imageio` (JDK built-in, pure JVM,
   * headless — PNG/BMP/GIF/JPEG): bytes → BufferedImage → features
   * (dimensions, integer luminance sum over the red channel, 16-bin
   * luminance histogram). Per-partition batched iteration: `ImageIO`
   * cache config happens once per task, items stream through. Integer
   * features make the output hash-stable for the DuckDB oracle (no
   * float-sum ordering issues).
   */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        val img = decodeOrNull(bytes)
        if (img == null)
          ImageFeatures(id, ok = false, 0, 0, 0L, 0L, new Array[Long](16))
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Long](16)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val lum = (img.getRGB(x, y) >> 16) & 0xFF
              sum += lum
              hist(lum >> 4) += 1L
              x += 1
            }
            y += 1
          }
          ImageFeatures(id, ok = true, w, h, w.toLong * h, sum, hist)
        }
      }
    }
  }

  /** Resized-media row: real re-encoded content. */
  case class ResizedMedia(media_id: Long, ok: Boolean, width: Int, height: Int,
                          content: Array[Byte])

  /**
   * REAL resize: decode (`javax.imageio`) → nearest-neighbor resample →
   * re-encode as PNG. Nearest neighbor by integer floor
   * (`srcX = x * srcW / targetW`) is bit-deterministic and
   * codec-independent — the resampled pattern of a [[syntheticImages]]
   * input stays a closed form of the id, so the full
   * encode → resize → re-decode round trip is DuckDB-oracle-checkable.
   * Undecodable content passes through as `ok = false` with empty bytes
   * (job survives corrupt media). Per-partition batched like
   * [[decodeImages]].
   */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int)
                  (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        val img = decodeOrNull(bytes)
        if (img == null) ResizedMedia(id, ok = false, 0, 0, Array.emptyByteArray)
        else {
          val (sw, sh) = (img.getWidth, img.getHeight)
          val dst = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * sh / targetH).toInt
            var x = 0
            while (x < targetW) {
              dst.setRGB(x, y, img.getRGB((x.toLong * sw / targetW).toInt, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          ResizedMedia(id, ok = true, targetW, targetH, bos.toByteArray)
        }
      }
    }
  }

  /** Perceptual fingerprint row. */
  case class ImageHash(media_id: Long, ok: Boolean, ahash: Long)

  /** The aHash core shared by [[imageAHash]] (whole image) and
    * [[videoAHash]] (per demuxed frame): nearest-neighbor 8×8 grayscale
    * downsample (red channel, integer-floor resample), bit i set iff
    * pixel i is strictly above the 64-pixel mean — compared by integer
    * cross-multiplication (`lum·64 > Σlum`) so no float rounding. */
  @inline private def ahashOf(img: java.awt.image.BufferedImage): Long = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val lums = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val sx = ((i % 8).toLong * sw / 8).toInt
      val sy = ((i / 8).toLong * sh / 8).toInt
      val lum = (img.getRGB(sx, sy) >> 16) & 0xFF
      lums(i) = lum; sum += lum
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (lums(i).toLong * 64 > sum) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /**
   * 64-bit average-hash (aHash) perceptual fingerprint: decode
   * (`javax.imageio`) → nearest-neighbor 8×8 grayscale downsample (red
   * channel, same integer-floor resample as [[resizeImages]]) → bit i set
   * iff pixel i is strictly above the 64-pixel mean. The comparison uses
   * integer cross-multiplication (`lum·64 > Σlum`) so the hash is
   * bit-deterministic with no float rounding. Byte-identical images get
   * identical hashes; small re-encodes/crops land within a few bits of
   * Hamming distance. Undecodable content → `ok = false`, hash 0.
   */
  def imageAHash(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        val img = decodeOrNull(bytes)
        if (img == null) ImageHash(id, ok = false, 0L)
        else ImageHash(id, ok = true, ahashOf(img))
      }
    }
  }

  /**
   * Perceptual near-duplicate image pairs: [[imageAHash]] signatures fed
   * through the SAME banded Hamming machinery as text SimHash
   * ([[graft.pipeline.Dedup.hammingBandPairs]]) — 4 16-bit bands bucket
   * candidates, popcount verifies `hamming ≤ maxHamming`, `maxBucket`
   * guards degenerate buckets (e.g. a corpus of near-black thumbnails).
   * The decode is the narrow per-partition pass; everything after moves
   * only (media_id, 8-byte hash) — at 100 TB of images the shuffle
   * carries ~16 bytes/row regardless of image size.
   */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 2, bands: Int = 4,
                        maxBucket: Option[Int] = None)
                       (implicit spark: SparkSession): DataFrame = {
    val sig = imageAHash(media).toDF()
      .filter(col("ok")).select(col("media_id"), col("ahash"))
    graft.pipeline.Dedup.hammingBandPairs(sig, "media_id", "ahash",
      maxHamming, bands, maxBucket)
  }

  /** Video fingerprint row. */
  case class VideoHash(media_id: Long, ok: Boolean, n_frames: Int, vhash: Long)

  /**
   * 64-bit video fingerprint: demux the multi-frame container (animated
   * GIF, the JDK-demuxable stand-in for video — same reader pattern as
   * [[sampleFrames]]), compute the [[imageAHash]] core per frame, then
   * majority-vote each bit across frames (the SimHash construction, with
   * frame aHashes as the "features"). Byte-identical videos fingerprint
   * identically; re-encodes or a few changed frames move only the bits
   * whose majority flips. Undecodable / zero-frame content → `ok = false`.
   */
  def videoAHash(media: DataFrame)(implicit spark: SparkSession): Dataset[VideoHash] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        if (bytes.isEmpty) VideoHash(id, ok = false, 0, 0L)
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) VideoHash(id, ok = false, 0, 0L)
            else {
              val reader = readers.next()
              reader.setInput(iis)
              try {
                val n = reader.getNumImages(true)
                if (n == 0) VideoHash(id, ok = false, 0, 0L)
                else {
                  val votes = new Array[Int](64)
                  var f = 0
                  while (f < n) {
                    val fh = ahashOf(reader.read(f))
                    var b = 0
                    while (b < 64) {
                      votes(b) += (if (((fh >>> b) & 1L) == 1L) 1 else -1)
                      b += 1
                    }
                    f += 1
                  }
                  var vhash = 0L
                  var b = 0
                  while (b < 64) {
                    if (votes(b) > 0) vhash |= (1L << b)
                    b += 1
                  }
                  VideoHash(id, ok = true, n, vhash)
                }
              } finally reader.dispose()
            }
          } catch {
            case scala.util.control.NonFatal(_) => VideoHash(id, ok = false, 0, 0L)
          } finally iis.close()
        }
      }
    }
  }

  /** Video near-duplicate pairs — [[videoAHash]] fingerprints through
    * [[graft.pipeline.Dedup.hammingBandPairs]], completing the
    * text/image/audio/video sweep on one banded pair engine. */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int = 2, bands: Int = 4,
                        maxBucket: Option[Int] = None)
                       (implicit spark: SparkSession): DataFrame = {
    val sig = videoAHash(media).toDF()
      .filter(col("ok")).select(col("media_id"), col("vhash"))
    graft.pipeline.Dedup.hammingBandPairs(sig, "media_id", "vhash",
      maxHamming, bands, maxBucket)
  }

  /** Grayscale 256-level palette shared by every synthetic animation
    * frame — an explicit IndexColorModel keeps the GIF encode → decode
    * round trip bit-exact (the encoder never needs to quantize). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Luminance of pixel (x, y) in frame `f` of synthetic animation `id` —
    * closed form, SQL-recomputable like [[synthLum]]. */
  @inline private def synthFrameLum(x: Int, y: Int, f: Int, id: Long): Int =
    (((x + 3L * y + 7L * id + 11L * f) % 256L).toInt + 256) % 256

  /**
   * Write a REAL animated GIF per document id: `2 + id mod 4` full frames
   * of `w`×`h` grayscale, frame `f` pixel luminance =
   * [[synthFrameLum]]. GIF with a 256-gray palette is lossless, so the
   * demux must reproduce every frame's pattern exactly. One encoder per
   * partition (`prepareWriteSequence`/`writeToSequence` — the JDK's own
   * multi-frame writer).
   */
  def syntheticAnimations(docs: DataFrame, w: Int = 32, h: Int = 24)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gifs = docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { d =>
        val nFrames = (2 + (d % 4)).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, synthFrameLum(x, y, f, d))
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        (d, bos.toByteArray)
      }
    }.toDF("media_id", "content")
    gifs.select(col("media_id"), col("content"),
      struct(lit("gif").as("format"), lit(w).cast("int").as("width"),
        lit(h).cast("int").as("height"),
        octet_length(col("content")).cast("long").as("size_bytes")).as("meta"))
  }

  /** Decoded-frame feature row ([[sampleFrames]]). */
  case class FrameFeatures(media_id: Long, frame_idx: Int, n_frames: Int,
                           width: Int, height: Int, lum_sum: Long)

  /**
   * REAL frame sampling: demux a multi-frame container (animated GIF —
   * the JDK's `ImageReader.getNumImages`/`read(i)` surface) and decode
   * every `everyN`-th frame into integer features. One reader per item,
   * per-partition batched; a frame row never materializes frames that
   * were not sampled. Undecodable content contributes zero rows (the
   * corrupt-media contract of [[decodeImages]], flatMap form).
   */
  def sampleFrames(media: DataFrame, everyN: Int)
                  (implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(everyN > 0, "everyN must be positive")
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        if (bytes.isEmpty) Seq.empty
        else {
          // iis closes on EVERY exit — including the no-reader path (the
          // common non-container row) and decoder throws — or each
          // skipped row strands a MemoryCacheImageInputStream
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Seq.empty
            else {
              val reader = readers.next()
              reader.setInput(iis)
              try {
                val n = reader.getNumImages(true)
                (0 until n by everyN).map { f =>
                  val img = reader.read(f)
                  val (w, h) = (img.getWidth, img.getHeight)
                  var sum = 0L
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      sum += (img.getRGB(x, y) >> 16) & 0xFF
                      x += 1
                    }
                    y += 1
                  }
                  FrameFeatures(id, f, n, w, h, sum)
                }
              } finally reader.dispose()
            }
          } catch { case scala.util.control.NonFatal(_) => Seq.empty }
          finally iis.close()
        }
      }
    }
  }

  /** PCM sample `s` of synthetic audio `id` — closed form in
    * [-1001, 1001], well inside 16-bit range; SQL-recomputable. */
  @inline private def synthSample(s: Int, id: Long): Int =
    (((7L * s + 13L * id) % 2003L).toInt) - 1001

  /**
   * Write a REAL mono 16-bit PCM WAV per document id (`javax.sound
   * .sampled`, pure JDK): `1000 + 200·(id mod 5)` samples at 8 kHz,
   * sample values from [[synthSample]]. WAV PCM is lossless — a decode
   * must reproduce every sample exactly, making the audio codec round
   * trip DuckDB-oracle-checkable like the image paths.
   */
  def syntheticAudio(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val wavs = docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      ids.map { d =>
        val n = (1000 + 200 * (d % 5)).toInt
        val pcm = new Array[Byte](n * 2)
        var s = 0
        while (s < n) {
          val v = synthSample(s, d)
          pcm(2 * s) = (v & 0xFF).toByte          // little-endian
          pcm(2 * s + 1) = ((v >> 8) & 0xFF).toByte
          s += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (d, bos.toByteArray)
      }
    }.toDF("media_id", "content")
    wavs.select(col("media_id"), col("content"),
      struct(lit("wav").as("format"), lit(0).cast("int").as("width"),
        lit(0).cast("int").as("height"),
        octet_length(col("content")).cast("long").as("size_bytes")).as("meta"))
  }

  /** Audio fingerprint row. */
  case class AudioHash(media_id: Long, ok: Boolean, ahash: Long)

  /**
   * 64-bit audio fingerprint (energy-delta hash, a Shazam-lite shape):
   * decode PCM (same 16-bit mono contract and byte-order handling as
   * [[decodeAudio]]), split the sample stream into 65 equal windows, set
   * bit i iff window i+1 has strictly higher integer energy (Σ|sample|)
   * than window i. Integer-only comparisons make the fingerprint
   * bit-deterministic; byte-identical audio hashes equal, and
   * level-preserving re-encodes land within a few Hamming bits. Clips
   * shorter than 65 samples (or undecodable/unsupported) flag
   * `ok = false`.
   */
  def audioAHash(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioHash] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val usable = fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!usable) AudioHash(id, ok = false, 0L)
          else {
            val big = fmt.isBigEndian
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            if (n < 65) AudioHash(id, ok = false, 0L)
            else {
              val energy = new Array[Long](65)
              var s = 0
              while (s < n) {
                val b0 = pcm(2 * s)
                val b1 = pcm(2 * s + 1)
                val v = if (big) (b0.toInt << 8) | (b1 & 0xFF) // b0 sign-extends
                        else (b1.toInt << 8) | (b0 & 0xFF)
                energy((s.toLong * 65 / n).toInt) += math.abs(v)
                s += 1
              }
              var hash = 0L
              var i = 0
              while (i < 64) {
                if (energy(i + 1) > energy(i)) hash |= (1L << i)
                i += 1
              }
              AudioHash(id, ok = true, hash)
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => AudioHash(id, ok = false, 0L)
        }
      }
    }
  }

  /**
   * Audio near-duplicate pairs: [[audioAHash]] fingerprints through the
   * same banded Hamming machinery as images and text
   * ([[graft.pipeline.Dedup.hammingBandPairs]]); the shuffle moves
   * (media_id, 8-byte hash) regardless of clip size.
   */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 2, bands: Int = 4,
                        maxBucket: Option[Int] = None)
                       (implicit spark: SparkSession): DataFrame = {
    val sig = audioAHash(media).toDF()
      .filter(col("ok")).select(col("media_id"), col("ahash"))
    graft.pipeline.Dedup.hammingBandPairs(sig, "media_id", "ahash",
      maxHamming, bands, maxBucket)
  }

  /** Decoded-audio feature row. Integer features (sum of |sample|, max
    * |sample|) keep the oracle hash-stable; `ok = false` marks
    * undecodable content, surviving like [[decodeImages]]. */
  case class AudioFeatures(media_id: Long, ok: Boolean, n_samples: Long,
                           sample_rate: Int, abs_sum: Long, max_abs: Int)

  /**
   * REAL audio decode via `javax.sound.sampled` (JDK built-in — WAV/AIFF
   * PCM): bytes → AudioInputStream → per-sample integer features. Reads
   * the format from the container (16-bit signed mono PCM expected;
   * anything else flags `ok = false` rather than mis-parsing). Per-
   * partition batched like the image decoders.
   */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val ok = fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!ok) AudioFeatures(id, ok = false, 0L, 0, 0L, 0)
          else {
            // honor the container's byte order: WAV is little-endian,
            // AIFF big-endian — both decode correctly (assuming LE for a
            // BE stream would silently byte-swap every sample)
            val big = fmt.isBigEndian
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            var sum = 0L
            var maxAbs = 0
            var s = 0
            while (s < n) {
              val b0 = pcm(2 * s)
              val b1 = pcm(2 * s + 1)
              val v =
                if (big) (b0.toInt << 8) | (b1 & 0xFF) // b0 sign-extends
                else (b1.toInt << 8) | (b0 & 0xFF)
              val a = math.abs(v)
              sum += a
              if (a > maxAbs) maxAbs = a
              s += 1
            }
            AudioFeatures(id, ok = true, n.toLong,
              math.round(fmt.getSampleRate), sum, maxAbs)
          }
        } catch {
          // UnsupportedAudioFileException, IOException, and the
          // RuntimeExceptions JDK parsers throw on hostile headers — a
          // corrupt row must flag, never fail the job
          case scala.util.control.NonFatal(_) =>
            AudioFeatures(id, ok = false, 0L, 0, 0L, 0)
        }
      }
    }
  }

  /** Decode + summarize: decoded features joined back to the metadata —
    * the typical decode → enrich pipeline shape, one shuffle on the
    * small side. */
  def featureSummary(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val feats = decodeImages(media).toDF()
    feats.join(media.select(col("media_id"), col("meta.format").as("format")), "media_id")
      .select(col("media_id"), col("format"), col("ok"),
        col("n_pixels"), col("lum_sum"))
  }
}
