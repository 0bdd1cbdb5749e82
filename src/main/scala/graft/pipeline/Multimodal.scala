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
 * luminance sums without any image library. Only video frame sampling
 * ([[sampleFramesStub]]) remains a clearly-marked deterministic fake:
 * the JDK has no container demuxer, so the stub keeps the real
 * plumbing (bounded per-row explode, per-partition demux init shape)
 * with chunking standing in for decode.
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
        val img =
          if (bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
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
        val img =
          if (bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
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

  /** One sampled frame of a media item. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Sample every `everyN`-th "frame" from each media item — the video
   * frame-sampling shape: one input row explodes to a bounded number of
   * frame rows, processed per partition so a real demuxer opens once.
   *
   * STUB: a real implementation demuxes the container and decodes key
   * frames. The deterministic fake treats content as fixed-size chunks
   * (`frameBytes` each) and keeps chunks 0, everyN, 2·everyN, ...
   */
  def sampleFramesStub(media: DataFrame, everyN: Int, frameBytes: Int = 64)
                      (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    require(everyN > 0 && frameBytes > 0)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by everyN).map { f =>
          val start = f * frameBytes
          Frame(id, f, bytes.slice(start, math.min(start + frameBytes, bytes.length)))
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
