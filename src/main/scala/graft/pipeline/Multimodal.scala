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
 * Decoding: this container has no image/audio codecs, so [[decodeStub]]
 * is a clearly-marked deterministic FAKE (byte histogram as "features").
 * The Spark-side plumbing — schema, per-partition batched iteration,
 * feature vector shape — is real and tested; swapping in a real codec
 * changes only the marked function body.
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

  /** Feature-vector row produced by the decode stage. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Double])

  /**
   * "Decode" each media item into a fixed-size feature vector with
   * per-partition batched iteration (the real-codec shape: open codec once
   * per partition, stream items through it).
   *
   * STUB: a real implementation would decode image/audio bytes here
   * (e.g. JPEG → pixels → embedding). The deterministic fake is a
   * 16-bin byte histogram, normalized — stable across runs and partitions.
   */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows: Iterator[Row] =>
      // per-partition setup happens HERE in a real codec (decoder init)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        // --- begin deterministic fake decode ---
        val hist = new Array[Double](16)
        bytes.foreach(b => hist((b & 0xFF) >> 4) += 1.0)
        val n = math.max(bytes.length, 1)
        // --- end fake decode ---
        MediaFeatures(id, bytes.length.toLong, hist.map(_ / n))
      }
    }
  }

  /** Resized-media row: metadata updated, content re-encoded. */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          content: Array[Byte])

  /**
   * "Resize" each media item to target dimensions, per-partition batched.
   *
   * STUB: a real implementation decodes, resamples, and re-encodes here.
   * The deterministic fake truncates/pads content proportionally to the
   * area ratio — stable, and it preserves the real pipeline property that
   * output size tracks target dimensions.
   */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int)
                (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](contentIdx)).getOrElse(Array.emptyByteArray)
        val meta = r.getStruct(metaIdx)
        val (w, h) = (meta.getInt(1), meta.getInt(2))
        // --- begin deterministic fake resize ---
        // empty/null content stays empty (a zero-byte media row must not
        // fail the job — index math below assumes non-empty bytes)
        val out =
          if (bytes.isEmpty) Array.emptyByteArray
          else {
            val ratio = (targetW.toLong * targetH).toDouble / math.max(w.toLong * h, 1)
            val newLen = math.max(1, math.min((bytes.length * ratio).toInt, bytes.length * 4))
            Array.tabulate[Byte](newLen)(i => bytes(i % bytes.length))
          }
        // --- end fake resize ---
        ResizedMedia(r.getLong(idIdx), targetW, targetH, out)
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

  /** Decode + summarize: feature-vector norms per format — the typical
    * decode → aggregate pipeline shape, one shuffle on the small side. */
  def featureSummary(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val feats = decodeStub(media).toDF()
    feats.join(media.select(col("media_id"), col("meta.format").as("format")), "media_id")
      .select(col("media_id"), col("format"), col("n_bytes"),
        Similarity.dot(col("features"), col("features")).as("feat_sq_norm"))
  }
}
