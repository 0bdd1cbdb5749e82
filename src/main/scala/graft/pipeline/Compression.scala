package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Compression-ratio quality signal: `deflate(text).length /
 * text.bytes.length` per document — the CCNet-family heuristic that
 * boilerplate, template spam, and keyword stuffing compress far better
 * than natural prose (ratio ≪ natural-text baseline), while random or
 * encrypted junk barely compresses (ratio ≈ 1). Cheap, language-
 * agnostic, and orthogonal to token-statistics filters.
 *
 * DEFLATE with a fixed level and strategy is a deterministic function
 * of its input bytes — same output on every JVM — so the emitted
 * ratios are stable across runs and executors (pinned by the spec's
 * double-run test). No SQL twin exists (DuckDB has no deflate), so
 * this entry takes the driver's rows-only check plus unit invariants.
 *
 * One `mapPartitions` pass, one `Deflater` per partition (allocation
 * amortized across the partition's rows — the correct use of the
 * imperative escape hatch); no shuffle before the output sort. The
 * numerator/denominator are emitted as exact integers alongside the
 * IEEE-divided ratio so downstream thresholds can cross-multiply.
 */
object Compression {

  /** (id, raw_bytes, deflated_bytes, ratio) per non-empty document. */
  def deflateRatio(df: DataFrame, idCol: String, textCol: String)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows: Dataset[(Long, String)] = df
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    rows.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
      val buf = new Array[Byte](64 * 1024)
      it.map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        deflater.reset()
        deflater.setInput(raw)
        deflater.finish()
        var n = 0L
        while (!deflater.finished()) n += deflater.deflate(buf)
        (id, raw.length.toLong, n)
      }
    }.toDF("id", "raw_bytes", "deflated_bytes")
      .withColumn("ratio",
        col("deflated_bytes").cast("double") / col("raw_bytes"))
  }
}
