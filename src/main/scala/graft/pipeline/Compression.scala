package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /**
   * Self-gated compression report over PLANTED determinism classes —
   * the checkable form of the quality signal (no SQL engine ships
   * deflate, so the deflate math carries its own in-plan invariant).
   * Each document contributes three rows:
   *
   *  - `natural`: the text as-is;
   *  - `boiler`:  its first 40 chars repeated 30× — the template-spam
   *    shape the heuristic exists to catch (ratio ≪ natural);
   *  - `junk`:    a 64-block fixed-width (lpad-16) xxhash64 hex chain
   *    keyed on the id — the ~4 bits/char incompressible end (ratio >
   *    natural prose). Fixed width makes the junk raw length an exact
   *    1024 bytes/doc, SQL-replayable without the hash.
   *
   * The class ordering `boiler < natural < junk` (by aggregate
   * deflated/raw, compared with exact DECIMAL(38) cross-multiplication
   * — no float thresholds) rides the plan as `assert_true`: if DEFLATE
   * ever stops discriminating the planted classes, the entry FAILS
   * instead of emitting unvalidated ratios.
   *
   * Output: one row per class with (n_docs, raw_bytes, ratio_rank) —
   * every column DuckDB-replayable, which is what makes q_compression
   * a hash-checked oracle entry: n_docs and raw_bytes are plain byte
   * arithmetic over the documents table (natural = UTF-8 byte length,
   * boiler = bytes of the 40-char×30 repeat, junk = 1024·n), and
   * ratio_rank is COMPUTED from the actual deflate sums by the same
   * exact cross-multiplication as the gate (1 = compresses best), so
   * the oracle's pinned 1/2/3 constants re-assert the deflate ordering
   * through the hash, independent of the in-plan gate. The deflate
   * sums themselves stay in-plan (gate + rank inputs). Same single
   * narrow mapPartitions pass as [[deflateRatio]].
   */
  def classRatioReport(df: DataFrame, idCol: String, textCol: String)
                      (implicit spark: SparkSession): DataFrame = {
    val d = df
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("did"), col(textCol).as("t"))
    // composite id = doc_id·4 + class index (recovered as id % 4)
    val planted = d.select((col("did") * 4).as("cid"), col("t").as("ct"))
      .union(d.select((col("did") * 4 + 1).as("cid"),
        repeat(substring(col("t"), 1, 40), 30).as("ct")))
      .union(d.select((col("did") * 4 + 2).as("cid"),
        array_join(transform(sequence(lit(1L), lit(64L)),
          i => lpad(hex(xxhash64(col("did"), i)), 16, "0")), "").as("ct")))
    // 3 rows, materialized ONCE — both the gate aggregate and the output
    // read it, and recomputing would run the whole deflate pass twice
    val byClass = deflateRatio(planted, "cid", "ct")
      .groupBy(pmod(col("id"), lit(4L)).as("cls"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_bytes")).as("raw_bytes"),
        sum(col("deflated_bytes")).as("deflated_bytes"))
      .localCheckpoint(true)
    val gate = byClass.agg(
      sum(when(col("cls") === 0, col("deflated_bytes"))).as("d_n"),
      sum(when(col("cls") === 0, col("raw_bytes"))).as("r_n"),
      sum(when(col("cls") === 1, col("deflated_bytes"))).as("d_b"),
      sum(when(col("cls") === 1, col("raw_bytes"))).as("r_b"),
      sum(when(col("cls") === 2, col("deflated_bytes"))).as("d_j"),
      sum(when(col("cls") === 2, col("raw_bytes"))).as("r_j"))
    // cross-multiplication in DECIMAL(38,0): byte sums at corpus scale
    // (10¹² docs × KBs) push the products past BIGINT, and the gate
    // should keep working — not ANSI-error — exactly when the corpus is
    // large enough to matter
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    // ratio_rank = 1 + |other classes with strictly smaller deflated/raw|,
    // by the SAME exact cross-multiplication as the gate — derived from
    // the measured deflate sums, never assumed. 3×3 broadcast cross on a
    // checkpointed 3-row frame.
    val others = byClass.select(col("cls").as("o_cls"),
      col("raw_bytes").as("o_raw"), col("deflated_bytes").as("o_defl"))
    val ranked = byClass.crossJoin(broadcast(others))
      .groupBy("cls", "n_docs", "raw_bytes", "deflated_bytes")
      .agg((lit(1) + sum(when(col("o_cls") =!= col("cls") &&
          d38(col("o_defl")) * d38(col("raw_bytes")) <
            d38(col("deflated_bytes")) * d38(col("o_raw")), 1)
        .otherwise(0))).cast("long").as("ratio_rank"))
    ranked
      .crossJoin(broadcast(gate))
      .filter(assert_true(
        d38(col("d_b")) * d38(col("r_n")) < d38(col("d_n")) * d38(col("r_b")) &&
          d38(col("d_n")) * d38(col("r_j")) < d38(col("d_j")) * d38(col("r_n")),
        concat(lit("compression class ordering violated (boiler < natural "),
          lit("< junk by deflated/raw): d_b="), col("d_b"), lit("/"), col("r_b"),
          lit(" d_n="), col("d_n"), lit("/"), col("r_n"),
          lit(" d_j="), col("d_j"), lit("/"), col("r_j")))
        .isNull)
      .select(
        element_at(typedLit(Seq("natural", "boiler", "junk")),
          col("cls").cast("int") + 1).as("class"),
        col("n_docs"), col("raw_bytes"), col("ratio_rank"))
      .orderBy("class")
  }
}
