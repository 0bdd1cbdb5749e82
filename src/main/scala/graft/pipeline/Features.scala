package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.FeatureFunctions
import graft.operators.PrefixSum

/**
 * Feature engineering for ML training pipelines — the transforms that
 * sit between a curated corpus and a trainer: equal-frequency binning,
 * standardization, target encoding, the hashing trick, categorical
 * index encoding. Reference analog: the computed-projection /
 * post-aggregation COMPUTATION surface (reference
 * bullet-core Projection/Computation, e.g. Projection.java:30-55) —
 * the reference computes derived columns per record; these operators
 * are the corpus-FIT versions (fit statistics + deterministic
 * transform) re-expressed as Spark plans.
 *
 * Scale notes (100 TB):
 *  - Every fit here is one aggregation whose output is bounded by the
 *    GROUP or VOCABULARY cardinality, never the corpus — the transform
 *    side is a narrow map against those bounded stats (joined back via
 *    AQE-sized joins, not forced broadcasts).
 *  - All fit statistics are exact INTEGER moments (counts and integer
 *    sums), combined into doubles only in the final per-row division —
 *    so results are bit-reproducible across engines and partitionings
 *    (no float accumulation order dependence), and every entry can be
 *    pinned by an external SQL oracle.
 *  - Nothing sorts globally in one task: binning rides the two-phase
 *    [[PrefixSum.withGlobalRank]] exchange.
 */
object Features {

  /**
   * Exact equal-frequency (quantile) binning: append `outCol` =
   * 0-based bin index in `[0, nBins)`, where bin sizes differ by at
   * most one row. `(valueCol, tieCol)` must be a total order (tie
   * included) so the answer is unique and engine-independent.
   *
   * bin = ((rank − 1) · nBins) div n — integer arithmetic only, so the
   * assignment is exactly reproducible (`row_number()` + the same
   * formula in any SQL engine). The global rank is the two-phase
   * range-partition + offsets exchange, NOT a single-task window; the
   * extra `n` lookup is one count-star aggregate broadcast back as a
   * 1-row frame. Output stays range-partitioned by value, so a
   * downstream per-bin aggregate collapses map-side.
   */
  def quantileBin(df: DataFrame, valueCol: Column, tieCol: Column, nBins: Int,
                  outCol: String = "bin"): DataFrame = {
    require(nBins >= 1, s"quantileBin needs nBins >= 1, got $nBins")
    val ranked = PrefixSum.withGlobalRank(df, Seq(valueCol, tieCol), "__graft_rank")
    val n = df.agg(count(lit(1)).as("__graft_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(outCol,
        expr(s"((__graft_rank - 1) * $nBins) div __graft_n").cast("int"))
      .drop("__graft_rank", "__graft_n")
  }

  /**
   * Grouped z-score standardization with integer-exact moments: for
   * each group, z = (n·x − S1) / sqrt(n·S2 − S1²) — algebraically
   * (x − mean) / populationStddev, but with every aggregate an exact
   * integer (S1 = Σx, S2 = Σx², over `valueCol` cast to BIGINT), so
   * the fit is independent of partitioning and float summation order.
   * Zero-variance groups standardize to 0.0 rather than dividing by
   * zero (ANSI-safe).
   *
   * The n·S2 and S1² cross-products are computed in DECIMAL(38,0) —
   * exact far past BIGINT range (the AbTest lesson: a 1e12-row group
   * with x ≤ 1e3 needs ~1e30) — and only the final division is a
   * double. One groupBy fit (output = |groups| rows) + one AQE-sized
   * join back; with no group columns, a broadcast 1-row cross join.
   */
  def standardize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  outCol: String = "zscore"): DataFrame = {
    val x = col(valueCol).cast("long")
    val stats =
      (if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*))
        .agg(count(lit(1)).as("__graft_n"), sum(x).as("__graft_s1"),
          sum(x * x).as("__graft_s2"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(stats, groupCols)
    val dec = "decimal(38,0)"
    val n = col("__graft_n").cast(dec)
    val s1 = col("__graft_s1").cast(dec)
    val s2 = col("__graft_s2").cast(dec)
    val num = (n * x.cast(dec) - s1).cast("double")
    val rad = n * s2 - s1 * s1
    joined
      .withColumn(outCol,
        when(rad > 0, num / sqrt(rad.cast("double"))).otherwise(lit(0.0)))
      .drop("__graft_n", "__graft_s1", "__graft_s2")
  }

  /**
   * Smoothed target-mean encoding (the classic high-cardinality
   * categorical encoder): returns the FIT mapping
   * `(catCol, n_cat, s_cat, enc)` where
   *
   *   enc = (s_cat + m · globalMean) / (n_cat + m)
   *       = (s_cat · N + m · S) / (N · (n_cat + m))
   *
   * — the second form is all-integer numerator/denominator (N, S the
   * global count/sum; m the smoothing pseudo-count), one double
   * division at the end, so the encoding is bit-reproducible. `target`
   * is cast to BIGINT (booleans/0-1 labels welcome). The caller joins
   * the mapping back on `catCol` to transform (AQE-sized); unseen
   * categories at serve time fall back to S/N.
   *
   * One per-category aggregate (|vocab| rows) + one 1-row global
   * aggregate broadcast into the mapping — no corpus-sized state.
   */
  def targetEncode(df: DataFrame, catCol: String, target: Column,
                   smoothing: Long, outCol: String = "enc"): DataFrame = {
    require(smoothing >= 0, s"targetEncode needs smoothing >= 0, got $smoothing")
    val t = target.cast("long")
    val perCat = df.groupBy(catCol)
      .agg(count(lit(1)).as("n_cat"), sum(t).as("s_cat"))
    val global = df.agg(count(lit(1)).as("__graft_nt"), sum(t).as("__graft_st"))
    val dec = "decimal(38,0)"
    val num = (col("s_cat").cast(dec) * col("__graft_nt") +
      lit(smoothing) * col("__graft_st").cast(dec)).cast("double")
    val den = (col("__graft_nt").cast(dec) *
      (col("n_cat").cast(dec) + lit(smoothing))).cast("double")
    perCat.crossJoin(broadcast(global))
      .withColumn(outCol, when(den > 0, num / den).otherwise(lit(0.0)))
      .select(col(catCol), col("n_cat"), col("s_cat"), col(outCol))
  }

  /**
   * Hashing-trick (feature-hashing) bag-of-words: explode whitespace
   * tokens, bucket each by [[FeatureFunctions.polyHash16]] mod `dims`,
   * sign by hash parity (the signed variant that keeps collision noise
   * zero-mean — Weinberger et al., ICML 2009), and sum per (id,
   * bucket). Returns `(idCol, bucket, fsum, n_tok)`.
   *
   * The hash is the oracle-replayable polynomial hash, computed by a
   * native codegen'd expression — the explode is a narrow map over the
   * scan, and the only exchange is the (id, bucket) aggregation with
   * map-side partial combine. Dimensionality-bounded output: at most
   * `dims` rows per document, no vocabulary state at all (THE encoder
   * for unbounded vocabularies at 100 TB; for bounded vocabularies see
   * [[indexEncode]]).
   */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dims: Int): DataFrame = {
    require(dims >= 2, s"hashedFeatures needs dims >= 2, got $dims")
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("__graft_tok"))
      .filter(length(col("__graft_tok")) > 0)
    val h = FeatureFunctions.polyHash16(col("__graft_tok"))
    tok.select(col(idCol), pmod(h, lit(dims.toLong)).as("bucket"),
        (lit(1L) - lit(2L) * pmod(h, lit(2L))).as("__graft_sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum("__graft_sign").as("fsum"), count(lit(1)).as("n_tok"))
  }

  /**
   * Hash-cross of categorical columns (wide-and-deep feature crosses):
   * one bucket column from the '|'-joined string values via the same
   * oracle-replayable hash — a pure narrow expression, no fit state.
   */
  def crossBucket(cols: Seq[Column], dims: Int): Column = {
    require(dims >= 2, s"crossBucket needs dims >= 2, got $dims")
    pmod(FeatureFunctions.polyHash16(concat_ws("|", cols: _*)), lit(dims.toLong))
  }

  /**
   * Frequency-rank vocabulary index encoding with rare-category
   * collapse: returns the mapping `(catCol, cnt, idx)` where idx 1 is
   * the most frequent kept category (ties broken by value, so the
   * mapping is deterministic), and every category with fewer than
   * `minCount` rows collapses to idx 0 (the single OTHER/OOV id).
   *
   * The window ranks the post-aggregation VOCABULARY (|distinct
   * categories| rows), not the corpus — same bounded-global-window
   * shape as the heavy-hitters report. This encoder presumes a
   * bounded vocabulary; for unbounded ones use [[hashedFeatures]].
   */
  def indexEncode(df: DataFrame, catCol: String, minCount: Long): DataFrame = {
    require(minCount >= 0, s"indexEncode needs minCount >= 0, got $minCount")
    val counts = df.groupBy(catCol).agg(count(lit(1)).as("cnt"))
    val kept = counts.filter(col("cnt") >= minCount)
      .withColumn("idx", row_number()
        .over(Window.orderBy(col("cnt").desc, col(catCol).asc)).cast("long"))
    val collapsed = counts.filter(col("cnt") < minCount)
      .withColumn("idx", lit(0L))
    kept.unionByName(collapsed)
  }
}
