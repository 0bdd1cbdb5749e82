package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift measurement between two cohorts of one corpus —
 * the monitoring pass that catches "the new crawl batch looks nothing
 * like the training mix" before it ships: Population Stability Index
 * over a bucketed feature,
 * `PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)`,
 * with add-one (Laplace) smoothing so buckets present in only one
 * cohort contribute finitely. PSI < 0.1 is conventionally "no shift",
 * > 0.25 "major shift".
 *
 * Emitted per bucket: the raw cohort counts (exact BIGINT) and the
 * bucket's PSI contribution rounded to 4 decimals — the same emit
 * discipline as the DSIR weights: integer evidence exact, the one
 * log-based double rounded past the cross-engine ln ulp.
 *
 * Scale shape: ONE scan — conditional aggregation counts both cohorts
 * per bucket in a single groupBy (map-side combined), the cohort
 * totals are a one-row broadcast, and the contribution is per-row
 * arithmetic on the (tiny) bucket frame.
 */
object Drift {

  /**
   * Per-bucket PSI contributions between rows where `inA` holds and
   * rows where it doesn't, over `bucketCol` (any discrete/bucketed
   * column). Returns (bucket, cnt_a, cnt_b, psi) plus the smoothing
   * domain: every bucket observed in EITHER cohort appears.
   */
  def psiByBucket(df: DataFrame, bucketCol: Column, inA: Column): DataFrame = {
    val counts = df.groupBy(bucketCol.as("bucket")).agg(
      sum(when(inA, 1L).otherwise(0L)).as("cnt_a"),
      sum(when(inA, 0L).otherwise(1L)).as("cnt_b"))
    val totals = counts.agg(
      sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"),
      count(lit(1)).as("n_buckets"))
    val p = (col("cnt_a") + 1).cast("double") / (col("n_a") + col("n_buckets"))
    val q = (col("cnt_b") + 1).cast("double") / (col("n_b") + col("n_buckets"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"),
        round((p - q) * log(p / q), 4).as("psi"))
  }
}
