package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust per-group outlier flagging via MAD (median absolute
 * deviation): a point is an outlier when `|v − median| > k · MAD`.
 * Unlike the z-score, both location and scale are medians, so the
 * estimator has a 50% breakdown point — a corrupt sensor emitting 1e12
 * can poison a mean/stddev gate but moves neither the median nor the
 * MAD until half the group is corrupt.
 *
 * Hash-safety across engines: the median and MAD come from
 * `percentile_disc`, so both are VALUES PRESENT in the data (the MAD a
 * stored |v − median| difference — IEEE subtraction of two stored
 * doubles is exactly reproducible). The flag compare multiplies by an
 * integer k — again exactly reproducible — so the boolean is
 * deterministic cross-engine, with no float accumulation anywhere.
 *
 * Scale shape: two group aggregations (median, then MAD of the
 * deviations) whose results — one row per group — broadcast back onto
 * the fact side; the fact table itself never shuffles. Same exact
 * per-group sort contract as [[Winsorize]]: groups must individually
 * fit an executor, else use the KLL sketch path.
 */
object Robust {

  /** Append `med`, `mad`, and boolean `is_outlier` (`|v − med| > k·mad`)
    * per `groupCol`. `k` is an integer multiplier (3 is the classic
    * cut); null values are never flagged. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val med = df.groupBy(groupCol).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)").as("med"))
    val mad = df.join(broadcast(med), groupCol)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
      .groupBy(groupCol).agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __ad)").as("mad"))
    df.join(broadcast(med), groupCol)
      .join(broadcast(mad), groupCol)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > col("mad") * k)
  }
}
