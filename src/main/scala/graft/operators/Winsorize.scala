package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-group winsorization: clip a numeric column to its group's
 * [pLo, pHi] discrete percentiles — the standard outlier-taming pass
 * before a column feeds scaling/normalization (a single corrupt 1e12
 * reading otherwise defines the feature range). `percentile_disc`
 * (not _cont) on purpose: the bounds are VALUES PRESENT IN THE DATA,
 * so clipping only ever copies stored doubles — no interpolation
 * arithmetic, bit-identical on any engine.
 *
 * Scale shape: one exact percentile aggregation per group (Spark sorts
 * within the aggregation buffer — groups must individually fit an
 * executor, the same contract as any exact per-group quantile; use the
 * KLL distribution sketch when they don't), then the per-group bounds —
 * one row per group — broadcast back onto the fact side. The fact
 * table itself never shuffles.
 */
object Winsorize {

  /** Clip `valueCol` to its `groupCol`-group [pLo, pHi] discrete
    * percentiles. Emits the input columns plus `lo`, `hi`, and
    * `clipped`. */
  def clip(df: DataFrame, groupCol: String, valueCol: String,
           pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, s"bad percentile range [$pLo, $pHi]")
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY $valueCol)").as("lo"),
      expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY $valueCol)").as("hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
  }
}
