package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Neyman-optimal stratified sample allocation (Neyman 1934) — how a
 * labeling/auditing budget should split across strata to minimize the
 * variance of the estimated mean: n_h ∝ N_h·σ_h. The corpus pass
 * collapses each stratum to EXACT integer moments (n, Σx, Σx²) —
 * map-side combined, no float accumulation; σ_h and the shares are
 * fixed-order scalar expressions over those integers. Fractional
 * allocations round by the LARGEST-REMAINDER method so the emitted
 * integers always sum to exactly the budget — ranking and the shared
 * totals run on the collapsed stratum domain (a documented bounded
 * single-partition window, strata being things like sources or
 * languages).
 *
 * Degenerate strata (σ_h = 0 — constant value) get weight 0 and
 * receive samples only through remainder distribution; a budget larger
 * than a stratum's population is NOT capped here (capping triggers
 * re-allocation cascades — callers with tiny strata should pre-merge
 * them, the standard survey-sampling practice).
 */
object Allocation {

  /** `valueCol` must be integral (the moments are summed exactly).
    * Output per stratum: n_pop, sigma (round-4), alloc (BIGINT,
    * sums to `budget`). */
  def neyman(df: DataFrame, stratumCol: String, valueCol: String,
             budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val moments = df
      .filter(col(stratumCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col(valueCol).cast("long")).as("s1"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("s2"))
    // population sigma from exact integer moments, fixed order:
    // sqrt((n*s2 - s1^2) / n^2)
    val varNum = col("n_pop").cast("double") * col("s2") -
      col("s1").cast("double") * col("s1")
    val sigma = sqrt(greatest(varNum, lit(0.0)) /
      (col("n_pop").cast("double") * col("n_pop")))
    val w = moments.withColumn("weight", col("n_pop") * sigma)
    // deterministic total: cumulative sum in stratum order, last value —
    // never an unordered float aggregate
    val wOrd = Window.orderBy("stratum")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("stratum")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val shared = w
      .withColumn("w_total", last(sum(col("weight")).over(wOrd)).over(wAll))
      .withColumn("share",
        when(col("w_total") > 0, lit(budget) * col("weight") / col("w_total"))
          .otherwise(lit(budget) * col("n_pop").cast("double") /
            sum(col("n_pop")).over(wAll)))
      .withColumn("fl", floor(col("share")))
      .withColumn("rem", col("share") - col("fl"))
    // largest-remainder: budget - sum(floor) leftover seats go to the
    // largest fractional remainders (ties by stratum)
    val leftover = lit(budget) - last(sum(col("fl")).over(wOrd)).over(wAll)
    val remRank = row_number().over(
      Window.orderBy(col("rem").desc, col("stratum")))
    shared
      .withColumn("alloc",
        (col("fl") + when(remRank <= leftover, 1L).otherwise(0L)).cast("long"))
      .select(col("stratum"), col("n_pop"), round(sigma, 4).as("sigma"),
        col("alloc"))
  }
}
