package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Greedy budgeted selection: walk the corpus in (score desc, id asc)
 * order and keep every row that STARTS before the budget is exhausted —
 * "fill a 10B-token training mix from the best-scored documents first".
 * A row is kept when the cumulative cost of all strictly-better rows is
 * still below the budget, so the result always contains the one row
 * that straddles the boundary (matching how a real mix is cut).
 *
 * The cumulative sum is NOT a single global window: the plan range-
 * partitions the narrow (id, cost, score) projection by the selection
 * order, computes per-partition cost totals (one tiny row per
 * partition), turns those into per-partition prefix offsets with a
 * driver-sized window, broadcasts them back, and finishes with a
 * within-partition running sum — `cum = offset(partition) + local
 * running sum`. Every stage is bounded: the corpus-wide data moves
 * once (the range exchange), and nothing ever concentrates on one
 * task. Correct for ANY range boundary placement (prefix + local sum
 * telescopes to the global sum), so RangePartitioner's sampled
 * boundaries don't affect the output.
 */
object BudgetSelect {

  /**
   * Rows whose cumulative `costCol` (ordered by `scoreCol` desc,
   * `idCol` asc) starts below `budget`. Emits the input columns plus
   * `cum` (cumulative cost INCLUDING the row). Costs must be
   * non-negative; score/id/cost must be non-null.
   */
  def selectByBudget(df: DataFrame, idCol: String, costCol: String,
                     scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val ordered = df
      .repartitionByRange(col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
    val offsets = ordered.groupBy("__pid")
      .agg(sum(col(costCol)).as("__t"))
      .withColumn("__off",
        coalesce(sum("__t").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off")
    val wLocal = Window.partitionBy("__pid")
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered.join(broadcast(offsets), "__pid")
      .withColumn("cum", col("__off") + sum(col(costCol)).over(wLocal))
      .filter(col("cum") - col(costCol) < budget)
      .drop("__pid", "__off")
  }

  /**
   * Stratified variant: an independent budget per `groupCol` value —
   * how real training mixes are cut ("2B tokens of code, 500M of each
   * low-resource language"). Here the running sum IS a plain window
   * partitioned by the group (each stratum hash-partitions to one
   * task's stream), which holds as long as no single stratum's rowcount
   * breaks a task — strata are languages/domains, orders of magnitude
   * coarser than rows. For a budget over the WHOLE corpus (one giant
   * stratum) use [[selectByBudget]]'s two-phase prefix sum instead.
   * Emits the input columns plus `cum` (within-stratum cumulative cost
   * including the row).
   */
  def selectByBudgetPerGroup(df: DataFrame, idCol: String, costCol: String,
                             scoreCol: String, groupCol: String,
                             budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(costCol)).over(w))
      .filter(col("cum") - col(costCol) < budget)
  }
}
