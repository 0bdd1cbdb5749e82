package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Two-phase distributed prefix operations over a total order — the
 * building block behind budgeted selection, balanced sharding and
 * curriculum ranking. A naive `Window.orderBy(...)` with no partition
 * key funnels the whole corpus through ONE task; this instead:
 *
 *  1. range-partitions the rows by the order (the only corpus-wide
 *     move, and it is a balanced exchange),
 *  2. aggregates one tiny row per partition (count / cost total),
 *  3. turns those P rows into per-partition offsets with a
 *     driver-sized window (P = number of partitions, not rows),
 *  4. broadcasts the offsets back and finishes with a within-partition
 *     running sum or row_number.
 *
 * `global = offset(partition) + local` telescopes to the exact global
 * value for ANY boundary placement, so RangePartitioner's sampled
 * boundaries never affect the result — only the balance.
 */
object PrefixSum {

  /** Append `outCol` = exact global running sum of `costCol` (including
    * the current row) in the total order given by `orderCols`. Also
    * appends nothing else; internal columns are dropped. */
  def withRunningSum(df: DataFrame, orderCols: Seq[Column], costCol: String,
                     outCol: String): DataFrame = {
    val ordered = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = ordered.groupBy("__pid")
      .agg(sum(col(costCol)).as("__t"))
      .withColumn("__off",
        coalesce(sum("__t").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off")
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + sum(col(costCol)).over(wLocal))
      .drop("__pid", "__off")
  }

  /** Append `outCol` = exact global 1-based rank (row_number) in the
    * total order given by `orderCols`, which must be a total order
    * (unique tiebreaker included). */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column],
                     outCol: String): DataFrame = {
    val ordered = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = ordered.groupBy("__pid")
      .agg(count(lit(1)).as("__t"))
      .withColumn("__off",
        coalesce(sum("__t").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off")
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
    ordered.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + row_number().over(wLocal).cast("long"))
      .drop("__pid", "__off")
  }
}
