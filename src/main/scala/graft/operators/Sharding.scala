package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Size-balanced shard assignment for training-data output: walk the
 * corpus in a deterministic order and cut a new shard every `capacity`
 * cost units (tokens, bytes), so every shard except the last carries
 * between `capacity - max_row_cost` and `capacity` units — the
 * assignment a sequential writer would produce, computed distributed.
 * A row belongs to the shard its FIRST unit lands in (`(cum - cost)
 * div capacity`), so a row straddling a boundary goes to the earlier
 * shard, matching greedy sequential packing.
 *
 * The cumulative cost is [[PrefixSum.withRunningSum]]'s two-phase
 * prefix sum — the corpus moves once through a balanced range
 * exchange, never through a single-task global window. Downstream, the
 * shard id is exactly what `write.partitionBy("shard")` or a
 * `repartition(col("shard"))` wants; unlike `repartition(n)`'s
 * hash-by-row it yields shards balanced by COST, not by row count,
 * which is what matters when document sizes are heavy-tailed.
 */
object Sharding {

  /** Append `cum` (running cost including the row, ordered by `idCol`)
    * and `shard` = (cum - cost) div capacity. Costs must be positive
    * and ≤ capacity; ids unique and non-null. */
  def assignShards(df: DataFrame, idCol: String, costCol: String,
                   capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    PrefixSum.withRunningSum(df, Seq(col(idCol).asc), costCol, "cum")
      .withColumn("shard", expr(s"(cum - $costCol) div ${capacity}L"))
  }
}
