package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * First-order (Markov) transition counts over per-entity event
 * sequences: order each entity's events by (ts, tie), pair every event
 * with its successor, and count (src_state → dst_state) transitions
 * corpus-wide. The per-source total rides along so confidence-style
 * ratios (P(dst|src) = n / src_total) are a single exact division for
 * the caller — both counts are BIGINT, nothing is pre-rounded.
 *
 * Plan shape: one shuffle on the entity key for the `lead` window (the
 * sequence must be reassembled somewhere; partitioning by entity is the
 * minimal reassembly), then a two-phase count on (src, dst) — map-side
 * partial aggregation collapses each task's pairs before the second,
 * much smaller exchange (|states|² rows at most). The src totals are a
 * window over the already-aggregated pair table, not the raw events —
 * O(|states|²) rows, negligible at any corpus size.
 */
object Transitions {

  /** (src, dst, n, src_total) for every observed adjacent state pair.
    * (tsCol, tieCol) must be unique per entity for a deterministic
    * ordering. */
  def transitionCounts(df: DataFrame, entityCol: String, tsCol: String,
                       tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(entityCol), col(tsCol), col(tieCol),
        col(stateCol).as("src"),
        lead(col(stateCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    pairs.withColumn("src_total",
      sum(col("n")).over(Window.partitionBy("src")))
  }
}
