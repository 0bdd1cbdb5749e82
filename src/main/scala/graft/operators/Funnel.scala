package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-step conversion funnel: for an ordered step sequence
 * (e.g. view → click → purchase), find per entity the EARLIEST
 * completion of each step strictly after the previous step's
 * completion, all within `windowSize` of the step-1 time — the
 * product-analytics "funnel" a stream engine's users ask of event
 * data, reduced to relational algebra: one conditional-min aggregation
 * per step, each joined back on the entity key.
 *
 * Semantics (the standard first-touch funnel): t₁ = min ts of step 1;
 * tᵢ = min ts of step i with tᵢ > tᵢ₋₁ and tᵢ ≤ t₁ + windowSize.
 * Earliest-completion is greedy-optimal here: taking the minimal
 * valid tᵢ never excludes a later step that a larger choice would
 * admit, so "reached depth d" is exact, not heuristic.
 *
 * Scale shape: step 1 is one filtered aggregation by entity; each
 * subsequent step filters the raw scan to its type (narrow), joins the
 * (entity → deadline) frame on the entity key, and re-aggregates —
 * k-step funnels are k aggregations + (k−1) equi-joins all
 * hash-partitioned on the same key, no windows, no per-entity event
 * buffering. Timestamps are integers end to end.
 */
object Funnel {

  /** Per-entity funnel times: (entity, t_1 .. t_k as `t1..tk`, depth).
    * Entities that never complete step 1 are absent; `tᵢ` is null past
    * the reached depth. `steps` are values of `typeCol`. */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], windowSize: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(windowSize > 0, "windowSize must be positive")
    val base = df.select(col(entityCol).as("entity"),
      col(tsCol).cast("long").as("ts"), col(typeCol).as("et"))
    val s1 = base.filter(col("et") === steps.head)
      .groupBy("entity").agg(min("ts").as("t1"))
      .withColumn("__dl", col("t1") + windowSize)
    val full = steps.zipWithIndex.tail.foldLeft(s1) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val next = base.filter(col("et") === step)
        .join(acc.select(col("entity"), col(prev), col("__dl")), "entity")
        .filter(col("ts") > col(prev) && col("ts") <= col("__dl"))
        .groupBy("entity").agg(min("ts").as(cur))
      acc.join(next, Seq("entity"), "left")
    }
    val depth = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.drop("__dl").withColumn("depth", depth)
  }
}
