package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention: bucket time into fixed periods, assign every entity
 * to the cohort of its FIRST active period, and count how many entities
 * of each cohort are active again at each later offset — the classic
 * triangular retention matrix.
 *
 * Plan shape: ONE shuffle of entity-granularity data. The raw events
 * collapse to per-entity state in a single `groupBy(entity)` whose
 * aggregate carries `min(period)` (the cohort) and `collect_set(period)`
 * (the activity set) — map-side partials shrink each task's events to
 * one row per (task, entity) before the exchange, and the set is
 * bounded by the number of DISTINCT PERIODS (weeks over a year = 52),
 * not by event count, so state per entity is small and fixed. The
 * explode back to (cohort, offset) is narrow, and the final count is a
 * two-phase aggregate over a tiny |cohorts|·|offsets| domain. At 100 TB
 * the events never shuffle twice — the alternative (window-min over
 * entity, then a second distinct) moves the event stream through two
 * exchanges.
 */
object Retention {

  /** (cohort, offset, n_active): entities whose first activity fell in
    * `cohort` (period index = ts div periodNanos) and were active again
    * `offset` periods later. offset 0 row counts the cohort size. */
  def retentionMatrix(df: DataFrame, entityCol: String, tsCol: String,
                      periodNanos: Long): DataFrame = {
    require(periodNanos > 0, "periodNanos must be positive")
    val perEntity = df
      .select(col(entityCol).as("__e"),
        // integer `div`, NOT `/`: epoch-nanos exceed double's 53-bit
        // mantissa, so a float quotient would mis-bucket edge values
        expr(s"cast($tsCol as bigint) div ${periodNanos}L").as("__p"))
      .groupBy("__e")
      .agg(min("__p").as("cohort"), collect_set("__p").as("__ps"))
    perEntity
      .select(col("cohort"), explode(col("__ps")).as("__p"))
      .select(col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active"))
  }
}
