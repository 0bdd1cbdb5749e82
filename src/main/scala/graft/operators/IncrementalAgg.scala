package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance: keep a per-key summary table
 * (count + integer sums + min/max) up to date by MERGING each new
 * batch's partials instead of recomputing over the whole corpus — the
 * warehouse "materialized rollup" pattern, and the exact-aggregate
 * sibling of the persisted theta partials in
 * [[SketchSetOps.thetaPartials]] (reference partial/final contract:
 * bullet-core `Strategy#getData`/`combine`).
 *
 * Everything maintained here is algebraic (count, sum, min, max merge
 * associatively and commutatively), so `merge(partials(A), partials(B))
 * == partials(A ∪ B)` exactly — pinned by the oracle recomputing from
 * scratch. AVG is derived at read time as sum/count, never stored.
 *
 * Scale shape: each batch aggregates map-side to one row per key
 * before anything persists; the merge is a union of two summary
 * frames + one groupBy on the key — O(keys), never O(corpus). At
 * 100 TB the summary table is partitioned/bucketed by key so the
 * merge co-locates.
 */
object IncrementalAgg {

  /** Per-key partials of `valueCol` over one batch:
    * (key, cnt, sum, min, max). `valueCol` must be integral — float
    * sums are not reorder-safe and break the merge-vs-recompute
    * equality this operator promises. */
  def partials(batch: DataFrame, keyCol: String, valueCol: String): DataFrame =
    batch.groupBy(col(keyCol).as("key")).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol)).cast("long").as("sum"),
      min(col(valueCol)).cast("long").as("min"),
      max(col(valueCol)).cast("long").as("max"))

  /** Merge any number of partial summary frames into one. */
  def merge(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one partial frame")
    parts.reduce(_ unionByName _).groupBy("key").agg(
      sum("cnt").cast("long").as("cnt"),
      sum("sum").cast("long").as("sum"),
      min("min").cast("long").as("min"),
      max("max").cast("long").as("max"))
  }
}
