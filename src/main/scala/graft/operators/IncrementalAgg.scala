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

  /**
   * Incremental view maintenance for an INNER equi-join under
   * insert-only deltas: Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB.
   * The maintained view updates as `view_old ∪ joinDelta(...)` — the
   * base ⋈ base term is NEVER recomputed, which is the whole point: at
   * 100 TB the bases dwarf the deltas, so all three terms are
   * delta-sized joins (a delta probing a base co-partitioned/bucketed
   * on the key, and one delta × delta). Insert-only by contract —
   * deletions/updates need keyed multiplicity counts (the classic
   * counting algorithm); this operator `require`s nothing about them
   * because it cannot see retractions at all, so the contract lives in
   * the name and the caller's ingest path (append-only logs, CDC
   * inserts). Duplicate rows are data: every term is a plain multiset
   * join, so multiplicities compose exactly like the full recompute.
   */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
