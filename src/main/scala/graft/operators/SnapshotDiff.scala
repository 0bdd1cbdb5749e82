package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dataset snapshot diff: classify every key across two table versions
 * as `added` (only in the new snapshot), `removed` (only in the old),
 * `changed` (present in both, any compared column differs), or
 * `unchanged` — the audit that gates a nightly re-publish ("this
 * refresh touches 0.1% of rows, ship it" vs "it rewrites half the
 * corpus, stop").
 *
 * One full-outer shuffle join on the key; the column comparison is a
 * null-safe equality conjunction evaluated in the join's projection (no
 * second pass, no hashing — direct value compares, so a false
 * "changed" can't come from digest collisions). At 100 TB both sides
 * shuffle once on the key — the minimum possible for a key-aligned
 * diff — and nothing concentrates: the output is one row per key and
 * counts roll up map-side if the caller aggregates statuses.
 */
object SnapshotDiff {

  /** (key, status) per key in either snapshot. Keys must be unique per
    * snapshot (it is a snapshot, not a log — use [[CdcMerge]] first if
    * not). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    val o = oldDf.select((keyCol +: compareCols).map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select((keyCol +: compareCols).map(c => col(c).as(s"n_$c")): _*)
    val same = compareCols
      .map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduce(_ && _)
    o.join(n, col(s"o_$keyCol") === col(s"n_$keyCol"), "full_outer")
      .select(
        coalesce(col(s"o_$keyCol"), col(s"n_$keyCol")).as(keyCol),
        when(col(s"o_$keyCol").isNull, "added")
          .when(col(s"n_$keyCol").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("status"))
  }
}
