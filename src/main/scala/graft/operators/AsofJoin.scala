package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Point-in-time (as-of) join — for each left row, attach the single most
 * recent right row with equal keys and rightTime <= leftTime (backward,
 * inclusive; the DuckDB/pandas ASOF LEFT JOIN contract). The reference has
 * no join operator at all (bullet queries see one stream), but this is the
 * canonical time-series enrichment a feature/training pipeline runs at
 * scale: "the user's last purchase as of this click".
 *
 * Spark shape: NOT a join. Both sides are tagged and unioned, then ONE hash
 * shuffle on the keys plus an in-partition sort by (time, side) lets a
 * running `last(_, ignoreNulls = true)` window carry each right row forward
 * to every later left row.
 *
 * 100 TB notes:
 *   - One shuffle of left + right, zero join explosion: a sort-merge join
 *     formulation (`l.ts >= r.ts` range condition) would first build
 *     O(matches-per-key²) candidate pairs and then pick the max — this
 *     stays O(|left| + |right|) rows end to end.
 *   - Partitioning is by join key, so a hot key lands on one task; Spark's
 *     window sort is external (spills, doesn't OOM), but if one key is a
 *     large fraction of the data, pre-split it by coarse time bucket and
 *     as-of join within buckets carrying a per-bucket seed row.
 *   - The right row is carried as ONE struct, so all attached columns come
 *     from the same matched row even when some of its fields are null.
 *
 * Null semantics match SQL: right rows with a null key or null time can
 * never be joined to (equality/inequality with NULL), so they are filtered;
 * left rows with null key/time sort where no right row precedes them and
 * come out unmatched — exactly the oracle's answer.
 */
object AsofJoin {

  /** Left as-of-backward join. Output = every left column, plus
    * `prefix+rightTime` and `prefix+c` for each c in `rightCols`, null when
    * no right row is at-or-before the left row (or farther back than
    * `tolerance`, when set, for numeric time columns). If (keys, rightTime)
    * is not unique on the right, the carried row among the ties is the last
    * in partition-sort order — dedupe first for a deterministic answer. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String, rightCols: Seq[String],
                   prefix: String = "r_", tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val attached = (rightTime +: rightCols).distinct
    val carriedType = StructType(attached.map(right.schema(_)))
    val collide = left.columns.toSet.intersect(attached.map(prefix + _).toSet)
    require(collide.isEmpty, s"prefixed right columns collide with left: $collide")
    // the union/window plumbing owns these names — a left column named
    // __t would silently shadow the sort key
    val reserved = Set("__t", "__side", "__r0", "__r")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"inputs use reserved internal column names: $clash")

    val leftOther = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTime)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(carriedType).as("__r0")) ++ leftOther.map(col): _*)
    val rTagged = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTime).isNotNull)
      .select(keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(attached.map(col): _*).as("__r0")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__r0"), ignoreNulls = true).over(w)
    val bounded = tolerance match {
      case Some(tol) => when(col("__t") - col("__r")(rightTime) <= tol, col("__r"))
      case None      => col("__r")
    }
    lTagged.unionByName(rTagged)
      .withColumn("__r", carried)
      .filter(col("__side") === 1)
      .withColumn("__r", bounded)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++ leftOther.map(col) ++
        attached.map(c => col("__r")(c).as(prefix + c)): _*)
  }
}
