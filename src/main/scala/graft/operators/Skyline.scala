package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D skyline (Pareto frontier, maximizing both axes): the rows not
 * dominated by any other row — multi-criteria data selection ("keep
 * documents on the length × diversity frontier") without collapsing
 * the criteria into one ad-hoc weighted score.
 *
 * Point (x', y') dominates (x, y) when x' ≥ x ∧ y' ≥ y and at least one
 * is strict; duplicate points are mutually non-dominating, so every row
 * carrying a skyline point is returned.
 *
 * Plan, not an all-pairs anti-join (the naive O(N²) form): reduce to
 * per-x maxima, then one descending-x sweep keeping rows whose group
 * max-y strictly exceeds the running max — exactly the classic sorted
 * sweep, expressed as two aggregations and a window. The sweep frame
 * has one row per DISTINCT x, which for continuous data is corpus-
 * sized, so a partition-local skyline pass runs first: dominance
 * within any subset implies dominance globally, so each partition's
 * local frontier (expected O(log n) of its rows for non-adversarial
 * data) is a superset-preserving prune, and only those candidates
 * reach the global single-task sweep. Skyline rows then come back via
 * a broadcast semi-join on (x, y) — the corpus itself never sorts
 * globally and never shuffles beyond its one local-prune pass.
 */
object Skyline {

  /** One sweep pass: the non-dominated (x, y) pairs of `pts`, locally
    * per `pid` partition column if given, else globally. `pts` must
    * have columns x, y (+ pid). */
  private def sweep(pts: DataFrame, pid: Option[String]): DataFrame = {
    val gCols = pid.toSeq :+ "x"
    val grouped = pts.groupBy(gCols.map(col): _*).agg(max("y").as("y"))
    val w = pid.map(p => Window.partitionBy(p)).getOrElse(Window.partitionBy())
      .orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    grouped
      .withColumn("__pm", max("y").over(w))
      .filter(col("__pm").isNull || col("y") > col("__pm"))
      .select((pid.toSeq :+ "x" :+ "y").map(col): _*)
  }

  /** Rows of `df` whose (xCol, yCol) point lies on the maximizing
    * frontier. Both columns must be non-null (filter upstream). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .withColumn("__pid", spark_partition_id())
    val local = sweep(pts, Some("__pid"))
    val global = sweep(local, None)
    df.join(broadcast(global),
      df(xCol) === global("x") && df(yCol) === global("y"), "left_semi")
  }
}
