package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level data profiling — the ANALYZE-style statistics a pipeline
 * operator (or a human) consults before planning work over an unfamiliar
 * 100 TB table: per-column non-null count, exact distinct count, and
 * min/max rendered as strings so heterogeneous columns share one schema.
 *
 * One scan: all per-column aggregates run in a single global `agg`, then
 * the single result row is exploded into one output row per column —
 * no per-column jobs, no driver loop over columns.
 *
 * Scale note: N exact `count_distinct`s in one aggregate make Catalyst
 * plan an Expand (each input row duplicated once per distinct-aggregate
 * before the partial agg). That is still one scan and one shuffle, but
 * the map-side row volume is ×N — for profile-only passes at extreme
 * scale, swap `count_distinct` for `approx_count_distinct` (HLL, no
 * Expand) at the call site; the exact form is kept here so the result is
 * oracle-checkable bit-for-bit.
 */
object Profiling {

  /** Profile `cols` of `df`: one row per column with
    * (col_name, n_rows, n_null, ndv, vmin, vmax). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("vmin"), col(s"__max_$c").as("vmax"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
