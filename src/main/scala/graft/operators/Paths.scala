package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Session path mining: sessionize each entity's event stream
 * ([[Sessionize.assign]] — one entity-key shuffle, no joins), render
 * every session as its ordered state string ("view>click>purchase"),
 * and count how often each distinct journey occurs corpus-wide — the
 * "top user paths" board.
 *
 * Determinism: events inside a session sort by (ts, tie) — a total
 * order — via `array_sort` over structs whose FIRST fields are the sort
 * key, so the rendered string never depends on shuffle arrival order.
 * Plan shape: the per-session `collect_list` rides the SAME
 * partitioning as the sessionization window (groupBy on a superset of
 * the window key — no second exchange of the events), per-session state
 * is bounded by session length (gap-bounded, not history-bounded), and
 * the final path count is a two-phase aggregate on a domain of distinct
 * journeys. Top-k is TakeOrdered, never a global sort.
 */
object Paths {

  /** (path, n): the `k` most frequent session journeys, ties broken by
    * path string for determinism. */
  def topPaths(df: DataFrame, entityCol: String, tsCol: String,
               tieCol: String, stateCol: String, gapUnits: Long,
               k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    Sessionize.assign(df, entityCol, tsCol, gapUnits, tieCol)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            col(tsCol).as("t"), col(tieCol).as("i"),
            col(stateCol).as("s")))),
          e => e.getField("s")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
