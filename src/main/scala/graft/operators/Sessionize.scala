package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: assign each event a per-entity session index,
 * where a new session starts whenever the gap to the entity's previous
 * event exceeds `gap` — the standard clickstream/user-journey operator
 * (and the batch analog of Structured Streaming's session windows, which
 * cover the live path).
 *
 * Scale shape: ONE shuffle by the entity key; the lag + running-sum
 * windows both ride that single partitioning (one WindowExec, sort
 * spills), so an entity with millions of events never materializes in
 * memory. No joins. Session summaries re-aggregate on (entity, session)
 * — same partitioning, map-side combinable.
 *
 * Timestamps are integer comparisons (epoch units of the caller's
 * column); outputs are integers/longs — hash-stable for cross-engine
 * oracles.
 */
object Sessionize {

  /** Per-event session assignment: input columns plus `session_idx`
    * (1-based, per entity, in time order; ties on ts break by `tieCol`
    * so the assignment is total and deterministic). */
  def assign(df: DataFrame, entityCol: String, tsCol: String,
             gapUnits: Long, tieCol: String): DataFrame = {
    require(gapUnits > 0, "gap must be positive")
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      col(tsCol).cast("long") - prev.cast("long") > gapUnits, 1L).otherwise(0L)
    df.withColumn("session_idx", sum(newSession).over(w))
  }

  /** Session summaries: one row per (entity, session) with event count
    * and the session's first/last timestamp (as long epoch units). */
  def summarize(df: DataFrame, entityCol: String, tsCol: String,
                gapUnits: Long, tieCol: String): DataFrame =
    assign(df, entityCol, tsCol, gapUnits, tieCol)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol).cast("long")).as("start_ts"),
        max(col(tsCol).cast("long")).as("end_ts"))

  /**
   * Streaming session summaries over a live stream: Structured
   * Streaming's native `session_window` (dynamic-gap event-time windows)
   * with a watermark bounding state — a session closes, EMITS ONCE
   * (append mode), and its state evicts when the watermark passes its
   * end. This is the unbounded-stream configuration of [[summarize]];
   * `tsCol` must be a TIMESTAMP column here (event time), and sessions
   * are keyed on event time rather than [[assign]]'s 1-based index.
   *
   * State per open session is O(aggregates); skewed entities shard by
   * Spark's session-window state partitioning. Late events beyond
   * `watermarkDelay` are dropped — the documented streaming tradeoff.
   *
   * Output columns are deliberately NAMED DIFFERENTLY from
   * [[summarize]]: `window_end` is the session window's end bound (last
   * event + gap, a TIMESTAMP), NOT the batch path's `end_ts` (max event
   * time as a long) — `last_event_ts` carries the batch-comparable
   * value.
   */
  def summarizeStream(stream: DataFrame, entityCol: String, tsCol: String,
                      gap: String, watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(entityCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("last_event_ts"))
      .select(col(entityCol), col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("last_event_ts"), col("n_events"))
}
