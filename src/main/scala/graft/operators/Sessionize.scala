package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input shape for [[Sessionize.statefulSessions]]. */
case class SessionEvent(entity: String, ts: java.sql.Timestamp, etype: String)

/** Open-session accumulator held in stream state (epoch millis). */
case class OpenSession(start: Long, last: Long, n: Long,
                       firstType: String, lastType: String, switches: Long)

/** A closed session with its behavioral summary (epoch millis). */
case class ClosedSession(entity: String, start_ms: Long, end_ms: Long,
                         n_events: Long, first_type: String,
                         last_type: String, type_switches: Long)

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

  /**
   * Stateful sessionization with a CUSTOM session payload via
   * `flatMapGroupsWithState` — the escape hatch for session summaries
   * `session_window` cannot express, because the aggregate depends on
   * event ORDER within the session: here first/last event type and the
   * number of type TRANSITIONS (the "journey shape" signal). Sessions
   * close and emit exactly once, either in-batch (a later event arrives
   * past the gap) or via EVENT-TIME TIMEOUT when the watermark passes
   * `last + gap` — so idle entities' state is reclaimed by the engine,
   * never leaked.
   *
   * State per entity is ONE fixed-size [[OpenSession]] (no event buffer:
   * arrivals fold in sorted order per batch), partitioned by entity key —
   * the standard keyed-state scale shape. Late events older than the
   * watermark are dropped by the engine before the function runs.
   *
   * Within-watermark late arrivals (possible whenever `watermarkDelay`
   * > 0: an event older than the open session's newest lands in a LATER
   * micro-batch) are folded without pretending they are newest: the
   * session's `start`/`firstType` move back when the late event precedes
   * them, `last`/`lastType` never rewind, and — because O(1) state
   * cannot reconstruct where mid-session the event truly slotted —
   * `type_switches` counts transitions among ON-TIME events only. A
   * late event more than `gapMs` BEFORE the open session's start cannot
   * belong to it (or to any state still held) and emits immediately as
   * its own single-event closed session.
   */
  def statefulSessions(stream: DataFrame, entityCol: String, tsCol: String,
                       etypeCol: String, gapMs: Long,
                       watermarkDelay: String): Dataset[ClosedSession] = {
    require(gapMs > 0, "gap must be positive")
    val spark = stream.sparkSession
    import spark.implicits._
    val ds = stream.withWatermark(tsCol, watermarkDelay)
      .select(col(entityCol).cast("string").as("entity"),
        col(tsCol).as("ts"), col(etypeCol).cast("string").as("etype"))
      .as[SessionEvent]
    ds.groupByKey(_.entity)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: String, events: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = ClosedSession(entity, s.start, s.last,
            s.n, s.firstType, s.lastType, s.switches)
          if (state.hasTimedOut) {
            val out = close(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // in-batch events arrive sorted, so t < s.last only for
                // state carried over from a PREVIOUS batch — a
                // within-watermark late arrival
                case Some(s) if t < s.start - gapMs =>
                  // too early to belong to the open session (or any
                  // state still held): its own already-elapsed session
                  closed += ClosedSession(entity, t, t, 1, e.etype, e.etype, 0)
                case Some(s) if t < s.last =>
                  // late merge: extend backwards only — never rewrite
                  // the newest-event fields or the on-time switch count
                  open = Some(s.copy(
                    start = math.min(s.start, t),
                    firstType = if (t < s.start) e.etype else s.firstType,
                    n = s.n + 1))
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(s.copy(last = t, n = s.n + 1,
                    lastType = e.etype,
                    switches = s.switches + (if (e.etype != s.lastType) 1 else 0)))
                case Some(s) => // gap exceeded inside the batch: close + restart
                  closed += close(s)
                  open = Some(OpenSession(t, t, 1, e.etype, e.etype, 0))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.etype, e.etype, 0))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }
}
