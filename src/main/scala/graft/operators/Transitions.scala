package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * First-order (Markov) transition counts over per-entity event
 * sequences: order each entity's events by (ts, tie), pair every event
 * with its successor, and count (src_state → dst_state) transitions
 * corpus-wide. The per-source total rides along so confidence-style
 * ratios (P(dst|src) = n / src_total) are a single exact division for
 * the caller — both counts are BIGINT, nothing is pre-rounded.
 *
 * Plan shape: one shuffle on the entity key for the `lead` window (the
 * sequence must be reassembled somewhere; partitioning by entity is the
 * minimal reassembly), then a two-phase count on (src, dst) — map-side
 * partial aggregation collapses each task's pairs before the second,
 * much smaller exchange (|states|² rows at most). The src totals are a
 * window over the already-aggregated pair table, not the raw events —
 * O(|states|²) rows, negligible at any corpus size.
 */
object Transitions {

  /** (src, dst, n, src_total) for every observed adjacent state pair.
    * (tsCol, tieCol) must be unique per entity for a deterministic
    * ordering. */
  def transitionCounts(df: DataFrame, entityCol: String, tsCol: String,
                       tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(entityCol), col(tsCol), col(tieCol),
        col(stateCol).as("src"),
        lead(col(stateCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    pairs.withColumn("src_total",
      sum(col("n")).over(Window.partitionBy("src")))
  }

  /** One event entering [[transitionsStream]]. */
  case class Ev(entity: Long, ts: Long, tie: Long, state: String)
  /** Per-entity carried state: the last event seen (in (ts, tie) order). */
  case class LastEv(ts: Long, tie: Long, state: String)
  /** An observed adjacent transition. */
  case class Transition(entity: Long, src: String, dst: String, ts: Long)

  /**
   * Streaming form: each entity carries only its LAST event — O(1)
   * state — and every arriving event emits the (last.state → state)
   * transition before becoming the new last. Within a micro-batch
   * events apply in (ts, tie) order, so a batch of k events emits the
   * same k transitions the batch pass would. Events older than the
   * carried last (cross-batch stragglers) are dropped rather than
   * spliced — splicing would retro-emit a corrected PAIR of
   * transitions, which an append sink can't retract; the drop is the
   * documented semantic difference from the batch operator.
   */
  def transitionsStream(events: Dataset[Ev]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, evs: Iterator[Ev], state: GroupState[LastEv]) =>
          var last = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[Transition]()
          evs.toSeq.sortBy(e => (e.ts, e.tie)).foreach { e =>
            if (last == null || e.ts > last.ts ||
                (e.ts == last.ts && e.tie > last.tie)) {
              if (last != null) out += Transition(entity, last.state, e.state, e.ts)
              last = LastEv(e.ts, e.tie, e.state)
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }
}
