package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Latest-wins change-data-capture apply: collapse a changelog of
 * upserts and deletes into final table state. Each log row carries a
 * key, a monotone sequence (plus a unique tiebreaker for same-sequence
 * observations), an operation tag, and the payload columns; the result
 * keeps, per key, the payload of the highest (seq, tie) observation —
 * unless that last observation is a delete, in which case the key is
 * absent from the output.
 *
 * This is the MERGE-shaped companion of [[Scd2.fromChangeLog]]: SCD2
 * keeps the whole interval history, CDC apply keeps only the current
 * image. Deliberately NOT a window sort: `max_by(struct(payload),
 * struct(seq, tie))` is an ordinary aggregate, so Spark partial-
 * aggregates map-side — each task reduces its slice of a key to ONE
 * candidate row before the exchange. On a 100 TB changelog where hot
 * keys carry millions of updates, that pre-shuffle collapse is the
 * difference between shuffling the log and shuffling ~one row per
 * (task, key); a `row_number` window would move every log row and
 * then sort it.
 */
object CdcMerge {

  /**
   * Apply the changelog. Output: `keyCol` plus every payload column (all
   * columns except key/seq/tie/op), valued at the latest observation;
   * keys whose latest op equals `deleteOp` are dropped. (seq, tie) must
   * be unique per key and non-null.
   */
  def apply(log: DataFrame, keyCol: String, seqCol: String, tieCol: String,
            opCol: String, deleteOp: String): DataFrame = {
    val payload = log.columns.filterNot(
      Set(keyCol, seqCol, tieCol, opCol).contains)
    val latest = struct((opCol +: payload).map(col): _*)
    val ord = struct(col(seqCol), col(tieCol))
    log.groupBy(col(keyCol))
      .agg(max_by(latest, ord).as("__last"))
      .filter(col(s"__last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** One changelog record entering [[applyStream]]. */
  case class CdcRecord(key: Long, seq: Long, tie: Long, op: String, payload: String)
  /** Per-key carried state: the winning (seq, tie) and its record. */
  case class CdcState(seq: Long, tie: Long, op: String, payload: String)
  /** The key's current image after a batch that touched it. `deleted`
    * marks a tombstone-latest key (the consumer drops it). */
  case class CdcImage(key: Long, seq: Long, op: String, payload: String,
                      deleted: Boolean)

  /**
   * Streaming latest-wins apply: the unbounded-changelog form of
   * [[apply]]. Per-key state is ONE record — the current (seq, tie)
   * winner — updated as batches arrive; each batch emits the new
   * current image for exactly the keys it touched (Update-style
   * downstream upsert feed). Out-of-order arrivals are absorbed
   * correctly because the comparison is on (seq, tie), not arrival:
   * a stale record loses against state no matter when it shows up.
   * Within a batch, records apply in (seq, tie) order so emission
   * never depends on shuffle arrival order. State never times out —
   * a CDC image IS the table; bound the key domain upstream if the
   * table itself is unbounded.
   */
  def applyStream(log: Dataset[CdcRecord], deleteOp: String): Dataset[CdcImage] = {
    val spark = log.sparkSession
    import spark.implicits._
    log.groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcImage](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, recs: Iterator[CdcRecord], state: GroupState[CdcState]) =>
          applyRecords(state.getOption.orNull, recs) match {
            case Some(next) =>
              state.update(next)
              Iterator.single(CdcImage(key, next.seq, next.op, next.payload,
                next.op == deleteOp))
            case None => Iterator.empty
          }
      }
  }

  /** The same latest-wins logic as a Spark 4 [[StatefulProcessor]] —
    * shared verbatim by both streaming forms so they cannot drift. */
  private def applyRecords(cur0: CdcState,
                           recs: Iterator[CdcRecord]): Option[CdcState] = {
    var cur = cur0
    var changed = false
    recs.toSeq.sortBy(r => (r.seq, r.tie)).foreach { r =>
      if (cur == null || r.seq > cur.seq ||
          (r.seq == cur.seq && r.tie > cur.tie)) {
        cur = CdcState(r.seq, r.tie, r.op, r.payload)
        changed = true
      }
    }
    if (changed) Some(cur) else None
  }

  /** The latest-wins processor on the transformWithState API. */
  class CdcProcessor(deleteOp: String)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, CdcRecord, CdcImage] {
    @transient private var cur:
      org.apache.spark.sql.streaming.ValueState[CdcState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cur = getHandle.getValueState[CdcState]("cur",
        org.apache.spark.sql.Encoders.product[CdcState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcRecord],
        timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[CdcImage] =
      applyRecords(if (cur.exists()) cur.get() else null, rows) match {
        case Some(next) =>
          cur.update(next)
          Iterator.single(CdcImage(key, next.seq, next.op, next.payload,
            next.op == deleteOp))
        case None => Iterator.empty
      }
  }

  /**
   * [[applyStream]] on Spark 4's `transformWithState`
   * ([[StatefulProcessor]] + typed `ValueState`): identical semantics —
   * the fold is literally the same private function — on the newer
   * arbitrary-state API, whose state store is queryable offline
   * (state reader), supports per-state TTL, and composes multiple
   * typed state variables per key. Requires the RocksDB state store
   * provider (`spark.sql.streaming.stateStore.providerClass` =
   * `...RocksDBStateStoreProvider`) — set it on the session before
   * starting the query; the HDFS-backed default store does not
   * implement transformWithState.
   */
  def applyStreamTws(log: Dataset[CdcRecord],
                     deleteOp: String): Dataset[CdcImage] = {
    val spark = log.sparkSession
    import spark.implicits._
    log.groupByKey(_.key)
      .transformWithState(new CdcProcessor(deleteOp),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }
}
