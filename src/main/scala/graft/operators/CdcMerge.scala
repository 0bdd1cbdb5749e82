package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
