package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time interval join: conversions matched to the touchpoints that
 * preceded them within an attribution window — the clickstream
 * attribution operator (purchase ← clicks in the last N minutes), and
 * the general "join stream A to recent stream B" pattern.
 *
 * The SAME function serves batch and streaming: the join is an equi-join
 * on the entity key plus an event-time range predicate. On batch inputs
 * that is a plain hash join with a residual filter (never a nested-loop —
 * the equi-key anchors the shuffle). On STREAMING inputs both sides get
 * watermarks and the range predicate doubles as the state-eviction bound
 * Structured Streaming requires for stream-stream joins: a touchpoint's
 * state is dropped once the watermark guarantees no conversion can still
 * reach back to it — state is O(window), not O(stream).
 *
 * Timestamp columns must be TimestampType (streaming state math needs
 * event-time columns, not raw longs).
 */
object Attribution {

  /** Conversions ⋈ touchpoints with `touchTs ∈ (convTs - windowSec, convTs]`.
    * Output: all conversion columns (aliased side `c`) plus the matched
    * touchpoint's columns (side `t`). Inner join — unconverted
    * touchpoints and untouched conversions drop out. */
  def attribute(conversions: DataFrame, touchpoints: DataFrame,
                keyCol: String, convTs: String, touchTs: String,
                windowSec: Long,
                watermarkDelay: Option[String] = None): DataFrame = {
    require(windowSec > 0, "attribution window must be positive")
    def wm(df: DataFrame, ts: String) =
      watermarkDelay.filter(_ => df.isStreaming)
        .map(d => df.withWatermark(ts, d)).getOrElse(df)
    val c = wm(conversions, convTs).alias("c")
    val t = wm(touchpoints, touchTs).alias("t")
    c.join(t,
      col(s"c.$keyCol") === col(s"t.$keyCol") &&
        col(s"t.$touchTs") <= col(s"c.$convTs") &&
        col(s"t.$touchTs") > col(s"c.$convTs") - expr(s"INTERVAL $windowSec SECOND"))
  }
}
