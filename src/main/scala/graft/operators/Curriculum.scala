package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Curriculum ordering with tier interleave: rank the corpus by a
 * difficulty score, cut it into `k` contiguous difficulty tiers, and
 * emit a global training position that ROUND-ROBINS across tiers —
 * position 0 is the easiest tier's first row, position 1 the second
 * tier's first row, … so any prefix of the output mixes all difficulty
 * levels in tier proportion (the standard anti-curriculum-collapse
 * trick when packing training shards).
 *
 * Everything is integer arithmetic on the global rank `r` (1-based,
 * from [[PrefixSum.withGlobalRank]] — two-phase, never a single-task
 * sort) and the corpus size `n`:
 *
 *   tier        = ((r-1)·k) div n              (floor partition: tier t
 *                                              owns ranks with
 *                                              (r-1)·k in [t·n,(t+1)·n))
 *   tier_start  = ceil(t·n / k) = (t·n + k - 1) div k   (0-based)
 *   pos         = (r - 1 - tier_start)·k + tier
 *
 * `pos` is collision-free because within a tier consecutive ranks are
 * k apart and distinct tiers differ in `pos mod k`. The 1-row corpus
 * count broadcasts; nothing concentrates.
 */
object Curriculum {

  /** Append `rank` (1-based by (scoreCol asc, idCol asc)), `tier`
    * (0-based of `k`) and `pos` (0-based interleaved position). */
  def interleave(df: DataFrame, idCol: String, scoreCol: String,
                 k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val ranked = PrefixSum.withGlobalRank(
      df, Seq(col(scoreCol).asc, col(idCol).asc), "rank")
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("tier", expr(s"((rank - 1) * $k) div __n"))
      .withColumn("pos",
        expr(s"(rank - 1 - (tier * __n + $k - 1) div $k) * $k + tier"))
      .drop("__n")
  }
}
