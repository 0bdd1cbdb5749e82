package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association rules over (group, item) memberships — the
 * market-basket pass (support / confidence / lift) that surfaces
 * "items that co-occur far above chance": co-purchased parts, tokens
 * that co-occur across documents, co-firing event types.
 *
 * For an item pair (a, b), a < b:
 *   support    c_ab = |groups containing both|
 *   confidence c_ab / c_a   (P(b | a))
 *   lift       n·c_ab / (c_a·c_b)   (observed / independence)
 *
 * Confidence and lift are each ONE IEEE division of exact BIGINT
 * operands (the numerator product computed in BIGINT first), so the
 * emitted doubles are correctly-rounded functions of the counts —
 * bit-identical cross-engine, no rounding discipline needed.
 *
 * Scale shape: memberships dedup once (one shuffle); the pair
 * explosion is quadratic in GROUP size like
 * [[Graph.cooccurrenceEdges]] and carries the same ENFORCED
 * `maxGroupSize` guard (any group over the bound fails loudly); the
 * support filter applies at the pair-count aggregation (before the
 * stats joins), and the per-item counts frame is items-sized — small
 * enough to auto-broadcast for any realistic vocabulary, but the join
 * strategy is deliberately left to AQE's measured size check (no
 * forced hint): a 10⁹-item vocabulary degrades to a shuffle join
 * instead of OOMing the driver.
 */
object Associations {

  /** Association rules for every unordered item pair whose RELATIVE
    * support is at least `minSupportNum / minSupportDen` of the group
    * count (absolute thresholds don't survive corpus growth; the
    * fraction compares integer-exactly by cross-multiplication):
    * (a, b, c_ab, c_a, c_b, conf, lift). `conf` is P(b | a) for the
    * (a, b) orientation; the reverse reads off the same row as
    * c_ab / c_b. */
  def rules(df: DataFrame, groupCol: String, itemCol: String,
            minSupportNum: Long, minSupportDen: Long,
            maxGroupSize: Long = 1L << 16): DataFrame = {
    require(minSupportNum >= 0 && minSupportDen >= 1,
      s"bad support fraction $minSupportNum/$minSupportDen")
    val m = Graph.guardGroupSize(
      df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct(),
      maxGroupSize, "Associations.rules")
    val nGroups = m.agg(countDistinct("g").as("n"))
    val itemCnt = m.groupBy("i").agg(count(lit(1)).as("c"))
    val pairs = m.as("x").join(m.as("y"),
        col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("c_ab"))
      .crossJoin(broadcast(nGroups))
      .filter(col("c_ab") * minSupportDen >= col("n") * minSupportNum)
    pairs
      .join(itemCnt.select(col("i").as("a"), col("c").as("c_a")), "a")
      .join(itemCnt.select(col("i").as("b"), col("c").as("c_b")), "b")
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        (col("c_ab").cast("double") / col("c_a")).as("conf"),
        ((col("n") * col("c_ab")).cast("double") / (col("c_a") * col("c_b")))
          .as("lift"))
  }
}
