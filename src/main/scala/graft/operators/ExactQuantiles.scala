package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact interpolating quantiles (the `percentile`/`quantile_cont`
 * definition: index `p·(n-1)`, linear interpolation) computed from
 * VALUE COUNTS instead of Spark's built-in exact `percentile` aggregate.
 *
 * Why: the built-in buffers every row's value in the aggregation state —
 * O(rows) memory and serialization, a collect-all in disguise; at 100 TB
 * it falls over. This plan is one hash aggregation on the value (the
 * only full shuffle, map-side combined), then a cumulative-count window
 * over the DISTINCT values only, then a rank lookup. State is O(distinct
 * values) — bounded by the value domain (e.g. integer cents), not the
 * row count. The global window sorts only distinct values and spills;
 * for domains too large even for that, fall back to the sketch path
 * (KLL, `GroupedDistribution`) and give up exactness.
 *
 * Interpolation arithmetic is identical to `quantile_cont`, so results
 * are oracle-comparable; with integer-valued inputs the interpolated
 * values are exact doubles.
 *
 * The bounded-domain regime is ENFORCED, not just documented: the
 * distinct-value count is measured first and the global window refuses
 * to run above `maxDomain` — a caller feeding raw continuous doubles
 * gets an immediate error naming the sketch fallback instead of a
 * silent one-task global sort.
 */
object ExactQuantiles {

  /** Default ceiling on distinct values the single-task cumulative
    * window may sort. 4M distinct (v, c, lo, hi) rows is ~128 MB on one
    * task — comfortably inside one executor core's working memory. */
  val DefaultMaxDomain: Long = 4000000L

  /** The exact `ps` quantiles of numeric column `valueCol` of `df`,
    * returned as a Map(p -> value). Runs three Spark jobs (distinct-domain
    * probe + total count on the cached counts, then the ranked lookup);
    * driver traffic is O(|ps|). Fails fast when the value domain exceeds
    * `maxDomain` — use the KLL sketch path (`GroupedDistribution`) for
    * continuous/high-cardinality columns and give up exactness. */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                maxDomain: Long = DefaultMaxDomain): Map[Double, Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps must be in [0,1]")
    val counts = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .persist()
    try {
      // domain guard BEFORE the global window: the orderBy-without-
      // partitionBy below moves every distinct value to ONE task, which
      // is only safe for bounded domains (integer cents, ordinals, ...)
      val distinctValues = counts.count()
      require(distinctValues <= maxDomain,
        s"ExactQuantiles: $distinctValues distinct values of '$valueCol' exceeds " +
          s"maxDomain=$maxDomain; the exact cumulative-count window would sort them " +
          "on a single task. Use the KLL sketch path (graft.operators." +
          "GroupedDistribution) for continuous/high-cardinality domains, or " +
          "pre-quantize the column (e.g. integer cents) to a bounded domain.")
      // total row count from the already-aggregated counts — no second
      // scan of the input
      val n = counts.agg(coalesce(sum("c"), lit(0L))).collect()(0).getLong(0)
      require(n > 0, "no non-null values")
      val w = Window.orderBy("v")
      val cum = counts.select(col("v"), col("c"),
        (sum("c").over(w) - col("c")).as("lo"), sum("c").over(w).as("hi"))
      // 0-based ranks needed: floor and ceil of every p*(n-1)
      val idx = ps.map(p => p -> p * (n - 1)).toMap
      val ranks = idx.values.flatMap(i => Seq(math.floor(i).toLong,
        math.ceil(i).toLong)).toSeq.distinct
      val vals = cum.filter(ranks.map(r => col("lo") <= r && col("hi") > r)
          .reduce(_ || _))
        .select("v", "lo", "hi").collect()
        .flatMap(r => ranks.filter(k => r.getLong(1) <= k && k < r.getLong(2))
          .map(_ -> r.getDouble(0))).toMap
      idx.map { case (p, i) =>
        val (fl, ce) = (math.floor(i).toLong, math.ceil(i).toLong)
        val f = i - fl
        p -> (vals(fl) + f * (vals(ce) - vals(fl)))
      }
    } finally counts.unpersist()
  }
}
