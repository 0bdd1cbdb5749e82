package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resilient two-stage aggregation. A hot key (one key holding a large
 * share of the data) turns an ordinary `groupBy(key)` into a single
 * overloaded reducer at scale. Salting spreads each key across
 * `buckets` sub-keys for a first partial aggregation, then re-aggregates
 * the (small) partials by the real key — two shuffles, both balanced.
 *
 * Correct for decomposable aggregates (count/sum/min/max); AQE's skew-join
 * handling covers joins, this covers aggregations.
 */
object Skew {

  /** Deterministic row-spreading salt in [0, buckets). Derived from a
    * per-row id rather than the key (the whole point is that rows of the
    * SAME key get different salts). */
  def salt(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  /**
   * Salted count + sum per key tuple: stage 1 groups by (keys..., salt),
   * stage 2 sums the partials by keys. Result equals the plain
   * `groupBy(keys).agg(count, sum)` — verified against the SQL oracle —
   * with bounded per-reducer load regardless of key skew.
   */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", salt(buckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum"))
  }

  /**
   * Join/aggregation skew ADVISOR: the top-`topK` hottest key tuples
   * with row count, the (exact, cross-multipliable) n/total share pair,
   * and the salt factor that would cap any single (key, salt) bucket at
   * `targetRowsPerBucket` rows — i.e. the `buckets` argument you'd hand
   * [[salt]]/[[saltedCountSum]], computed instead of guessed. Run it on
   * the join key of a stage that spills or straggles; `skewed = false`
   * everywhere means salting would only add a shuffle.
   *
   * Scale shape: one map-side-combined groupBy on the key (the same
   * exchange the skewed operation itself would pay), a 1-row broadcast
   * total, and a TakeOrdered top-k — never a global sort; output is
   * `topK` rows. Integer arithmetic throughout (`div`, not `/`) so the
   * report hashes identically on any engine.
   */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 targetRowsPerBucket: Long, topK: Int): DataFrame = {
    require(targetRowsPerBucket >= 1, "targetRowsPerBucket must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val keys = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("salt_factor",
        expr(s"(n + ${targetRowsPerBucket - 1}) div $targetRowsPerBucket"))
      .withColumn("skewed", col("salt_factor") > 1)
      .orderBy(col("n").desc +: keys: _*)
      .limit(topK)
  }
}
