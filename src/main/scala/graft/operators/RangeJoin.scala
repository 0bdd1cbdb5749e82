package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scale-safe interval (range) join: match each point row to the interval
 * rows whose `[lo, hi]` contains it, WITHOUT a non-equi join. Spark plans
 * a raw `p >= lo AND p <= hi` join as BroadcastNestedLoopJoin — O(n·m)
 * work that only survives when one side fits in memory. This operator
 * bucketizes the domain instead: every interval explodes to the buckets
 * it covers, every point lands in exactly ONE bucket, and the join is a
 * plain equi-join on the bucket id followed by the exact containment
 * filter. One hash shuffle per side, AQE-skew-splittable, and no
 * duplicate pairs by construction (a point has one bucket, and each
 * matching interval covers that bucket exactly once).
 *
 * `bucketWidth` trades explode factor against bucket selectivity: an
 * interval produces `len/width + 1` rows, a bucket collects points and
 * interval-fragments within `width` of each other. Pick it near the
 * median interval length. `maxBucketsPerInterval` is the skew guard — a
 * pathological interval spanning the whole domain would otherwise explode
 * into millions of rows; the job FAILS (assert) rather than silently
 * ballooning, mirroring `Similarity.semanticDedup`'s cell guard.
 *
 * Inspired by the bucketized overlap-join strategy in genomic/interval
 * analytics on Spark (e.g. the "interval binning" scheme used by ADAM
 * and by range-join optimizations in several SQL engines).
 */
object RangeJoin {

  /**
   * Join `points` to the `intervals` whose `[loCol, hiCol]` (closed on
   * both ends) contains `ptCol`. Output: every points column + every
   * intervals column (names must not collide). Intervals with
   * `hi < lo` are empty and match nothing; null endpoints or points
   * never match.
   */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    val pb = points
      .filter(col(ptCol).isNotNull)
      .withColumn("__bucket", floor(col(ptCol) / bucketWidth).cast("long"))
    val lo = floor(col(loCol) / bucketWidth).cast("long")
    val hi = floor(col(hiCol) / bucketWidth).cast("long")
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(hiCol) >= col(loCol))
      // Guard in DOUBLE arithmetic, BEFORE any long bucket index exists: a
      // sentinel endpoint (1e300, Infinity as "no upper bound") overflows
      // the long index, and a long-based `hi - lo + 1` would wrap negative
      // and slip past the cap into a billion-row explode. The normalized
      // length never overflows and Infinity fails the comparison (the
      // guard is ≤ one bucket conservative vs the exact explode count).
      .withColumn("__len", (col(hiCol) - col(loCol)) / bucketWidth)
      .filter(assert_true(col("__len") < maxBucketsPerInterval,
        concat(lit("interval spans ~"), col("__len"),
          lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval: " +
            "raise bucketWidth (or the cap) — a domain-spanning interval " +
            "explodes the bucket join"))).isNull)
      .withColumn("__bucket", explode(sequence(lo, hi)))
      .drop("__len")
    pb.join(ib, "__bucket")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bucket")
  }

  /**
   * Interval×interval OVERLAP join: every (a, b) pair whose closed
   * intervals `[aLo, aHi]` and `[bLo, bHi]` intersect, as an equi-join
   * on the same domain buckets — never a nested-loop join. Both sides
   * explode to the buckets they cover; overlapping intervals are
   * guaranteed to share the bucket containing `max(aLo, bLo)` (the
   * later start lies inside both intervals), and the pair is emitted
   * ONLY from that bucket — exactly-once by construction, no distinct
   * pass. Output: every `a` column + every `b` column (names must not
   * collide). Degenerate intervals (`hi < lo`) and null endpoints
   * match nothing. Each side carries the same explode-factor guard as
   * [[pointInInterval]], in double arithmetic so sentinel endpoints
   * (±Infinity, 1e300) fail loudly instead of wrapping a long index.
   */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    def binned(df: DataFrame, loCol: String, hiCol: String): DataFrame =
      df.filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
          col(hiCol) >= col(loCol))
        .withColumn("__len", (col(hiCol) - col(loCol)) / bucketWidth)
        .filter(assert_true(col("__len") < maxBucketsPerInterval,
          concat(lit("interval spans ~"), col("__len"),
            lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval: " +
              "raise bucketWidth (or the cap) — a domain-spanning interval " +
              "explodes the bucket join"))).isNull)
        .withColumn("__bucket", explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
        .drop("__len")
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), "__bucket")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      // exactly-once: only the bucket holding the later start emits
      .filter(col("__bucket") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
