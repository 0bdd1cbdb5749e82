package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Time-series operators over an epoch-long timestamp column: bucketed
 * resampling with gap fill / forward fill, and integer-exact per-key
 * anomaly flagging — the monitoring pass a pipeline runs over ingest
 * volumes (per-source rates, per-user activity) to catch collection
 * failures (gaps) and floods (spikes) before they poison downstream
 * statistics.
 *
 * Both operators are two-shuffle plans keyed on the series key:
 * bucketing is a groupBy(key, bucket) with map-side partial
 * aggregation; the per-key pass (span or moment statistics) rides one
 * more exchange on the key alone. Nothing buffers a series in memory —
 * gap generation is a bounded `sequence` explode (one row per bucket in
 * the key's span) and anomaly scoring is pure per-row arithmetic
 * against broadcast-sized per-key moments.
 *
 * Anomaly scoring is INTEGER-exact: instead of a floating z-score
 * (whose summation-order-dependent variance would break cross-engine
 * hashes), the z² > z₀² test is cross-multiplied into
 * `(cnt·n − s)² > z₀²·(n·ss − s²)` over BIGINT counts — the population
 * z-test decided without a single double. Overflow headroom: with
 * per-bucket counts ≤ ~10⁶ and ≤ ~10⁵ buckets per key the largest term
 * is ~10¹⁷ < 2⁶³.
 */
object TimeSeries {

  /** Per-(key, bucket) event counts plus an optional carried value (the
    * max of `carryCol` in the bucket). `bucketSize` is in the timestamp
    * column's own unit (e.g. 3_600_000_000_000L for hours over
    * epoch-nanos). */
  def bucketCounts(df: DataFrame, keyCol: String, tsCol: String,
                   bucketSize: Long, carryCol: String): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    // `div`, not `/`: Column./ is DOUBLE division, and epoch-nanos
    // (~1.7e18) are far beyond a double's 2^53 exact-integer range —
    // the truncated quotient would be off by whole buckets.
    df.groupBy(col(keyCol).as("key"),
        expr(s"CAST($tsCol AS BIGINT) div ${bucketSize}L").as("bucket"))
      .agg(count(lit(1)).as("cnt"), max(col(carryCol)).as("carry"))
  }

  /**
   * Dense resample: every key gets one row per bucket from its first to
   * its last observed bucket; missing buckets appear with `cnt = 0` and
   * the carry column forward-filled from the last observed bucket.
   *
   * Scale shape: the span frame is one row per key (tiny next to the
   * counts) and joins back on the key; the `sequence` explode emits
   * exactly span-many rows per key — callers bound the blow-up by
   * choosing the bucket size against the data's time span (a 30-day
   * span at hour grain is 720 rows/key; at millisecond grain it would
   * be 2.6e9 — the operator trusts the caller's grain). Forward fill is
   * one window pass ordered by bucket within the key partition.
   */
  def gapFill(counts: DataFrame): DataFrame = {
    val spans = counts.groupBy("key")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
    val dense = spans
      .select(col("key"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(counts, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        last(col("carry"), ignoreNulls = true).over(w).as("carry"))
  }

  /**
   * Integer-exact spike detection: flags buckets whose count deviates
   * from the key's own mean by more than `z` population standard
   * deviations, deciding `((cnt·n − s)² > z²·(n·ss − s²))` entirely in
   * BIGINT. Keys with fewer than `minBuckets` observed buckets are not
   * scored (a 3-point series has no meaningful variance). Returns only
   * the flagged rows: (key, bucket, cnt, n, s).
   */
  def anomalies(counts: DataFrame, z: Int, minBuckets: Int): DataFrame = {
    val moments = counts.groupBy("key").agg(
      count(lit(1)).as("n"), sum("cnt").as("s"),
      sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("cnt") * col("n") - col("s")
    counts.join(moments, "key")
      .filter(col("n") >= minBuckets &&
        dev * dev > lit(z.toLong * z) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("key"), col("bucket"), col("cnt"), col("n"), col("s"))
  }

  /**
   * Seasonal-adjusted spike detection: identical integer-exact z² test
   * as [[anomalies]], but each bucket is judged against the moments of
   * its own PHASE — `phase = bucket mod period` (hour-of-day for hourly
   * buckets and period 24) — so a 9am burst is compared with 9am
   * history, not with a mean diluted by overnight lulls (which hides
   * daytime floods and false-flags every busy morning). Phases with
   * fewer than `minBuckets` observations are not scored. Same two-
   * shuffle shape, now keyed on (key, phase); returns flagged rows
   * (key, phase, bucket, cnt, n, s).
   */
  def seasonalAnomalies(counts: DataFrame, period: Int, z: Int,
                        minBuckets: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2 buckets, got $period")
    val withPhase = counts.withColumn("phase",
      pmod(col("bucket"), lit(period.toLong)))
    val moments = withPhase.groupBy("key", "phase").agg(
      count(lit(1)).as("n"), sum("cnt").as("s"),
      sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("cnt") * col("n") - col("s")
    withPhase.join(moments, Seq("key", "phase"))
      .filter(col("n") >= minBuckets &&
        dev * dev > lit(z.toLong * z) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("key"), col("phase"), col("bucket"), col("cnt"),
        col("n"), col("s"))
  }

  /**
   * Audience accounting (daily-uniques / new-vs-returning) via
   * FIRST-SEEN COLLAPSE: the running COUNT DISTINCT that naively needs
   * a sketch union per prefix or a quadratic self-join is EXACT in two
   * shuffles, because cumulative uniques through bucket b equals the
   * number of keys whose first-seen bucket is ≤ b. Per bucket:
   * `n_active` (distinct keys seen), `n_new` (keys first seen), and
   * `cum_uniques` (running Σ n_new). The only window runs over the
   * BUCKET domain — days or hours, thousands of rows at most after
   * aggregation, a documented bounded single-partition sort; every
   * corpus-sized stage is a map-side-combined groupBy.
   */
  def cumulativeUniques(df: DataFrame, keyCol: String, tsCol: String,
                        bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val d = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(expr(s"CAST($tsCol AS BIGINT) div ${bucketSize}L").as("bucket"),
        col(keyCol).as("__k"))
    val nActive = d.groupBy("bucket")
      .agg(count_distinct(col("__k")).as("n_active"))
    val nNew = d.groupBy("__k").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nActive.join(nNew, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_uniques", sum(col("n_new")).over(w))
  }

  /** One (key, bucket) observation entering [[anomaliesStream]]. */
  case class BucketObs(key: Long, bucket: Long, cnt: Long)
  /** Running per-key moments carried between micro-batches. */
  case class Moments(n: Long, s: Long, ss: Long)
  /** A flagged bucket: `n`/`s` are the moments the score was taken
    * against (BEFORE absorbing the bucket itself). */
  case class AnomalyFlag(key: Long, bucket: Long, cnt: Long, n: Long, s: Long)

  /**
   * ONLINE variant of [[anomalies]] for unbounded streams: each key
   * carries only its running (n, Σcnt, Σcnt²) moments — O(1) state per
   * key, no bucket history — and every arriving bucket is scored
   * against the moments accumulated so far, then absorbed. Same
   * integer-exact cross-multiplied z² test; the semantic difference
   * from the batch pass (which scores against FULL-corpus moments) is
   * inherent to online detection and intended — a flood is flagged
   * when it happens, not in retrospect after it has inflated the mean.
   * Within a micro-batch, buckets apply in ascending bucket order so
   * results don't depend on shuffle arrival order.
   */
  def anomaliesStream(counts: Dataset[BucketObs], z: Int, minBuckets: Int): Dataset[AnomalyFlag] = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts.groupByKey(_.key)
      .flatMapGroupsWithState[Moments, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, obs: Iterator[BucketObs], state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer[AnomalyFlag]()
          obs.toSeq.sortBy(o => (o.bucket, o.cnt)).foreach { o =>
            val dev = o.cnt * m.n - m.s
            if (m.n >= minBuckets &&
                dev * dev > z.toLong * z * (m.n * m.ss - m.s * m.s))
              out += AnomalyFlag(key, o.bucket, o.cnt, m.n, m.s)
            m = Moments(m.n + 1, m.s + o.cnt, m.ss + o.cnt * o.cnt)
          }
          state.update(m)
          out.iterator
      }
  }

  /**
   * Debounce (event-storm / double-fire suppression): a row survives
   * when the nearest preceding same-key row is MORE than `gap` older —
   * the lag-1 form, so a burst keeps only rows preceded by quiet, not
   * one row per `gap` of burst (that variant needs the kept-chain
   * recurrence; this one is a single window pass and what dashboards
   * mean by "collapse repeats within N seconds"). Pure integer
   * comparison on the timestamp column; one shuffle on the key
   * columns, window lag, filter.
   */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               gap: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(gap > 0, "gap must be positive")
    // tieCols make the lag order total when timestamps can collide —
    // without a total order, which of two same-ts rows survives is
    // engine- and shuffle-dependent
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull || col(tsCol) - col("__prev") > gap)
      .drop("__prev")
  }

  /**
   * Trailing-window aggregates with a true RANGE frame: for every
   * event, counts and an integer max over all same-key events in
   * `(ts - width, ts]` — "requests in the last hour AT each request",
   * the per-event form that tumbling buckets can't express (a bucket
   * boundary splits the hour; this frame never does). RANGE, not ROWS:
   * the frame is defined by timestamp distance, so same-ts peers are
   * all in-frame regardless of tie order, and sparse keys don't drag
   * old rows in. One shuffle on the key; Spark evaluates the moving
   * frame with two pointers over each key's sorted run — O(run), no
   * per-row rescan. The aggregated column must be integral (cents,
   * bytes, tokens): a windowed double sum would accumulate in
   * engine-specific order.
   */
  def trailingRange(df: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(-(width - 1), Window.currentRow)
    df.withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_max", max(col(valCol)).over(w))
      .withColumn("trail_sum", sum(col(valCol)).over(w))
  }

  /**
   * Recency-weighted (exponential-decay) scores with EXACT integer
   * arithmetic: per key, `Σ value · 2^(maxK − k)` where
   * `k = min(age_in_halflives, maxK)` and age is measured in whole
   * half-lives back from the corpus's newest timestamp. The score is in
   * fixed-point units of 2^−maxK · (value unit) — a float
   * `pow(0.5, age/halflife)` would tie the result to libm rounding and
   * summation order; the shifted-integer form is bit-identical across
   * engines and partitionings, which is what lets a decayed leaderboard
   * be oracle-checked at all. Items older than maxK half-lives all
   * weigh 2^0 = 1 fixed-point unit (≈ 2^−maxK of a fresh item — below
   * any ranking-relevant resolution).
   *
   * Plan: ONE row of global max-ts broadcast back via crossJoin (no
   * driver collect), then one map-side-combined groupBy on the key.
   * Overflow guard: |value| ≤ maxAbsValue asserted in-plan, so the
   * worst-case sum  n · maxAbsValue · 2^maxK  stays inside BIGINT for
   * corpora up to ~2^63 / (maxAbsValue·2^maxK) rows — the require
   * documents the bound instead of wrapping silently.
   */
  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, halfLifeNanos: Long, maxK: Int = 20,
                 maxAbsValue: Long = 1000000L): DataFrame = {
    require(halfLifeNanos > 0, "halfLifeNanos must be positive")
    require(maxK >= 1 && maxK <= 40, s"maxK must be in [1, 40], got $maxK")
    require(Set("long", "integer", "short", "byte")
        .contains(df.schema(valueCol).dataType.typeName),
      s"decayedSum needs an INTEGRAL value column (got " +
        s"${df.schema(valueCol).dataType.typeName}) — fixed-point exactness " +
        "is the point; pre-scale floats with round(x * unit).cast('long')")
    val newest = df.agg(max(col(tsCol)).as("__tmax"))
    val guarded = df.filter(assert_true(abs(col(valueCol)) <= maxAbsValue,
      concat(lit("decayedSum value "), col(valueCol),
        lit(s" exceeds maxAbsValue=$maxAbsValue — the 2^$maxK fixed-point " +
          "sum could overflow BIGINT; rescale the value or lower maxK")))
      .isNull)
    // integer `div`, not Column./ (double division would misplace whole
    // half-lives out beyond 2^53 epoch-nanos — same hazard as bucketCounts)
    guarded.crossJoin(newest)
      .withColumn("__k", least(
        expr(s"CAST(__tmax - $tsCol AS BIGINT) div ${halfLifeNanos}L"),
        lit(maxK.toLong)))
      .withColumn("__w", expr(s"shiftleft(1L, CAST($maxK - __k AS INT))"))
      .groupBy(col(keyCol))
      .agg(sum(col(valueCol) * col("__w")).as("decayed_fp"),
        count(lit(1)).as("n"))
      .withColumn("fp_unit_log2", lit(-maxK))
  }
}
