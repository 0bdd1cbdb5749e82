package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkTestBase {

  // epoch-nanos base far beyond a double's 2^53 exact-integer range —
  // catches any float division sneaking into the bucketing
  private val T0 = 1704067200000000000L // 2024-01-01T00:00:00Z in nanos
  private val Hour = 3600000000000L

  private def events(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "event_id")
  }

  test("bucketCounts buckets by exact integral division on epoch-nanos") {
    val df = events(Seq(
      (1L, T0, 10L), (1L, T0 + Hour - 1, 11L), // same hour, last nano
      (1L, T0 + Hour, 12L),                    // next hour, first nano
      (2L, T0 + 5 * Hour + 123L, 20L)))
    val got = TimeSeries.bucketCounts(df, "user_id", "ts", Hour, "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val h0 = T0 / Hour
    assert(got === Set((1L, h0, 2L, 11L), (1L, h0 + 1, 1L, 12L), (2L, h0 + 5, 1L, 20L)))
  }

  test("gapFill emits every bucket in each key's span, zero-filled, carry forward") {
    val df = events(Seq(
      (1L, T0, 10L), (1L, T0 + 3 * Hour, 13L), // gap at hours +1, +2
      (2L, T0 + Hour, 21L)))                   // single-bucket span
    val c = TimeSeries.bucketCounts(df, "user_id", "ts", Hour, "event_id")
    val got = TimeSeries.gapFill(c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val h0 = T0 / Hour
    assert(got === Set(
      (1L, h0, 1L, 10L),
      (1L, h0 + 1, 0L, 10L), // gap: cnt 0, carry held
      (1L, h0 + 2, 0L, 10L),
      (1L, h0 + 3, 1L, 13L),
      (2L, h0 + 1, 1L, 21L)))
  }

  test("anomalies flags a planted spike integer-exactly and honors minBuckets") {
    // key 1: twelve quiet hours at cnt=1 plus one spike hour at cnt=10
    // key 2: same shape but only 5 buckets -> below minBuckets, never scored
    val quiet = (0 until 12).flatMap(h => Seq((1L, T0 + h * Hour, 100L + h)))
    val spike = (0 until 10).map(i => (1L, T0 + 12 * Hour + i * 1000L, 200L + i))
    val small = (0 until 5).map(h => (2L, T0 + h * Hour, 300L + h))
    val c = TimeSeries.bucketCounts(
      events(quiet ++ spike ++ small), "user_id", "ts", Hour, "event_id")
    val got = TimeSeries.anomalies(c, z = 3, minBuckets = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, T0 / Hour + 12, 10L)))
    // hand-check the integer inequality for the flagged row:
    // n=13, s=22, ss=112: (10*13-22)^2 = 11664 > 9*(13*112-484) = 8748
    assert((10L * 13 - 22) * (10L * 13 - 22) > 9L * (13 * 112 - 22 * 22))
    // and for a quiet row: (1*13-22)^2 = 81 <= 8748 -> not flagged
    assert((1L * 13 - 22) * (1L * 13 - 22) <= 9L * (13 * 112 - 22 * 22))
  }

  test("seasonalAnomalies judges a bucket against its own phase only") {
    // 24 hourly buckets, period 4. All cnt=5 except bucket 12 (phase 0)
    // at cnt=50. Phase 0 sees 6 buckets {0,4,...,20}: n=6, s=75, ss=2625.
    // NOTE a single outlier among n otherwise-identical points has
    // z² = n-1 exactly, so n must exceed z²+1 for a strict flag — the
    // first draft used n=5 with z=2 and tied 32400 > 32400.
    val rows = (0 until 24).flatMap { h =>
      val cnt = if (h == 12) 50 else 5
      (0 until cnt).map(i => (1L, T0 + h * Hour + i * 1000L, 100L + h))
    }
    val c = TimeSeries.bucketCounts(events(rows), "user_id", "ts", Hour, "event_id")
    val got = TimeSeries.seasonalAnomalies(c, period = 4, z = 2, minBuckets = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // (50*6-75)^2 = 50625 > 4*(6*2625-75^2) = 40500 -> flagged
    val t0h = T0 / Hour
    assert(got.toSeq === Seq(((t0h + 12) % 4, t0h + 12, 50L)))
    // the GLOBAL detector at the same z also flags it, but seasonal
    // keeps quiet phases quiet: no other bucket flagged
    assert(TimeSeries.seasonalAnomalies(c, period = 4, z = 2, minBuckets = 7)
      .count() === 0L, "phases below minBuckets are never scored")
    intercept[IllegalArgumentException](
      TimeSeries.seasonalAnomalies(c, period = 1, z = 2, minBuckets = 4))
  }

  test("cumulativeUniques: first-seen collapse equals running count distinct") {
    val s2 = spark
    import s2.implicits._
    // buckets of 10: u1 in b0+b1, u2 in b0, u3 in b2; null key/ts dropped
    val df = Seq(
      (Option(1L), Option(1L)), (Option(1L), Option(11L)),
      (Option(2L), Option(3L)), (Option(2L), Option(4L)),
      (Option(3L), Option(25L)),
      (Option.empty[Long], Option(5L)), (Option(9L), Option.empty[Long]))
      .toDF("user_id", "ts")
    val got = TimeSeries.cumulativeUniques(df, "user_id", "ts", 10L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, 2L), // u1, u2 both new
      (1L, 1L, 0L, 2L), // u1 returning only
      (2L, 1L, 1L, 3L)  // u3 new
    ))
  }

  test("anomalies never flags a constant series (zero variance both sides)") {
    val rows = (0 until 20).map(h => (1L, T0 + h * Hour, h.toLong))
    val c = TimeSeries.bucketCounts(events(rows), "user_id", "ts", Hour, "event_id")
    assert(TimeSeries.anomalies(c, z = 3, minBuckets = 12).count() === 0L)
  }

  test("debounce keeps rows whose same-key predecessor is more than gap older") {
    val df = events(Seq(
      (1L, T0, 10L),
      (1L, T0 + 30L, 11L),  // 30ns after -> suppressed (gap 60)
      (1L, T0 + 100L, 12L), // 70ns after previous EVENT -> kept
      (2L, T0 + 10L, 20L))) // different key -> kept
    val got = TimeSeries.debounce(df, Seq("user_id"), "ts", gap = 60L,
        tieCols = Seq("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L, 12L, 20L))
  }

  test("debounce ties on ts resolve by tieCols, deterministically") {
    val df = events(Seq((1L, T0, 2L), (1L, T0, 1L), (1L, T0 + 100L, 3L)))
    val got = TimeSeries.debounce(df, Seq("user_id"), "ts", gap = 60L,
        tieCols = Seq("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    // order is (ts, event_id): id1 first (kept), id2 same ts (diff 0,
    // suppressed), id3 100ns later (kept)
    assert(got === Set(1L, 3L))
  }

  test("anomaliesStream scores online against prior-batch moments, O(1) state") {
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[TimeSeries.BucketObs]
    val q = TimeSeries.anomaliesStream(in.toDS(), z = 3, minBuckets = 12)
      .writeStream.format("memory").queryName("anoms")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: twelve quiet buckets for key 1 — builds moments, and the
      // online pass flags nothing (early buckets score vs n < minBuckets)
      in.addData((0 until 12).map(b => TimeSeries.BucketObs(1L, b, 1L)): _*)
      q.processAllAvailable()
      assert(s.table("anoms").count() === 0L)
      // batch 2: a spike bucket and another quiet one; spike flags
      // against moments n=12, s=12, ss=12:
      // (10*12-12)^2 = 11664 > 9*(12*12-144) = 0 -> flagged
      in.addData(TimeSeries.BucketObs(1L, 12L, 10L), TimeSeries.BucketObs(1L, 13L, 1L))
      q.processAllAvailable()
      val flagged = s.table("anoms").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(flagged.toSeq === Seq((1L, 12L, 10L, 12L, 12L)))
    } finally q.stop()
  }

  test("decayedSum: hand-computed fixed-point weights, cap, and guards") {
    val s = spark
    import s.implicits._
    import graft.operators.TimeSeries
    val hl = 100L // half-life in "nanos" for the toy clock
    // key a: ages 0, 1, 2 half-lives with value 10 each
    //   -> 10*2^20 + 10*2^19 + 10*2^18 = 10 * (2^20 + 2^19 + 2^18)
    // key b: age far beyond maxK -> weight exactly 1
    val df = Seq(
      ("a", 1000L, 10L), ("a", 900L, 10L), ("a", 800L, 10L),
      ("b", 1000L - 100L * 50, 7L)).toDF("k", "ts", "v")
    val got = TimeSeries.decayedSum(df, "k", "ts", "v", hl, maxK = 20)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val p20 = 1L << 20
    assert(got("a") === ((10L * (p20 + p20 / 2 + p20 / 4), 3L)))
    assert(got("b") === ((7L, 1L)), "beyond maxK half-lives the weight is 1")
    // non-integral value column rejected loudly
    val bad = Seq(("a", 1000L, 1.5)).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.decayedSum(bad, "k", "ts", "v", hl)
    }
    assert(e.getMessage.contains("INTEGRAL"))
    // overflow guard trips in-plan on an oversized value
    val big = Seq(("a", 1000L, 2000000L)).toDF("k", "ts", "v")
    val e2 = intercept[Exception] {
      TimeSeries.decayedSum(big, "k", "ts", "v", hl).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e2).exists(_.contains("maxAbsValue")), msgs(e2).mkString(";"))
  }
}
