package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("pointInInterval matches closed bounds, negatives, and bucket boundaries") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      (1L, 0.0), (2L, 5.0), (3L, -3.5), (4L, 10.0), (5L, 99.0),
      (6L, Double.NaN)
    ).toDF("pid", "p")
    val ivs = Seq(
      (10L, 0.0, 5.0),    // catches 1 (lo bound), 2 (hi bound)
      (11L, -4.0, -3.0),  // catches 3 (negative domain)
      (12L, 9.5, 10.5),   // catches 4
      (13L, 50.0, 40.0)   // hi < lo: empty, matches nothing
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("pointInInterval agrees with the naive non-equi join on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100 - 50)).toDF("pid", "p")
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 5)
    }.toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("no duplicate pairs even when an interval spans many buckets") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 7.3)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val rows = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = 0.5)
      .collect()
    assert(rows.length === 1)
  }

  test("the guard catches sentinel endpoints that would overflow the long bucket index") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    // "no upper bound" encodings: Infinity and a near-max double — a
    // long-based count would wrap negative and slip past the cap
    Seq(Double.PositiveInfinity, 1e300).foreach { hi =>
      val ivs = Seq((10L, 0.0, hi)).toDF("iid", "lo", "hi")
      val ex = intercept[Exception] {
        RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi",
          bucketWidth = 1.0, maxBucketsPerInterval = 1000).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")), msgs(ex).mkString("; "))
    }
  }

  test("the bucket-span guard fails loudly on a domain-spanning interval") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi",
        bucketWidth = 1.0, maxBucketsPerInterval = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")), msgs(ex).mkString("; "))
  }

  test("intervalOverlap agrees with the naive non-equi join, multiplicity included") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val as = (1 to 120).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("aid", "a_lo", "a_hi")
    val bs = (1 to 90).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("bid", "b_lo", "b_hi")
    val fast = RangeJoin.intervalOverlap(as, "a_lo", "a_hi", bs, "b_lo", "b_hi",
        bucketWidth = 4.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = as.join(bs, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: compare as SORTED SEQS, not sets — a duplicate emission
    // from two shared buckets would survive a set comparison
    assert(fast.sorted.toSeq === naive.sorted.toSeq)
    assert(fast.nonEmpty)
  }

  test("intervalOverlap: wide overlap spanning many shared buckets emits exactly once") {
    val s = spark
    import s.implicits._
    val as = Seq((1L, 0.0, 50.0)).toDF("aid", "a_lo", "a_hi")
    val bs = Seq((2L, 10.0, 60.0)).toDF("bid", "b_lo", "b_hi")
    val rows = RangeJoin.intervalOverlap(as, "a_lo", "a_hi", bs, "b_lo", "b_hi",
      bucketWidth = 1.0).collect()
    assert(rows.length === 1)
  }

  test("intervalOverlap: touching endpoints match (closed), disjoint and degenerate do not") {
    val s = spark
    import s.implicits._
    val as = Seq((1L, 0.0, 10.0), (2L, 20.0, 19.0)).toDF("aid", "a_lo", "a_hi")
    val bs = Seq((3L, 10.0, 15.0), (4L, 10.1, 15.0),
      (5L, 19.0, 21.0)).toDF("bid", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(as, "a_lo", "a_hi", bs, "b_lo", "b_hi",
        bucketWidth = 5.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a1 touches b3 at 10.0 exactly; a2 is degenerate (hi < lo) and
    // matches nothing even though b5 covers its range
    assert(got === Set((1L, 3L)))
  }

  test("intervalOverlap: the bucket-span guard trips on either side") {
    val s = spark
    import s.implicits._
    val as = Seq((1L, 0.0, 5.0)).toDF("aid", "a_lo", "a_hi")
    val bs = Seq((2L, 0.0, 1e9)).toDF("bid", "b_lo", "b_hi")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(as, "a_lo", "a_hi", bs, "b_lo", "b_hi",
        bucketWidth = 1.0, maxBucketsPerInterval = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")), msgs(ex).mkString("; "))
  }
}
