package graft

import graft.operators._

/** Randomized differentials: the distributed sequence operators vs
  * straight-line in-memory reimplementations, on seeded random event
  * streams WITH timestamp collisions (the case hand-written fixtures
  * under-test). Any divergence — partitioning artifact, frame
  * off-by-one, tie instability — fails here before an oracle ever
  * sees it. */
class SequenceDifferentialSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  // seeded: identical data every run, collisions guaranteed by the
  // small ts domain
  private val rnd = new scala.util.Random(20260814L)
  private val events: Seq[(Long, Long, Long, String)] =
    (1L to 2000L).map { id =>
      (rnd.nextInt(20).toLong + 1, rnd.nextInt(300).toLong, id,
        s"s${rnd.nextInt(4)}")
    }.map { case (e, ts, id, st) => (e, ts, id, st) }

  private def df = events.toDF("e", "ts", "id", "st")

  test("transitions differential") {
    val got = Transitions.transitionCounts(df, "e", "ts", "id", "st")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val pairs = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(t => (t._2, t._3))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._4, b._4) }
    }
    val n = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val srcTotal = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val want = n.map { case ((a, b), c) => (a, b) -> (c, srcTotal(a)) }
    assert(got === want)
  }

  test("trailingRange differential (width straddles collisions)") {
    val width = 37L
    val got = TimeSeries.trailingRange(
        df.withColumn("v", org.apache.spark.sql.functions.col("id")),
        "e", "ts", "v", width)
      .select("e", "ts", "id", "trail_n", "trail_sum")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap
    events.foreach { case (e, ts, id, _) =>
      val in = events.filter(o => o._1 == e && o._2 > ts - width && o._2 <= ts)
      assert(got((e, ts, id)) === (in.size.toLong, in.map(_._3).sum),
        s"entity $e ts $ts")
    }
  }

  test("retention differential") {
    val period = 50L
    val got = Retention.retentionMatrix(df, "e", "ts", period)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // .toSeq BEFORE mapping to (cohort, periods): mapping a Map to
    // pairs re-keys it and silently merges entities sharing a cohort
    val perEntity = events.groupBy(_._1).toSeq.map { case (_, evs) =>
      val ps = evs.map(_._2 / period).distinct
      (ps.min, ps)
    }
    val want = perEntity
      .flatMap { case (c, ps) => ps.map(p => (c, p - c)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }

  test("session paths differential") {
    val gap = 25L
    val got = Paths.topPaths(df, "e", "ts", "id", "st", gap, k = 1000)
      .as[(String, Long)].collect().toMap
    val want = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(t => (t._2, t._3))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (Nil, ev) => List(List(ev))
        case (cur :: done, ev) =>
          if (ev._2 - cur.head._2 > gap) List(ev) :: cur :: done
          else (ev :: cur) :: done
      }
      sessions.map(sess => sess.reverse.map(_._4).mkString(">"))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }

  test("global rank differential on a colliding sort key") {
    val ranked = PrefixSum.withGlobalRank(
        df.repartition(13),
        Seq(org.apache.spark.sql.functions.col("ts").asc,
          org.apache.spark.sql.functions.col("id").asc), "rank")
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = events.sortBy(t => (t._2, t._3)).zipWithIndex
      .map { case (t, i) => t._3 -> (i + 1L) }.toMap
    assert(ranked === want)
  }
}
