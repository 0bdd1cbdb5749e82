package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Conformance for the as-of (point-in-time) join: backward-inclusive
  * match, tolerance bound, null keys/times, tie handling, reserved-name
  * guard. Semantics mirror the DuckDB/pandas ASOF LEFT JOIN contract. */
class AsofJoinSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  private def left = Seq(
    // (key, t, tag)
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
    ("b", 10L, "l3"), ("c", 10L, "l4")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    ("a", 5L, 1.0), ("a", 15L, 2.0), ("b", 10L, 3.0), ("d", 1L, 4.0)
  ).toDF("k", "t", "v")

  private def runToMap = {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("v"))
    out.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("t")) ->
      (Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("r_v")))).toMap
  }

  test("backward inclusive: latest right row with r.t <= l.t, else null") {
    val m = runToMap
    assert(m(("a", 5L)) === (Some(5L), Some(1.0)))   // inclusive at equality
    assert(m(("a", 10L)) === (Some(5L), Some(1.0)))  // 15 is in the future
    assert(m(("a", 20L)) === (Some(15L), Some(2.0))) // most recent wins
    assert(m(("b", 10L)) === (Some(10L), Some(3.0)))
    assert(m(("c", 10L)) === (None, None))           // key with no right rows
  }

  test("every left row survives exactly once (left join, no explosion)") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() === left.count())
    assert(out.columns.toSet === Set("k", "t", "tag", "r_t", "r_v"))
  }

  test("tolerance: matches farther back than the bound come out null") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("v"),
      tolerance = Some(3L))
    val m = out.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("t")) ->
      Option(r.getAs[Any]("r_v"))).toMap
    assert(m(("a", 5L)) === Some(1.0))   // lag 0 <= 3
    assert(m(("a", 10L)) === None)       // lag 5 > 3
    assert(m(("a", 20L)) === None)       // lag 5 > 3
    assert(m(("b", 10L)) === Some(3.0))  // lag 0
  }

  test("null right keys/times never join; null-key left rows come out unmatched") {
    val l = Seq((Some("a"), Some(10L), "x"), (None: Option[String], Some(10L), "y"),
      (Some("a"), None: Option[Long], "z")).toDF("k", "t", "tag")
    val r = Seq((Some("a"), Some(5L), 1.0), (None: Option[String], Some(1L), 9.0),
      (Some("a"), None: Option[Long], 8.0)).toDF("k", "t", "v")
    val out = AsofJoin.asofBackward(l, r, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() === 3)
    val byTag = out.collect().map(x => x.getAs[String]("tag") ->
      Option(x.getAs[Any]("r_v"))).toMap
    assert(byTag("x") === Some(1.0)) // the null-keyed/timed right rows are invisible
    assert(byTag("y") === None)
    // null left time: no right row can be <= null — unmatched
    assert(byTag("z") === None)
  }

  test("ties on (key, rightTime): deduped right gives a deterministic answer") {
    val r = Seq(("a", 5L, 1.0), ("a", 5L, 7.0)).toDF("k", "t", "v")
    val dedup = r.groupBy("k", "t").agg(max("v").as("v"))
    val out = AsofJoin.asofBackward(left.filter($"k" === "a"), dedup,
      Seq("k"), "t", "t", Seq("v"))
    assert(out.collect().forall(_.getAs[Double]("r_v") === 7.0))
  }

  test("multi-key equality join keys") {
    val l = Seq(("a", 1, 10L, "x"), ("a", 2, 10L, "y")).toDF("k1", "k2", "t", "tag")
    val r = Seq(("a", 1, 5L, 1.0), ("a", 2, 6L, 2.0)).toDF("k1", "k2", "t", "v")
    val m = AsofJoin.asofBackward(l, r, Seq("k1", "k2"), "t", "t", Seq("v"))
      .collect().map(x => x.getAs[String]("tag") -> x.getAs[Double]("r_v")).toMap
    assert(m === Map("x" -> 1.0, "y" -> 2.0))
  }

  test("reserved internal names and prefixed collisions are rejected") {
    val bad = left.withColumnRenamed("tag", "__t")
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(bad, right, Seq("k"), "t", "t", Seq("v"))
    }
    val collide = left.withColumnRenamed("tag", "r_v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(collide, right, Seq("k"), "t", "t", Seq("v"))
    }
  }
}
