package graft

import graft.operators.SnapshotDiff

/** Conformance for the snapshot diff classifier. */
class SnapshotDiffSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    val old = Seq(
      (1L, Option("a"), "x"), (2L, Option("b"), "x"),
      (3L, Option("c"), "x"), (4L, None: Option[String], "x")
    ).toDF("k", "t", "g")
    val nw = Seq(
      (1L, Option("a"), "x"),   // unchanged
      (2L, Option("B"), "x"),   // changed (t)
      (4L, None: Option[String], "x"), // unchanged via null-safe compare
      (5L, Option("e"), "x")    // added
    ).toDF("k", "t", "g")       // 3 removed
    val got = SnapshotDiff.diff(old, nw, "k", Seq("t", "g"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("null -> value transition is changed, not unchanged") {
    val old = Seq((1L, None: Option[String])).toDF("k", "t")
    val nw = Seq((1L, Option("v"))).toDF("k", "t")
    val got = SnapshotDiff.diff(old, nw, "k", Seq("t"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed"))
  }

  test("Backfill.plan: ok / missing / stale / orphan, and the NULL partition survives") {
    val s = spark
    import s.implicits._
    import graft.operators.Backfill
    import org.apache.spark.sql.functions.col
    val src0 = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),
      ("p2", 3L, "c"),
      ("p3", 4L, "d"),
      (null.asInstanceOf[String], 5L, "e")).toDF("part0", "id", "v")
    val dst0 = Seq(
      ("p1", 1L, "a"), ("p1", 2L, "b"),          // ok
      // p2 absent -> missing
      ("p3", 4L, "CHANGED"),                      // stale (same count)
      ("p9", 9L, "x"),                            // orphan
      (null.asInstanceOf[String], 5L, "e")).toDF("part0", "id", "v")
    val got = Backfill.plan(src0, dst0, "part0", Seq("id", "v"))
      .collect().map(r => Option(r.getString(0)) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(Some("p1")) === (("ok", 2L, 2L)))
    assert(got(Some("p2")) === (("missing", 1L, 0L)))
    assert(got(Some("p3")) === (("stale", 1L, 1L)))
    assert(got(Some("p9")) === (("orphan", 0L, 1L)))
    assert(got(None) === (("ok", 1L, 1L)), "null partition must join, not vanish")
    // order-insensitivity: permuting rows inside a partition stays ok
    val perm = Backfill.plan(src0,
      dst0.orderBy(col("v").desc), "part0", Seq("id", "v"))
      .filter(col("part") === "p1").collect()(0)
    assert(perm.getString(1) === "ok")
  }
}
