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
}
