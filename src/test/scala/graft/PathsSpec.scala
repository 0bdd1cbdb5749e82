package graft

import graft.operators.Paths

/** Conformance for session path mining. */
class PathsSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("paths: gap splits sessions; order is (ts, tie); counts aggregate") {
    val ev = Seq(
      // user 1, session 1: a -> b; session 2 (gap > 10): a -> b
      (1L, 0L, 1L, "a"), (1L, 5L, 2L, "b"),
      (1L, 100L, 3L, "a"), (1L, 105L, 4L, "b"),
      // user 2, one session, same-ts tie broken by id: a -> c
      (2L, 0L, 5L, "a"), (2L, 0L, 6L, "c"),
      // user 3: lone event
      (3L, 0L, 7L, "a")
    ).toDF("u", "ts", "id", "st")
    val out = Paths.topPaths(ev, "u", "ts", "id", "st", gapUnits = 10L, k = 5)
      .as[(String, Long)].collect().toList
    assert(out === List(("a>b", 2L), ("a", 1L), ("a>c", 1L)))
  }

  test("paths: k truncates after (n desc, path) ordering") {
    val ev = (1L to 6L).flatMap(u =>
      Seq((u, 0L, u * 10, s"s$u"))) // 6 distinct single-event paths
      .toDF("u", "ts", "id", "st")
    val out = Paths.topPaths(ev, "u", "ts", "id", "st", 10L, 3)
      .as[(String, Long)].collect().toList
    assert(out === List(("s1", 1L), ("s2", 1L), ("s3", 1L)))
  }
}
