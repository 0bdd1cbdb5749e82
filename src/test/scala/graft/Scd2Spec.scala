package graft

import graft.operators.Scd2

class Scd2Spec extends SparkTestBase {

  private def hist(rows: Seq[(Long, Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    Scd2.fromChangeLog(rows.toDF("k", "t", "a", "tie"), "k", "t", "a", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
  }

  test("changes open/close intervals; the last row is current") {
    val got = hist(Seq((1L, 0L, "A", 0L), (1L, 10L, "B", 1L), (1L, 20L, "C", 2L)))
    assert(got === Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "B", 10L, Some(20L), false),
      (1L, "C", 20L, None, true)))
  }

  test("re-observed identical values collapse into one interval") {
    val got = hist(Seq(
      (1L, 0L, "A", 0L), (1L, 5L, "A", 1L), (1L, 9L, "A", 2L),
      (1L, 10L, "B", 3L), (1L, 15L, "B", 4L)))
    assert(got === Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "B", 10L, None, true)))
  }

  test("an A->B->A flip-flop produces three intervals, not two") {
    val got = hist(Seq(
      (1L, 0L, "A", 0L), (1L, 10L, "B", 1L), (1L, 20L, "A", 2L)))
    assert(got.map(_._2) === Seq("A", "B", "A"))
    assert(got.last === ((1L, "A", 20L, None, true)))
  }

  test("same-timestamp observations order by tie, keys are independent") {
    val got = hist(Seq(
      (1L, 0L, "A", 1L), (1L, 0L, "B", 2L), // tie order: A then B
      (2L, 0L, "Z", 0L)))
    assert(got === Seq(
      (1L, "A", 0L, Some(0L), false),
      (1L, "B", 0L, None, true),
      (2L, "Z", 0L, None, true)))
  }
}
