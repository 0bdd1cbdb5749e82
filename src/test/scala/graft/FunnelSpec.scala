package graft

import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {

  private def ev(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "event_type")
  }

  private def run(df: org.apache.spark.sql.DataFrame, window: Long = 100L) =
    Funnel.funnel(df, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), window)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap

  test("full conversion, partial depth, and no-step-1 absence") {
    val got = run(ev(Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"), // depth 3
      (2L, 10L, "A"), (2L, 20L, "B"),                 // depth 2
      (3L, 20L, "B"), (3L, 30L, "C"))))               // no A: absent
    assert(got(1L) === ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(got(2L) === ((Some(10L), Some(20L), None, 2L)))
    assert(!got.contains(3L))
  }

  test("steps must be strictly after the previous step and inside the window") {
    val got = run(ev(Seq(
      (1L, 10L, "A"), (1L, 10L, "B"),                  // B at same ts: not after
      (2L, 10L, "A"), (2L, 200L, "B"),                 // B past window 100
      (3L, 10L, "A"), (3L, 50L, "B"), (3L, 110L, "C"), // C at t1+100: inclusive
      (4L, 10L, "A"), (4L, 50L, "B"), (4L, 111L, "C")))) // C past deadline
    assert(got(1L)._4 === 1L)
    assert(got(2L)._4 === 1L)
    assert(got(3L) === ((Some(10L), Some(50L), Some(110L), 3L)))
    assert(got(4L)._4 === 2L)
  }

  test("first-touch: t1 is the EARLIEST step-1, later step-1s never restart") {
    // first A at 10 (its window ends 110); the B at 300 follows the
    // second A at 250 but the funnel is anchored at the first touch
    val got = run(ev(Seq(
      (1L, 10L, "A"), (1L, 250L, "A"), (1L, 300L, "B"))))
    assert(got(1L) === ((Some(10L), None, None, 1L)))
  }

  test("earliest valid step is chosen, keeping later steps feasible") {
    val got = run(ev(Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 90L, "B"), (1L, 50L, "C"))))
    // min valid B is 20, so C at 50 qualifies (with B=90 it would not)
    assert(got(1L) === ((Some(10L), Some(20L), Some(50L), 3L)))
  }
}
