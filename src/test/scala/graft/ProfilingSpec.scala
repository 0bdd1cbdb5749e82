package graft

import graft.pipeline.Profiling

class ProfilingSpec extends SparkTestBase {

  test("one row per column with exact counts, ndv, min/max as strings") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("x")), (2L, None), (2L, Some("a")))
      .toDF("k", "v")
    val got = Profiling.profile(df, Seq("k", "v")).orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(got(0) === ("k", 3L, 0L, 2L, "1", "2"))
    assert(got(1) === ("v", 3L, 1L, 2L, "a", "x"))
  }

  test("all columns profile in ONE job — a single shuffle, no per-column scans") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x", 2.0)).toDF("a", "b", "c")
    val plan = Profiling.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    // one aggregate pair (partial+final) over an Expand — not 3 joins
    assert(plan.contains("Expand"), plan.take(800))
    assert(!plan.contains("Join"), plan.take(800))
  }
}
