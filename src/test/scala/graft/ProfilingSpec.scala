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

  test("KeyDiscovery: the FK signature is containment 1.0 into the larger domain") {
    val s = spark
    import s.implicits._
    import graft.operators.KeyDiscovery
    val dim = (1L to 10L).map(Tuple1(_)).toDF("pk")
    val fact = Seq(1L, 1L, 2L, 3L, 3L, 3L).map(Tuple1(_)).toDF("fk")
    val noise = Seq(2L, 3L, 99L).map(Tuple1(_)).toDF("x")
    val got = KeyDiscovery.containmentReport(Seq(
        ("dim.pk", dim, "pk"), ("fact.fk", fact, "fk"),
        ("noise.x", noise, "x")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // fact.fk ⊆ dim.pk: the FK signature
    assert(got(("fact.fk", "dim.pk")) === ((3L, 10L, 3L, 1.0)))
    // the reverse direction is weak containment, not a FK
    assert(got(("dim.pk", "fact.fk")) === ((10L, 3L, 3L, 0.3)))
    // partial overlap shows as fractional containment
    assert(got(("noise.x", "dim.pk")) === ((3L, 10L, 2L, 2.0 / 3.0)))
    // zero-overlap pairs are absent, not zero rows
    assert(!got.contains(("noise.x", "noise.x")))
    intercept[IllegalArgumentException](
      KeyDiscovery.containmentReport(Seq(("a", dim, "pk"))))
    intercept[IllegalArgumentException](
      KeyDiscovery.containmentReport(Seq(("a", dim, "pk"), ("a", fact, "fk"))))
  }

  test("KeyDiscovery sketched form: identical to exact in the exact regime") {
    val s = spark
    import s.implicits._
    import graft.operators.KeyDiscovery
    val dim = (1L to 200L).map(Tuple1(_)).toDF("pk")
    val fact = (1L to 120L).map(i => Tuple1(i % 40 + 1)).toDF("fk")
    val cols = Seq(("dim.pk", dim, "pk"), ("fact.fk", fact, "fk"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(t => (t._1, t._2)).toSeq
    val exact = rows(KeyDiscovery.containmentReport(cols))
    val sk = rows(KeyDiscovery.containmentReportSketched(cols, lgK = 12))
    assert(sk === exact)
    assert(exact.exists { case (a, b, _, _, _, c) =>
      a == "fact.fk" && b == "dim.pk" && c == 1.0 })
  }
}
