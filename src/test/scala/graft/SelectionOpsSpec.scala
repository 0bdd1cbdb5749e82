package graft

import graft.operators.{BudgetSelect, Drift, Skyline, Winsorize}
import org.apache.spark.sql.functions._

class SelectionOpsSpec extends SparkTestBase {

  test("skyline2D keeps exactly the non-dominated points, duplicates included") {
    val s = spark
    import s.implicits._
    // frontier: (5,1), (3,3) x2, (1,5); dominated: (2,2) by (3,3),
    // (3,1) by (3,3) (same x, lower y), (1,3) by (3,3)
    val df = Seq(
      (1L, 5L, 1L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 1L, 5L),
      (5L, 2L, 2L), (6L, 3L, 1L), (7L, 1L, 3L)).toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("skyline2D: single max point dominates everything") {
    val s = spark
    import s.implicits._
    val base = (1L to 50L).map(i => (i, i % 7, i % 5)).toDF("id", "x", "y")
      .union(Seq((99L, 100L, 100L)).toDF("id", "x", "y"))
    val got = Skyline.skyline2D(base, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(99L))
  }

  test("selectByBudget keeps rows starting before the budget, in score order") {
    val s = spark
    import s.implicits._
    // order by (q desc, id): id2(q9,c5) cum5, id1(q8,c5) cum10,
    // id4(q7,c5) cum15, id3(q1,c5) cum20. budget 11: rows starting at
    // 0,5,10 -> ids 2,1,4 (the straddler 4 starts at 10 < 11).
    val df = Seq(
      (1L, 5L, 8L), (2L, 5L, 9L), (3L, 5L, 1L), (4L, 5L, 7L))
      .toDF("id", "cost", "q")
    val got = BudgetSelect.selectByBudget(df, "id", "cost", "q", budget = 11L)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 5L, 1L -> 10L, 4L -> 15L))
  }

  test("selectByBudget cum telescopes correctly across many partitions") {
    val s = spark
    import s.implicits._
    val n = 1000
    val df = (1 to n).map(i => (i.toLong, 1L, (i % 97).toLong)).toDF("id", "cost", "q")
    val out = BudgetSelect.selectByBudget(df, "id", "cost", "q", budget = 250L)
      .select("id", "q", "cum").collect()
    assert(out.length === 250)
    // cum over the selected prefix must be exactly 1..250 when re-sorted
    // by the selection order (q desc, id asc)
    val inOrder = out.sortBy(r => (-r.getLong(1), r.getLong(0))).map(_.getLong(2))
    assert(inOrder.toSeq === (1L to 250L))
  }

  test("winsorize clips to discrete per-group percentiles (values present in data)") {
    val s = spark
    import s.implicits._
    val a = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
    val b = (1 to 10).map(i => (100L + i, "b", i * 10.0))
    val df = (a ++ b).toDF("id", "g", "v")
    val got = Winsorize.clip(df, "g", "v", 0.05, 0.95)
      .select("id", "lo", "hi", "clipped").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // group a: lo = 5th percentile disc = 5.0, hi = 95.0
    assert(got(1L) === ((5.0, 95.0, 5.0)))   // 1.0 clipped up to 5
    assert(got(50L) === ((5.0, 95.0, 50.0))) // untouched
    assert(got(100L) === ((5.0, 95.0, 95.0))) // 100 clipped down
    // group b: n=10, p05 -> first value 10, p95 -> 100
    assert(got(101L)._3 === 10.0)
    assert(got(110L)._3 === 100.0)
    // every clipped value is a value present in its group's data
    val aVals = a.map(_._3).toSet ++ Set.empty
    assert(got.filterKeys(_ <= 100L).values.forall(t => aVals.contains(t._3)))
  }

  test("selectByBudgetPerGroup cuts each stratum independently") {
    val s = spark
    import s.implicits._
    // lang a: 3 docs of cost 4 (q order: id1,id2,id3) — budget 7 keeps
    // id1 (starts 0) and id2 (starts 4); id3 starts 8.
    // lang b: 1 doc of cost 100 — straddler always kept.
    val df = Seq(
      (1L, "a", 4L, 9L), (2L, "a", 4L, 8L), (3L, "a", 4L, 7L),
      (4L, "b", 100L, 1L)).toDF("id", "lang", "cost", "q")
    val got = graft.operators.BudgetSelect
      .selectByBudgetPerGroup(df, "id", "cost", "q", "lang", budget = 7L)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L, 2L -> 8L, 4L -> 100L))
  }

  test("IncrementalAgg: merge of split partials equals recompute over the union") {
    val s = spark
    import s.implicits._
    val all = (1 to 100).map(i => ((i % 3).toString, i.toLong)).toDF("k", "v")
    val a = all.filter($"v" % 2 === 0)
    val b = all.filter($"v" % 2 === 1)
    import graft.operators.IncrementalAgg
    val merged = IncrementalAgg.merge(
      IncrementalAgg.partials(a, "k", "v"), IncrementalAgg.partials(b, "k", "v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val direct = IncrementalAgg.partials(all, "k", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged === direct)
    assert(merged.keySet === Set("0", "1", "2"))
  }

  test("skyline2D matches brute-force dominance on 500 random points (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    assert(got === naive)
  }

  test("selectByBudget matches a single global running sum on 2000 random rows (seeded)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i =>
      (i, 1L + rnd.nextInt(50).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "cost", "q")
    val got = BudgetSelect.selectByBudget(df, "id", "cost", "q", budget = 5000L)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val naive = rows.sortBy(r => (-r._3, r._1)).flatMap { case (id, c, _) =>
      val start = cum; cum += c
      if (start < 5000L) Some(id -> cum) else None
    }.toMap
    assert(got === naive)
  }

  test("psiByBucket: identical cohort distributions give exactly zero PSI") {
    val s = spark
    import s.implicits._
    // both cohorts: 10 rows in bucket 0, 5 in bucket 1
    val df = (Seq.fill(10)((0L, true)) ++ Seq.fill(5)((1L, true)) ++
      Seq.fill(10)((0L, false)) ++ Seq.fill(5)((1L, false))).toDF("b", "ina")
    val got = Drift.psiByBucket(df, col("b"), col("ina"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) === ((10L, 10L, 0.0)))
    assert(got(1L) === ((5L, 5L, 0.0)))
  }

  test("psiByBucket: one-sided bucket contributes positively via smoothing, never NaN") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(10)((0L, true)) ++ Seq.fill(10)((1L, false))).toDF("b", "ina")
    val got = Drift.psiByBucket(df, col("b"), col("ina"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // p≠q in both buckets; contributions are finite and positive
    // ((p-q) and ln(p/q) always share sign)
    assert(got.values.forall(v => !v.isNaN && v > 0))
  }
}
