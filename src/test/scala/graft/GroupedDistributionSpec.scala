package graft

import graft.operators.GroupedDistribution
import org.apache.spark.sql.functions._

class GroupedDistributionSpec extends SparkTestBase {

  test("per-group quantiles are exact per group in the exact regime") {
    val s = spark
    import s.implicits._
    // group a: 1..100; group b: 1000, 2000, ..., 10000
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 1000.0))).toDF("g", "v")
    val out = GroupedDistribution.quantiles(df, Seq("g"), "v",
      probs = Seq(0.5, 1.0), k = 1024)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // KLL INCLUSIVE rank semantics == percentile_disc
    assert(out(("a", 0.5)) === 50.0)
    assert(out(("a", 1.0)) === 100.0)
    assert(out(("b", 0.5)) === 5000.0)
    assert(out(("b", 1.0)) === 10000.0)
  }

  test("null and missing group values behave like any grouped aggregation") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None), ("c", Some(7.0)))
      .toDF("g", "v")
    val out = GroupedDistribution.quantiles(df, Seq("g"), "v",
      probs = Seq(1.0), k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out === Map("a" -> 3.0, "c" -> 7.0)) // nulls don't update the sketch
  }

  test("grouped count-distinct: one Theta sketch per group, exact in regime") {
    val s = spark
    import s.implicits._
    val df = (1 to 300).map(i => (if (i % 2 == 0) "a" else "b", i % 7, i % 11))
      .toDF("g", "u", "v")
    val out = graft.operators.GroupedCountDistinct.countDistinct(
      df, Seq("g"), Seq("u"), name = "du")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 7L, "b" -> 7L))
    // tuple form: distinct (u, v) pairs per group — injective key encoding
    val tup = graft.operators.GroupedCountDistinct.countDistinct(
      df, Seq("g"), Seq("u", "v"), name = "duv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = df.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2))).distinct.length.toLong).toMap
    assert(tup === expect)
  }

  test("grouped top-k: per-group heavy hitters, exact in regime, ties by key") {
    val s = spark
    import s.implicits._
    // group a: x appears 5x, y 3x, z 1x, w 1x (tie at 1 → key order);
    // group b: only q, 2x
    val rows = Seq.fill(5)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq(("a", "z"), ("a", "w"), ("b", "q"), ("b", "q"))
    val df = rows.toDF("g", "item")
    val out = graft.operators.GroupedTopK.topK(df, Seq("g"),
      Seq("item" -> "item"), k = 3, countName = "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val a = out.filter(_._1 == "a").sortBy(r => (-r._3, r._2))
    assert(a === Array(("a", "x", 5L), ("a", "y", 3L), ("a", "w", 1L)))
    assert(out.filter(_._1 == "b").toSeq === Seq(("b", "q", 2L)))
    // matches the exact two-shuffle formulation on a randomized frame
    val rnd = new scala.util.Random(11)
    val big = (1 to 2000).map(_ => (s"g${rnd.nextInt(4)}", s"i${rnd.nextInt(30)}"))
      .toDF("g", "item")
    val sk = graft.operators.GroupedTopK.topK(big, Seq("g"),
      Seq("item" -> "item"), k = 5, countName = "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = big.collect().groupBy(r => (r.getString(0), r.getString(1)))
      .map { case ((g, i), rs) => (g, i, rs.length.toLong) }
      .groupBy(_._1).flatMap { case (_, items) =>
        items.toSeq.sortBy(r => (-r._3, s"""["${r._2}"]""")).take(5)
      }.toSet
    assert(sk === exact)
  }

  test("filterAtOrAboveQuantile keeps each group's own top half") {
    val s = spark
    import s.implicits._
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 4).map(i => ("b", i * 100.0))).toDF("g", "v")
    val kept = GroupedDistribution.filterAtOrAboveQuantile(df, Seq("g"), "v",
      p = 0.5, k = 64, requireExact = true)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    // percentile_disc(0.5) of 1..10 is 5 → keep 5..10; of {100..400} is 200
    assert(kept === ((5 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 200.0), ("b", 300.0), ("b", 400.0))).toSet)
  }

  test("filterAtOrAboveQuantile: null-key rows filter by their OWN group, not vanish") {
    val s = spark
    import s.implicits._
    val df = ((1 to 10).map(i => (Some("a"), i.toDouble)) ++
      (1 to 10).map(i => (None: Option[String], i * 10.0))).toDF("g", "v")
    val kept = GroupedDistribution.filterAtOrAboveQuantile(df, Seq("g"), "v",
      p = 0.5, k = 64, requireExact = true)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toSet
    // the null group's own median is 50 → 50..100 kept; "a" keeps 5..10
    assert(kept === ((5 to 10).map(i => (Some("a"), i.toDouble)) ++
      (5 to 10).map(i => (None, i * 10.0))).toSet)
  }

  test("requireExact fails loudly when a group exceeds k") {
    val s = spark
    import s.implicits._
    val df = (1 to 200).map(i => ("a", i.toDouble)).toDF("g", "v")
    val e = intercept[Exception] {
      GroupedDistribution.filterAtOrAboveQuantile(df, Seq("g"), "v",
        p = 0.5, k = 64, requireExact = true).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(x => Option(x.getMessage).exists(_.contains("exceeds KLL k"))))
  }
}
