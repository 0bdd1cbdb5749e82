package graft

import graft.compile.QueryCompiler
import graft.model._

/** Whole-query semantics: evaluation order, null-key convention, caps. */
class QueryCompilerSpec extends SparkTestBase {

  private lazy val events = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "click", 5.0, "US"),
      (2L, "view", 15.0, "US"),
      (3L, "click", 25.0, "DE"),
      (4L, "click", 35.0, null.asInstanceOf[String]),
      (5L, "buy", 45.0, "DE")
    ).toDF("event_id", "etype", "value", "country")
  }

  // Reference: filtering happens on the RAW record BEFORE projection —
  // a filter on the raw name matches even when the projection renames it
  // (FilterBoltTest.java:372-393)...
  test("filter evaluates on the raw record, before projection") {
    val q = QuerySpec(id = "t",
      filter = Some(Binary(Field("etype"), Lit("click"), BinOp.EQUALS)),
      projection = Some(Seq("renamed" -> Field("etype"), "event_id" -> Field("event_id"))),
      aggregation = Raw(100))
    assert(QueryCompiler.run(events, q).count() === 3L)
  }

  // ...and a filter on the projected alias matches NOTHING: the alias does
  // not exist on the raw record, and a missing field is a typed null under
  // the reference's schemaless semantics (FilterBoltTest.java:349-370
  // asserts non-emission, not an error).
  test("filter on a projected alias matches no records") {
    val q = QuerySpec(id = "t",
      filter = Some(Binary(Field("renamed"), Lit("click"), BinOp.EQUALS)),
      projection = Some(Seq("renamed" -> Field("etype"))),
      aggregation = Raw(100))
    assert(QueryCompiler.run(events, q).count() === 0L)
  }

  // Missing/null grouped field becomes the string "null"
  // (FilterBoltTest.java:827-828).
  test("null group key stringifies to \"null\" in GROUP BY") {
    val q = QuerySpec(id = "t",
      aggregation = GroupBy(Seq("country" -> "c"),
        Seq(GroupOp(GroupOpType.COUNT, None, "cnt"))))
    val rows = QueryCompiler.run(events, q).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("US" -> 2L, "DE" -> 2L, "null" -> 1L))
  }

  test("null group key stringifies to \"null\" in TOP_K") {
    val q = QuerySpec(id = "t",
      aggregation = TopK(Seq("country" -> "c"), k = 3, countName = "cnt"))
    val rows = QueryCompiler.run(events, q).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("US" -> 2L, "DE" -> 2L, "null" -> 1L))
  }

  test("GROUP BY entries cap keeps first `entries` groups in key order") {
    val q = QuerySpec(id = "t",
      aggregation = GroupBy(Seq("etype" -> "e"),
        Seq(GroupOp(GroupOpType.COUNT, None, "cnt")), entries = 2))
    val keys = QueryCompiler.run(events, q).collect().map(_.getString(0)).toSeq
    assert(keys === Seq("buy", "click")) // first 2 of buy/click/view
  }

  test("RAW applies ORDER BY before the size cap (deterministic truncation)") {
    val q = QuerySpec(id = "t",
      aggregation = Raw(2),
      postAggregations = Seq(OrderBy(Seq("value" -> false))))
    val vals = QueryCompiler.run(events, q).collect().map(_.getDouble(2)).toSeq
    assert(vals === Seq(45.0, 35.0))
  }

  test("composite TOP_K keys survive separator-hostile content") {
    val s = spark
    import s.implicits._
    // keys containing commas, quotes, and the old  separator
    val df = Seq(("a,b", "c\"d"), ("a,b", "c\"d"), ("xy", "z"))
      .toDF("f1", "f2")
    val q = QuerySpec(id = "t",
      aggregation = TopK(Seq("f1" -> "k1", "f2" -> "k2"), k = 2, countName = "cnt"))
    val rows = QueryCompiler.run(df, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(("a,b", "c\"d", 2L), ("xy", "z", 1L)))
  }

  test("COUNT_DISTINCT distinguishes tuple boundaries") {
    val s = spark
    import s.implicits._
    // ("ab","c") vs ("a","bc") must count as 2 distinct tuples
    val df = Seq(("ab", "c"), ("a", "bc")).toDF("f1", "f2")
    val q = QuerySpec(id = "t", aggregation = CountDistinct(Seq("f1", "f2")))
    assert(QueryCompiler.run(df, q).collect()(0).getLong(0) === 2L)
  }

  test("GROUP(all) with no matching rows still emits one row of zeros/nulls") {
    val q = QuerySpec(id = "t",
      filter = Some(Binary(Field("value"), Lit(1000.0), BinOp.GREATER_THAN)),
      aggregation = GroupAll(Seq(
        GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("value"), "s"))))
    val row = QueryCompiler.run(events, q).collect()(0)
    assert(row.getLong(0) === 0L)
    assert(row.isNullAt(1))
  }

  test("HAVING / COMPUTATION / CULLING post-aggregations compose") {
    val q = QuerySpec(id = "t",
      aggregation = GroupBy(Seq("etype" -> "e"),
        Seq(GroupOp(GroupOpType.SUM, Some("value"), "s"))),
      postAggregations = Seq(
        Having(Binary(Field("s"), Lit(20.0), BinOp.GREATER_THAN)),
        Computation(Seq("half" -> Binary(Field("s"), Lit(2.0), BinOp.DIV))),
        Culling(Seq("s"))))
    val out = QueryCompiler.run(events, q)
    assert(out.columns.toSeq === Seq("e", "half"))
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m === Map("click" -> 32.5, "buy" -> 22.5))
  }

  test("DISTRIBUTION QUANTILE output shape and exact values") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val q = QuerySpec(id = "t",
      aggregation = Distribution("x", DistributionType.QUANTILE, Seq(0.0, 0.5, 1.0), k = 1024))
    val out = QueryCompiler.run(df, q)
    assert(out.columns.toSeq === Seq("Quantile", "Value"))
    val m = out.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(m === Map(0.0 -> 1.0, 0.5 -> 50.0, 1.0 -> 100.0))
  }

  test("DISTRIBUTION PMF has ±∞ end bins with exact counts") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val q = QuerySpec(id = "t",
      aggregation = Distribution("x", DistributionType.PMF, Seq(3.0, 7.0), k = 1024))
    val rows = QueryCompiler.run(df, q).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows === Array(
      ("(-∞, 3.0)", 2L, 0.2),   // 1,2
      ("[3.0, 7.0)", 4L, 0.4),  // 3..6
      ("[7.0, +∞)", 4L, 0.4)))  // 7..10
  }
}
