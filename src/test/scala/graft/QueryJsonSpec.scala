package graft

import graft.model._
import graft.streaming._

class QueryJsonSpec extends SparkTestBase {

  private val fullSpec = QuerySpec(
    id = "q-full",
    filter = Some(NAry(NAryOp.AND, Seq(
      Binary(Field("etype"), Lit("click"), BinOp.EQUALS),
      Binary(Field("props", Some("k")), ListExpr(Seq(Lit(1L), Lit(2L))), BinOp.EQUALS_ANY),
      Unary(UnaryOp.NOT, Binary(Cast(Field("v"), FieldType.LONG), Lit(5L), BinOp.LESS_THAN))))),
    projection = Some(Seq("a" -> Field("etype"),
      "b" -> Binary(Field("value"), Lit(2.0), BinOp.MUL))),
    aggregation = GroupBy(Seq("a" -> "x"), Seq(
      GroupOp(GroupOpType.COUNT, None, "cnt"),
      GroupOp(GroupOpType.AVG, Some("value"), "av")), entries = 64),
    window = Some(WindowSpec(WindowUnit.TIME, 1000, WindowUnit.ALL, 0)),
    durationMs = 60000,
    postAggregations = Seq(
      Having(Binary(Field("cnt"), Lit(1L), BinOp.GREATER_THAN)),
      OrderBy(Seq("cnt" -> false)),
      Computation(Seq("d" -> Binary(Field("cnt"), Lit(2L), BinOp.MUL))),
      Culling(Seq("cnt"))),
    rateLimitMaxEmit = Some(99L))

  test("QuerySpec JSON round-trips exactly") {
    assert(QueryJson.parse(QueryJson.render(fullSpec)) === fullSpec)
  }

  test("every aggregation type round-trips") {
    val aggs = Seq[Aggregation](
      Raw(42),
      GroupAll(Seq(GroupOp(GroupOpType.SUM, Some("v"), "s"))),
      GroupBy(Seq("a" -> "a"), Seq(GroupOp(GroupOpType.MIN, Some("v"), "m")), 7),
      CountDistinct(Seq("a", "b"), "n", 12),
      Distribution("v", DistributionType.CDF, Seq(1.0, 2.0), 512),
      TopK(Seq("a" -> "k"), 5, "c", Some(3L), 128))
    aggs.foreach { a =>
      val spec = QuerySpec("x", aggregation = a)
      assert(QueryJson.parse(QueryJson.render(spec)) === spec, a.toString)
    }
  }

  test("hand-written JSON parses with defaults") {
    val spec = QueryJson.parse(
      """{"id":"q1","filter":{"op":"GREATER_THAN","left":{"field":"value"},"right":{"value":10.5}},
        |"aggregation":{"type":"COUNT_DISTINCT","fields":["user_id"]}}""".stripMargin)
    assert(spec.id === "q1")
    assert(spec.filter === Some(Binary(Field("value"), Lit(10.5), BinOp.GREATER_THAN)))
    assert(spec.aggregation === CountDistinct(Seq("user_id")))
    assert(spec.durationMs === 10000L)
  }

  test("control plane: register and kill via JSON messages; sink sees all clips") {
    val clock = new ManualClock(0)
    val runner = new QueryRunner(spark, clock)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    runner.onResult(c => seen += s"${c.queryId}:${c.signal.getOrElse("WINDOW")}")

    val reg = """{"type":"REGISTER","query":{"id":"cq",
      |"filter":{"op":"EQUALS","left":{"field":"etype"},"right":{"value":"click"}},
      |"aggregation":{"type":"GROUP_ALL","ops":[{"op":"COUNT","name":"cnt"}]},
      |"durationMs":5000}}""".stripMargin
    assert(runner.handleMessage(reg).isEmpty)
    assert(runner.activeQueryIds === Seq("cq"))

    val s = spark
    import s.implicits._
    runner.processBatch(Seq((1L, "click"), (2L, "view")).toDF("event_id", "etype"))
    assert(runner.handleMessage("""{"type":"KILL","id":"cq"}""").exists(_.signal.contains("KILL")))
    assert(runner.activeQueryIds.isEmpty)
    assert(seen.toSeq === Seq("cq:KILL"))
  }

  test("control plane: REGISTER_BQL submits raw BQL text end to end") {
    val clock = new ManualClock(0)
    val runner = new QueryRunner(spark, clock)
    runner.configureMeta(Map(
      "QUERY_METADATA" -> "meta", "QUERY_STRING" -> "query"))
    val msg = """{"type":"REGISTER_BQL","id":"bq1","bql":
      |"SELECT COUNT(*) AS cnt FROM STREAM WHERE etype = 'click' WINDOWING EVERY 2 RECORD"}"""
      .stripMargin.replace("\n", "")
    assert(runner.handleMessage(msg).isEmpty)
    assert(runner.activeQueryIds === Seq("bq1"))
    val s = spark
    import s.implicits._
    val clips = runner.processBatch(
      Seq((1L, "click"), (2L, "click"), (3L, "view")).toDF("event_id", "etype"))
    assert(clips.size === 1) // 2 clicks hit the 2-record window
    assert(clips.head.queryId === "bq1")
    // the submitted BQL text echoes back through the QUERY_STRING concept
    val qm = clips.head.meta("meta").asInstanceOf[Map[String, Any]]
    assert(qm("query").toString.startsWith("SELECT COUNT(*)"))
    // malformed BQL text fails as the standard error clip — ATTRIBUTED to
    // the submitted id (a subscriber watching bq2 must learn it failed)
    val bad = runner.handleMessage(
      """{"type":"REGISTER_BQL","id":"bq2","bql":"SELEKT garbage"}""")
    assert(bad.isDefined && bad.get.signal.contains("FAIL"))
    assert(bad.get.queryId === "bq2")
    assert(!runner.activeQueryIds.contains("bq2"))
  }

  test("malformed control message produces an error clip, not an exception") {
    val runner = new QueryRunner(spark, new ManualClock(0))
    val clip = runner.handleMessage("""{"type":"NONSENSE"}""")
    assert(clip.isDefined && clip.get.signal.contains("FAIL"))
    val clip2 = runner.handleMessage("""not json at all""")
    assert(clip2.isDefined && clip2.get.signal.contains("FAIL"))
    assert(runner.activeQueryIds.isEmpty)
  }

  test("duplicate registration via the control plane is suppressed") {
    val runner = new QueryRunner(spark, new ManualClock(0))
    val reg = """{"type":"REGISTER","query":{"id":"d","aggregation":{"type":"RAW","size":5}}}"""
    assert(runner.handleMessage(reg).isEmpty)
    assert(runner.handleMessage(reg).isEmpty)
    assert(runner.duplicatesSuppressed === 1)
  }

  test("registry round-trips through JSON (checkpoint/replay shape)") {
    // render the registry as JSON lines, rebuild a second runner from them
    val specs = Seq(fullSpec, QuerySpec("r2", aggregation = Raw(10)))
    val lines = specs.map(QueryJson.render)
    val revived = lines.map(QueryJson.parse)
    assert(revived === specs)
  }

  test("runner registry snapshot/restore re-arms queries after a restart") {
    val r1 = new QueryRunner(spark, new ManualClock(0))
    r1.register(fullSpec)
    r1.register(QuerySpec("r2", aggregation = Raw(10)))
    val snapshot = r1.snapshotRegistry()
    val r2 = new QueryRunner(spark, new ManualClock(0))
    r2.restoreRegistry(snapshot)
    assert(r2.activeQueryIds.toSet === Set("q-full", "r2"))
  }
}
