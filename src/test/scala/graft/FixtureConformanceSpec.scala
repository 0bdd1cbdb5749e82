package graft

import graft.compile.QueryCompiler
import graft.model._
import graft.sources.SchemaJson
import graft.streaming._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/**
 * FIXTURES.md conformance: reproduce the reference tests' record shapes and
 * expected outputs (F1–F8) — same inputs, same outputs.
 */
class FixtureConformanceSpec extends SparkTestBase {

  // F1 — flat {field STRING, timestamp LONG} (FilterBoltTest.java:275-277)
  private lazy val f1 = {
    val s = spark
    import s.implicits._
    Seq(("b235gf23b", 92L), ("other", 42L)).toDF("field", "timestamp")
  }

  test("F1: equality filter on the flat record matches/rejects exactly") {
    val q = QuerySpec("f1",
      filter = Some(Binary(Field("field"), Lit("b235gf23b"), BinOp.EQUALS)),
      aggregation = Raw(10))
    assert(QueryCompiler.run(f1, q).collect().map(_.getString(0)).toSeq === Seq("b235gf23b"))
    val qNone = QuerySpec("f1n",
      filter = Some(Binary(Field("field"), Lit("wontmatch"), BinOp.EQUALS)),
      aggregation = Raw(10))
    assert(QueryCompiler.run(f1, qNone).count() === 0L)
  }

  // F2 — map record; projection id := field, mid := map_field.id
  // (expected {id:"b235gf23b", mid:"123"}, FilterBoltTest.java:282)
  test("F2: map-subfield projection produces the reference output") {
    val s = spark
    import s.implicits._
    val df = Seq(("b235gf23b", 92L, Map("id" -> "123", "bar" -> "foo")))
      .toDF("field", "timestamp", "map_field")
    val q = QuerySpec("f2",
      projection = Some(Seq("id" -> Field("field"), "mid" -> Field("map_field", Some("id")))),
      aggregation = Raw(10))
    val row = QueryCompiler.run(df, q).collect()(0)
    assert(row.getString(0) === "b235gf23b")
    assert(row.getString(1) === "123")
  }

  // F3 — nested boolean filter with cast of a string-held int
  // (CAST(demographic_map.age AS INTEGER) > 65, FilterBoltTest.java:566-603)
  test("F3: nested AND/OR filter with map-subfield cast") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("abc", "app", 1, Map("age" -> "70"), Map("is_fake_event" -> true)),
      ("abc", "app", 2, Map("age" -> "30"), Map("is_fake_event" -> true)),
      ("xyz", "web", 3, Map("age" -> "80"), Map("is_fake_event" -> false))
    ).toDF("field", "experience", "mid", "demographic_map", "filter_map")
    val filter = NAry(NAryOp.AND, Seq(
      NAry(NAryOp.OR, Seq(
        Binary(Field("field"), ListExpr(Seq(Lit("abc"), Lit("equalto"))), BinOp.EQUALS_ANY),
        Binary(Field("experience"), Lit("app"), BinOp.EQUALS))),
      Binary(Cast(Field("demographic_map", Some("age")), FieldType.INTEGER),
        Lit(65), BinOp.GREATER_THAN),
      Binary(Field("filter_map", Some("is_fake_event")), Lit(true), BinOp.EQUALS)))
    val q = QuerySpec("f3", filter = Some(filter), aggregation = Raw(10))
    assert(QueryCompiler.run(df, q).collect().map(_.getInt(2)).toSeq === Seq(1))
  }

  // F4 — {fieldA: i%16, fieldB: i/16}, GROUP BY fieldA→A, COUNT cnt, SUM(fieldB) sumB
  // (JoinBoltTest.java:745-786: 32 records → 16 groups, each cnt=2)
  test("F4: group-by with rename matches the reference group shape") {
    val s = spark
    import s.implicits._
    val df = (0 until 32).map(i => (i % 16, i / 16)).toDF("fieldA", "fieldB")
    val q = QuerySpec("f4", aggregation = GroupBy(
      Seq("fieldA" -> "A"),
      Seq(GroupOp(GroupOpType.COUNT, None, "cnt"),
        GroupOp(GroupOpType.SUM, Some("fieldB"), "sumB")),
      entries = 16))
    val rows = QueryCompiler.run(df, q).collect()
    assert(rows.length === 16)
    rows.foreach { r =>
      assert(r.getLong(1) === 2L)  // cnt
      assert(r.getLong(2) === 1L)  // sumB = 0 + 1
    }
  }

  // F5 — {field: INT} 0..255 distinct; 0..100 quantiles with PMF 3 splits → 4 bins
  test("F5: 256 distinct values count exactly; PMF has 4 bins with ±∞ ends") {
    val s = spark
    import s.implicits._
    val distinct = (0 until 256).map(i => i).toDF("field")
    val qcd = QuerySpec("f5cd", aggregation = CountDistinct(Seq("field"), "count", lgK = 12))
    assert(QueryCompiler.run(distinct, qcd).collect()(0).getLong(0) === 256L)

    val vals = (0 to 100).map(_.toDouble).toDF("field")
    val qd = QuerySpec("f5d", aggregation = Distribution("field",
      DistributionType.PMF, Seq(25.0, 50.0, 75.0), k = 1024))
    val bins = QueryCompiler.run(vals, qd).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(bins.length === 4)
    assert(bins(0) === ("(-∞, 25.0)", 25L))   // 0..24
    assert(bins(1) === ("[25.0, 50.0)", 25L)) // 25..49
    assert(bins(2) === ("[50.0, 75.0)", 25L))
    assert(bins(3) === ("[75.0, +∞)", 26L))   // 75..100
  }

  // F6 — TOP_K over {A, B(absent)}: values stringified, missing → "null",
  // counts 7/3 exact (FilterBoltTest.java:794-832)
  test("F6: top-k stringifies keys and renders the missing field as \"null\"") {
    val s = spark
    import s.implicits._
    val df = ((1 to 7).map(_ => 0) ++ (1 to 3).map(_ => 1)).map(a => (a, null.asInstanceOf[String]))
      .toDF("A", "B")
    val q = QuerySpec("f6", aggregation = TopK(
      Seq("A" -> "A", "B" -> "foo"), k = 2, countName = "cnt"))
    val rows = QueryCompiler.run(df, q).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq(("0", "null", 7L), ("1", "null", 3L)))
  }

  // F7 — DSL schema {foo STRING, bar STRING} with type-check enable
  test("F7: DSL schema json parses and type-checks records") {
    val schema = SchemaJson.parseSchema(
      """{"fields":[{"name":"foo","type":"STRING"},{"name":"bar","type":"STRING"}]}""")
    assert(schema === StructType(Seq(
      StructField("foo", StringType), StructField("bar", StringType))))
    val s = spark
    import s.implicits._
    val good = Seq(("a", "b")).toDF("foo", "bar")
    assert(SchemaJson.typeCheck(good, schema) === Seq.empty)
    val missing = Seq(Tuple1("a")).toDF("foo")
    assert(SchemaJson.typeCheck(missing, schema) === Seq("missing field 'bar'"))
    val wrongType = Seq(("a", 1)).toDF("foo", "bar")
    assert(SchemaJson.typeCheck(wrongType, schema).head.contains("declared StringType"))
  }

  // F9 — Kafka-shaped ingest: a frame with the kafka source's columns
  // (key/value binary + metadata) decodes its value payload to a typed
  // record struct; bad payloads yield a null struct (fail-soft converter).
  test("F9: Kafka-shaped value payloads decode to typed records, bad rows fail soft") {
    val s = spark
    import s.implicits._
    val kafkaShaped = Seq(
      (Array[Byte](1), """{"k":7,"name":"a"}""".getBytes("UTF-8"), "t", 0, 100L),
      (Array[Byte](2), """not json""".getBytes("UTF-8"), "t", 0, 101L)
    ).toDF("key", "value", "topic", "partition", "offset")
    val out = graft.sources.JsonRecords.fromKafka(kafkaShaped, "k INT, name STRING")
    val rows = out.orderBy("offset")
      .selectExpr("record.k", "record.name", "offset").collect()
    assert(rows(0).getInt(0) === 7 && rows(0).getString(1) === "a")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // fail-soft
    assert(out.columns.contains("topic") && out.columns.contains("offset"))
  }

  // F9b — delimited converter: CSV and TSV lines decode by declared
  // schema; a malformed line parses to all-null fields (PERMISSIVE) and
  // the wellFormed gate drops it; encode(convert(x)) round-trips.
  test("F9b: delimited lines decode typed; malformed rows fail soft and filter out") {
    val s = spark
    import s.implicits._
    import graft.sources.DelimitedRecords
    import org.apache.spark.sql.functions.col
    val ddl = "k INT, name STRING, v DOUBLE"
    val lines = Seq("7,alpha,1.5", "8,beta,-2.0", ",,", "not delimited at all")
      .toDF("line")
    val parsed = DelimitedRecords.convert(lines, "line", ddl)
    val rows = parsed.select("line_rec.k", "line_rec.name", "line_rec.v").collect()
    assert(rows(0).getInt(0) === 7 && rows(0).getString(1) === "alpha")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2))
    val clean = parsed.filter(DelimitedRecords.wellFormed(col("line_rec"), ddl))
    // ",," and "not delimited at all" both parse to all-null fields (the
    // latter's single token fails the leading INT) — only real rows stay
    assert(clean.count() === 2)
    // TSV via sep
    val tsv = Seq("9\tgamma\t0.5").toDF("line")
    val trow = DelimitedRecords.convert(tsv, "line", ddl, sep = "\t")
      .select("line_rec.k", "line_rec.name").collect().head
    assert(trow.getInt(0) === 9 && trow.getString(1) === "gamma")
    // round-trip: encode the struct back to the original line
    val back = parsed.limit(2)
      .select(DelimitedRecords.encode(col("line_rec")).as("line"))
      .as[String].collect()
    assert(back === Array("7,alpha,1.5", "8,beta,-2.0"))
  }

  // F8 — combine-stage merges COUNT partials additively: 1+2+3+4+5 → 15
  // (JoinBoltTest.java:663-693), via the runner's cross-batch combine.
  test("F8: five COUNT partials merge additively to 15") {
    val s = spark
    import s.implicits._
    val clock = new ManualClock(0)
    val runner = new QueryRunner(spark, clock)
    runner.register(QuerySpec("f8",
      aggregation = GroupAll(Seq(GroupOp(GroupOpType.COUNT, None, "cnt")))))
    (1 to 5).foreach { k =>
      runner.processBatch((1 to k).map(i => Tuple1(i)).toDF("x"))
    }
    clock.advance(60000)
    val clip = runner.onTick().head
    val cnt = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(clip.records.head).get("cnt").asLong()
    assert(cnt === 15L)
  }
}
