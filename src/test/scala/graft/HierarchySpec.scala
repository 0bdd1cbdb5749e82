package graft

import graft.operators.Hierarchy
import graft.pipeline.Compression

/** Conformance for bounded hierarchy closure and the deflate-ratio
  * quality signal. */
class HierarchySpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("ancestors: chain closure to maxLevels, no phantom rows") {
    // 4 -> 3 -> 2 -> 1, and 9 -> 1
    val edges = Seq((4L, 3L), (3L, 2L), (2L, 1L), (9L, 1L)).toDF("c", "p")
    val got = Hierarchy.ancestors(edges, "c", "p", maxLevels = 10,
        checkpointEvery = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (4L, 3L, 1L), (4L, 2L, 2L), (4L, 1L, 3L),
      (3L, 2L, 1L), (3L, 1L, 2L),
      (2L, 1L, 1L), (9L, 1L, 1L)))
  }

  test("ancestors: maxLevels truncates deep chains") {
    val edges = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("c", "p")
    val got = Hierarchy.ancestors(edges, "c", "p", maxLevels = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.forall(_._3 <= 2L) && got.contains((4L, 2L, 2L)) &&
      !got.exists(t => t._1 == 4L && t._2 == 1L))
  }

  test("deflate ratio: repetitive < prose < random-ish; deterministic") {
    implicit val sp = s
    val docs = Seq(
      (1L, "ab " * 2000),                                       // repetitive
      (2L, (1 to 400).map(i => s"word$i with varied text ${i * 37 % 91}").mkString(" ")),
      (3L, (1 to 4000).map(i =>
        ((scala.util.hashing.MurmurHash3.stringHash(i.toString) & 0x7fffffff)
          % 93 + 33).toChar).mkString)
    ).toDF("doc_id", "text")
    def run() = Compression.deflateRatio(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq)                 // bit-deterministic
    val byId = a.map(r => r._1 -> r._4).toMap
    assert(byId(1L) < byId(2L) && byId(2L) < byId(3L))
    assert(byId(1L) < 0.05 && byId(3L) > 0.5)
    // integer fields consistent with the ratio
    a.foreach { case (_, raw, defl, ratio) =>
      assert(math.abs(ratio - defl.toDouble / raw) < 1e-15) }
  }

  test("classRatioReport: planted boiler < natural < junk passes the in-plan gate") {
    implicit val sp = s
    val docs = (1L to 20L).map(i =>
      (i, (1 to 120).map(j => s"tok${i * 131 + j} mix ${j * 37 % 91}").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Compression.classRatioReport(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq("boiler", "junk", "natural"))
    assert(rows.forall(_._2 === 20L))
    // ratio_rank is COMPUTED from the measured deflate sums by exact
    // cross-multiplication — asserting 1/2/3 re-verifies the ordering
    // independently of the in-plan gate (a silently-weakened gate still
    // can't pass), and it is exactly what the DuckDB oracle pins
    val ranks = rows.map(r => r._1 -> r._4).toMap
    assert(ranks === Map("boiler" -> 1L, "natural" -> 2L, "junk" -> 3L))
    // raw_bytes replayability: junk is fixed-width (64 blocks x 16 hex
    // chars = 1024 bytes/doc) so the oracle needs no hash function
    assert(rows.collectFirst { case ("junk", _, raw, _) => raw }.get === 20L * 1024L)
  }

  test("classRatioReport gate TRIPS when classes stop discriminating") {
    implicit val sp = s
    // an all-constant corpus makes the natural text exactly as
    // compressible as its planted boiler twin — the strict ordering
    // fails and the assert_true must surface, not pass silently
    val degenerate = (1L to 5L).map(i => (i, "z" * 1200)).toDF("doc_id", "text")
    val e = intercept[Exception](
      Compression.classRatioReport(degenerate, "doc_id", "text").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("compression class ordering violated")),
      msgs(e).mkString("|"))
  }

  test("closure parity: frontier operator == Spark WITH RECURSIVE, row for row") {
    val s = spark
    import s.implicits._
    val docs = (1L to 500L).map(i => Tuple1(i)).toDF("doc_id")
    import org.apache.spark.sql.functions.{col, expr}
    val edges = docs.select(col("doc_id").as("c"),
      expr("doc_id div 10").as("p"))
    val op = graft.operators.Hierarchy.ancestors(edges, "c", "p", maxLevels = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    edges.createOrReplaceTempView("hp_edges")
    val sql = s.sql("""WITH RECURSIVE a AS (
      SELECT c AS node, p AS ancestor, CAST(1 AS BIGINT) AS level FROM hp_edges
      UNION ALL
      SELECT a.node, e.p, a.level + 1 FROM a JOIN hp_edges e ON a.ancestor = e.c
      WHERE a.level < 5)
      SELECT node, ancestor, level FROM a""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(op === sql)
    assert(op.nonEmpty)
  }
}
