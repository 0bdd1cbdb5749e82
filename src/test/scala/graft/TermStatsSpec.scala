package graft

import graft.pipeline.TermStats
import org.apache.spark.sql.functions._

/** Conformance for chi-squared term selection and G² collocations. */
class TermStatsSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chi2: hand-computed 2x2 for a perfectly class-bound token") {
    // 4 docs: class x has 'alpha' in both docs, class y never.
    // For (x, alpha): a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    val docs = Seq(
      (1L, "x", "alpha beta"), (2L, "x", "alpha gamma"),
      (3L, "y", "beta gamma"), (4L, "y", "beta delta"))
      .toDF("doc_id", "cls", "text")
    val out = TermStats.chiSquaredTerms(docs, "doc_id", "text", "cls", 10)
      .filter(col("class") === "x" && col("token") === "alpha")
      .select("a", "b", "chi2").as[(Long, Long, Double)].collect()
    assert(out === Array((2L, 0L, 4.0)))
    // beta appears in 1 x-doc and 2 y-docs: for x, a=1 b=2 c=1 d=0
    // chi2 = 4*(0-2)^2/(3*1*2*2) = 16/12
    val beta = TermStats.chiSquaredTerms(docs, "doc_id", "text", "cls", 10)
      .filter(col("class") === "x" && col("token") === "beta")
      .select("chi2").as[Double].collect()
    assert(beta === Array(r4(16.0 / 12)))
  }

  test("chi2: within-doc repeats count once (distinct incidence)") {
    val docs = Seq((1L, "x", "z z z z"), (2L, "y", "w"))
      .toDF("doc_id", "cls", "text")
    val a = TermStats.chiSquaredTerms(docs, "doc_id", "text", "cls", 10)
      .filter(col("token") === "z").select("a").as[Long].collect()
    assert(a === Array(1L))
  }

  test("chi2: topK caps per class and ranks the bound token first") {
    val docs = (1L to 20L).map { i =>
      val cls = if (i <= 10) "x" else "y"
      val marker = if (i <= 10) "onlyx" else "onlyy"
      (i, cls, s"$marker common${i % 3} shared")
    }.toDF("doc_id", "cls", "text")
    val out = TermStats.chiSquaredTerms(docs, "doc_id", "text", "cls", 2)
    assert(out.count() === 4) // 2 per class
    val top = out.filter(col("class") === "x" && col("rank") === 1)
      .select("token").as[String].head()
    assert(top === "onlyx")
  }

  test("collocations: hand-computed G2 and the frozen-pair ranking") {
    // 'new york' always adjacent; fillers vary.
    val docs = Seq("new york a b", "new york c d", "a c new york")
      .toDF("text")
    val out = TermStats.collocations(docs, "text", minCount = 2, topK = 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.head._1 === "new" && out.head._2 === "york")
    val (_, _, k11, nW1, nW2, g2) = out.head
    assert((k11, nW1, nW2) === ((3L, 3L, 3L)))
    // replay the entropy form by hand: N=9, k12=k21=0, k22=6
    def xlx(x: Double) = if (x > 0) x * math.log(x) else 0.0
    val want = 2.0 * (xlx(3) + xlx(0) + xlx(0) + xlx(6) -
      xlx(3) - xlx(6) - xlx(3) - xlx(6) + xlx(9))
    assert(g2 === r4(want))
  }

  test("collocations: minCount prunes and topK bounds the output") {
    val docs = Seq.fill(50)("p q").toDF("text")
      .union(Seq("r s").toDF("text"))
    val out = TermStats.collocations(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === Set(("p", "q")))
  }
}
