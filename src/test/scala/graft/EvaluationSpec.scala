package graft

import graft.pipeline.Evaluation
import org.apache.spark.sql.functions._

/** Hand-computed conformance for the ranked-retrieval and classifier
  * evaluation metrics. */
class EvaluationSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("rankedEval: hand-computed P@k / recall / MRR / AP / NDCG") {
    // q=1: ranks 1..4 -> items a(rel) b c(rel) d ; truth {a, c, z}
    //   hits=2, P@4=0.5, R=2/3, rr=1.0
    //   AP = (1/1 + 2/3)/min(3,4) = (1 + 0.6667)/3 = 0.5556
    //   DCG = 1/log2(2) + 1/log2(4) = 1.5 ; IDCG = 1 + 1/log2(3) + 0.5
    val results = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4),
      (2L, "x", 1), (2L, "y", 2)).toDF("query_id", "item", "rank")
    val truth = Seq((1L, "a"), (1L, "c"), (1L, "z"), (2L, "q"))
      .toDF("query_id", "item")
    val out = Evaluation.rankedEval(results, truth, "query_id", "item", "rank", k = 4)
      .orderBy("query_id")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    val q1 = out(0)
    assert(q1 === ((1L, 3L, 2L, 0.5, 0.6667, 1.0, 0.5556,
      math.rint(1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5) * 1e4) / 1e4)))
    // q=2: truth {q} never retrieved -> all zeros, not a dropped row
    assert(out(1) === ((2L, 1L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("rankedEval: truth-bearing query absent from results emits zeros") {
    val results = Seq((1L, "a", 1)).toDF("query_id", "item", "rank")
    val truth = Seq((1L, "a"), (9L, "a")).toDF("query_id", "item")
    val out = Evaluation.rankedEval(results, truth, "query_id", "item", "rank", 3)
    val r9 = out.filter(col("query_id") === 9)
      .select("hits", "precision_k", "rr").as[(Long, Double, Double)].collect()
    assert(r9 === Array((0L, 0.0, 0.0)))
    // and a query with no truth rows is dropped (metrics undefined)
    assert(out.count() === 2)
  }

  test("rankedEval: ranks beyond k are ignored") {
    val results = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3))
      .toDF("query_id", "item", "rank")
    val truth = Seq((1L, "c")).toDF("query_id", "item")
    val out = Evaluation.rankedEval(results, truth, "query_id", "item", "rank", 2)
      .select("hits").as[Long].collect()
    assert(out === Array(0L)) // c sits at rank 3 > k=2
  }

  test("calibrationBins: hand-computed bins, gaps, and ECE") {
    // scale 100, 2 bins. bin 0: confs 10,30 labels 0,1 -> conf .2 acc .5
    // bin 1: confs 80,90 labels 1,1 -> conf .85 acc 1.0
    // ECE = .5*.3 + .5*.15 = .225
    val df = Seq((10L, 0), (30L, 1), (80L, 1), (90L, 1))
      .toDF("conf", "label")
    val out = Evaluation.calibrationBins(df, "conf", "label", nBins = 2, scale = 100L)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(out(0) === ((0L, 2L, 1L, 0.2, 0.5, 0.3, 0.225)))
    assert(out(1) === ((1L, 2L, 2L, 0.85, 1.0, 0.15, 0.225)))
  }

  test("calibrationBins: perfectly calibrated data scores ECE 0") {
    // conf 25 in bin 0 of 4 (0..24 -> bin 1? no: 25*4/100=1) — use bin
    // midpoints: conf 12 (bin 0), 1 of 8 positive ... simpler: conf=50,
    // half positive -> conf .5, acc .5
    val df = (1 to 10).map(i => (50L, i % 2)).toDF("conf", "label")
    val out = Evaluation.calibrationBins(df, "conf", "label", 1, 100L)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(out === Array((0L, 10L, 5L, 0.5, 0.5, 0.0, 0.0)))
  }

  test("calibrationBins: out-of-range confidences are excluded") {
    val df = Seq((100L, 1), (-1L, 0), (99L, 1)).toDF("conf", "label")
    val out = Evaluation.calibrationBins(df, "conf", "label", 10, 100L)
    assert(out.agg(sum("n")).as[Long].head() === 1L)
  }

  test("classifierEval: hand-computed confusion and a never-predicted class") {
    // gold:  a a a b b c    pred: a b a b b a
    // a: tp=2 fp=1(c->a) fn=1(a->b)   b: tp=2 fp=1 fn=0   c: tp=0 fp=0 fn=1
    val df = Seq(("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "b"),
      ("c", "a")).toDF("gold", "pred")
    val out = Evaluation.classifierEval(df, "gold", "pred")
      .orderBy("class")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(out(0) === (("a", 2L, 1L, 1L, 3L, 0.6667, 0.6667, 0.6667)))
    assert(out(1) === (("b", 2L, 1L, 0L, 2L, 0.6667, 1.0, 0.8)))
    // c is never predicted: precision 0 by convention, recall 0, row kept
    assert(out(2) === (("c", 0L, 0L, 1L, 1L, 0.0, 0.0, 0.0)))
  }

  test("classifierEval: invented class (predicted, never gold) keeps a zero-recall row") {
    val df = Seq(("a", "a"), ("a", "x")).toDF("gold", "pred")
    val out = Evaluation.classifierEval(df, "gold", "pred")
      .filter(col("class") === "x")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(out === Array(("x", 0L, 1L, 0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("classifierEval totals: sum(tp)+sum(fn) = rows = sum(tp)+sum(fp)") {
    val rnd = new scala.util.Random(3)
    val labels = Vector("a", "b", "c", "d")
    val df = Seq.fill(500)((labels(rnd.nextInt(4)), labels(rnd.nextInt(4))))
      .toDF("gold", "pred")
    val m = Evaluation.classifierEval(df, "gold", "pred")
      .agg(sum("tp"), sum("fp"), sum("fn")).as[(Long, Long, Long)].head()
    assert(m._1 + m._2 === 500L)
    assert(m._1 + m._3 === 500L)
  }
}
