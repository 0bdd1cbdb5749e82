package graft

import graft.pipeline.Annotations

class AnnotationsSpec extends SparkTestBase {

  private def votesDf = {
    val s = spark
    import s.implicits._
    // item A: x, x, y (three annotators); item B: x, x — annotator 1
    // re-submits (A, x) which must dedupe to ONE vote
    Seq(
      ("A", 1L, "x"), ("A", 1L, "x"), ("A", 2L, "x"), ("A", 3L, "y"),
      ("B", 1L, "x"), ("B", 2L, "x")).toDF("item_id", "rater", "lab")
  }

  test("majorityVote: modal label, counts, agreement; resubmission is idempotent") {
    val got = Annotations.majorityVote(votesDf, "item_id", "rater", "lab")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("A") === (("x", 2L, 3L, 2.0 / 3.0)))
    assert(got("B") === (("x", 2L, 2L, 1.0)))
  }

  test("majorityVote: a tie breaks lexicographically, deterministically") {
    val s = spark
    import s.implicits._
    val tie = Seq(("T", 1L, "z"), ("T", 2L, "a")).toDF("item_id", "rater", "lab")
    val r = Annotations.majorityVote(tie, "item_id", "rater", "lab").collect()(0)
    assert(r.getString(1) === "a" && r.getLong(2) === 1L && r.getLong(3) === 2L)
  }

  test("pairwiseKappa: hand-computed tallies and coefficient") {
    // pairs: A has C(3,2)=3 (1 agreeing: the two x's), B has 1 (agreeing)
    // po = 2/4 = 0.5; marginals x=4, y=1, N=5 → pe = (16+1)/25 = 0.68
    // kappa = (0.5 − 0.68) / 0.32 = −0.5625
    val r = Annotations.pairwiseKappa(votesDf, "item_id", "rater", "lab")
      .collect()(0)
    assert(r.getLong(0) === 2L, "n_items")
    assert(r.getLong(1) === 5L, "n_votes")
    assert(r.getLong(2) === 2L, "agree_pairs")
    assert(r.getLong(3) === 4L, "total_pairs")
    assert(r.getDouble(4) === 0.5, "po")
    assert(r.getDouble(5) === 0.68, "pe")
    assert(math.abs(r.getDouble(6) - (-0.5625)) < 1e-15, "kappa")
  }

  test("pairwiseKappa: a single-label corpus yields NULL kappa, not a blow-up") {
    val s = spark
    import s.implicits._
    val mono = Seq(("A", 1L, "x"), ("A", 2L, "x"), ("B", 1L, "x"))
      .toDF("item_id", "rater", "lab")
    val r = Annotations.pairwiseKappa(mono, "item_id", "rater", "lab").collect()(0)
    assert(r.getDouble(4) === 1.0, "po")
    assert(r.getDouble(5) === 1.0, "pe")
    assert(r.isNullAt(6), "kappa undefined when chance agreement is total")
  }
}
