package graft

import graft.pipeline.Retrieval
import org.apache.spark.sql.Row

class RetrievalSpec extends SparkTestBase {

  // 4 docs; terms target "spark". Embeddings: id 0 is the query; id 1
  // points the same way (cosine 1), id 2 orthogonal, id 3 opposite.
  private def fixtures = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "spark spark spark join"), // top lexical
      (1L, "spark join"),
      (2L, "join only text here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    (docs, emb)
  }

  test("rrfHybrid fuses both modalities; doc top in both lists wins") {
    implicit val s = spark
    val (docs, emb) = fixtures
    val got = Retrieval.rrfHybrid(docs, "doc_id", "text", Seq("spark"),
      emb, "vec_id", "embedding", queryVecId = 0L, n = 3, k = 4).collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    // lexical ranks: doc0 r1 (tf 3), doc1 r2 (tf 1), then 2,3 tie at tf 0
    // -> doc2 r3. semantic ranks (query=0 excluded): 1 (cos 1) r1,
    // 2 (cos 0) r2, 3 (cos -1) r3.
    // fused: doc1 = 1/62 + 1/61 (both lists), doc0 = 1/61 (lex only),
    // doc2 = 1/63 + 1/62, doc3 = 1/63 (sem only)
    def fused(r: Row) = r.getDouble(3)
    assert(fused(byId(1L)) === 1.0 / 62 + 1.0 / 61)
    assert(fused(byId(0L)) === 1.0 / 61)
    assert(byId(0L).isNullAt(2), "doc 0 must have null semantic rank")
    assert(byId(3L).isNullAt(1), "doc 3 must have null lexical rank")
    // overall order by fused desc: 1, 2, 0, 3
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 0L, 3L))
  }

  test("rrfHybrid limits to k and ranks are 1-based per modality") {
    implicit val s = spark
    val (docs, emb) = fixtures
    val got = Retrieval.rrfHybrid(docs, "doc_id", "text", Seq("spark"),
      emb, "vec_id", "embedding", queryVecId = 0L, n = 3, k = 2).collect()
    assert(got.length === 2)
    val ranks = got.flatMap(r =>
      Seq(1, 2).filterNot(r.isNullAt).map(r.getLong))
    assert(ranks.forall(_ >= 1))
  }

  // 8 docs sharing a ubiquitous token mix plus rare overlaps — the shape
  // the head/tail decomposition must get exactly right.
  private def dotCorpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the the the cat sat"),
      (2L, "the the dog sat sat"),
      (3L, "the cat cat cat mat"),
      (4L, "the the the the dog dog"),
      (5L, "rare pair rare pair the"),
      (6L, "pair rare pair rare the the"),
      (7L, "unrelated words entirely"),
      (8L, "the")).toDF("doc_id", "text")
  }

  /** Naive reference: all-token inverted-index dot, no decomposition. */
  private def naiveDots(minDot: Long): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    val tf = dotCorpus
      .selectExpr("doc_id", "explode(split(text, ' ')) AS tok")
      .groupBy("doc_id", "tok").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = tf.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(x => x._2 -> x._3).toMap }
    val ids = byDoc.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      dot = byDoc(i).map { case (t, c) => c * byDoc(j).getOrElse(t, 0L) }.sum
      if dot >= minDot
    } yield (i, j) -> dot).toMap
  }

  test("tfDotPairs head/tail decomposition equals the naive all-token dot") {
    // denseDf=3 forces 'the' (df=8) and 'sat'? (df=2, stays sparse) —
    // head/tail split exercised; compare against the naive reference at
    // several thresholds, including one where tail-only pairs qualify.
    for (minDot <- Seq(1L, 4L, 8L)) {
      val got = Retrieval.tfDotPairs(dotCorpus, "doc_id", "text",
          minDot = minDot, denseDf = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === naiveDots(minDot), s"minDot=$minDot")
    }
  }

  test("tfDotPairs headless path (denseDf above every df) matches too") {
    val got = Retrieval.tfDotPairs(dotCorpus, "doc_id", "text",
        minDot = 2L, denseDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naiveDots(2L))
  }

  test("tfDotPairs guards trip loudly") {
    val e1 = intercept[IllegalArgumentException](
      Retrieval.tfDotPairs(dotCorpus, "doc_id", "text",
        minDot = 1L, denseDf = 1, maxHeadTokens = 2))
    assert(e1.getMessage.contains("denseDf"))
    // the head guard bounds WORK (n·(n−1)/2·H madds), not just docs:
    // 8 docs × 1 head dim ('the', df=8) = 28 madds > 20 trips
    val e2 = intercept[IllegalArgumentException](
      Retrieval.tfDotPairs(dotCorpus, "doc_id", "text",
        minDot = 1L, denseDf = 3, maxHeadMadds = 20L))
    assert(e2.getMessage.contains("maxHeadMadds"))
    // thresholded-scorer contract: minDot <= 0 is rejected up front
    // (the dense and headless paths would disagree on zero-dot pairs)
    val e3 = intercept[IllegalArgumentException](
      Retrieval.tfDotPairs(dotCorpus, "doc_id", "text", minDot = 0L))
    assert(e3.getMessage.contains("minDot"))
  }

  test("tfDotPairs shuffled tail merge (broadcast budget 0) matches the naive dot") {
    // forcing the tail past the broadcast budget switches the merge to a
    // shuffled equi-join — same answer, different physical join
    val got = Retrieval.tfDotPairs(dotCorpus, "doc_id", "text",
        minDot = 1L, denseDf = 3, maxTailBroadcastPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naiveDots(1L))
  }

  test("phraseSearch: exact sequence, overlapping repeats, filtered postings") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),          // "a b c" at word 0 and 3
      (2L, "x x x x"),              // "x x x" overlaps at 0 and 1
      (3L, "a b b c"),              // no "a b c"
      (4L, "c b a")).toDF("doc_id", "text")
    val abc = graft.pipeline.Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(abc === Set((1L, 0), (1L, 3)))
    val xxx = graft.pipeline.Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("x", "x", "x"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(xxx === Set((2L, 0), (2L, 1)))
    // single-word phrase degenerates to the postings of that word
    val b1 = graft.pipeline.Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(b1 === Set((1L, 1), (1L, 4), (3L, 1), (3L, 2), (4L, 1)))
    // malformed phrases are rejected loudly
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a b"))
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Retrieval.phraseSearch(docs, "doc_id", "text", Nil)
    }
  }
}
