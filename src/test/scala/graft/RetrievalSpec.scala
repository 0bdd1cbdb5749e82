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
}
