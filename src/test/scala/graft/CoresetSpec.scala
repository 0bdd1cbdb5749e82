package graft

import graft.pipeline.Similarity

class CoresetSpec extends SparkTestBase {

  test("FPS on unit-circle points picks the hand-computed order") {
    val s = spark
    import s.implicits._
    val inv = 1.0 / math.sqrt(2)
    val pts = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(inv, inv)),
      (3L, Seq(-1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.coresetFPS(pts, "vec_id", "embedding", k = 4, seedId = 0L)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    // seed (1,0); farthest is (-1,0) at cosine dist 2; then (0,1) at 1;
    // last (1/√2,1/√2) at 1-1/√2
    assert(got.map(_._1).toSeq === Seq(0L, 3L, 1L, 2L))
    assert(math.abs(got(1)._2 - 2.0) < 1e-12)
    assert(math.abs(got(2)._2 - 1.0) < 1e-12)
    assert(math.abs(got(3)._2 - (1 - inv)) < 1e-12)
  }

  test("radii are non-increasing and selections are distinct on a random set") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0L until 100L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val got = Similarity.coresetFPS(pts, "vec_id", "embedding", k = 10, seedId = 0L)
      .collect().sortBy(_.getInt(0))
    assert(got.map(_.getLong(1)).distinct.length === 10)
    val radii = got.drop(1).map(_.getDouble(2))
    assert(radii.sliding(2).forall { case Array(a, b) => a >= b - 1e-9; case _ => true })
  }
}
