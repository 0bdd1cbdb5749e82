package graft

import graft.pipeline.Associations

class AssociationsSpec extends SparkTestBase {

  test("rules: hand-computed support/confidence/lift on 4 baskets") {
    val s = spark
    import s.implicits._
    // baskets: {1,2} {1,2} {1,3} {2}  -> n=4
    // c_1=3, c_2=3, c_3=1; pairs: (1,2) c=2, (1,3) c=1
    val m = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 2L)).toDF("g", "i")
    val got = Associations.rules(m, "g", "i", 1L, 2L) // support >= n/2 = 2
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // only (1,2) clears support 2
    assert(got.keySet === Set((1L, 2L)))
    val (cab, ca, cb, conf, lift) = got((1L, 2L))
    assert((cab, ca, cb) === ((2L, 3L, 3L)))
    assert(conf === 2.0 / 3.0)
    assert(lift === 8.0 / 9.0) // n*c_ab/(c_a*c_b) = 4*2/9
  }

  test("rules: duplicate membership rows don't inflate supports") {
    val s = spark
    import s.implicits._
    val m = Seq((10L, 1L), (10L, 1L), (10L, 2L), (10L, 2L)).toDF("g", "i")
    val got = Associations.rules(m, "g", "i", 0L, 1L).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 1L) // c_ab = 1 despite duplicated rows
  }
}
