package graft

import graft.operators.JoinAdvisor

/** Pre-join cardinality advisory: in the exact regime the NDVs and key
  * intersection are exact, so the report is a pure arithmetic function
  * of the two frames — pinned by hand here, and pinned against the
  * ACTUAL join size where multiplicities are uniform (the estimate's
  * stated regime). */
class JoinAdvisorSpec extends SparkTestBase {

  test("exact-regime report: counts, NDVs, intersection, and the containment estimate") {
    val s = spark
    import s.implicits._
    // A: keys 1..10, 2 rows each (20 rows). B: keys 6..15, 3 rows each
    // (30 rows). Intersection = {6..10} (5 keys); uniform multiplicity
    // → true join size = 5 · 2 · 3 = 30, and the estimate is exact.
    val a = (1L to 10L).flatMap(k => Seq.fill(2)(k)).toDF("k")
    val b = (6L to 15L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val r = JoinAdvisor.report(a, "k", b, "k", lgK = 12).head()
    assert((r.getLong(0), r.getLong(1)) === ((20L, 30L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((10L, 10L, 5L)))
    assert(r.getDouble(5) === 30.0)
    val actual = a.join(b, "k").count()
    assert(actual === 30L, "uniform-multiplicity estimate must equal the real join size")
  }

  test("disjoint key domains estimate zero; empty side divides safely") {
    val s = spark
    import s.implicits._
    val a = (1L to 5L).toDF("k")
    val b = (10L to 14L).toDF("k")
    val r = JoinAdvisor.report(a, "k", b, "k", lgK = 12).head()
    assert(r.getLong(4) === 0L && r.getDouble(5) === 0.0)
    val empty = Seq.empty[Long].toDF("k")
    val r2 = JoinAdvisor.report(a, "k", empty, "k", lgK = 12).head()
    assert(r2.getLong(1) === 0L && r2.getLong(3) === 0L && r2.getDouble(5) === 0.0)
  }
}
