package graft

import graft.operators.Allocation
import org.apache.spark.sql.functions._

/** Conformance for Neyman-optimal stratified allocation. */
class AllocationSpec extends SparkTestBase {
  private val s = spark
  import s.implicits._

  test("hand-computed: allocation proportional to N_h * sigma_h, sums to budget") {
    // stratum a: values 0/10 repeated -> sigma 5, N=4, weight 20
    // stratum b: constant 7          -> sigma 0, N=4, weight 0
    // stratum c: values 0/20         -> sigma 10, N=2, weight 20
    val df = Seq(("a", 0L), ("a", 10L), ("a", 0L), ("a", 10L),
      ("b", 7L), ("b", 7L), ("b", 7L), ("b", 7L),
      ("c", 0L), ("c", 20L)).toDF("src", "v")
    val out = Allocation.neyman(df, "src", "v", budget = 10)
      .orderBy("stratum").as[(String, Long, Double, Long)].collect()
    assert(out.map(_._4).sum === 10L)
    val m = out.map(r => r._1 -> r).toMap
    assert(m("a")._3 === 5.0 && m("c")._3 === 10.0 && m("b")._3 === 0.0)
    // weights 20/0/20 -> shares 5/0/5
    assert(m("a")._4 === 5L && m("b")._4 === 0L && m("c")._4 === 5L)
  }

  test("largest-remainder: allocations always sum exactly to the budget") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(500)((s"s${rnd.nextInt(7)}", rnd.nextInt(100).toLong))
      .toDF("src", "v")
    for (budget <- Seq(1L, 17L, 100L, 997L)) {
      val total = Allocation.neyman(df, "src", "v", budget)
        .agg(sum("alloc")).as[Long].head()
      assert(total === budget, s"budget $budget")
    }
  }

  test("all-degenerate strata fall back to population-proportional") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("b", 9L)).toDF("src", "v")
    val out = Allocation.neyman(df, "src", "v", budget = 4)
      .orderBy("stratum").as[(String, Long, Double, Long)].collect()
    assert(out.map(_._4).sum === 4L)
    assert(out(0)._4 === 3L && out(1)._4 === 1L) // 3:1 population split
  }
}
