package graft

import graft.operators.ExactQuantiles
import org.apache.spark.sql.functions._

class ExactQuantilesSpec extends SparkTestBase {

  test("matches the built-in exact percentile on random duplicated integers") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map(_ => rnd.nextInt(200).toLong).toDF("v")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = ExactQuantiles.quantiles(df, "v", ps)
    val want = df.agg(expr(s"percentile(v, array(${ps.mkString(",")}))"))
      .head.getSeq[Double](0)
    ps.zip(want).foreach { case (p, e) =>
      assert(got(p) === e, s"p=$p: got ${got(p)}, built-in $e")
    }
  }

  test("interpolates between distinct values exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(10L, 20L, 30L, 40L).toDF("v")
    val got = ExactQuantiles.quantiles(df, "v", Seq(0.5, 1.0 / 3))
    assert(got(0.5) === 25.0)
    assert(math.abs(got(1.0 / 3) - 20.0) < 1e-9)
  }

  test("domain guard: continuous doubles raise instead of single-task sorting") {
    val s = spark
    import s.implicits._
    // every value distinct — the regime where the one-task cumulative
    // window would absorb the whole column
    val continuous = (1 to 2000).map(i => i + 1e-7 * i).toDF("v")
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.quantiles(continuous, "v", Seq(0.5), maxDomain = 1000L)
    }
    assert(e.getMessage.contains("maxDomain"))
    assert(e.getMessage.contains("GroupedDistribution"), // names the sketch fallback
      s"error must point at the KLL path: ${e.getMessage}")
    // same data passes once the domain bound admits it
    val ok = ExactQuantiles.quantiles(continuous, "v", Seq(0.5), maxDomain = 2000L)
    assert(ok(0.5) > 1000 && ok(0.5) < 1001)
  }
}
