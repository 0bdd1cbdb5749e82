package graft

import graft.functions.VectorFunctions
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** The native vec_dot Catalyst expression: bit-identical to the composable
  * zip_with/aggregate fold, null-propagating, codegen'd. */
class VectorFunctionsSpec extends SparkTestBase {

  private lazy val vecs = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (1L to 200L).map { i =>
      (i, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }.toDF("id", "a", "b")
  }

  test("native functions are callable from plain SQL once registered") {
    VectorFunctions.ensure(spark)
    graft.functions.TextFunctions.ensure(spark)
    val r = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS g, " +
        "winnow_fingerprint('a b c d', 2, 2) AS f, " +
        "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0)
    assert(r.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(r.getSeq[Long](1).nonEmpty)
    assert(r.getDouble(2) === 11.0)
  }

  test("vec_dot equals the zip_with/aggregate fold bit-for-bit") {
    VectorFunctions.ensure(spark)
    val rows = vecs.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotd(col("a"), col("b")).as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vec_dot uses min length and propagates null arrays") {
    VectorFunctions.ensure(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),      // unequal lengths → min
      (null.asInstanceOf[Array[Double]], Array(1.0)) // null array → null
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.vecDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 1.0 * 4.0 + 2.0 * 5.0)
    assert(out(1).isNullAt(0))
  }

  test("vec_dot interpreted eval matches codegen") {
    VectorFunctions.ensure(spark)
    val e = graft.functions.VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, -1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) === 1.5 * 3.0 + 2.0 * (-1.0))
  }

  test("the plan stays inside whole-stage codegen (no ArrayAggregate lambdas)") {
    VectorFunctions.ensure(spark)
    val p = vecs.select(VectorFunctions.vecDot(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("aggregate("), p.take(600))
    assert(!p.contains("zip_with"), p.take(600))
  }

  test("GraftExtensions injects vec_dot at session build") {
    // the active test session wasn't built with extensions; exercise the
    // injector against a fresh extensions object to pin the wiring compiles
    // and targets the same builder as ensure()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // and call through SQL on the ensured session
    VectorFunctions.ensure(spark)
    val one = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(one === 11.0)
  }
}
