package graft

import graft.compile.ExprCompiler
import graft.model._
import graft.streaming.PostAggEval
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.util.Random

/**
 * Randomized parity: the driver-side post-aggregation evaluator must agree
 * with the Catalyst-compiled expression on every generated tree. The
 * generator is type-sane (no plans that fail analysis, no zero divisors —
 * ANSI division) but otherwise explores nulls, three-valued logic,
 * mixed long/double comparisons, string ops, and nesting.
 */
class PostAggParitySpec extends SparkTestBase {

  private val rnd = new Random(20260812L)

  // fixture rows: nullable long / double / string / boolean
  private val rowData: Seq[(java.lang.Long, java.lang.Double, String, java.lang.Boolean)] = Seq(
    (1L, 2.5, "alpha", true),
    (-7L, 0.0, "", false),
    (42L, -3.25, "Beta", true),
    (null, 9.5, null, null),
    (0L, null, "gamma", false),
    (5L, 5.0, "alpha", null))

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("s", StringType), StructField("t", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rowData.map(r => Row(r._1, r._2, r._3, r._4)): _*), schema)
  }

  private def recOf(r: (java.lang.Long, java.lang.Double, String, java.lang.Boolean)): PostAggEval.Rec =
    mutable.LinkedHashMap[String, Any](
      "a" -> (if (r._1 == null) null else r._1.longValue),
      "b" -> (if (r._2 == null) null else r._2.doubleValue),
      "s" -> r._3,
      "t" -> (if (r._4 == null) null else r._4.booleanValue))

  // ---- type-directed expression generator ----------------------------------

  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  private def genNum(depth: Int): Expr =
    if (depth <= 0) pick(Seq(Field("a"), Field("b"), Lit(rnd.nextInt(20).toLong - 10),
      Lit(math.rint(rnd.nextDouble() * 20 - 10) / 2), Lit(null)))
    else pick[() => Expr](Seq(
      () => genNum(0),
      () => Binary(genNum(depth - 1), genNum(depth - 1),
        pick(Seq(BinOp.ADD, BinOp.SUB, BinOp.MUL))),
      // ANSI division: keep divisors as nonzero literals
      () => Binary(genNum(depth - 1), Lit(pick(Seq(2L, 4L, -3L, 2.5, -0.5))), BinOp.DIV),
      () => Unary(UnaryOp.ABS, genNum(depth - 1)),
      () => NAry(NAryOp.IF, Seq(genBool(depth - 1), genNum(depth - 1), genNum(depth - 1)))
    ))()

  private def genStr(depth: Int): Expr =
    if (depth <= 0) pick(Seq(Field("s"), Lit("alpha"), Lit("zz"), Lit(""), Lit(null)))
    else pick[() => Expr](Seq(
      () => genStr(0),
      () => Unary(pick(Seq(UnaryOp.UPPER, UnaryOp.LOWER, UnaryOp.TRIM)), genStr(depth - 1)),
      () => NAry(NAryOp.SUBSTRING, Seq(genStr(depth - 1),
        Lit(rnd.nextInt(7).toLong - 2), Lit(rnd.nextInt(5).toLong))),
      () => NAry(NAryOp.IF, Seq(genBool(depth - 1), genStr(depth - 1), genStr(depth - 1)))
    ))()

  private def genBool(depth: Int): Expr =
    // null boolean leaf is a typed null (null = 0) — a bare Lit(null) is
    // VOID to Catalyst and fails analysis as an IF/CASE condition
    if (depth <= 0) pick(Seq(Field("t"), Lit(true), Lit(false),
      Binary(Lit(null), Lit(0L), BinOp.EQUALS)))
    else pick[() => Expr](Seq(
      () => genBool(0),
      () => Binary(genNum(depth - 1), genNum(depth - 1),
        pick(Seq(BinOp.EQUALS, BinOp.NOT_EQUALS, BinOp.GREATER_THAN, BinOp.LESS_THAN,
          BinOp.GREATER_OR_EQUALS, BinOp.LESS_OR_EQUALS))),
      () => Binary(genStr(depth - 1), genStr(depth - 1),
        pick(Seq(BinOp.EQUALS, BinOp.NOT_EQUALS, BinOp.LESS_THAN, BinOp.GREATER_THAN))),
      () => Binary(genBool(depth - 1), genBool(depth - 1),
        pick(Seq(BinOp.AND, BinOp.OR, BinOp.XOR))),
      () => Unary(UnaryOp.NOT, genBool(depth - 1)),
      () => Unary(pick(Seq(UnaryOp.IS_NULL, UnaryOp.IS_NOT_NULL)),
        pick(Seq(genNum(depth - 1), genStr(depth - 1)))),
      () => NAry(NAryOp.BETWEEN, Seq(genNum(depth - 1), genNum(depth - 1), genNum(depth - 1))),
      // left side stays typed (a bare null literal is VOID to array_contains)
      () => Binary(pick(Seq(Field("a"), Field("b"), Lit(5L), Lit(3.0))),
        ListExpr(Seq(Lit(1L), Lit(5L), Lit(-7L))), pick(Seq(BinOp.IN, BinOp.EQUALS_ANY)))
    ))()

  private def sameValue(spark: Any, eval: Any): Boolean = (spark, eval) match {
    case (null, null) => true
    case (x: java.lang.Number, y: java.lang.Number) =>
      x.doubleValue == y.doubleValue ||
        (x.doubleValue.isNaN && y.doubleValue.isNaN)
    case (x, y) => x == y
  }

  test("400 random expression trees: driver eval equals the compiled Column row-by-row") {
    val recs = rowData.map(recOf)
    var checked = 0
    (1 to 400).foreach { i =>
      val e = pick[Int => Expr](Seq(genNum, genStr, genBool))(2 + rnd.nextInt(2) - 1)
      val compiled = ExprCompiler.compile(e, Some(df.schema))
      val sparkVals = df.select(compiled.as("v")).collect().map(_.get(0))
      val evalVals = recs.map(r => PostAggEval.eval(e, r))
      sparkVals.zip(evalVals).zipWithIndex.foreach { case ((sv, ev), ri) =>
        assert(sameValue(sv, ev),
          s"tree #$i row $ri: spark=$sv eval=$ev expr=$e")
      }
      checked += 1
    }
    assert(checked === 400)
  }
}
