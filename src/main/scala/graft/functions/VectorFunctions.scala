package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Native Catalyst dot product over two `array<double>` columns.
 *
 * The composable alternative (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
 * allocates an intermediate array and evaluates its lambdas interpreted,
 * per element, outside whole-stage codegen — measurable in the ANN/dedup
 * hot loops where the dot product dominates (SURVEY: similarity operators).
 * This expression generates a tight primitive loop via `doGenCode` instead:
 * no allocation, stays inside WholeStageCodegen.
 *
 * Semantics match the fold exactly: strict left-to-right summation over
 * min(|a|, |b|) elements — bit-identical to DuckDB's `list_dot_product`
 * on equal-length inputs, so oracle comparisons stay hash-exact.
 * Null ARRAYS propagate null; elements are assumed non-null (embedding
 * vectors), matching the reference layout.
 */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<double> inputs, got ${left.dataType} and ${right.dataType}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[VecDot]]'s exact-integer sibling over two `array<bigint>` columns:
  * same tight codegen'd loop, LONG accumulator — overflow-free for tf
  * vectors (|dot| ≤ n·maxtf², astronomically under 2⁶³) and hash-exact
  * against any engine's integer arithmetic, where the double version
  * would be subject to summation-order effects. */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_long needs two array<bigint> inputs, got ${left.dataType} and ${right.dataType}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private[functions] val ident = FunctionIdentifier("vec_dot")
  private[functions] val info = new ExpressionInfo(classOf[VecDot].getName, "vec_dot")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
    VecDot(exprs.head, exprs(1))
  }
  private[functions] val longIdent = FunctionIdentifier("vec_dot_long")
  private[functions] val longInfo =
    new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long")
  private[functions] val longBuilder = (exprs: Seq[Expression]) => {
    require(exprs.length == 2, "vec_dot_long takes exactly 2 arguments")
    VecDotLong(exprs.head, exprs(1))
  }

  /** Idempotently register `vec_dot` / `vec_dot_long` with an existing
    * session's function registry (for sessions not built with
    * [[GraftExtensions]]). */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    if (!registry.functionExists(longIdent))
      registry.registerFunction(longIdent, longInfo, longBuilder)
  }

  /** `vec_dot(a, b)` as a Column — session-free native node (see
    * [[org.apache.spark.sql.graft.ColumnBridge]]); [[ensure]] /
    * [[GraftExtensions]] are only needed for SQL-name access. */
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecDot(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** `vec_dot_long(a, b)` as a Column. */
  def vecDotLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecDotLong(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

/** Session-extension hook: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.functions.
  * GraftExtensions`) injects the engine's native functions at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((VectorFunctions.ident, VectorFunctions.info, VectorFunctions.builder))
    ext.injectFunction((TextFunctions.ident, TextFunctions.info, TextFunctions.builder))
    ext.injectFunction(
      (TextFunctions.winnowIdent, TextFunctions.winnowInfo, TextFunctions.winnowBuilder))
    ext.injectFunction(
      (TextFunctions.simhashIdent, TextFunctions.simhashInfo, TextFunctions.simhashBuilder))
    ext.injectFunction(
      (TextFunctions.minhashIdent, TextFunctions.minhashInfo, TextFunctions.minhashBuilder))
    ext.injectFunction(
      (VectorFunctions.longIdent, VectorFunctions.longInfo, VectorFunctions.longBuilder))
    ext.injectFunction(
      (TextFunctions.normIdent, TextFunctions.normInfo, TextFunctions.normBuilder))
    ext.injectFunction(
      (FeatureFunctions.ident, FeatureFunctions.info, FeatureFunctions.builder))
  }
}
