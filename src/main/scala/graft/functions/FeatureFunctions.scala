package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Oracle-replayable string hash for the hashing-trick feature family
 * ([[graft.pipeline.Features]]).
 *
 * Unlike Murmur3/xxhash64, this polynomial hash is expressible as plain
 * arithmetic over character codes, so an external engine (the DuckDB
 * oracle, a downstream feature store, a Python trainer) can recompute
 * the exact bucket of every feature without linking against Spark:
 *
 *   h(s) = Σ_{i=0}^{min(len,16)-1}  code(s_i) · w_i
 *   w_i  = 31^i           for i < 8
 *   w_i  = 13 · 31^(i-8)  for 8 ≤ i < 16
 *
 * Only the first 16 characters participate — by design: feature names
 * and categorical levels are short, and the bound keeps every weight ·
 * code product, and the 16-term sum, exactly inside both BIGINT and
 * IEEE-double integer range (max ≈ 1.3e14), so Spark, DuckDB and
 * NumPy all agree bit-for-bit. `code` is the UTF-16 unit (= Unicode
 * code point for all of the BMP); parity with `ascii(substr(s,i,1))`
 * holds for non-astral text.
 *
 * Null in → null out; the empty string hashes to 0.
 */
object FeatureFunctionHelpers {
  /** w_i weights: 31^i for the first 8 chars, 13·31^(i-8) for the next 8. */
  val Weights: Array[Long] = {
    val w = new Array[Long](16)
    var p = 1L
    var i = 0
    while (i < 8) { w(i) = p; w(i + 8) = 13L * p; p *= 31L; i += 1 }
    w
  }

  def polyHash16(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    val n = math.min(str.length, 16)
    var h = 0L
    var i = 0
    while (i < n) { h += str.charAt(i).toLong * Weights(i); i += 1 }
    java.lang.Long.valueOf(h)
  }
}

/** Native codegen'd node for [[FeatureFunctionHelpers.polyHash16]] —
  * a narrow per-row map that stays inside whole-stage codegen (a
  * higher-order `aggregate(transform(split(...)))` would fall out). */
case class PolyHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash16 needs a string input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash16"
  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val boxed = FeatureFunctionHelpers.polyHash16(
      child.eval(input).asInstanceOf[UTF8String])
    if (boxed == null) null else boxed.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("polyHashBoxed")
    ev.copy(code = code"""
      |${c.code}
      |java.lang.Long $boxed = graft.functions.FeatureFunctionHelpers.polyHash16(
      |  ${c.isNull} ? null : ${c.value});
      |boolean ${ev.isNull} = $boxed == null;
      |long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeatureFunctions {
  private[functions] val ident = FunctionIdentifier("poly_hash16")
  private[functions] val info =
    new ExpressionInfo(classOf[PolyHash16].getName, "poly_hash16")
  private[functions] val builder = (exprs: Seq[Expression]) => {
    require(exprs.length == 1, "poly_hash16 takes exactly 1 argument")
    PolyHash16(exprs.head)
  }

  /** Idempotently register `poly_hash16` with an existing session. */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column => nativeCol, expression => exprOf}

  /** `poly_hash16(s)` as a Column — session-free native node. */
  def polyHash16(c: Column): Column = nativeCol(PolyHash16(exprOf(c)))
}
