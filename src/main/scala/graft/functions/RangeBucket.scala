package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/**
 * Threshold-bucket index for the runner's RANGE admission partitioner
 * (the SimpleEqualityPartitioner idea generalized from `field == v` to
 * `field >/>=/</<= t`): given the SORTED distinct thresholds
 * b_0 < … < b_{m-1} of a fused query group, map each record's value to
 * an integer bucket
 *
 *   idx(v) = 2·j + 1   when v == b_j            (the point bucket)
 *   idx(v) = 2·i       when b_{i-1} < v < b_i   (the open interval)
 *
 * so every threshold predicate becomes a pure index range:
 *   v >  b_j  ⇔  idx ≥ 2j + 2        v <  b_j  ⇔  idx ≤ 2j
 *   v ≥  b_j  ⇔  idx ≥ 2j + 1        v ≤  b_j  ⇔  idx ≤ 2j + 1
 *
 * One groupBy(idx) job then serves EVERY fused query via driver-side
 * prefix/suffix folds over ≤ 2m+1 bucket rows — one binary search per
 * record instead of N predicate evaluations ([[graft.streaming
 * .QueryRunner]] wires it; the reference's analog surface is the query
 * partitioner, bullet-storm SimpleEqualityPartitioner.java:40-75).
 *
 * Two typed forms, matching Spark's own comparison coercion so the fold
 * is indistinguishable from the generic compiled path:
 *  - [[RangeBucketL]] (integral column, integral thresholds): exact
 *    64-bit comparisons — no 2^53 hazard.
 *  - [[RangeBucketD]] (fractional column, or a fractional literal
 *    forcing Spark's own long→double promote): IEEE compare with
 *    Spark's NaN-largest ordering (java binarySearch's Double.compare
 *    agrees) and −0.0 == 0.0 (normalized on both sides — Double.compare
 *    would otherwise order −0.0 below +0.0 where Spark's `>=` treats
 *    them equal).
 *
 * NULL in → NULL out (a null never matches any threshold predicate, and
 * the runner filters nulls before the grouped job).
 */
case class RangeBucketD(child: Expression, breaks: Seq[Double])
    extends UnaryExpression {
  require(breaks.nonEmpty && breaks.sliding(2).forall(
      p => p.size < 2 || java.lang.Double.compare(p(0), p(1)) < 0),
    "breaks must be non-empty, sorted, distinct")
  // normalize −0.0 at construction; value side normalizes per row
  private val arr: Array[Double] = breaks.map(b => if (b == 0d) 0d else b).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"range_bucket_d needs a double input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket_d"

  override def nullSafeEval(input: Any): Any =
    RangeBucketD.index(input.asInstanceOf[Double], arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("breaks", arr, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.RangeBucketD.index($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RangeBucketD {
  /** Static so interpreted eval and generated code share one body. */
  def index(v0: Double, breaks: Array[Double]): Int = {
    val v = if (v0 == 0d) 0d else v0
    val j = java.util.Arrays.binarySearch(breaks, v)
    if (j >= 0) 2 * j + 1 else 2 * (-(j + 1))
  }
  def col(c: Column, breaks: Seq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(RangeBucketD(expression(c), breaks))
  }
}

/** Exact integral sibling of [[RangeBucketD]] — see its scaladoc. */
case class RangeBucketL(child: Expression, breaks: Seq[Long])
    extends UnaryExpression {
  require(breaks.nonEmpty && breaks.sliding(2).forall(
      p => p.size < 2 || p(0) < p(1)),
    "breaks must be non-empty, sorted, distinct")
  private val arr: Array[Long] = breaks.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"range_bucket_l needs a bigint input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket_l"

  override def nullSafeEval(input: Any): Any =
    RangeBucketL.index(input.asInstanceOf[Long], arr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("breaks", arr, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.RangeBucketL.index($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RangeBucketL {
  def index(v: Long, breaks: Array[Long]): Int = {
    val j = java.util.Arrays.binarySearch(breaks, v)
    if (j >= 0) 2 * j + 1 else 2 * (-(j + 1))
  }
  def col(c: Column, breaks: Seq[Long]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(RangeBucketL(expression(c), breaks))
  }
}
