package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Hilbert-curve index for a 2-D point — the locality upgrade over the
 * Morton/Z-order interleave ([[graft.operators.ZOrder]]): consecutive
 * Hilbert addresses are always grid-adjacent (no Z-shape "jumps"), so
 * range-partitioning on the index packs each file into a tighter spatial
 * rectangle and zone-map pruning skips more.
 *
 * Why a native Expression and not composed Columns: the standard xy2d
 * walk is a LOOP carrying (x, y, d) through `bits` rotate/reflect steps,
 * and each step's outputs reference the previous step's outputs several
 * times — unrolled into a Column expression tree that's Θ(3^bits) nodes
 * (and Spark's CollapseProject re-inlines any attempt to stage it
 * through projections). The codegen'd loop is ~10 instructions per step.
 *
 * Algorithm: the public-domain xy2d Hilbert walk (top bit to bottom):
 * quadrant contribution s²·((3·rx) xor ry), then reflect+swap when
 * ry = 0. Inputs must lie in [0, 2^bits); out-of-range inputs yield an
 * undefined (but deterministic) index — guard upstream like
 * [[graft.operators.ZOrder.cluster]] does.
 */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if bits >= 1 && bits <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs two bigint inputs and bits in [1,31], got " +
          s"${left.dataType}, ${right.dataType}, bits=$bits")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpatialFunctions {

  /** `hilbert_index(x, y)` over `bits`-bit coordinates as a Column. */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HilbertIndex(
      org.apache.spark.sql.graft.ColumnBridge.expression(x.cast("long")),
      org.apache.spark.sql.graft.ColumnBridge.expression(y.cast("long")), bits))

  /**
   * The same xy2d walk as ANSI-ish SQL — the oracle twin of
   * [[HilbertIndex]], generated from the same step structure (mirrors
   * [[graft.operators.ZOrder.zValueSql]]). One MATERIALIZED CTE per bit
   * level carrying (hx, hy, hd): the materialization boundary is load-
   * bearing — lateral/inline alias substitution would re-expand each
   * step's outputs into the next and the expression tree grows Θ(3^bits),
   * the exact blowup the native expression's loop avoids (a first draft
   * with lateral aliases hung DuckDB's binder at bits=16).
   */
  def hilbertSql(fromSql: String, keyCols: Seq[String], xCol: String,
                 yCol: String, bits: Int, outName: String): String = {
    require(bits >= 1 && bits <= 31)
    val keys = keyCols.mkString(", ")
    val b = new StringBuilder
    b.append(s"WITH h0 AS MATERIALIZED (SELECT $keys, " +
      s"CAST($xCol AS BIGINT) AS hx, CAST($yCol AS BIGINT) AS hy, " +
      s"CAST(0 AS BIGINT) AS hd FROM $fromSql)")
    for (i <- 0 until bits) {
      val s = 1L << (bits - 1 - i)
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      b.append(s", h${i + 1} AS MATERIALIZED (SELECT $keys, " +
        s"hd + $s * $s * xor(3 * $rx, $ry) AS hd, " +
        s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hy ELSE hy END) ELSE hx END AS hx, " +
        s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hx ELSE hx END) ELSE hy END AS hy " +
        s"FROM h$i)")
    }
    b.append(s" SELECT $keys, hd AS $outName FROM h$bits")
    b.toString
  }
}
