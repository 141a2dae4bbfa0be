package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 2-D HILBERT index of two quantized
  * `bits`-bit coordinates — the classical iterative xy2d walk
  * (quadrant digit + reflect-and-swap rotation per bit, high to low)
  * as ONE codegen'd per-row loop.
  *
  * Why an expression and not column arithmetic: the per-bit rotation
  * makes each stage's (x, y) reference the previous stage's (x, y)
  * several times, and CollapseProject merges chained projections by
  * SUBSTITUTION — the expression tree grows ~3× per bit, ~3^8 for an
  * 8-bit curve (the r15 probe measured 88 s/2M rows for the
  * column-chained form vs ~2 s here). The Morton interleave
  * ([[graft.operators.ZOrderLayout]]) has no such cross-stage
  * dependence, which is why IT stays plain column arithmetic. The
  * oracle mirrors the walk as `bits` unrolled SQL stages, where each
  * CTE materializes and no substitution blowup exists. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (long, long), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.HilbertIndex.xy2d($bits, $x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** The canonical xy2d (Hilbert 1891 via the common iterative form):
    * per bit s (high→low), quadrant digit (3·rx)^ry, then the
    * reflect-and-swap rotation with the FULL n−1−· reflection — the
    * exact arithmetic the oracle's unrolled SQL stages mirror. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def apply(a: Column, b: Column, bits: Int): Column =
    GraftSqlBridge.column(new HilbertIndex(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), bits))
}
