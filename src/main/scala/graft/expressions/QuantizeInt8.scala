package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: symmetric per-vector int8 quantization
  * of an embedding — codes c_i = round(127·x_i / s) with s = max|x_i|,
  * emitted as ONE array<tinyint> in a single fused pass (max-abs scan +
  * code loop).
  *
  * Why a custom Expression (SURVEY §2.10 preference order): the HOF
  * formulation `transform(v, x -> round(127*x / aggregate(v, ...)))`
  * re-evaluates the max-abs aggregate PER ELEMENT once Catalyst's
  * projection collapse inlines it into the lambda — O(d²) per row — and
  * higher-order functions are interpreted besides. This is one tight
  * O(d) loop that stays inside whole-stage codegen.
  *
  * Scale contract: byte codes are 4× smaller than float32 (8× vs
  * float64) — at 100 TB the quantized index is what fits in cluster
  * memory/SSD while the float vectors stay in cold storage. Cosine
  * ranking needs NO dequantization: per-vector scales cancel in the
  * cosine, so cos(codes_a, codes_b) ≈ cos(x_a, x_b) computed directly
  * on the byte arrays ([[CosineSimilarity]] accepts integer arrays).
  * An all-zero vector quantizes to all-zero codes (scale guarded to
  * 1e-30; its cosine is NaN on both the exact and quantized path). */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = ad.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      val a = math.abs(x)
      if (a > s) s = a
      i += 1
    }
    if (s < 1e-30) s = 1e-30
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      codes(i) = math.round(127.0 * x / s).toByte
      i += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val ax = ctx.freshName("ax")
      val codes = ctx.freshName("codes")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = java.lang.Math.abs((double) $a.$getter($i));
         |  if ($ax > $s) $s = $ax;
         |}
         |if ($s < 1e-30) $s = 1e-30;
         |byte[] $codes = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$getter($i);
         |  $codes[$i] = (byte) java.lang.Math.round(127.0 * $x / $s);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def apply(c: Column): Column =
    GraftSqlBridge.column(new QuantizeInt8(GraftSqlBridge.expression(c)))
}
