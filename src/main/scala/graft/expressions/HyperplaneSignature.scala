package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: random-hyperplane LSH signature of a
  * numeric vector, packed into ONE long (bit j = sign of the projection
  * onto deterministic ±1 plane j). The ±1 planes are derived from a
  * Scala hash of (bit, dim) at plan time and shipped as a reference
  * object, so the generated code is a tight two-level loop — the
  * statically-expanded Column formulation (bits×dim terms) blew past JIT
  * limits and compiled for seconds per query.
  *
  * `bits <= 64`. Same plane derivation as the previous Column version
  * (MurmurHash3.productHash((j, i)) & 1).
  */
case class HyperplaneSignature(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float|double>, got ${other.simpleString}")
  }

  /** planes(j)(i) == true -> +x, false -> -x. */
  @transient private lazy val planes: Array[Array[Boolean]] =
    Array.tabulate(bits, dim)((j, i) =>
      (scala.util.hashing.MurmurHash3.productHash((j, i)) & 1) == 1)

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = math.min(ad.numElements(), dim)
    val isFloat = elemIsFloat
    var sig = 0L
    var j = 0
    while (j < bits) {
      val plane = planes(j)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
        proj += (if (plane(i)) x else -x)
        i += 1
      }
      if (proj >= 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "boolean[][]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val x = ctx.freshName("x")
      val plane = ctx.freshName("plane")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  boolean[] $plane = $planesRef[$j];
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$getter($i);
         |    $proj += $plane[$i] ? $x : -$x;
         |  }
         |  if ($proj >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def apply(vec: Column, bits: Int, dim: Int): Column =
    GraftSqlBridge.column(
      new HyperplaneSignature(GraftSqlBridge.expression(vec), bits, dim))
}
