package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization ENCODING — for each
  * of the m contiguous subspaces, the index of the nearest codebook
  * centroid (squared-distance argmin, lowest index on ties), emitted as
  * ONE array<tinyint> of length m.
  *
  * Why a custom Expression (SURVEY §2.10 preference order): the
  * compositional formulation (a when-chain of m × nCodes
  * SquaredDistance terms over slice()) generates more code than Janino
  * accepts for realistic m/nCodes (m=16, nCodes=16 already trips
  * InternalCompilerException and drops the whole stage to interpreted
  * evaluation — measured ~100× slower). The codebooks ride along as a
  * reference object and the encoding is the canonical fused triple
  * loop (subspace → centroid → dim), exactly the m·k·d multiply-adds
  * FAISS's encoder performs.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]], subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val m = codebooks.length
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < cb.length) {
        val c = cb(ci)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (isFloat) ad.getFloat(j * subDim + i).toDouble
            else ad.getDouble(j * subDim + i)
          val diff = x - c(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = ci } // strict <: lowest index wins
        ci += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val getter = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val cb = ctx.freshName("cb")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val codes = ctx.freshName("codes")
      s"""
         |int $m = $cbRef.length;
         |byte[] $codes = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double[][] $cb = $cbRef[$j];
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $ci = 0; $ci < $cb.length; $ci++) {
         |    double[] $c = $cb[$ci];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $diff = ((double) $a.$getter($j * $subDim + $i)) - $c[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $ci; }
         |  }
         |  $codes[$j] = (byte) $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def apply(c: Column, codebooks: Array[Array[Array[Double]]],
      subDim: Int): Column =
    GraftSqlBridge.column(
      new PqEncode(GraftSqlBridge.expression(c), codebooks, subDim))
}

/** Native Catalyst expression: ADC (asymmetric distance computation)
  * scoring of a PQ code array against ONE query — approx cosine =
  * Σⱼ lut[j][codeⱼ] / (|q| · √Σⱼ cnorm[j][codeⱼ]), where lut carries
  * the query-subvector · centroid dot products and cnorm the centroid
  * norms (both driver-computed per probe, riding along as reference
  * objects). Per row this is 2·m array lookups — no d-length loop, no
  * vector bytes read: the 100 TB probe path scans m-byte code rows.
  */
case class PqAdcScore(child: Expression, lut: Array[Array[Double]],
    cnorm: Array[Array[Double]], qnorm: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects array<tinyint> codes, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val m = lut.length
    var dot = 0.0
    var n2 = 0.0
    var j = 0
    while (j < m) {
      val code = ad.getByte(j).toInt & 0xff
      dot += lut(j)(code)
      n2 += cnorm(j)(code)
      j += 1
    }
    dot / (qnorm * math.sqrt(n2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "double[][]")
    val cnRef = ctx.addReferenceObj("cnorm", cnorm, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val dot = ctx.freshName("dot")
      val n2 = ctx.freshName("n2")
      s"""
         |int $m = $lutRef.length;
         |double $dot = 0.0; double $n2 = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $code = ((int) $a.getByte($j)) & 0xff;
         |  $dot += $lutRef[$j][$code];
         |  $n2 += $cnRef[$j][$code];
         |}
         |${ev.value} = $dot / ($qnorm * java.lang.Math.sqrt($n2));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcScore {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def apply(c: Column, lut: Array[Array[Double]],
      cnorm: Array[Array[Double]], qnorm: Double): Column =
    GraftSqlBridge.column(
      new PqAdcScore(GraftSqlBridge.expression(c), lut, cnorm, qnorm))
}
