package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two numeric
  * array columns, computed in double precision in one fused loop.
  *
  * Why a custom Expression (SURVEY §2.10 preference order): the built-in
  * alternatives both lose at scale — higher-order functions
  * (aggregate/zip_with) are interpreted per element, and statically
  * expanded element_at chains blow up codegen/JIT for wide vectors and
  * get re-evaluated wherever Catalyst pushes them (e.g. into join
  * conditions). This generates ONE tight Java loop via `doGenCode`, so
  * it stays inside whole-stage codegen wherever the operator sits.
  *
  * Accumulation order matches the HOF formulation (index-order left
  * fold; cos = dot / (sqrt(na)*sqrt(nb))) so results are bit-identical
  * with `VectorFns.cosine`. Array elements must be non-null
  * (embedding vectors); lengths are taken from the left side.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // Byte/Short/Int elements are accepted alongside Float/Double so the
  // int8-quantized ANN path (SimilaritySearch.quantizedTopK) can keep its
  // codes stored as array<tinyint> — the 4-8x-smaller storage/shuffle form
  // that IS the point of quantization — and still run through this one
  // fused codegen kernel. Integer values (|c| <= 127) are exact in double.
  private val okTypes: Set[DataType] =
    Set(FloatType, DoubleType, ByteType, ShortType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(okTypes.contains) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double|byte|short|int> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def get(arr: ArrayData, e: Expression, i: Int): Double =
    elemType(e) match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case ByteType => arr.getByte(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case t => throw new IllegalStateException(s"unreachable: $t")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(ad, left, i)
      val y = get(bd, right, i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, e: Expression, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case t => throw new IllegalStateException(s"unreachable: $t")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, left, i)};
         |  double $y = ${getter(b, right, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column API + SQL registration for the custom expressions. */
object GraftExpressions {
  import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

  def cosine_similarity(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Thresholded Levenshtein via the Myers bit-parallel kernel —
    * drop-in for `levenshtein(a, b, k)` (same value, same −1
    * sentinel past the threshold). */
  def levenshtein_within(a: Column, b: Column, k: Int): Column =
    GraftSqlBridge.column(LevenshteinWithin(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), k))

  /** Make `cosine_similarity(a, b)` usable from spark.sql(...). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}
