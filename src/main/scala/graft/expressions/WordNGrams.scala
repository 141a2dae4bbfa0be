package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word n-grams from an already-tokenized
  * array<string>, space-joined, optionally de-duplicated — the zero-
  * shuffle replacement for the posexplode → doc-window → `lead` shingle
  * builder.
  *
  * The window formulation costs a full shuffle of the token rows
  * (partitionBy doc) plus a per-doc sort, and its consumers then pay a
  * second shuffle for `.distinct()`. This expression emits the distinct
  * gram set per row inside whole-stage codegen, so a shingle consumer
  * (Jaccard/MinHash/decontamination posting lists) starts its first
  * shuffle AT the posting-list aggregate — the earliest it can possibly
  * be at any scale. Per-row state is one hash set over the doc's own
  * grams, bounded by document length (the same bound the window sort
  * already paid per doc).
  *
  * Gram text is identical to the window form by construction: the same
  * token array, the same single-space join — so oracle SQL that builds
  * grams from the same tokenization is unchanged.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordNGrams.compute($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Static kernel shared by eval and codegen (one early-bound call per
    * row keeps the expression inside WholeStageCodegen). */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): GenericArrayData = {
    val nt = toks.numElements()
    val total = nt - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    if (distinct) {
      // first-appearance order: deterministic output for the two-run
      // hash-stability gate even where the gram set is consumed unordered
      val seen = new java.util.LinkedHashSet[UTF8String](total * 2)
      var i = 0
      while (i < total) {
        var k = 0
        while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](total)
      var i = 0
      while (i < total) {
        var k = 0
        while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** distinct word n-grams of a token array, space-joined. */
  def distinctGrams(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(new WordNGrams(
      GraftSqlBridge.expression(tokens), n, distinct = true))

  /** all word n-grams (with repeats) of a token array, space-joined. */
  def allGrams(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(new WordNGrams(
      GraftSqlBridge.expression(tokens), n, distinct = false))
}
