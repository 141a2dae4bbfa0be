package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization of a string
  * column (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`) — the
  * canonicalization stage every multilingual training-data pipeline
  * needs before hashing, dedup, or tokenization: "é" as U+00E9 and as
  * "e"+U+0301 are the SAME text but different bytes, so un-normalized
  * corpora under-dedup and fragment vocabulary. NFKC additionally
  * folds compatibility forms (ﬁ → fi, fullwidth → ASCII, ² → 2),
  * which is what C4-style cleaning applies.
  *
  * Cheap-path guard: an all-ASCII string (the overwhelming majority of
  * rows in mixed corpora) is returned UNCHANGED without invoking the
  * normalizer — `Normalizer.isNormalized` on ASCII short-circuits, but
  * the byte scan here avoids even the String materialization.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // validate at plan time AND canonicalize: eval/codegen pass the
  // enum NAME so the per-row path is a straight Form.valueOf — no
  // toUpperCase allocation per row
  private val canonicalForm = UnicodeNormalize.formOf(form).name()

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], canonicalForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.expressions.UnicodeNormalize.normalize($a, "$canonicalForm");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  private[expressions] def formOf(form: String): java.text.Normalizer.Form =
    form.toUpperCase match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $other")
    }

  /** `form` here is the canonical enum NAME (the expression resolves
    * user input once at plan time) — Form.valueOf is allocation-free
    * per row. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    // ASCII fast path: ASCII is closed under every normalization form
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))
  }

  def apply(c: Column, form: String): Column =
    GraftSqlBridge.column(new UnicodeNormalize(
      GraftSqlBridge.expression(c), form))
}
