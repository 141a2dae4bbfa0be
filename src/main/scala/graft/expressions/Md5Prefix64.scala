package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 64 bits of md5 of a string's
  * UTF-8 bytes, as a LONG (big-endian read of digest bytes 0..7 — the
  * same value the 16-hex-char md5 prefix denotes, so bit b LSB-first
  * is nibble bit b%4 of hex char 16 − b/4, which is what oracle SQL
  * reconstructs nibble-wise from `substring(md5(x), 1, 16)`).
  *
  * This is the library's engine-agnostic 64-bit identity in its
  * cheapest form: no hex string materialization, no conv() decimal
  * round-trip — one digest over the raw bytes into one long, with a
  * thread-local MessageDigest so per-ROW usage (e.g. SimHash's
  * per-token hash) allocates nothing.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Md5Prefix64.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian fold of digest bytes 0..7 — THE 64-bit identity every
    * md5-prefix consumer shares (CharGramHashes64 included); change it
    * in one place or gram and token hashes silently diverge. */
  private[expressions] def prefix64(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)

  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    prefix64(md.digest(s.getBytes))
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(new Md5Prefix64(GraftSqlBridge.expression(c)))
}
