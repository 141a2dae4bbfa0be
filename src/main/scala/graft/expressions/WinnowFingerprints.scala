package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprints
  * (Schleimer/Wilkerson/Aiken '03) of a NORMALIZED text column in one
  * codegen pass — hash every character k-gram (16-hex-char md5 prefix),
  * keep the minimum of each sliding window of `w` consecutive gram
  * hashes (trailing partial windows included), de-duplicate.
  *
  * Replaces the explode-positions → doc-window min → distinct plan: that
  * shape shuffles every gram row (≈ one row per CHARACTER of corpus)
  * into a per-doc sort and then pays a second distinct shuffle. Here the
  * sliding min is a monotonic deque over the row's own grams — O(m)
  * time, O(w) state — and consumers explode an already-distinct
  * fingerprint array, so the first shuffle of any downstream plan is its
  * posting-list aggregate.
  *
  * Fingerprint bytes are IDENTICAL to the relational form: md5 of the
  * UTF-8 bytes of each code-point k-gram, first 16 lowercase hex chars,
  * minimum by lexicographic order (engine-agnostic — plain byte order on
  * hex ASCII), windows clipped at the last gram. Oracle SQL that mirrors
  * the window formulation is unchanged.
  *
  * Normalization (lower/whitespace-collapse/trim) stays OUTSIDE in the
  * caller's Column expression so this kernel matches it bit-for-bit.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: the 16-hex-char md5 prefix of EVERY
  * k-char gram of a normalized text column, in position order — the
  * per-position hashing pass of substring-level dedup, one tight loop
  * per document with a reused MessageDigest (the relational
  * substring+md5 projection allocates a digest and intermediate
  * UTF8Strings per position — measured ~2× slower over corpus-scale
  * position counts). Bytes are identical to the relational form;
  * consumers posexplode (0-based ordinal + 1 = the 1-based position). */
case class CharGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharGramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.CharGramHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHashes {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val n = text.numChars()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offs = WinnowFingerprints.charOffsets(bytes, n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val o = if (offs == null) i else offs(i)
      val e = if (offs == null) i + k else offs(i + k)
      md.update(bytes, o, e - o)
      md.digest(buf, 0, 16)
      out(i) = WinnowFingerprints.hexPrefix(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(normText: Column, k: Int): Column =
    GraftSqlBridge.column(new CharGramHashes(
      GraftSqlBridge.expression(normText), k))
}

/** [[CharGramHashes]]'s long-valued sibling: the SAME md5 identity
  * (first 64 digest bits) of every k-char gram, but as `array<long>`
  * instead of 16-hex strings — half the bytes per gram on the wire and
  * no hex encode, for consumers that only COUNT and JOIN on the hash
  * and never emit it (substring dedup). The hex↔long mapping is a
  * bijection of the same 64 bits, so duplicate structure (and thus any
  * downstream result) is identical to the string form an oracle
  * reconstructs with `substring(md5(...), 1, 16)`. */
case class CharGramHashes64(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes64 expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharGramHashes64.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.CharGramHashes64.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHashes64 {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val n = text.numChars()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val bytes = text.getBytes
    val offs = WinnowFingerprints.charOffsets(bytes, n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val o = if (offs == null) i else offs(i)
      val e = if (offs == null) i + k else offs(i + k)
      md.update(bytes, o, e - o)
      md.digest(buf, 0, 16)
      // Md5Prefix64.prefix64: the one shared 64-bit md5 identity
      out(i) = Md5Prefix64.prefix64(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(normText: Column, k: Int): Column =
    GraftSqlBridge.column(new CharGramHashes64(
      GraftSqlBridge.expression(normText), k))
}

object WinnowFingerprints {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  private val HEX = "0123456789abcdef".toCharArray

  /** Byte offset of each code point of a UTF-8 buffer: offs(i) = first
    * byte of char i, offs(n) = total bytes. Returns null for pure-ASCII
    * input (offset == index — no array needed). One linear walk; gram
    * loops that previously located char i with `substringSQL(i+1, k)`
    * paid a scan from byte 0 PER POSITION — O(chars²) per document,
    * ruinous on real web documents (100 KB+), invisible on short test
    * rows. */
  private[expressions] def charOffsets(bytes: Array[Byte], n: Int): Array[Int] = {
    if (bytes.length == n) return null
    val offs = new Array[Int](n + 1)
    var b = 0
    var c = 0
    while (c < n) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(n) = bytes.length
    offs
  }

  /** First 8 digest bytes as 16 lowercase hex chars, as UTF8String. */
  private[expressions] def hexPrefix(digest: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      val b = digest(i) & 0xff
      hex(2 * i) = HEX(b >>> 4).toByte
      hex(2 * i + 1) = HEX(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** 16-hex-char md5 prefix of the UTF-8 bytes, as UTF8String. */
  private[expressions] def hashGram(md: java.security.MessageDigest, gram: UTF8String): UTF8String = {
    md.reset()
    hexPrefix(md.digest(gram.getBytes))
  }

  /** Static kernel shared by eval and codegen. */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val len = text.numChars()
    val m = len - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offs = charOffsets(bytes, len)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val hashes = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val o = if (offs == null) i else offs(i)
      val e = if (offs == null) i + k else offs(i + k)
      md.update(bytes, o, e - o)
      md.digest(buf, 0, 16)
      hashes(i) = hexPrefix(buf)
      i += 1
    }
    // sliding min over [i, min(i+w-1, m-1)] for every i — a monotonic
    // deque of candidate indices with strictly increasing hash values
    val seen = new java.util.LinkedHashSet[UTF8String](m)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    i = 0
    while (i < m) {
      val hi = math.min(i + w - 1, m - 1)
      while (j <= hi) {
        while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(j)) >= 0) tail -= 1
        deque(tail) = j
        tail += 1
        j += 1
      }
      while (deque(head) < i) head += 1
      seen.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** distinct winnowing fingerprints of an already-normalized text
    * column. */
  def apply(normText: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(new WinnowFingerprints(
      GraftSqlBridge.expression(normText), k, w))
}
