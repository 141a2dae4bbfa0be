package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. '07) as a custom
  * TypedImperativeAggregate — the industry-standard mergeable distinct
  * counter, alongside [[KMVSketch]] (k-minima family): m = 256
  * registers of "max leading-zero rank" over md5-prefix64 hashes,
  * elementwise-max merge, CONSTANT 256-byte state per group no matter
  * the input size — the 100 TB pre-aggregation shape.
  *
  * ORACLE-REPRODUCIBLE by the q37/q24 discipline: string keys hash
  * through the library's md5-prefix64 identity, bucket = the hash's
  * top 8 bits (hex chars 1–2), rank = leading zeros of the remaining
  * 56 bits + 1 CAPPED AT 40 (LEAST on both engines — the cap keeps the
  * harmonic sum Σ 2^(40−M[j]) ≤ 256·2⁴⁰ inside a BIGINT, and a true
  * rank > 40 has probability ≈ m·2⁻⁴⁰ per register: statistically
  * irrelevant, but DEFINED identically on both engines, which is what
  * the gate needs). The emitted surface is the exact integer register
  * summary — v_zero (empty registers) and s40 (the scaled harmonic
  * sum) — plus the RAW HLL estimate αₘ·m²·2⁴⁰/s40 as one literal
  * arithmetic chain both engines evaluate to the same IEEE double. The
  * small-range linear-counting correction (m·ln(m/V)) uses libm `ln`,
  * which is NOT bit-portable across engines — [[estimate]] applies it
  * for production use, spec-tested; the gate pins the raw formula.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch.{M, RANK_CAP}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HllSketch.summaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => HllSketch.offer(regs, Md5Prefix64.hash(s))
      case other => HllSketch.offer(regs, Md5Prefix64.hash(
        UTF8String.fromString(other.toString)))
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = HllSketch.summaryRow(regs)

  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketch {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  val M = 256        // registers (p = 8)
  val RANK_CAP = 40  // keeps Σ 2^(40−M[j]) inside a BIGINT; see scaladoc

  /** The summary struct's schema — shared by [[HllSketch]] (one-shot)
    * and [[HllSummary]] (over stored/merged registers). */
  val summaryType: StructType = StructType(Seq(
    StructField("v_zero", LongType, nullable = false),
    StructField("s40", LongType, nullable = false),
    StructField("est_hll", DoubleType, nullable = false)))

  private[expressions] def offer(regs: Array[Byte], h: Long): Unit = {
    val bucket = ((h >>> 56) & 0xffL).toInt
    val w = h & 0x00ffffffffffffffL
    val rank =
      if (w == 0L) RANK_CAP
      else math.min(java.lang.Long.numberOfLeadingZeros(w) - 8 + 1, RANK_CAP)
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
  }

  private[expressions] def summaryRow(regs: Array[Byte]): GenericInternalRow = {
    var vZero = 0L
    var s40 = 0L
    var i = 0
    while (i < M) {
      if (regs(i) == 0) vZero += 1L
      s40 += 1L << (40 - regs(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](vZero, s40, rawEstimate(s40)))
  }

  /** The raw HLL estimate as ONE literal arithmetic chain — the oracle
    * SQL spells the identical expression, so the double is
    * bit-identical across engines. */
  def rawEstimate(s40: Long): Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 1099511627776.0 / s40.toDouble

  /** Production estimator: raw HLL plus the standard small-range
    * linear-counting correction (uses libm ln — NOT gate-safe; the
    * gate surface carries [[rawEstimate]] instead). */
  def estimate(vZero: Long, s40: Long): Double = {
    val raw = rawEstimate(s40)
    if (raw <= 2.5 * M && vZero > 0) M.toDouble * math.log(M.toDouble / vZero)
    else raw
  }

  /** HLL register summary (v_zero, s40, est_hll) per group. */
  def hll_sketch(c: Column): Column =
    GraftSqlBridge.column(
      HllSketch(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Raw 256-byte register state per group — the STORABLE partial for
    * shard-wise roll-up (write per-shard sketches, merge later with
    * [[hll_merge]], summarize with [[hll_summary]]). */
  def hll_registers(c: Column): Column =
    GraftSqlBridge.column(
      HllRegisters(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Merge stored register states (elementwise max) into one. */
  def hll_merge(c: Column): Column =
    GraftSqlBridge.column(
      HllMergeAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Summarize a stored/merged register state. */
  def hll_summary(c: Column): Column =
    GraftSqlBridge.column(HllSummary(GraftSqlBridge.expression(c)))
}

/** The storable form of [[HllSketch]]: same update path, but eval emits
  * the raw 256-byte registers (BinaryType) — the partial a shard writes
  * out so a later pass can [[HllMergeAgg]] sketches instead of
  * re-reading the shard's rows. Mergeability is what makes HLL a
  * pre-aggregation: count once per shard, combine forever. */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch.M)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => HllSketch.offer(regs, Md5Prefix64.hash(s))
      case other => HllSketch.offer(regs, Md5Prefix64.hash(
        UTF8String.fromString(other.toString)))
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllSketch.M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = regs
  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge aggregate over STORED register states: elementwise max — the
  * second level of a shard-wise sketch roll-up. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch.M)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val other = v.asInstanceOf[Array[Byte]]
      require(other.length == HllSketch.M,
        s"register state must be ${HllSketch.M} bytes, got ${other.length}")
      var i = 0
      while (i < HllSketch.M) {
        if (other(i) > regs(i)) regs(i) = other(i)
        i += 1
      }
    }
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllSketch.M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(regs: Array[Byte]): Any = regs
  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar summary of a stored/merged register state — (v_zero, s40,
  * est_hll), the same surface [[HllSketch]] emits one-shot.
  * CodegenFallback is deliberate: this evaluates once per GROUP (over
  * already-aggregated sketch rows, a driver-bounded cardinality), not
  * per input row — nothing to win from a fused loop. */
case class HllSummary(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = HllSketch.summaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_summary expects binary registers, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    require(regs.length == HllSketch.M,
      s"register state must be ${HllSketch.M} bytes, got ${regs.length}")
    HllSketch.summaryRow(regs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
