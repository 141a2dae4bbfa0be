package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * TypedImperativeAggregate (SURVEY §2.10's "novel sketch" slot — the
  * custom AGGREGATE counterpart to the scalar custom expressions).
  *
  * The sketch keeps the k smallest 64-bit hashes seen; with U = the
  * k-th smallest hash normalized to (0,1], the unbiased estimator is
  * D̂ = (k-1)/U (Beyer et al., "On Synopses for Distinct-Value
  * Estimation under Multiset Operations", SIGMOD'07). Deterministic
  * (xxhash64-style mixing, no RNG), mergeable (union-of-mins), fixed
  * memory: exactly what a 100 TB pre-aggregation wants — the partial
  * state is k longs regardless of input size, vs countDistinct's
  * expand+exact shuffle.
  *
  * Buffer: a bounded max-heap of the k smallest hashes.
  */
case class KMVSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k >= 2, "k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  // max-heap: head is the LARGEST of the kept k minima
  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k, java.util.Collections.reverseOrder())

  private def mix(h0: Long): Long = {
    // xxhash-style avalanche; keeps determinism without an RNG
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private def hashValue(v: Any): Long = v match {
    // strings hash through the library's engine-agnostic md5-prefix64
    // identity (already uniform — no extra mixing), which makes a
    // string-keyed KMV sketch ORACLE-REPRODUCIBLE: any engine with md5
    // recomputes the same k minima, so the estimate graduates from
    // rows-only to hash-gated (q37, the q24 SimHash precedent)
    case s: UTF8String => Md5Prefix64.hash(s)
    case l: Long => mix(l)
    case i: Int => mix(i.toLong)
    case d: Double => mix(java.lang.Double.doubleToLongBits(d))
    case f: Float => mix(java.lang.Float.floatToIntBits(f).toLong)
    case b: Boolean => mix(if (b) 1L else 0L)
    case other => mix(other.hashCode().toLong)
  }

  private def offer(buf: java.util.PriorityQueue[java.lang.Long], h: Long): Unit = {
    // track minima in UNSIGNED order (flip the sign bit)
    val u = h ^ Long.MinValue
    if (buf.size < k) { if (!buf.contains(u)) buf.offer(u) }
    else if (u < buf.peek() && !buf.contains(u)) { buf.poll(); buf.offer(u) }
  }

  override def update(buf: java.util.PriorityQueue[java.lang.Long],
      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, hashValue(v))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[java.lang.Long],
      other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val u: Long = it.next()
      if (buf.size < k) { if (!buf.contains(u)) buf.offer(u) }
      else if (u < buf.peek() && !buf.contains(u)) { buf.poll(); buf.offer(u) }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val n = buf.size
    if (n == 0) 0L
    else if (n < k) n.toLong // saw fewer than k distinct hashes: exact
    else {
      // stored values are sign-flipped so natural order == unsigned
      // order; unsigned(h) = stored + 2^63. The Beyer et al. estimator
      // D̂ = (k−1)/U with U = (unsigned+1)/2^64 runs ENTIRELY in
      // 128-bit integer arithmetic — floor((k−1)·2^64/(unsigned+1)) —
      // so an oracle mirrors it exactly in HUGEINT (no double, no
      // rounding-mode trap; the q71 discipline). A degenerate kth-min
      // near 0 (probability ~(k/2^23)^k) makes the quotient exceed a
      // long; clamp to Long.MaxValue — the SQL mirror clamps with
      // least() before its BIGINT cast, so the defined-and-identical
      // degenerate behavior replaces a silent wrap here vs a DuckDB
      // out-of-range error there.
      val stored = buf.peek().longValue()
      val unsigned = BigInt(stored) + BigInt(Long.MinValue).abs
      (((BigInt(k) - 1) << 64) / (unsigned + 1))
        .min(BigInt(Long.MaxValue)).toLong
    }
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMVSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMVSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KMVSketch {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** approx distinct count via a k-minimum-values sketch. */
  def approx_distinct_kmv(c: Column, k: Int = 256): Column =
    GraftSqlBridge.column(
      KMVSketch(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
