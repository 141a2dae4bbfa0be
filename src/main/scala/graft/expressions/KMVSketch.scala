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

  private def hashValue(v: Any): Long = mix(v match {
    case s: UTF8String => s.hashCode().toLong * 0x9e3779b97f4a7c15L
    case l: Long => l
    case i: Int => i.toLong
    case d: Double => java.lang.Double.doubleToLongBits(d)
    case f: Float => java.lang.Float.floatToIntBits(f).toLong
    case b: Boolean => if (b) 1L else 0L
    case other => other.hashCode().toLong
  })

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
      // order; fraction of the 2^64 space = (stored + 2^63) / 2^64
      val stored = buf.peek().longValue()
      val u = (stored.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / u)
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
