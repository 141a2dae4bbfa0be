package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a custom
  * TypedImperativeAggregate — the heavy-hitter counterpart to
  * [[KMVSketch]] in SURVEY §2.10's custom-aggregate slot.
  *
  * Keeps at most `k` (item, weight) counters. The classic stream update
  * (Misra & Gries '82): increment a present item; insert if a slot is
  * free; otherwise decrement every counter (dropping zeros) — that step
  * "spends" one occurrence of each tracked item plus the incoming one,
  * so the total decremented weight is bounded by N/(k+1). The merge
  * (Agarwal et al., "Mergeable Summaries", PODS'12) sums counters and
  * trims to the k largest by subtracting the (k+1)-th largest weight,
  * preserving the same error bound across arbitrary partial-aggregate
  * trees — exactly the map-side-combine shape a 100 TB groupBy-free
  * frequency scan needs.
  *
  * Guarantees (N = total weight seen):
  *   - estimate(x) ∈ [true(x) − N/(k+1), true(x)];
  *   - every x with true(x) > N/(k+1) is present in the summary.
  * The summary is therefore a guaranteed SUPERSET of the items above
  * the support threshold; an exact count restricted to the ≤ k
  * candidates (a broadcast semi-join, tiny by construction) turns it
  * into the exact frequent-item set without ever running a full
  * all-items groupBy.
  *
  * Deterministic (no hashing at all — counters are exact lower bounds),
  * mergeable, bounded: the partial state is ≤ k (string, long) pairs
  * regardless of input size. Returns map<string, long> of surviving
  * lower-bound weights.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  private def add(buf: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + w)
    else if (buf.size < k) buf.put(item, w)
    else {
      // no free slot: decrement all counters by the incoming weight
      // (bounded by the smallest counter so nothing goes negative in a
      // single weighted step; loop until the increment is spent)
      var remaining = w
      while (remaining > 0 && !buf.containsKey(item) && buf.size == k) {
        var minW = Long.MaxValue
        val vit = buf.values().iterator()
        while (vit.hasNext) minW = math.min(minW, vit.next())
        val dec = math.min(remaining, minW)
        val eit = buf.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val nw = e.getValue - dec
          if (nw == 0L) eit.remove() else e.setValue(nw)
        }
        remaining -= dec
      }
      if (remaining > 0) {
        val cur2 = buf.get(item)
        if (cur2 != 0L || buf.containsKey(item)) buf.put(item, cur2 + remaining)
        else if (buf.size < k) buf.put(item, remaining)
        // else remaining was fully spent against the decrement — drop
      }
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    // sum counters, then trim to k by subtracting the (k+1)-th largest
    // weight (Mergeable Summaries §3.1) — NOT repeated single-decrements,
    // which would be O(k²) per merge.
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      val weights = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { weights(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val cut = weights(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nw = e.getValue - cut
        if (nw <= 0L) eit.remove() else e.setValue(nw)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic output order (sorted by item) so the map bytes are
    // stable across runs — the two-run hash gate sees identical results
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val n = keys.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) {
      ks(i) = UTF8String.fromString(keys.get(i))
      vs(i) = buf.get(keys.get(i))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val sit = buf.entrySet().iterator()
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    while (sit.hasNext) {
      val e = sit.next()
      val b = e.getKey.getBytes("UTF-8")
      entries.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (b, w) = entries.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(w)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Misra–Gries frequent-items summary: map<item, lower-bound weight>
    * with at most `k` entries; every item with frequency > N/(k+1) is
    * guaranteed present. */
  def frequent_items_sketch(c: Column, k: Int = 64): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
