package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–min sketch (Cormode & Muthukrishnan '05): `depth` hash rows ×
  * `width` counters; an item increments one counter per row, the
  * estimate is the MIN over its counters. One-sided error — estimates
  * NEVER undercount; overcount ≤ e·N/width with probability 1−e^−depth.
  *
  * The point-frequency complement to [[MisraGries]] (which enumerates
  * heavy items but can't answer "how often did THIS item occur" for
  * arbitrary items): a 100 TB frequency service is one bounded
  * depth×width row per group, mergeable by element-wise addition — so
  * partial aggregates combine map-side, the result is independent of
  * partitioning and arrival order (addition commutes), and estimates
  * are fully deterministic: the hash functions are seeded mixes, no
  * RNG anywhere.
  */
object CmsHashing {
  private[expressions] def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** 64-bit content hash (FNV-1a over the UTF-8 bytes, finalized by
    * the 64-bit mix). A 32-bit base (UTF8String.hashCode) would make
    * every sketch row collide together for item pairs colliding on 32
    * bits — the birthday regime at ~1e5 distinct items; full-row
    * collisions now require a 64-bit collision. */
  private[expressions] def contentHash(item: UTF8String): Long = {
    val bytes = item.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    mix(h * 0x9e3779b97f4a7c15L)
  }

  /** Double-hash step for a base hash: odd, so (base + i·step) walks
    * the full period mod any power-of-two-free width too. */
  private[expressions] def stepOf(base: Long): Long =
    mix(base + 0x6a09e667f3bcc909L) | 1L

  /** Row `i`'s counter index given a precomputed (base, step). */
  private[expressions] def indexAt(base: Long, step: Long, i: Int,
      width: Int): Int =
    java.lang.Math.floorMod(base + i.toLong * step, width.toLong).toInt
}

/** Aggregate: build the sketch as ONE array<long> of depth·width
  * counters. Buffer is the flat counter array — fixed memory from the
  * first row. */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "depth in [1, 16]")
  require(width >= 2, "width >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val base = CmsHashing.contentHash(s)
      val step = CmsHashing.stepOf(base)
      var i = 0
      while (i < depth) {
        buf(i * width + CmsHashing.indexAt(base, step, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar: the min-over-rows estimate of an item's frequency from a
  * sketch built with the SAME depth/width. */
case class CountMinEstimate(left: Expression, right: Expression,
    depth: Int, width: Int) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (array<long>, string), got $other")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CountMinEstimate.estimate(sketch.asInstanceOf[ArrayData],
      item.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.expressions.CountMinEstimate.estimate(" +
        s"$sk, $it, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  def estimate(sketch: ArrayData, item: UTF8String, depth: Int, width: Int): Long = {
    val base = CmsHashing.contentHash(item)
    val step = CmsHashing.stepOf(base)
    var mn = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch.getLong(i * width + CmsHashing.indexAt(base, step, i, width))
      if (c < mn) mn = c
      i += 1
    }
    mn
  }
}

object CountMinSketchAgg {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** count–min sketch of a string column as one array<long> row. */
  def cms_sketch(c: Column, depth: Int = 4, width: Int = 2048): Column =
    GraftSqlBridge.column(
      CountMinSketchAgg(GraftSqlBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** frequency estimate of `item` from a sketch with matching
    * depth/width. */
  def cms_estimate(sketch: Column, item: Column,
      depth: Int = 4, width: Int = 2048): Column =
    GraftSqlBridge.column(CountMinEstimate(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(item),
      depth, width))
}
