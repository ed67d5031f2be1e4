package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact distinct count over a bounded non-negative integer key as a
  * native imperative aggregate with a fixed-size bitset buffer.
  *
  * Why: `COUNT(DISTINCT k)` plans an extra shuffle of every distinct
  * value (expand + two aggregations); `approx_count_distinct` is a
  * sketch. When the key domain is bounded (dictionary-encoded ids,
  * surrogate keys — the common warehouse case) a bitmap buffer gives
  * the EXACT answer in one aggregation pass: per-partition bitmaps
  * OR-merge, so the shuffle carries `maxKey/8` bytes per group instead
  * of the distinct values themselves. This is the roaring-bitmap
  * pattern warehouses use, minus the compression (keys here are dense).
  *
  * Out-of-range or null keys are ignored (contribute nothing) — the
  * caller pins the domain, mirroring dictionary-encoded reality.
  */
case class BitmapDistinct(
    child: Expression,
    maxKey: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // Guard the buffer size: a negative maxKey would explode via the
  // unsigned shift in `words` (maxKey = -1 → ~512 MB per group), and an
  // unbounded one defeats the fixed-small-buffer design. 2^28 caps the
  // per-group buffer at 32 MB.
  require(maxKey >= 0 && maxKey <= BitmapDistinct.MaxKeyLimit,
    s"bitmap_distinct maxKey must be in [0, ${BitmapDistinct.MaxKeyLimit}], got $maxKey")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct requires an integral key, got $t")
  }

  private val words = (maxKey >>> 6) + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
      }
      if (k >= 0 && k <= maxKey)
        buf((k >>> 6).toInt) |= 1L << (k & 63)
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BitmapDistinct {
  /** Largest accepted maxKey (2^28 − 1): 32 MB bitset per group. */
  val MaxKeyLimit: Int = (1 << 28) - 1
}
