package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-min sketch frequency estimate as a native imperative aggregate:
  * `cms_estimate(key, probe, depth, width)` returns the sketch's
  * estimate of `count(key = probe)` within the group.
  *
  * Why a sketch: an exact per-key frequency table shuffles every
  * distinct key; the sketch buffer is a FIXED depth×width count matrix
  * per group that merges by elementwise addition — the shuffle payload
  * is constant in the key cardinality, the property that matters when
  * the key domain is unbounded (urls, doc ids) at 100 TB. Guarantees:
  * estimate ≥ true count, and ≤ true + ε·N with ε ≈ e/width except
  * with probability ~e^-depth.
  *
  * Hashing is fixed-seed (a_d·k + b_d mod 2^61−1 mod width), so the
  * estimate is deterministic across runs, partitionings, and retries —
  * required for the oracle's bounds check and for stable results under
  * stage retry in a real cluster.
  */
case class CountMinSketch(
    child: Expression,
    probe: Long,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
  require(width >= 16 && width <= (1 << 22),
    s"cms width must be in [16, 2^22], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires an integral key, got $t")
  }

  // Mersenne prime 2^61-1; fixed PER-ROW odd multipliers keep the rows'
  // collision patterns independent of each other (a shared multiplier
  // would give every row the same pairwise key difference) while the
  // whole sketch stays deterministic run-to-run (no Random seeds).
  private val P = (1L << 61) - 1
  private def slot(d: Int, k: Long): Int = {
    val a = (0x9e3779b97f4a7c15L | 1L) * (2 * d + 1)
    val b = 0xc2b2ae3d27d4eb4fL
    val mixed = java.lang.Math.floorMod(a * k + (b >>> d), P)
    (mixed % width).toInt
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
      }
      var d = 0
      while (d < depth) {
        buf(d * width + slot(d, k)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = buf(d * width + slot(d, probe))
      if (c < est) est = c
      d += 1
    }
    est
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](depth * width)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
