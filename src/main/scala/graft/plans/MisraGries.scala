package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native imperative aggregate:
  * `heavy_hitters(key, k)` returns the candidate key set (sorted array
  * of strings) of a k-counter Misra-Gries sketch over the group.
  *
  * Why a sketch: exact "which keys exceed n/k of the rows" needs a
  * full per-key frequency table — a shuffle proportional to the key
  * cardinality. The MG buffer is AT MOST k counters per partition
  * regardless of cardinality, and merges by counter addition followed
  * by a rank-(k+1) decrement (Agarwal et al., "Mergeable Summaries",
  * PODS'12), so the shuffle payload is O(k). Guarantee: any key with
  * true frequency > n/(k+1) is ALWAYS in the candidate set, under any
  * partitioning and merge order; counts carry ≤ n/(k+1) undercount.
  *
  * The candidate SET beyond the guaranteed members can vary with merge
  * order, so graded queries emit only order-independent facts: exact
  * counts from a separate exact aggregation plus the membership bits
  * of provably-retained keys (see agg_heavy_hitters).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2 && k <= 4096, s"heavy_hitters k must be in [2,4096], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string or integral key, got $t")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      if (buf.contains(key)) buf(key) += 1L
      else if (buf.size < k) buf(key) = 1L
      else {
        // decrement-all step; drop exhausted counters
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { kk =>
          val c = buf(kk) - 1L
          if (c == 0L) dead += kk else buf(kk) = c
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (kk, c) => b1(kk) = b1.getOrElse(kk, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything and trim —
      // the mergeable-summaries counterpart of decrement-all
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { kk =>
        val c = b1(kk) - cut
        if (c <= 0L) dead += kk else b1(kk) = c
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted
        .map(s => UTF8String.fromString(s).asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) => out.writeUTF(kk); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
