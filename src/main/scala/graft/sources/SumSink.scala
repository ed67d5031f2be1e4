package graft.sources

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK exercising the full distributed commit
  * protocol — the write-side twin of [[TickSource]]: each task's
  * `DataWriter` accumulates (row count, Σ of one designated LONG
  * column), task `commit()` emits that partial as its
  * `WriterCommitMessage`, and ONLY the driver-side
  * `BatchWrite.commit` — which Spark calls after every task
  * succeeded — publishes the merged total to the registry.
  *
  * That two-phase shape is the whole point at scale: a 100 TB write
  * with 10⁵ tasks sees stragglers, retries, and speculative
  * duplicates, and correctness comes from Spark committing exactly
  * one message per partition and the sink publishing only in the
  * driver commit. `SumSinkSpec` pins both halves: a successful write
  * publishes the exact batch aggregate; a mid-write task failure
  * leaves the registry untouched (atomicity — no partial publish).
  *
  * Registry results are (count, sum) under the caller's `key` option:
  * order-insensitive merges, so task scheduling cannot affect the
  * outcome. */
class SumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    // Accept whatever the query writes; validated in the write builder.
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SumSinkTable(schema)
}

object SumSink {
  /** key → (n_rows, sum(col)); written ONLY by BatchWrite.commit. */
  val results = new ConcurrentHashMap[String, (Long, Long)]()
  /** key → committed epoch ids; the streaming commit's idempotence
    * ledger — a SAME-PROCESS re-delivered epoch (StreamExecution
    * retrying a batch after a transient failure) must not double-add.
    * The ledger is JVM-local: a real driver restart starts it empty,
    * so cross-process exactly-once would additionally require
    * persisting committed epoch ids under the query's checkpoint
    * location — out of scope for this in-memory test sink. */
  val epochs = new ConcurrentHashMap[String, java.util.Set[java.lang.Long]]()
}

private[sources] class SumSinkTable(schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft-sum-sink"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new SumWrite(info)
    }
}

private[sources] case class SumPartial(n: Long, sum: Long)
    extends WriterCommitMessage

private[sources] class SumWrite(info: LogicalWriteInfo)
    extends Write with BatchWrite with StreamingWrite {
  private val key = info.options.getOrDefault("key", "default")
  private val colName = info.options.getOrDefault("sumCol",
    info.schema().fields.head.name)
  private val colIdx = info.schema().fieldIndex(colName)
  require(info.schema().fields(colIdx).dataType == LongType,
    s"sumCol '$colName' must be LONG, got " +
      info.schema().fields(colIdx).dataType.simpleString)
  // Simulated mid-write failure for the abort-atomicity spec.
  private val failAt = Option(info.options.get("failAtRow")).map(_.toLong)

  // Both BatchWrite and StreamingWrite declare this default; Scala
  // requires an explicit pick when mixing the two traits.
  override def useCommitCoordinator(): Boolean = true

  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
    new SumWriterFactory(colIdx, failAt)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val partials = messages.collect { case m: SumPartial => m }
    SumSink.results.put(key,
      (partials.map(_.n).sum, partials.map(_.sum).sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()

  // ---- streaming face: per-epoch driver commits, idempotent on epoch
  override def toStreaming: StreamingWrite = this
  override def createStreamingWriterFactory(
      p: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SumStreamingWriterFactory(colIdx, failAt)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val seen = SumSink.epochs.computeIfAbsent(key,
      _ => ConcurrentHashMap.newKeySet[java.lang.Long]())
    // Exactly-once under SAME-PROCESS epoch re-delivery: first commit
    // of an epoch wins, replays are no-ops — the sink-side half of the
    // contract whose source-side half is the checkpointed offset log.
    // (Ledger is in-memory; see SumSink.epochs for the restart caveat.)
    if (seen.add(epochId)) {
      val partials = messages.collect { case m: SumPartial => m }
      SumSink.results.merge(key,
        (partials.map(_.n).sum, partials.map(_.sum).sum),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    }
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class SumWriterFactory(colIdx: Int, failAt: Option[Long])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SumWriter(colIdx, failAt)
}

private[sources] class SumStreamingWriterFactory(colIdx: Int,
    failAt: Option[Long]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new SumWriter(colIdx, failAt)
}

private[sources] class SumWriter(colIdx: Int, failAt: Option[Long])
    extends DataWriter[InternalRow] {
  private var n = 0L
  private var sum = 0L
  override def write(row: InternalRow): Unit = {
    val v = row.getLong(colIdx)
    if (failAt.contains(v))
      throw new RuntimeException(s"injected failure at row value $v")
    n += 1
    sum += v
  }
  override def commit(): WriterCommitMessage = SumPartial(n, sum)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
