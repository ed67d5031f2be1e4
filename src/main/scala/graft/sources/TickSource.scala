package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, ReadMinRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic tick table as a full DataSource V2
  * (`TableProvider`) — the "custom source" surface of SURVEY §2B,
  * shaped like the reference's per-stock price feed
  * (`stock_data_scraper.py:83-140` emits one row per (stock, day)).
  *
  * Row `i` of `rows` is a pure function of `i` (integer arithmetic
  * only, so any re-read — Spark or the DuckDB oracle's
  * `generate_series` twin — reproduces identical bits):
  *
  *   sym         = SYMS(i % 8)
  *   day         = (i / 97) % 30
  *   price_cents = 1000 + (i * 37) % 9000
  *
  * The scan builder implements BOTH V2 pushdown hooks, and both are
  * real, not cosmetic:
  *
  *  - `SupportsPushDownFilters`: `tick_id` bounds prune whole input
  *    partitions at PLANNING time (each `InputPartition` is a compact
  *    `[start,end)` id range, so a bound either shrinks or deletes it)
  *    — the DSv2 analogue of parquet row-group/partition pruning, the
  *    thing that makes a selective query on a 100 TB feed read only
  *    the slice it needs. `sym` equality is applied inside the reader
  *    (row skip before materialization). Accepted filters are
  *    consumed (returned residual excludes them), so the reader MUST
  *    apply them exactly — `TickSourceSpec` pins that contract.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the pruned schema; a 2-column projection never builds the other
  *    fields.
  *
  * Plan visibility: `Scan.description()` embeds the pushed filter list,
  * so `.explain` shows `graft-ticks … PushedFilters: […]` and the spec
  * can assert pushdown from the plan text alone. */
class TickSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TickTable(
      math.max(1L, properties.getOrDefault("rows", "100000").toLong),
      math.max(1, properties.getOrDefault("parts", "8").toInt),
      math.max(1L, properties.getOrDefault("batchRows", "25000").toLong))
  override def supportsExternalMetadata(): Boolean = false
}

object TickSource {
  val SYMS: Array[String] =
    Array("ALPHA", "BETA", "GAMMA", "DELTA", "EPS", "ZETA", "ETA", "THETA")
  val schema: StructType = StructType(Seq(
    StructField("tick_id", LongType, nullable = false),
    StructField("sym", StringType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("price_cents", LongType, nullable = false)))

  /** The row function — single source of truth for source and spec. */
  def sym(i: Long): String = SYMS((i % 8).toInt)
  def day(i: Long): Int = ((i / 97) % 30).toInt
  def priceCents(i: Long): Long = 1000L + (i * 37) % 9000
}

private[sources] class TickTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-ticks($rows)"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TickScanBuilder(rows, parts, batchRows)
}

/** One pushed aggregate column: `op` ∈ count|sum|min|max over `field`
  * (null field = COUNT(*)), surfacing as `outType` in the scan output. */
private[sources] case class AggSpec(op: String, field: String,
    outType: DataType)

private[sources] class TickScanBuilder(rows: Long, parts: Int,
    batchRows: Long = 25000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = TickSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggGroup: Array[String] = Array.empty
  private var aggSpecs: Array[AggSpec] = Array.empty
  private var aggPushed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("tick_id", _: Long) => true
      case GreaterThan("tick_id", _: Long) => true
      case GreaterThanOrEqual("tick_id", _: Long) => true
      case LessThan("tick_id", _: Long) => true
      case LessThanOrEqual("tick_id", _: Long) => true
      case EqualTo("sym", _: String) => true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark may ask for an empty schema (pure COUNT(*)); keep it — the
    // reader then emits empty rows, which is exactly what count needs.
    required = requiredSchema

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays
    * false): each input partition emits one pre-aggregated row per
    * group and Spark plans the final merge — correct under any
    * partition count, and the 100 TB win is that only
    * |groups|·|partitions| tiny rows ever leave the source instead of
    * every raw row. Count/sum/min/max over int columns and group keys
    * on any source column are accepted; anything else is declined and
    * Spark falls back to a raw scan + its own aggregate. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def fieldOf(e: Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    def colType(f: String): DataType =
      TickSource.schema(f).dataType
    val groups = aggregation.groupByExpressions.map(fieldOf)
    if (groups.exists(_.isEmpty)) return false
    val specs = aggregation.aggregateExpressions.map {
      case _: CountStar => Some(AggSpec("count", null, LongType))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(AggSpec("count", _, LongType))
      case s: Sum if !s.isDistinct =>
        fieldOf(s.column)
          .filter(f => colType(f) == LongType || colType(f) == IntegerType)
          .map(AggSpec("sum", _, LongType))
      // min/max only on numeric columns: the reader accumulates in
      // Long index space, which would order `sym` by symbol index,
      // not lexicographically — decline and let Spark aggregate raw.
      case m: Min => fieldOf(m.column).filter(f => colType(f) != StringType)
        .map(f => AggSpec("min", f, colType(f)))
      case m: Max => fieldOf(m.column).filter(f => colType(f) != StringType)
        .map(f => AggSpec("max", f, colType(f)))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    aggGroup = groups.map(_.get)
    aggSpecs = specs.map(_.get)
    aggPushed = true
    true
  }

  override def build(): Scan =
    if (aggPushed)
      new TickScan(rows, parts, aggOutputSchema, pushed,
        Some((aggGroup, aggSpecs)), batchRows)
    else new TickScan(rows, parts, required, pushed, None, batchRows)

  /** Scan output under pushed aggregation: group columns (source
    * types), then one column per aggregate, in declaration order —
    * the layout V2ScanRelationPushDown expects to plan its final
    * merge over. */
  private def aggOutputSchema: StructType = StructType(
    aggGroup.map(f => StructField(f, TickSource.schema(f).dataType)) ++
      aggSpecs.zipWithIndex.map { case (a, i) =>
        StructField(s"agg_${i}_${a.op}", a.outType) })
}

private[sources] case class TickRange(start: Long, end: Long)
    extends InputPartition

private[sources] class TickScan(rows: Long, parts: Int,
    required: StructType, pushed: Array[Filter],
    agg: Option[(Array[String], Array[AggSpec])],
    batchRows: Long = 25000L)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ticks rows=$rows parts=$parts " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      agg.map { case (g, a) =>
        s"PushedAggregates: [${a.map(x => s"${x.op}(${x.field})").mkString(", ")}], " +
          s"PushedGroupBy: [${g.mkString(", ")}], " }.getOrElse("") +
      s"ReadSchema: ${required.catalogString}"

  // tick_id bounds → the surviving [lo, hi) id interval. Bounds
  // compose (multiple filters intersect); an empty interval yields
  // zero partitions — the whole scan is planned away.
  private def bounds: (Long, Long) = {
    var lo = 0L
    var hi = rows
    pushed.foreach {
      case EqualTo("tick_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("tick_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("tick_id", v: Long) => lo = math.max(lo, v)
      case LessThan("tick_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("tick_id", v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = bounds
    val step = math.max(1L, (rows + parts - 1) / parts)
    // Fixed planning grid (0, step, 2·step, …) intersected with the
    // pushed bounds: a bound prunes the grid cells it excludes, the
    // surviving cells keep their identity — same layout contract as
    // partitioned parquet.
    (0L until rows by step).flatMap { s =>
      val e = math.min(s + step, rows)
      val ps = math.max(s, lo)
      val pe = math.min(e, hi)
      if (ps < pe) Some(TickRange(ps, pe)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TickReaderFactory(required, pushed.collect {
      case EqualTo("sym", v: String) => v
    }, agg)

  /** Streaming face of the same table: the id sequence is the offset
    * log (offset = next unread tick_id), so the source replays
    * EXACTLY like a kafka-partition cursor. Admission control caps
    * each micro-batch at `batchRows` ids — real incremental batches,
    * not one catch-all — and AvailableNow drains up to the
    * prepare-time ceiling and stops. Filter/column pushdown state
    * carries over from the scan builder unchanged. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // The scan builder is shared between batch and streaming, so any
    // filter it CONSUMED must be applied here too: sym equality goes
    // to the reader, tick_id bounds intersect the offset ranges in
    // planInputPartitions. Aggregate pushdown has no streaming path —
    // fail loud rather than emit raw rows under an aggregated schema.
    require(agg.isEmpty,
      "aggregate pushdown is batch-only; streaming scan cannot honor it")
    new TickMicroBatchStream(rows, parts, batchRows, required, pushed.collect {
      case EqualTo("sym", v: String) => v
    }, bounds)
  }
}

private[sources] case class TickOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

private[sources] class TickMicroBatchStream(rows: Long, parts: Int,
    batchRows: Long, required: StructType, symEq: Array[String],
    idBounds: (Long, Long))
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // AvailableNow pins the drain target at prepare time; a live source
  // would keep growing past it and the next run picks up from the
  // checkpointed offset.
  @volatile private var ceiling: Long = rows

  override def prepareForTriggerAvailableNow(): Unit = ceiling = rows
  override def initialOffset(): Offset = TickOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TickOffset].next
    val avail = math.max(0L, ceiling - s)
    // Honor the limit Spark actually passed, not just our own default:
    // Trigger.AvailableNow and user maxRows configs arrive here as
    // ReadAllAvailable / ReadMaxRows / a composite of both, and a
    // source that silently re-applies its default pacing breaks their
    // contract. Composite takes the most restrictive member. MinRows
    // deferral (wait until >= minRows have accumulated) exists to
    // batch up a trickle on a source that keeps GROWING; this source
    // is a bounded replay whose ceiling never moves, so a backlog
    // below minRows is by definition the final tail — deferring it
    // would stall the query forever (the driver-side maxTriggerDelayMs
    // escape hatch cannot rescue a source that keeps returning the
    // start offset). Defer only while the backlog could still grow;
    // once the remaining rows are the last there will ever be, drain.
    def cap(l: ReadLimit): Long = l match {
      case m: ReadMaxRows      => m.maxRows()
      case _: ReadAllAvailable => Long.MaxValue
      case m: ReadMinRows      =>
        if (avail < m.minRows() && s + avail < ceiling) 0L
        else Long.MaxValue
      case c: CompositeReadLimit => c.getReadLimits.map(cap).min
      case _                   => batchRows
    }
    TickOffset(s + math.min(avail, cap(limit)))
  }
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(batchRows)
  override def reportLatestOffset(): Offset = TickOffset(ceiling)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // Offsets advance over the FULL id sequence (so progress/backlog
    // accounting stays honest); consumed tick_id bounds shrink the
    // materialized ranges here, exactly like batch partition pruning.
    val s = math.max(start.asInstanceOf[TickOffset].next, idBounds._1)
    val e = math.min(end.asInstanceOf[TickOffset].next, idBounds._2)
    if (s >= e) return Array.empty
    val step = math.max(1L, (e - s + parts - 1) / parts)
    (s until e by step).map(p =>
      TickRange(p, math.min(p + step, e))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TickReaderFactory(required, symEq, None)
  override def deserializeOffset(json: String): Offset =
    TickOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class TickReaderFactory(required: StructType,
    symEq: Array[String], agg: Option[(Array[String], Array[AggSpec])])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    agg match {
      case Some((g, a)) =>
        new TickAggReader(partition.asInstanceOf[TickRange], symEq, g, a)
      case None =>
        new TickReader(partition.asInstanceOf[TickRange], required, symEq)
    }
}

/** Range iterator: O(1) state, applies the pushed sym equality before
  * building the output row, materializes only the pruned columns. */
private[sources] class TickReader(range: TickRange, required: StructType,
    symEq: Array[String]) extends PartitionReader[InternalRow] {

  private var i = range.start - 1
  private val fields: Array[String] = required.fields.map(_.name)

  override def next(): Boolean = {
    i += 1
    while (i < range.end && !symOk(i)) i += 1
    i < range.end
  }
  private def symOk(id: Long): Boolean =
    symEq.isEmpty || symEq.forall(_ == TickSource.sym(id))

  override def get(): InternalRow = {
    val values: Array[Any] = fields.map {
      case "tick_id" => i
      case "sym" => UTF8String.fromString(TickSource.sym(i))
      case "day" => TickSource.day(i)
      case "price_cents" => TickSource.priceCents(i)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = ()
}

/** Partial-aggregate reader: one pass over the id range accumulating
  * per-group count/sum/min/max in a small map (|groups| entries — 8
  * syms × 30 days worst case), then emits the group rows. Group-key
  * iteration order is sorted for determinism, though Spark's final
  * merge is order-insensitive anyway. */
private[sources] class TickAggReader(range: TickRange,
    symEq: Array[String], group: Array[String], specs: Array[AggSpec])
    extends PartitionReader[InternalRow] {

  private def colVal(f: String, i: Long): Long = f match {
    case "tick_id" => i
    case "sym" => i % 8 // group/agg key in index space; rendered on emit
    case "day" => TickSource.day(i).toLong
    case "price_cents" => TickSource.priceCents(i)
  }

  private lazy val rowsOut: Iterator[InternalRow] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Long], Array[Long]]
    var i = range.start
    while (i < range.end) {
      if (symEq.isEmpty || symEq.forall(_ == TickSource.sym(i))) {
        val key = group.toSeq.map(colVal(_, i))
        val cells = acc.getOrElseUpdate(key,
          specs.map {
            case AggSpec("min", _, _) => Long.MaxValue
            case AggSpec("max", _, _) => Long.MinValue
            case _ => 0L
          })
        var j = 0
        while (j < specs.length) {
          val sp = specs(j)
          sp.op match {
            case "count" => cells(j) += 1
            case "sum" => cells(j) += colVal(sp.field, i)
            case "min" => cells(j) = math.min(cells(j), colVal(sp.field, i))
            case "max" => cells(j) = math.max(cells(j), colVal(sp.field, i))
          }
          j += 1
        }
      }
      i += 1
    }
    acc.toSeq.sortBy(_._1.mkString(",")).iterator.map { case (key, cells) =>
      val groupVals: Seq[Any] = group.toSeq.zip(key).map {
        case ("sym", v) => UTF8String.fromString(TickSource.SYMS(v.toInt))
        case ("day", v) => v.toInt
        case (_, v) => v
      }
      val aggVals: Seq[Any] = specs.toSeq.zip(cells.toSeq).map {
        case (AggSpec(_, _, IntegerType), v) => v.toInt
        case (_, v) => v
      }
      InternalRow.fromSeq(groupVals ++ aggVals)
    }
  }

  override def next(): Boolean = rowsOut.hasNext
  override def get(): InternalRow = rowsOut.next()
  override def close(): Unit = ()
}
