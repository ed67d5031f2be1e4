package graft.sources

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Admission-control contract: `latestOffset(start, limit)` must honor
  * the limit SPARK passes, not silently re-apply the source's own
  * default pacing — Trigger.AvailableNow and user-configured limits
  * arrive as ReadAllAvailable / ReadMaxRows / composites (advisor
  * finding, round 7). Pure offset arithmetic, no Spark session. */
class TickReadLimitSpec extends AnyFunSuite {

  private def stream(rows: Long = 100000L, batchRows: Long = 10000L) =
    new TickMicroBatchStream(rows, 4, batchRows,
      new StructType().add("tick_id", LongType), Array.empty,
      (0L, rows))

  private def next(s: TickMicroBatchStream, from: Long, l: ReadLimit): Long =
    s.latestOffset(TickOffset(from), l).asInstanceOf[TickOffset].next

  test("ReadMaxRows caps the batch at the passed value, not batchRows") {
    val s = stream()
    assert(next(s, 0, ReadLimit.maxRows(3000)) === 3000L)
    assert(next(s, 0, ReadLimit.maxRows(25000)) === 25000L)
  }

  test("ReadAllAvailable drains to the ceiling") {
    assert(next(stream(), 40000, ReadLimit.allAvailable()) === 100000L)
  }

  test("default limit still paces by batchRows") {
    val s = stream()
    assert(next(s, 0, s.getDefaultReadLimit) === 10000L)
  }

  test("cap clamps at the ceiling near end of stream") {
    assert(next(stream(), 95000, ReadLimit.maxRows(10000)) === 100000L)
  }

  test("ReadMinRows cannot stall a bounded stream's final tail") {
    val s = stream(rows = 1000L)
    // 1000 available < 5000 minimum, but this source's ceiling never
    // moves: the backlog can never grow to minRows, so deferring here
    // would return the start offset FOREVER and stall the query (the
    // driver-side maxTriggerDelayMs escape hatch can't rescue a source
    // that never advances). The final tail must drain.
    assert(next(s, 0, ReadLimit.minRows(5000, 60000L)) === 1000L)
    // backlog >= minimum → drain (no max member in this limit).
    assert(next(s, 0, ReadLimit.minRows(500, 60000L)) === 1000L)
  }

  test("composite limit applies its most restrictive member") {
    val s = stream()
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(100, 60000L), ReadLimit.maxRows(7000)))
    assert(next(s, 0, composite) === 7000L)
  }
}
