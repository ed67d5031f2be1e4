package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.etl.StockEtl
import graft.streaming.StreamingOps

/** Production-robustness paths: reader-level quarantine and
  * exactly-once file-sink streaming with checkpoint recovery. */
class RobustnessSpec extends SparkTestBase {

  test("PERMISSIVE CSV quarantine: bad rows captured, good rows flow") {
    val dir = Files.createTempDirectory("graft_quarantine").toString
    val csv =
      """Date,Price,Vol.
        |"Mar 07, 2025","42,801.72",763.44M
        |"Mar 06, 2025","42,579.08",643.88M
        |"Mar 05, 2025","bad,row,with,too,many,cells",1,2,3,4,5
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"), csv)
    val (good, bad) = StockEtl.readCsvWithQuarantine(
      spark, s"$dir/in.csv", Seq("Date", "Price", "Vol."))
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.head().getString(0).contains("too,many,cells"))
  }

  test("Trigger.AvailableNow + checkpoint: file sink is exactly-once across restarts") {
    val base = Files.createTempDirectory("graft_stream_ck").toString
    def runOnce(): Unit = {
      val q = StreamingOps.tumbling(StreamingOps.eventsStream(spark, sf))
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(s"$base/out").count()
    // restart with the same checkpoint and unchanged input: the source
    // offset log must prevent reprocessing (no duplicate rows)
    runOnce()
    val n2 = spark.read.parquet(s"$base/out").count()
    assert(n1 > 0 && n2 == n1, s"expected exactly-once, got $n1 then $n2")
  }

  test("foreachBatch + checkpoint: committed batches are not redelivered") {
    val base = Files.createTempDirectory("graft_feb_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def runOnce(): Unit = {
      val q = StreamingOps.eventsStream(spark, sf)
        .writeStream
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // the merge/upsert hook point in production; here we record
          // (batchId, rows) to observe redelivery
          seen += ((id, df.count())); ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    val rows1 = seen.map(_._2).sum
    assert(rows1 > 0)
    // same checkpoint, unchanged source: a restart must deliver no
    // already-committed data to foreachBatch
    runOnce()
    assert(seen.map(_._2).sum == rows1,
      s"foreachBatch redelivered committed rows: $seen")
  }
}
