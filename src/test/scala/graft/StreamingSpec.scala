package graft

import graft.core.Tables
import graft.streaming.StreamingOps

/** Drives the SAME transforms the batch oracle checks through real
  * Structured Streaming execution (file source → state → memory sink). */
class StreamingSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("tumbling windows: streaming (complete mode) equals batch") {
    val q = StreamingOps.tumbling(StreamingOps.eventsStream(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_tumb").start()
    try {
      q.processAllAvailable()
      val streamed = canon(spark.table("graft_tumb"))
      val batch = canon(StreamingOps.tumbling(Tables.load(spark, sf, "events")))
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("keyed dedup: streaming state emits one row per key") {
    val q = StreamingOps.dedupStreaming(StreamingOps.eventsStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_dedup").count()
      val batch = StreamingOps.dedupFirstPerKey(
        Tables.load(spark, sf, "events")).count()
      assert(streamed == batch && streamed > 0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState anomalies: streaming equals batch") {
    import graft.streaming.StatefulOps
    import spark.implicits._
    val streamEv = StreamingOps.eventsStream(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
      .as[StatefulOps.Ev]
    val q = StatefulOps.anomalies(streamEv).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_anom").start()
    try {
      q.processAllAvailable()
      val streamed = canon(spark.table("graft_anom"))
      val batch = canon(StatefulOps.anomalies(
        StatefulOps.eventsTyped(spark, sf)).toDF())
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("session windows: append-mode emissions are a subset of batch sessions") {
    val q = StreamingOps.sessionized(StreamingOps.eventsStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sess").start()
    try {
      q.processAllAvailable()
      val streamed = canon(spark.table("graft_sess"))
      val batch = canon(StreamingOps.sessionized(Tables.load(spark, sf, "events")))
      // the final watermark withholds the trailing sessions
      assert(streamed.nonEmpty && streamed.subsetOf(batch))
    } finally q.stop()
  }
}
