package graft

import org.apache.spark.sql.functions._

import graft.sources.SumSink

/** Commit-protocol pins for the custom DSv2 sink: a successful write
  * publishes the exact distributed aggregate via driver-side commit;
  * a mid-write task failure aborts the job and publishes NOTHING. */
class SumSinkSpec extends SparkTestBase {

  private def events =
    graft.core.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"))

  test("successful write publishes merged task partials on driver commit") {
    SumSink.results.remove("ok")
    events.repartition(7)
      .write.format("graft.sources.SumSink")
      .option("key", "ok").option("sumCol", "event_id")
      .mode("append").save()
    val expected = events.agg(count(lit(1)), sum("event_id")).head()
    assert(SumSink.results.get("ok") ===
      ((expected.getLong(0), expected.getLong(1))))
  }

  test("mid-write task failure aborts the job and publishes nothing") {
    SumSink.results.remove("boom")
    val err = intercept[Exception] {
      events.repartition(7)
        .write.format("graft.sources.SumSink")
        .option("key", "boom").option("sumCol", "event_id")
        .option("failAtRow", "123")
        .mode("append").save()
    }
    assert(err.getMessage != null)
    assert(!SumSink.results.containsKey("boom"),
      "aborted write must not publish a partial result")
  }
}
