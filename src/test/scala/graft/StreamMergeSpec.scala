package graft

import org.apache.spark.sql.functions._

/** Pins for the round-11 batch D pair: the streaming MERGE upsert and
  * pixel-level dedup through the real codec. */
class StreamMergeSpec extends SparkTestBase {

  test("stream_merge_upsert: multi-batch merge accumulation equals the batch aggregate") {
    val rows = SparkEntry.queries("stream_merge_upsert")(spark, sf).collect()
    val batch = graft.core.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total"))
      .collect()
    val got = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = batch.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want,
      "4 merge transactions must accumulate to the one-shot aggregate")
    // the merge REALLY ran against the row-level catalog
    assert(spark.sql("SELECT count(*) FROM graft_mem.db.stream_upsert")
      .head.getLong(0) == rows.length.toLong)
  }

  test("mm_pixel_dedup: re-encodes found by pixels, invisible to bytes") {
    val r = SparkEntry.queries("mm_pixel_dedup")(spark, sf).collect().head
    val (nBlobs, blobGroups, pixelGroups, reenc, dupBlobs) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nBlobs > 0)
    assert(blobGroups > pixelGroups,
      "RGB re-encodes must be byte-distinct but pixel-identical")
    assert(reenc == blobGroups - pixelGroups)
    assert(dupBlobs == nBlobs - pixelGroups)
    assert(blobGroups <= nBlobs)
  }
}
