package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch L ([[graft.queries.Analytics32]]
  * + the streaming left-outer join). */
class Analytics32Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("llm_mrl_recall: recall grows (weakly) with truncation width " +
    "and is bounded by 1") {
    val rows = run("llm_mrl_recall").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    rows.foreach { r =>
      assert(r.getLong(2) == 30, "10 queries x exact top-3")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      assert(math.abs(r.getDouble(3)
        - r.getLong(1).toDouble / r.getLong(2)) < 1e-12)
    }
    // 32 of 64 dims must retrieve at least as well as 8 of 64 here
    assert(rows.last.getDouble(3) >= rows.head.getDouble(3) - 1e-12)
  }

  test("llm_bradley_terry: strengths positive, mean-1 normalized, " +
    "and ordered consistently with win rates at the extremes") {
    val rows = run("llm_bradley_terry")
    assert(rows.length >= 2)
    val ps = rows.map(_.getDouble(3))
    assert(ps.forall(_ > 0.0))
    assert(math.abs(ps.sum / ps.length - 1.0) < 1e-9,
      "MM iterations renormalize to mean 1")
    val byWinRate = rows.sortBy(r =>
      r.getLong(2).toDouble / r.getLong(1))
    assert(byWinRate.last.getDouble(3) > byWinRate.head.getDouble(3),
      "best win-rate source must out-rank the worst")
  }

  test("sql_group_by_all: equals the explicit GROUP BY spelling") {
    val rows = run("sql_group_by_all")
    assert(rows.length > 0)
    val explicit = {
      import org.apache.spark.sql.functions._
      graft.core.Tables.load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
    }
    val got = rows.map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getDouble(3))).toSet
    assert(got == explicit)
  }

  test("stream_left_outer_join (batch twin): unmatched clicks emit " +
    "null error ids; matched flag coherent") {
    val rows = run("stream_left_outer_join")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) == !r.isNullAt(2))
    }
    assert(rows.exists(_.isNullAt(2)), "some click has no error within 1h")
    assert(rows.exists(!_.isNullAt(2)), "some click has an error within 1h")
  }

  test("stream_left_outer_join: real streaming run — matched rows " +
    "equal the batch inner join; outer emissions are a subset of " +
    "batch unmatched") {
    import org.apache.spark.sql.functions._
    val joined = graft.streaming.StreamingOps.streamLeftOuterJoin(
      graft.streaming.StreamingOps.eventsStream(spark, sf))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_lo_join").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_lo_join")
      val batch = SparkEntry.queries("stream_left_outer_join")(spark, sf)
      val sMatched = streamed.filter(col("matched")).count()
      val bMatched = batch.filter(col("matched")).count()
      assert(sMatched == bMatched,
        "inner matches must be identical in streaming and batch")
      assert(streamed.count() <= batch.count(),
        "outer emissions are gated by the final watermark")
    } finally q.stop()
  }
}
