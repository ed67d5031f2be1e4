package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 session-4 batch E
  * ([[graft.queries.Analytics16]] + the `stream_tws_typecounts`
  * MapState processor). */
class Analytics16Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_ichimoku: lines inside the series envelope, exact row budget") {
    val rows = run("win_ichimoku")
    assert(rows.nonEmpty)
    val stats = graft.core.Tables.load(spark, sf, "events")
      .agg(min("value"), max("value"), count(lit(1))).head()
    val (lo, hi, n) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    rows.foreach { r =>
      Seq(2, 3, 4, 5).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= lo && v <= hi, s"line $i value $v outside [$lo,$hi]")
      }
    }
    // rn > 77 drops 77 head rows; chikou (lead 26) drops 26 tail rows
    assert(rows.length == n - 77 - 26, s"${rows.length} != ${n - 103}")
  }

  test("agg_var_es: expected shortfall no better than VaR") {
    val rows = run("agg_var_es")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 20)
      // ES averages the tail up to and including the VaR order
      // statistic, so ES ≤ VaR always.
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-12,
        s"user ${r.getLong(0)}: ES ${r.getDouble(3)} > VaR ${r.getDouble(2)}")
    }
  }

  test("llm_cooccurrence: canonical pairs, support floor, finite PMI") {
    val rows = run("llm_cooccurrence")
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    rows.foreach { r =>
      val w1 = r.getString(0); val w2 = r.getString(1)
      assert(w1 <= w2, s"pair ($w1,$w2) not canonical")
      assert(seen.add((w1, w2)), s"duplicate pair ($w1,$w2)")
      assert(r.getLong(2) >= 5)
      val pmi = r.getDouble(3)
      assert(!pmi.isNaN && !pmi.isInfinite)
    }
  }

  test("agg_binseg_split: non-negative gain, means decompose the total") {
    val rows = run("agg_binseg_split")
    assert(rows.length == 1)
    val r = rows.head
    val idx = r.getLong(1); val n = r.getLong(2)
    assert(idx >= 2 && idx <= n - 2)
    assert(r.getDouble(3) >= -1e-6, s"gain ${r.getDouble(3)} negative")
    // weighted segment means recompose the overall mean
    val overall = (r.getDouble(4) * idx + r.getDouble(5) * (n - idx)) / n
    val daily = graft.core.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date"))
      .agg(floor(sum(col("o_totalprice").cast("decimal(18,2)")))
        .cast("double").as("x"))
      .agg(avg("x")).head().getDouble(0)
    assert(math.abs(overall - daily) < 1e-6 * math.abs(daily),
      s"segment means $overall do not recompose the overall mean $daily")
  }

  test("stream_tws_typecounts: MapState census equals the direct group-by") {
    val rows = run("stream_tws_typecounts")
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = graft.core.Tables.load(spark, sf, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == direct)
  }
}
