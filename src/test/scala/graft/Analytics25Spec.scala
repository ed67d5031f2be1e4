package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for round-11 batch E ([[graft.queries.Analytics25]]). */
class Analytics25Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_huber_mean: robust center bracketed by the data, scale sane") {
    val rows = run("agg_huber_mean")
    assert(rows.nonEmpty)
    val bounds = graft.core.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(1) >= lo && r.getDouble(1) <= hi, "median in range")
      assert(r.getDouble(2) >= 0, "MAD non-negative")
      assert(r.getDouble(3) >= lo && r.getDouble(3) <= hi,
        "Huber mean is a convex combination of observations")
    }
  }

  test("scan_time_travel: append then copy-on-write rewrite, censuses consistent") {
    val rows = run("scan_time_travel").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val nA = orders.filter(col("o_orderkey") % 3 === 0).count()
    val nB = orders.filter(col("o_orderkey") % 3 === 1).count()
    val nC = orders.filter(col("o_orderkey") % 3 === 0)
      .filter(col("o_totalprice") <= 200000).count()
    assert(rows(0).getLong(1) == nA + nB, "v1 = base + append")
    assert(rows(1).getLong(1) == nC + nB, "v2 = rewritten base + append")
    assert(rows(1).getLong(1) < rows(0).getLong(1),
      "the rewrite actually deleted rows")
  }

  test("win_hmm_filter: probabilities bounded, states decode, every event covered") {
    val rows = run("win_hmm_filter")
    val n = graft.core.Tables.load(spark, sf, "events").count()
    assert(rows.length.toLong == n, "one filtered state per event")
    rows.foreach { r =>
      val p = r.getDouble(2)
      assert(p >= 0.0 && p <= 1.0)
      // p is the 6-dp ROUNDED probability; the state decodes from the
      // unrounded one, so only check consistency away from the boundary
      if (math.abs(p - 0.5) > 1e-6)
        assert(r.getString(3) == (if (p >= 0.5) "H" else "L"))
    }
    // both regimes must actually occur under a median threshold
    val states = rows.map(_.getString(3)).toSet
    assert(states == Set("H", "L"))
  }
}
