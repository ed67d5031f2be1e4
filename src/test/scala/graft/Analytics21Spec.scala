package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch J
  * ([[graft.queries.Analytics21]]). */
class Analytics21Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_heikin_ashi: high/low clamp holds, first bar seeds the fold") {
    val rows = run("win_heikin_ashi")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ho = r.getDouble(2); val hc = r.getDouble(3)
      val hh = r.getDouble(4); val hl = r.getDouble(5)
      assert(hh >= math.max(ho, hc) - 1e-12)
      assert(hl <= math.min(ho, hc) + 1e-12)
      assert(hh >= hl)
    }
  }

  test("graph_hitting_prob: probabilities monotone in horizon, purchase is 1") {
    val rows = run("graph_hitting_prob")
    assert(rows.length == 5)
    rows.foreach { r =>
      val p4 = r.getDouble(1); val p8 = r.getDouble(2)
      assert(p4 >= 0.0 && p4 <= 1.0 + 1e-12)
      assert(p8 >= p4 - 1e-12, s"${r.getString(0)}: p8 $p8 < p4 $p4")
      if (r.getString(0) == "purchase") assert(p8 == 1.0)
    }
  }

  test("agg_chow_test: split RSS never exceeds pooled, F non-negative") {
    val rows = run("agg_chow_test")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0))
    // per-segment OLS fits at least as well as the pooled line:
    // rss_split / rss_pooled ∈ (0, 1]
    if (!r.isNullAt(3)) {
      assert(r.getDouble(3) <= 1.0 + 1e-6)
      assert(r.getDouble(3) > 0.0)
    }
    if (!r.isNullAt(4)) assert(r.getDouble(4) >= -1e-9)
  }

  test("agg_randomization_test: p-value consistent with the extreme count") {
    val rows = run("agg_randomization_test")
    assert(rows.length == 1)
    val r = rows.head
    val b = r.getLong(1); val ex = r.getLong(2); val p = r.getDouble(3)
    assert(b == 16L)
    assert(ex >= 0 && ex <= b)
    assert(math.abs(p - (1.0 + ex) / (b + 1.0)) < 1e-12)
    assert(p > 0.0 && p <= 1.0)
  }
}
