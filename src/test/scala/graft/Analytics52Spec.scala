package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AG ([[graft.queries.Analytics52]]). */
class Analytics52Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_conformal_interval: coverage lands at or just above the " +
    "target; split partitions the days") {
    val r = run("agg_conformal_interval").head
    val (nTrain, nCal) = (r.getLong(0), r.getLong(1))
    val (qhat, cov) = (r.getDouble(3), r.getDouble(4))
    assert(nTrain > 0 && nCal > 0)
    assert(qhat > 0.0)
    // the k-th order statistic guarantees coverage >= k/(n+1) >= 0.9
    // on the calibration scores themselves; it can exceed it only by
    // the one-rank granularity
    assert(cov >= 0.9 - 1.0 / nCal && cov <= 1.0)
  }

  test("etl_stock_pairs_spread: distinct pair, signals bounded by the " +
    "day count, z-census consistent with 2-sigma tails") {
    val r = run("etl_stock_pairs_spread").head
    val (sa, sb) = (r.getString(0), r.getString(1))
    val (n, beta) = (r.getLong(2), r.getDouble(3))
    val (nl, ns) = (r.getLong(4), r.getLong(5))
    assert(sa != sb)
    assert(n > 10 && !beta.isNaN)
    assert(nl + ns <= n)
    // Chebyshev: at most 1/4 of any sample sits beyond 2 sigma
    assert((nl + ns).toDouble / n <= 0.25 + 1e-9)
  }
}
