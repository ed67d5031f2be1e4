package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AJ ([[graft.queries.Analytics55]]). */
class Analytics55Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_cronbach_alpha: alpha recomposes from the variance " +
    "decomposition; bounded above by 1") {
    val r = run("agg_cronbach_alpha").head
    val (k, n) = (r.getLong(0), r.getLong(1))
    val (sv, tv, a) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(k == 5 && n > 10)
    assert(sv > 0.0 && tv > 0.0)
    assert(math.abs(a - k.toDouble / (k - 1) * (1.0 - sv / tv)) < 1e-12)
    assert(a <= 1.0, "alpha cannot exceed 1")
    // independent synthetic items: total variance ~ sum of item
    // variances, so alpha should hover near 0 (not near 1)
    assert(a < 0.9)
  }

  test("agg_icc: mean squares positive; ICC(1,1) in (-1, 1]; n0 " +
    "within the group-size envelope") {
    val r = run("agg_icc").head
    val (i, n) = (r.getLong(0), r.getLong(1))
    val (msb, msw, n0, icc) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    assert(i > 10 && n > i)
    assert(msb > 0.0 && msw > 0.0)
    assert(n0 > 0.0 && n0 <= n.toDouble / i * 2.0)
    assert(icc > -1.0 && icc <= 1.0)
  }
}
