package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AQ ([[graft.queries.Analytics62]]). */
class Analytics62Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_beta_fit: mean in (0,1); alpha/beta positive and the " +
    "fitted mean alpha/(alpha+beta) recovers the sample mean") {
    val r = run("agg_beta_fit").head
    val (mu, v, a, b) = (r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(mu > 0.0 && mu < 1.0 && v > 0.0)
    assert(a > 0.0 && b > 0.0)
    assert(math.abs(a / (a + b) - mu) < 1e-9,
      "method of moments matches the first moment by construction")
  }

  test("agg_negbin_fit: dispersion recomposes; NB parameters recover " +
    "the sample mean when overdispersed") {
    val r = run("agg_negbin_fit").head
    val (mu, v, disp) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mu > 0.0 && v > 0.0)
    assert(math.abs(disp - v / mu) < 1e-12)
    if (!r.isNullAt(4)) {
      val (rh, ph) = (r.getDouble(4), r.getDouble(5))
      assert(rh > 0.0 && ph > 0.0 && ph < 1.0)
      // NB mean = r(1-p)/p must reproduce the sample mean
      assert(math.abs(rh * (1.0 - ph) / ph - mu) < 1e-9 * (1.0 + mu))
    }
  }
}
