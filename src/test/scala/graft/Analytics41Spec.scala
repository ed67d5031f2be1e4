package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch U ([[graft.queries.Analytics41]]). */
class Analytics41Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_kruskal_wallis: H positive, correction only inflates, " +
    "dof = k - 1") {
    val r = run("agg_kruskal_wallis").head
    val (dof, n) = (r.getLong(0), r.getLong(1))
    val (h, hc) = (r.getDouble(2), r.getDouble(3))
    assert(dof >= 1 && n > 0)
    assert(h > 0.0)
    assert(hc >= h, "tie correction divides by a factor <= 1")
  }

  test("agg_g_test: non-negative and on the chi2 scale (same dof)") {
    val g = run("agg_g_test").head
    val chi = run("agg_chi2").head
    assert(g.getDouble(0) >= 0.0)
    assert(g.getLong(1) == chi.getLong(1), "same contingency, same dof")
    assert(g.getLong(2) == chi.getLong(2))
    // asymptotically equivalent statistics on the same table
    assert(g.getDouble(0) < 10.0 * (chi.getDouble(0) + 1.0))
  }

  test("agg_odds_ratio: OR recomposes from the counts; CI brackets it") {
    val r = run("agg_odds_ratio").head
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(a > 0 && b > 0 && c > 0 && d > 0)
    val or = r.getDouble(4)
    assert(or == a.toDouble * d / (b.toDouble * c))
    assert(r.getDouble(5) < or && or < r.getDouble(6))
  }

  test("agg_fisher_exact: driver-side hypergeometric replica agrees") {
    val r = run("agg_fisher_exact").head
    val (a, r1, c1, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val (pObs, pRight) = (r.getDouble(4), r.getDouble(5))
    assert(pObs > 0.0 && pObs <= pRight && pRight <= 1.0 + 1e-12)
    // replica: lnfact by running sum, right tail from k = a
    val lf = new Array[Double](n.toInt + 1)
    (1 to n.toInt).foreach(i => lf(i) = lf(i - 1) + math.log(i.toDouble))
    val r2 = n - r1
    def lnC(m: Long, k: Long): Double =
      lf(m.toInt) - lf(k.toInt) - lf((m - k).toInt)
    val kMax = math.min(r1, c1)
    var tail = 0.0
    (a to kMax).foreach { k =>
      if (c1 - k <= r2)
        tail += math.exp(lnC(r1, k) + lnC(r2, c1 - k) - lnC(n, c1))
    }
    assert(math.abs(tail - pRight) / tail < 1e-9,
      s"replica $tail vs engine $pRight")
  }
}
