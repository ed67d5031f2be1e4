package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AI ([[graft.queries.Analytics54]]). */
class Analytics54Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_ttest_paired: t recomposes from mean/sd/n; dof = n - 1") {
    val r = run("agg_ttest_paired").head
    val (n, md, sd, t, dof) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(n > 10 && dof == n - 1)
    assert(sd > 0.0)
    assert(math.abs(t - md / (sd / math.sqrt(n.toDouble)))
      < 1e-9 * (1.0 + math.abs(t)))
  }

  test("agg_wilcoxon_signed_rank: W+ within [0, n(n+1)/2]; z centered " +
    "on mu_w") {
    val r = run("agg_wilcoxon_signed_rank").head
    val (n, w, mu, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(n > 10)
    assert(w >= 0.0 && w <= n.toDouble * (n + 1) / 2.0)
    assert(math.abs(mu - n.toDouble * (n + 1) / 4.0) < 1e-9)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("agg_sign_test: exact binomial p matches a BigDecimal " +
    "driver-side replica") {
    val r = run("agg_sign_test").head
    val (np, nm, p) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(np > 0 && nm > 0)
    assert(p > 0.0 && p <= 1.0)
    // exact replica via log-space binomial tail
    val n = np + nm
    val lf = new Array[Double](n.toInt + 1)
    (1 to n.toInt).foreach(i => lf(i) = lf(i - 1) + math.log(i.toDouble))
    val kMax = math.min(np, nm)
    var tail = 0.0
    (0L to kMax).foreach { k =>
      tail += math.exp(lf(n.toInt) - lf(k.toInt) - lf((n - k).toInt)
        - n * math.log(2.0))
    }
    val want = math.min(1.0, 2.0 * tail)
    assert(math.abs(p - want) < 1e-9 * (1.0 + want), s"$p vs $want")
  }
}
