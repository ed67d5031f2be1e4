package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch Y ([[graft.queries.Analytics44]]). */
class Analytics44Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_granger: the restricted model never fits better; F >= 0") {
    val r = run("agg_granger").head
    val (n, ratio, f) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
    assert(n >= 10)
    assert(ratio >= 1.0 - 1e-12,
      "adding a regressor cannot raise the SSR")
    assert(f >= -1e-9)
    assert(math.abs(f - (ratio - 1.0) * (n - 3)) < 1e-6 * (1.0 + f),
      "F recomposes from the RSS ratio")
  }

  test("events_bass_diffusion: saturating fit yields positive market " +
    "potential above... the intercept, and p + q coefficients recompose") {
    val r = run("events_bass_diffusion").head
    assert(r.getLong(0) >= 5, "needs a multi-day signup series")
    val a = r.getDouble(1)
    assert(a > 0.0, "baseline adoption must be positive")
    if (!r.isNullAt(4)) {
      val (b, c, m, p, q) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(m > 0.0 && c < 0.0)
      assert(math.abs(p - a / m) < 1e-9 * (1.0 + math.abs(p)))
      assert(math.abs(q - (-c * m)) < 1e-9 * (1.0 + math.abs(q)))
      assert(math.abs((q - p) - b) < 1e-6 * (1.0 + math.abs(b)),
        "b = q - p (the Bass identity)")
    }
  }

  test("agg_dunn_posthoc: one canonical row per event-type pair, z " +
    "signed like the mean-rank difference") {
    val rows = run("agg_dunn_posthoc")
    val k = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(rows.length == k * (k - 1) / 2, "all unordered pairs, once")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair identity pinned")
      val (d, z) = (r.getDouble(2), r.getDouble(3))
      assert(!z.isNaN && !z.isInfinite)
      assert(d == 0.0 || math.signum(d) == math.signum(z))
    }
  }
}
