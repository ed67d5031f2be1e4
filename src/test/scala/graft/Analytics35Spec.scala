package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch O ([[graft.queries.Analytics35]]). */
class Analytics35Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_mcnemar: discordant census bounded by users; plain stat " +
    "dominates the continuity-corrected one") {
    val rows = run("agg_mcnemar")
    assert(rows.length == 1)
    val r = rows.head
    val (n, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(b + c <= n && b >= 0 && c >= 0)
    if (!r.isNullAt(3)) {
      assert(r.getDouble(3) >= 0.0)
      assert(r.getDouble(3) >= r.getDouble(4) - 1e-12,
        "continuity correction can only shrink the statistic")
      val expect = (b - c).toDouble * (b - c) / (b + c)
      assert(math.abs(r.getDouble(3) - expect) < 1e-9)
    }
  }

  test("agg_cohens_kappa: po/pe in [0,1], kappa <= 1 and recomposes") {
    val rows = run("agg_cohens_kappa")
    assert(rows.length == 1)
    val r = rows.head
    val (po, pe, k) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(k <= 1.0 + 1e-12)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-12)
  }

  test("agg_partial_corr: all correlations in [-1,1]; independent " +
    "quantity/price columns keep the partial close to the raw") {
    val rows = run("agg_partial_corr")
    assert(rows.length == 1)
    val r = rows.head
    Seq(1, 2, 3, 4).foreach { i =>
      assert(r.getDouble(i) >= -1.0 - 1e-9 && r.getDouble(i) <= 1.0 + 1e-9,
        s"col $i out of [-1,1]: ${r.getDouble(i)}")
    }
  }

  test("agg_lorenz_curve: shares sum to 1, cumulative share is " +
    "convex-increasing and ends at 1") {
    val rows = run("agg_lorenz_curve").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-12)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(3) > a.getDouble(3),
        "cumulative share strictly increases")
      assert(b.getDouble(2) >= a.getDouble(2) - 1e-12,
        "deciles sorted by value have non-decreasing shares")
    }
  }
}
