package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AO ([[graft.queries.Analytics60]]). */
class Analytics60Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_theil_decomposition: the between/within split recomposes " +
    "the total exactly; all parts non-negative") {
    val r = run("agg_theil_decomposition").head
    val (t, tb, tw, trec) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(t >= 0.0 && tw >= 0.0,
      "Theil total and within are Jensen-nonnegative")
    assert(math.abs(trec - (tb + tw)) < 1e-15)
    assert(math.abs(t - trec) < 1e-9 * (1.0 + t),
      "T = T_between + sum s_g T_g (the decomposability identity)")
    // priorities are near-uniform slices: between-group inequality
    // must be a tiny fraction of the total
    assert(tb < 0.1 * t)
  }

  test("events_retention_halflife: fitted r0 near 1 for a week-0 " +
    "cohort; half-life positive when decaying") {
    val r = run("events_retention_halflife").head
    val (n, slope, r0) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n >= 2, "needs at least two weekly points")
    assert(r0 > 0.0 && r0 <= 1.5)
    if (!r.isNullAt(3)) {
      val hl = r.getDouble(3)
      assert(slope < 0.0 && hl > 0.0)
      assert(math.abs(hl - (-math.log(2.0) / slope)) < 1e-9 * hl)
    }
  }
}
