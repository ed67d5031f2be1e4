package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch Z ([[graft.queries.Analytics45]]). */
class Analytics45Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("events_cuped: adjustment can only reduce variance, and the " +
    "reduction recomposes") {
    val r = run("events_cuped").head
    val (n, theta) = (r.getLong(0), r.getDouble(1))
    val (vPost, vCuped, red) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(n > 0 && !theta.isNaN)
    assert(vPost > 0.0 && vCuped > 0.0)
    assert(vCuped <= vPost + 1e-9 * vPost,
      "CUPED variance is var_post - theta^2 var_pre <= var_post")
    assert(math.abs(red - (vPost - vCuped) / vPost) < 1e-9)
  }

  test("events_srm_check: arms partition the users; flag matches the " +
    "3.841 cutoff") {
    val r = run("events_srm_check").head
    val (nA, nB, chi2, flag) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getBoolean(3))
    val users = graft.core.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(nA + nB == users)
    assert(chi2 >= 0.0)
    assert(flag == (chi2 > 3.841))
  }

  test("agg_cpk: cpk never exceeds cp; sigma positive; centered " +
    "process would equalize them") {
    val rows = run("agg_cpk")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mu, sigma, cp, cpk) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(sigma > 0.0)
      assert(cpk <= cp + 1e-12,
        "min(USL-mu, mu-LSL) <= (USL-LSL)/2 always")
      if (mu == 50.0) assert(math.abs(cpk - cp) < 1e-12)
    }
  }
}
