package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AM ([[graft.queries.Analytics58]]). */
class Analytics58Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_qq_two_sample: 9 deciles, each side monotone, driver-side " +
    "order-statistic replica agrees") {
    val rows = run("agg_qq_two_sample")
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length == 9)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, "quantiles monotone in p")
    }
    val vals = graft.core.Tables.load(spark, sf, "events")
      .filter("event_type = 'purchase'")
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)")
      .collect().map(_.getDouble(0)).sorted
    rows.foreach { case (p, qa, _) =>
      val k = math.ceil(p * vals.length).toInt
      assert(qa == vals(k - 1), s"decile $p: $qa vs ${vals(k - 1)}")
    }
  }

  test("agg_xbar_r_chart: limits bracket the center line; OOC counts " +
    "bounded by the subgroup census") {
    val r = run("agg_xbar_r_chart").head
    val (k, xbb, rbar) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val (lcl, ucl, uclR) = (r.getDouble(3), r.getDouble(4),
      r.getDouble(5))
    val (oocX, oocR) = (r.getLong(6), r.getLong(7))
    assert(k >= 1, "sf0.001 has almost no 5-order days")
    assert(rbar > 0.0)
    assert(lcl < xbb && xbb < ucl)
    assert(math.abs((ucl - xbb) - (xbb - lcl)) < 1e-9, "symmetric limits")
    assert(uclR > rbar)
    assert(oocX <= k && oocR <= k)
  }
}
