package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AK ([[graft.queries.Analytics56]]). */
class Analytics56Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_breusch_pagan: LM = n * R2_aux with R2 in [0, 1]") {
    val r = run("agg_breusch_pagan").head
    val (n, r2, lm) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 10)
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(lm - n * r2) < 1e-9 * (1.0 + lm))
  }

  test("agg_cooks_distance: 10 ranked positive distances, " +
    "non-increasing") {
    val rows = run("agg_cooks_distance")
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(rows.length == 10)
    rows.foreach(r => assert(r._2 > 0.0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 - 1e-15)
    }
  }

  test("agg_vif: VIF recomposes from r2 and is >= 1") {
    val r = run("agg_vif").head
    val (r2, vif) = (r.getDouble(1), r.getDouble(2))
    assert(r2 >= 0.0 && r2 < 1.0)
    assert(vif >= 1.0)
    assert(math.abs(vif - 1.0 / (1.0 - r2)) < 1e-9 * vif)
  }
}
