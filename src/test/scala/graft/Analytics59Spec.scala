package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AN ([[graft.queries.Analytics59]]). */
class Analytics59Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_kde: positive density, trapezoid integral over mu +/- 3sd " +
    "close to the Gaussian's ~0.997 mass share") {
    val rows = run("agg_kde")
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length == 21)
    rows.foreach(r => assert(r._3 > 0.0))
    val dx = rows(1)._2 - rows(0)._2
    val integral = rows.sliding(2).map { case Array(a, b) =>
      (a._3 + b._3) / 2.0 * dx
    }.sum
    assert(integral > 0.7 && integral < 1.05,
      s"density must integrate to ~1 over the grid span (got $integral)")
  }

  test("agg_ecdf: monotone from near 0 to near 1; n_le/n recomposes") {
    val rows = run("agg_ecdf")
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == 21)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, "CDF monotone")
    }
    assert(rows.head._3 < 0.2 && rows.last._3 > 0.8,
      "grid spans the distribution")
  }
}
