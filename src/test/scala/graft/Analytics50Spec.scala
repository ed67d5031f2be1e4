package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AE ([[graft.queries.Analytics50]]). */
class Analytics50Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_anderson_darling: A2 positive; correction inflates; " +
    "consistent with the QQ verdict on the same series") {
    val r = run("agg_anderson_darling").head
    val (n, a2, a2s) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 10)
    assert(a2 > 0.0, "A-squared is a positive discrepancy measure")
    assert(a2s >= a2, "the finite-sample factor is >= 1")
  }

  test("normal CDF approximation: Zelen-Severo replica hits known " +
    "values and is monotone/symmetric") {
    def phi(x: Double): Double = {
      def half(ax: Double): Double = {
        val t = 1.0 / (1.0 + 2.316419e-1 * ax)
        val poly = ((((1.330274429 * t - 1.821255978) * t
          + 1.781477937) * t - 3.56563782e-1) * t + 3.1938153e-1) * t
        1.0 - math.exp(-ax * ax / 2.0) / 2.5066282746310002 * poly
      }
      if (x >= 0) half(x) else 1.0 - half(-x)
    }
    assert(math.abs(phi(0.0) - 0.5) < 1e-7)
    assert(math.abs(phi(1.959964) - 0.975) < 1e-6)
    assert(math.abs(phi(-1.959964) - 0.025) < 1e-6)
    assert(math.abs(phi(3.0) - 0.998650) < 1e-6)
    val grid = (-400 to 400).map(_ / 100.0)
    grid.sliding(2).foreach { case Seq(a, b) =>
      assert(phi(a) < phi(b), "strictly monotone")
    }
    grid.foreach(x =>
      assert(math.abs(phi(x) + phi(-x) - 1.0) < 1.5e-7, "symmetric"))
  }

  test("etl_stock_black_scholes: positive vol; ATM call worth a " +
    "plausible fraction of spot; price = spot x (N(d1) - N(d2))") {
    val rows = run("etl_stock_black_scholes")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sigma, spot, px, frac) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(sigma > 0.0 && spot > 0.0)
      assert(px > 0.0 && px < spot, "an ATM call is worth less than spot")
      assert(math.abs(px - spot * frac) < 1e-9 * spot)
      // C/S = 2 Phi(sigma sqrt(T)/2) - 1 stays under ~0.4 even at 200% vol
      assert(frac < 0.5)
    }
  }
}
