package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AF ([[graft.queries.Analytics51]]). */
class Analytics51Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("events_markov_entropy: bounded by log2(k) for a k-state chain") {
    val r = run("events_markov_entropy").head
    val (edges, h) = (r.getLong(0), r.getDouble(1))
    assert(edges > 0)
    assert(h > 0.0 && h <= math.log(5.0) / math.log(2.0) + 1e-9,
      "entropy rate of a 5-state chain is at most log2(5) bits")
  }

  test("agg_power_twoprop: rates and power in [0,1]; MDE positive " +
    "and proportional to SE") {
    val r = run("agg_power_twoprop").head
    val (pa, pb, se) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(pa >= 0.0 && pa <= 1.0 && pb >= 0.0 && pb <= 1.0)
    if (se == 0.0) {
      // sf0.001 degenerate: every user converts -> pooled p = 1 -> the
      // readout is NULL on both engines (gate-consistent)
      assert(r.isNullAt(5))
    } else {
      val (pw, mde) = (r.getDouble(5), r.getDouble(6))
      assert(se > 0.0 && mde > 0.0)
      assert(pw >= 0.0 && pw <= 1.0)
      assert(math.abs(mde - (1.959964 + 8.41621e-1) * se) < 1e-12)
    }
  }

  test("agg_energy_distance: non-negative, and equals a brute-force " +
    "O(n^2) driver replica") {
    val r = run("agg_energy_distance").head
    val (nx, ny, e) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nx > 0 && ny > 0)
    assert(e >= 0.0, "energy distance is a metric")
    val rows = graft.core.Tables.load(spark, sf, "events")
      .filter("event_type IN ('purchase', 'click')")
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "event_type = 'purchase'").collect()
      .map(r2 => (r2.getLong(0), r2.getBoolean(1)))
    val xs = rows.filter(_._2).map(_._1)
    val ys = rows.filterNot(_._2).map(_._1)
    assert(xs.length == nx && ys.length == ny)
    def meanAbs(a: Array[Long], b: Array[Long]): Double = {
      var s = BigInt(0)
      a.foreach(x => b.foreach(y => s += (x - y).abs))
      (BigDecimal(s) / (BigDecimal(a.length) * b.length)).toDouble
    }
    val want = (2.0 * meanAbs(xs, ys) - meanAbs(xs, xs) -
      meanAbs(ys, ys)) / 100.0
    assert(math.abs(e - want) < 1e-9 * (1.0 + want),
      s"engine $e vs brute force $want")
  }
}
