package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AH ([[graft.queries.Analytics53]]). */
class Analytics53Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_jackknife_ratio: SE positive and matches a driver-side " +
    "leave-one-out replica") {
    import org.apache.spark.sql.functions._
    val r = run("agg_jackknife_ratio").head
    val (n, theta, se, bc) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(n > 10 && se > 0.0)
    val daily = graft.core.Tables.load(spark, sf, "orders")
      .groupBy(expr("datediff(CAST(o_orderdate AS DATE), " +
        "DATE '1995-01-01')").as("x"))
      .agg(expr("CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))) " +
        "AS DOUBLE)").as("y"), count(lit(1)).cast("double").as("m"))
      .collect().map(r2 => (r2.getDouble(1), r2.getDouble(2)))
    val (sy, sm) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val that = sy / sm
    assert(math.abs(theta - that) < 1e-9 * that)
    val devs = daily.map { case (y, m) => (sy - y) / (sm - m) - that }
    val (sd, sdd) = (devs.sum, devs.map(d => d * d).sum)
    val nn = daily.length.toDouble
    val want = math.sqrt((nn - 1.0) / nn * (sdd - sd * sd / nn))
    assert(math.abs(se - want) < 1e-6 * want, s"$se vs $want")
    assert(math.abs(bc - theta) < 10.0 * se,
      "bias correction stays within a few SEs")
  }

  test("events_ccf: 11 lags, symmetric pair counts, lag-0 is the " +
    "plain correlation in [-1, 1]") {
    val rows = run("events_ccf")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (-5L to 5L))
    rows.foreach { case (_, np, c) =>
      assert(np > 0)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    val byLag = rows.map(r => r._1 -> r._2).toMap
    (1L to 5L).foreach(l =>
      assert(byLag(l) == byLag(-l), "lag +/-l see the same pair count"))
  }
}
