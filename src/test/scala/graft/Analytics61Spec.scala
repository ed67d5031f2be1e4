package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AP ([[graft.queries.Analytics61]]). */
class Analytics61Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_friedman: chi2 non-negative with k-1 dof; bounded by the " +
    "no-ties maximum n(k-1)") {
    val r = run("agg_friedman").head
    val (n, k, dof, chi2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))
    assert(k == 5 && dof == 4 && n > 5)
    assert(chi2 >= 0.0)
    assert(chi2 <= n.toDouble * (k - 1) + 1e-9,
      "Friedman chi2 is capped at n(k-1)")
  }

  test("agg_cochran_q: non-negative; matches a driver-side integer " +
    "replica") {
    val r = run("agg_cochran_q").head
    val k = r.getLong(0)
    assert(k == 5)
    // sf0.001 degenerate: every user did all 5 types, so the
    // denominator k*sum(R) - sum(R^2) is 0 -> NULL on both engines
    if (!r.isNullAt(2)) {
    val q = r.getDouble(2)
    assert(q >= 0.0)
    import org.apache.spark.sql.functions._
    val pairs = graft.core.Tables.load(spark, sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r2 => (r2.getLong(0), r2.getString(1)))
    val users = pairs.map(_._1).distinct
    val types = pairs.map(_._2).distinct.sorted
    val set = pairs.toSet
    val cj = types.map(t => users.count(u => set((u, t))).toLong)
    val ri = users.map(u => types.count(t => set((u, t))).toLong)
    val (n, scc, sr, srr) = (cj.sum, cj.map(c => c * c).sum, ri.sum,
      ri.map(x => x * x).sum)
    val kk = types.length.toLong
    val want = (kk - 1).toDouble * (kk * scc - n * n) / (kk * sr - srr)
    assert(math.abs(q - want) < 1e-9 * (1.0 + math.abs(want)),
      s"$q vs $want")
    }
  }
}
