package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AB ([[graft.queries.Analytics47]]). */
class Analytics47Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_decision_stump: split partitions the rows; gain " +
    "non-negative; driver-side impurity replica agrees at the " +
    "chosen threshold") {
    val r = run("agg_decision_stump").head
    val (thr, nl, nr) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    val (gRoot, gSplit, gain) = (r.getDouble(3), r.getDouble(4),
      r.getDouble(5))
    val rows = graft.core.Tables.load(spark, sf, "events")
      .selectExpr("CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS x",
        "CAST(event_type = 'purchase' AS INT) AS y").collect()
      .map(r2 => (r2.getDouble(0), r2.getInt(1)))
    assert(nl + nr == rows.length)
    assert(gain >= 0.0 && gSplit <= gRoot + 1e-12)
    def gini(xs: Array[(Double, Int)]): Double = {
      val n = xs.length.toDouble; val p = xs.map(_._2).sum / n
      1.0 - p * p - (1.0 - p) * (1.0 - p)
    }
    val (l, rr) = rows.partition(_._1 <= thr)
    assert(l.length == nl && rr.length == nr)
    val want = l.length / rows.length.toDouble * gini(l) +
      rr.length / rows.length.toDouble * gini(rr)
    assert(math.abs(want - gSplit) < 1e-9, s"$want vs $gSplit")
  }

  test("text_jsd: bounded in [0, 1] bits and positive across languages") {
    val r = run("text_jsd").head
    val (vocab, jsd) = (r.getLong(0), r.getDouble(1))
    assert(vocab > 0)
    assert(jsd > 0.0 && jsd <= 1.0 + 1e-9,
      "JSD in bits is bounded by 1")
  }

  test("agg_logrank: chi2 = z^2; variance positive; observed within " +
    "the arm's event count") {
    val r = run("agg_logrank").head
    val (o1, e1, v) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val (z, chi2) = (r.getDouble(3), r.getDouble(4))
    assert(v > 0.0 && e1 > 0.0)
    assert(math.abs(chi2 - z * z) < 1e-12 * (1.0 + chi2))
    assert(o1 >= 0 && o1.toDouble <= 2.0 * e1 + 10.0 * math.sqrt(v),
      "observed events in a sane envelope of expectation")
  }
}
