package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AC ([[graft.queries.Analytics48]]). */
class Analytics48Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("llm_embed_outlier: 10 ranked outliers, sims ascending in rank " +
    "and inside [-1, 1]") {
    val rows = run("llm_embed_outlier")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    rows.foreach(r => assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 + 1e-12, "outliers ordered by similarity")
    }
  }

  test("agg_mahalanobis: 10 ranked distances, non-increasing, " +
    "positive") {
    val rows = run("agg_mahalanobis")
      .map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(rows.length == 10)
    rows.foreach(r => assert(r._2 > 0.0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 - 1e-12)
    }
  }

  test("agg_youden: J = TPR - FPR, both rates in [0,1], and J beats " +
    "the degenerate thresholds") {
    val r = run("agg_youden").head
    val (tpr, fpr, j) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(tpr >= 0.0 && tpr <= 1.0 && fpr >= 0.0 && fpr <= 1.0)
    assert(math.abs(j - (tpr - fpr)) < 1e-12)
    assert(j >= 0.0, "predict-nothing has J = 0; the argmax can't be worse")
  }
}
