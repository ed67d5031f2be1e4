package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch I
  * ([[graft.queries.Analytics20]]). */
class Analytics20Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("llm_langid_eval: cells partition the corpus, F1 is the harmonic mean") {
    val rows = run("llm_langid_eval")
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val corpus = graft.core.Tables.load(spark, sf, "documents").count()
    assert(total == corpus, s"confusion cells $total != corpus $corpus")
    rows.foreach { r =>
      val p = r.getDouble(3); val rc = r.getDouble(4); val f1 = r.getDouble(5)
      assert(p > 0.0 && p <= 1.0 && rc > 0.0 && rc <= 1.0)
      assert(math.abs(f1 - 2 * p * rc / (p + rc)) < 1e-12)
    }
    // the prediction rule must agree with text_langid itself
    val fromLangid = SparkEntry.queries("text_langid")(spark, sf)
      .groupBy("labeled_lang", "pred_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cells = rows
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells == fromLangid, "confusion cells drifted from text_langid")
  }

  test("etl_bitemporal: the correction is visible only after its tx date") {
    val rows = run("etl_bitemporal")
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set("before_correction", "after_correction",
      "early_valid"))
    val (nb, pb) = rows("before_correction")
    val (na, pa) = rows("after_correction")
    // same valid date, same visible key set — only prices moved
    assert(na == nb, "correction changed row visibility at the same valid date")
    assert(pa > pb, "corrected total must exceed the pre-correction total")
    // the +10 correction applies to exactly the %3 keys visible
    val (ne, _) = rows("early_valid")
    assert(ne <= nb, "earlier valid date cannot see more rows")
  }

  test("agg_two_proportion: census identity and bounded z sign") {
    val rows = run("agg_two_proportion")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    val diff = r.getDouble(4)
    if (!r.isNullAt(5)) {
      val z = r.getDouble(5)
      assert(math.signum(diff) == math.signum(z) || diff == 0.0)
    }
  }
}
