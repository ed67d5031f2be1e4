package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch I ([[graft.queries.Analytics29]]). */
class Analytics29Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("events_did: estimate recomposes from its four cell means") {
    val rows = run("events_did")
    assert(rows.length == 1)
    val r = rows.head
    val (tp, tq, cp, cq, did) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(did - ((tp - tq) - (cp - cq))) < 1e-12)
    val n = graft.core.Tables.load(spark, sf, "events").count()
    assert(r.getLong(5) == n, "all events accounted across the 4 cells")
  }

  test("text_code_detect: fractions bounded, prose corpus mostly not code") {
    val rows = run("text_code_detect")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getBoolean(6) ==
        (r.getDouble(4) > 0.04 || r.getDouble(5) > 0.2))
    }
    val codeFrac = rows.count(_.getBoolean(6)).toDouble / rows.length
    assert(codeFrac < 0.5, "a prose fixture must not classify mostly code")
  }
}
