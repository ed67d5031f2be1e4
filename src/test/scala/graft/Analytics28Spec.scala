package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for round-11 batch H ([[graft.queries.Analytics28]]
  * + `win_stl_anomaly`). */
class Analytics28Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("scan_csv_permissive: both malformed classes quarantined, none lost") {
    val r = run("scan_csv_permissive").head
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val nBad = orders.filter(
      col("o_orderkey") % 13 === 0 || col("o_orderkey") % 17 === 0).count()
    assert(r.getLong(1) == nBad, "every injected bad row must be flagged")
    assert(r.getLong(0) + r.getLong(1) == orders.count(), "no row lost")
    assert(r.getDouble(2) > 0)
  }

  test("etl_dq_expectations: suite green on the clean fixture, ops coherent") {
    val rows = run("etl_dq_expectations")
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"expectation must pass on the fixture: $r")
      val (m, thr, op) = (r.getDouble(1), r.getDouble(2), r.getString(3))
      op match {
        case ">=" => assert(m >= thr)
        case "<=" => assert(m <= thr)
      }
    }
  }

  test("win_stl_anomaly: flags are exactly the >3-MAD residual days") {
    val anomalies = run("win_stl_anomaly")
    val decomp = run("win_stl_decompose")
    assert(anomalies.nonEmpty && anomalies.length < decomp.length / 10,
      "anomalies must be a small minority of days")
    anomalies.foreach(r => assert(math.abs(r.getDouble(3)) > 3.0 - 1e-6,
      s"score must exceed the 3-MAD gate: $r"))
  }
}
