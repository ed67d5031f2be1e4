package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch R ([[graft.queries.Analytics38]]). */
class Analytics38Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_auc_roc: AUC in [0,1]; a label-independent score sits " +
    "near 0.5") {
    val rows = run("agg_auc_roc")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val auc = r.getDouble(2)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(auc - 0.5) < 0.1,
      s"value carries no error signal on this fixture: auc=$auc")
  }

  test("agg_brier_calibration: 10 deciles, confidences centered in " +
    "their bins, Brier terms positive and bounded") {
    val rows = run("agg_brier_calibration").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    rows.foreach { r =>
      val (bin, conf, obs, gap, brier) = (r.getLong(0), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(conf > bin / 10.0 - 1e-9 && conf < (bin + 1) / 10.0 + 1e-9,
        "mean PIT score stays inside its decile")
      assert(obs >= 0.0 && obs <= 1.0)
      assert(math.abs(gap - math.abs(conf - obs)) < 1e-12)
      assert(brier >= 0.0 && brier <= 1.0)
    }
  }

  test("events_sprt: frozen walks have |llr| past the threshold at " +
    "their decision step; undecided walks stay inside the band") {
    val rows = run("events_sprt")
    assert(rows.nonEmpty)
    val thresh = 2.9444389791664403
    rows.foreach { r =>
      val (n, llr, dec, step) = (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))
      if (dec == 0) {
        assert(step == 0)
        assert(llr > -thresh && llr < thresh,
          "undecided walks never crossed")
      } else {
        assert(step >= 1 && step <= n)
        assert(dec == 1 || dec == -1)
        if (dec == 1) assert(llr >= thresh) else assert(llr <= -thresh)
      }
    }
    assert(rows.exists(_.getLong(3) != 0),
      "with a 0.25-0.35 band some 50-event walk must decide")
  }
}
