package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch G
  * ([[graft.queries.Analytics18]]). */
class Analytics18Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("llm_span_corruption: mask rate near 15%, spans consistent") {
    val rows = run("llm_span_corruption")
    assert(rows.nonEmpty)
    var tok = 0L; var masked = 0L
    rows.foreach { r =>
      tok += r.getLong(1); masked += r.getLong(2)
      // spans partition the masked set: n_spans ≤ n_masked, and a doc
      // with any masked token has ≥1 span
      assert(r.getLong(3) <= r.getLong(2))
      assert((r.getLong(2) == 0) == (r.getLong(3) == 0))
    }
    val rate = masked.toDouble / tok
    // 9830/65536 ≈ 0.14999 with Bernoulli noise over the corpus
    assert(rate > 0.13 && rate < 0.17, s"corpus mask rate $rate")
  }

  test("agg_hhi: between the 5-way uniform floor and the monopoly cap") {
    val rows = run("agg_hhi")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val hhi = r.getDouble(2)
      assert(hhi >= 10000.0 / n - 1e-6, s"HHI $hhi below uniform floor")
      assert(hhi <= 10000.0 + 1e-6, s"HHI $hhi above monopoly cap")
    }
  }

  test("win_pivot_points: level ordering S2 <= S1 <= P <= R1 <= R2") {
    val rows = run("win_pivot_points")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(2); val r1 = r.getDouble(3); val s1 = r.getDouble(4)
      val r2 = r.getDouble(5); val s2 = r.getDouble(6)
      // R1 − P = P − L ≥ 0 (P ≥ L by the midpoint mean), etc.
      assert(s2 <= s1 + 1e-9 && s1 <= p + 1e-9
        && p <= r1 + 1e-9 && r1 <= r2 + 1e-9,
        s"pivot ladder broken: $s2 $s1 $p $r1 $r2")
    }
  }
}
