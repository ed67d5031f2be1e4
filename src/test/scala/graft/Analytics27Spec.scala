package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch G ([[graft.queries.Analytics27]]
  * + the LlmText threshold sweep). */
class Analytics27Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_stl_decompose: additive identity holds per day") {
    val rows = run("win_stl_decompose")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rev, tr, se, re) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // rev = trend + seasonal + resid up to the 6-dp lattice rounding
      assert(math.abs(rev - (tr + se + re)) < 5e-6,
        s"decomposition must recompose: $r")
    }
  }

  test("llm_data_mixture_epochs: caps and budget accounting") {
    val rows = run("llm_data_mixture_epochs")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ep = r.getDouble(2); val alloc = r.getLong(3)
      val util = r.getDouble(4)
      assert(ep > 0 && ep <= 4.0 + 1e-9, s"epoch cap violated: $r")
      assert(alloc <= 4L * r.getLong(1) + 1, "allocation bounded by 4 epochs")
      if (ep < 4.0 - 1e-9)
        assert(math.abs(util - 1.0) < 1e-9,
          "an uncapped source uses its full share")
      else assert(util <= 1.0 + 1e-9, "a capped source underuses its share")
    }
  }

  test("llm_dedup_threshold_sweep: counts monotone in the threshold") {
    val rows = run("llm_dedup_threshold_sweep").sortBy(_.getDouble(0))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1), "pair count decreasing")
    }
    // the 0.5 row is the whole verified pair table
    val nPairs = run("llm_minhash_neardup").length
    assert(rows.head.getLong(1) == nPairs)
  }
}
