package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch F ([[graft.queries.Analytics26]]). */
class Analytics26Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("graph_betweenness: ratios bounded by pair count, leaves score zero-ish") {
    val rows = run("graph_betweenness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getDouble(1); val pairs = r.getLong(2)
      assert(b >= 0.0)
      // each covered pair contributes at most 1 to the ordered sum,
      // so betweenness (halved) is bounded by n_pairs / 2
      assert(b <= pairs / 2.0 + 1e-6, s"betweenness exceeds pair bound: $r")
    }
    // scores must discriminate: not all nodes equal on a thresholded graph
    assert(rows.map(_.getDouble(1)).distinct.length > 1)
  }

  test("win_haar: energies non-negative, approximation equals the block mean") {
    val rows = run("win_haar")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(3) >= 0 && r.getDouble(4) >= 0)
      assert(r.getDouble(1) > 0, "daily revenue blocks have positive mean")
    }
    // Parseval-flavoured sanity: a flat block has zero detail energy at
    // every level, so nonzero e1 somewhere implies real daily variation
    assert(rows.exists(_.getDouble(2) > 0))
  }
}
