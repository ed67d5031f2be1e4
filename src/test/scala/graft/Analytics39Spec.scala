package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch S ([[graft.queries.Analytics39]]). */
class Analytics39Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_newey_west: both standard errors positive; HAC inflation " +
    "recomposes as their ratio") {
    val rows = run("agg_newey_west")
    assert(rows.length == 1)
    val r = rows.head
    val (seOls, seHac, infl) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(seOls > 0 && seHac > 0)
    assert(math.abs(infl - seHac / seOls) < 1e-9)
  }

  test("events_decay_score: bounded by event count, strictly positive, " +
    "and the max-ts event contributes fully") {
    val rows = run("events_decay_score")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, score) = (r.getLong(1), r.getDouble(2))
      assert(score > 0.0 && score <= n.toDouble + 1e-9,
        "each term is in (0,1]")
    }
    assert(rows.exists(_.getDouble(2) >= 1.0),
      "the user owning the high-water-mark event scores at least 1")
  }

  test("win_holt_winters: state finite; forecast recomposes from " +
    "level + trend + active seasonal slot") {
    val rows = run("win_holt_winters")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
      assert(!r.getDouble(4).isNaN)
      // level should sit inside a generous envelope of the value range
      assert(math.abs(r.getDouble(2)) < 1e6)
    }
  }
}
