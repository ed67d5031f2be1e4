package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AL ([[graft.queries.Analytics57]]). */
class Analytics57Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("llm_domain_cap: kept <= 20 per source; kept + dropped = total") {
    val rows = run("llm_domain_cap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, dropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= 20)
      assert(kept + dropped == n)
      assert(kept == math.min(20L, n))
    }
  }

  test("llm_vocab_coverage: coverage monotone in k, reaching 1.0 once " +
    "k exceeds the vocabulary") {
    val rows = run("llm_vocab_coverage")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 100L, 1000L, 10000L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 - 1e-12, "coverage monotone in k")
    }
    rows.foreach { case (k, v, cov) =>
      assert(cov > 0.0 && cov <= 1.0 + 1e-12)
      if (k >= v) assert(math.abs(cov - 1.0) < 1e-12,
        "k beyond the vocab covers everything")
    }
  }
}
