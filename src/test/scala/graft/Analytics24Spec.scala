package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch C ([[graft.queries.Analytics24]]
  * + the LlmText source-overlap / contrastive-triplet queries). */
class Analytics24Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("graph_modularity: partition covers the graph, Q within bounds") {
    val rows = run("graph_modularity")
    assert(rows.nonEmpty)
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 - 1e-6 && q <= 1.0 + 1e-6, s"modularity Q out of range: $q")
    // degree sums over communities = directed edge count = Σ e_in counts
    // only when one community; generally Σd_c = 2m ≥ Σe_in
    val dcSum = rows.map(_.getLong(3)).sum
    val eInSum = rows.map(_.getLong(2)).sum
    assert(eInSum <= dcSum)
    // LPA labels partition the node set
    val nNodes = rows.map(_.getLong(1)).sum
    val lpa = run("graph_label_prop")
    assert(nNodes == lpa.length)
  }

  test("agg_winsorized_mean: robust means sit inside the clamp band") {
    val rows = run("agg_winsorized_mean")
    assert(rows.length == 3)
    rows.foreach { r =>
      val p05 = r.getDouble(1); val p95 = r.getDouble(2)
      assert(p05 <= p95)
      assert(r.getDouble(4) >= p05 - 1e-6 && r.getDouble(4) <= p95 + 1e-6)
      assert(r.getDouble(5) >= p05 - 1e-6 && r.getDouble(5) <= p95 + 1e-6)
    }
  }

  test("etl_late_arriving_dim: facts conserved, audit columns consistent") {
    val rows = run("etl_late_arriving_dim")
    val nOrders = graft.core.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "no fact dropped")
    rows.foreach { r =>
      if (r.getString(0) == "UNKNOWN") {
        assert(r.getLong(4) == r.getLong(1), "UNKNOWN rows are all inferred")
        assert(r.getLong(3) == 0L, "UNKNOWN rows resolved nothing")
      } else {
        assert(r.getLong(4) == 0L, "named segments carry no inferred rows")
      }
    }
    // the late batch actually resolved something at this sf
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("llm_cross_source_overlap: pair census conserves the pair table") {
    val rows = run("llm_cross_source_overlap")
    val nPairs = run("llm_minhash_neardup").length
    assert(rows.map(_.getLong(2)).sum == nPairs)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.5 - 1e-6 && r.getDouble(3) <= 1.0 + 1e-6)
      assert(r.getString(0) <= r.getString(1), "source pair canonical order")
    }
  }

  test("llm_contrastive_pairs: triplets well-formed and deterministic") {
    val rows = run("llm_contrastive_pairs")
    assert(rows.nonEmpty)
    val anchors = rows.map(_.getLong(0))
    assert(anchors.distinct.length == anchors.length, "one triplet per anchor")
    rows.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n != a && n != p, s"negative must differ from anchor/positive: $r")
      assert(n < 64, "negative drawn from the bounded candidate slice")
      assert(r.getDouble(3) >= 0.5 - 1e-6, "positive is a verified near-dup")
    }
    // determinism: a second run yields the identical triplet set
    val again = run("llm_contrastive_pairs")
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }
}
