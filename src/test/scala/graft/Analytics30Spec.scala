package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch J ([[graft.queries.Analytics30]]). */
class Analytics30Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("etl_record_linkage: every emitted pair agrees on the number " +
    "residue and score recomposes from the literal weights") {
    // sf0.001 has only ~60 blocked pairs (1-in-100 residue match can
    // legitimately yield zero links); pin the semantics at sf0.01.
    val rows = SparkEntry.queries("etl_record_linkage")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAgree, score, isMatch) =
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(score > 5.0)
      assert(nAgree >= 1 && nAgree <= 3)
      assert(isMatch == (score > 9.0))
      // score > 5 is reachable only through the +6.1293 residue weight
      val feasible = Seq(
        6.1293 + 4.3923 + 0.8480, 6.1293 + 4.3923 - 2.5360,
        6.1293 - 1.9434 + 0.8480)
      assert(feasible.exists(w => math.abs(w - score) < 1e-9),
        s"score $score must be one of the num-agree combinations")
    }
  }

  test("etl_k_anonymity: class sizes census the whole table and risk " +
    "is 1/k") {
    val rows = run("etl_k_anonymity")
    val total = rows.map(_.getLong(3)).sum
    val n = graft.core.Tables.load(spark, sf, "customer").count()
    assert(total == n, "equivalence classes must partition the table")
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) >= 5))
      assert(math.abs(r.getDouble(5) - 1.0 / r.getLong(3)) < 1e-12)
    }
  }

  test("agg_bh_fdr: BH adjustment is monotone in rank and never " +
    "below the raw p-value") {
    val rows = run("agg_bh_fdr").sortBy(_.getLong(4))
    assert(rows.length == 25, "one test per nation")
    val padj = rows.map(_.getDouble(5))
    padj.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-15, "adjusted p must be non-decreasing in rank")
    }
    rows.foreach { r =>
      assert(r.getDouble(5) + 1e-15 >= r.getDouble(3) ||
        r.getDouble(5) == 1.0)
      assert(r.getDouble(5) <= 1.0)
      assert(r.getBoolean(6) == (r.getDouble(5) <= 0.10))
    }
  }

  test("agg_cramers_v: V in [0,1] over the full 3x5 table") {
    val rows = run("agg_cramers_v")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 3 && r.getLong(2) == 5)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(3) >= 0.0)
  }

  test("agg_durbin_watson: DW in (0,4) and rho consistent") {
    val rows = run("agg_durbin_watson")
    assert(rows.length == 1)
    val r = rows.head
    val dw = r.getDouble(3)
    assert(dw > 0.0 && dw < 4.0)
    assert(math.abs(r.getDouble(4) - (1.0 - dw / 2.0)) < 1e-12)
  }

  test("agg_adf_test: t-stat recomposes from rho and its SE; a " +
    "mean-reverting revenue series rejects the unit root") {
    val rows = run("agg_adf_test")
    assert(rows.length == 1)
    val r = rows.head
    val (rho, se, t) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(se > 0.0)
    assert(math.abs(t - rho / se) < 1e-12)
    assert(r.getBoolean(4) == (t < -2.86))
    // stationary daily-revenue noise: rho must pull toward the mean
    assert(rho < 0.0)
  }
}
