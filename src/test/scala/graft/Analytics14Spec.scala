package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch C
  * ([[graft.queries.Analytics14]] + `mm_scene_cuts`). */
class Analytics14Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_nelson_aalen: hazard cumulative, and bounded by -ln(KM survival)") {
    val na = run("agg_nelson_aalen").sortBy(_.getLong(0))
    assert(na.nonEmpty)
    na.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(3) >= a.getDouble(3) - 1e-12, "H not cumulative")
    }
    // Ĥ(t) = Σ d/n ≤ Σ −ln(1 − d/n) = −ln Ŝ_KM(t): the classical
    // estimator inequality, over the SAME census — a drift in either
    // query's event derivation breaks it.
    val km = run("agg_kaplan_meier").map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(km.nonEmpty)
    na.foreach { r =>
      val t = r.getLong(0)
      km.get(t).foreach { s =>
        assert(r.getDouble(3) <= -math.log(s) + 1e-9,
          s"t=$t: H=${r.getDouble(3)} > -ln(S)=${-math.log(s)}")
      }
    }
  }

  test("win_ulcer_index: RMS drawdown between zero and the max drawdown") {
    val rows = run("win_ulcer_index")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val maxDd = r.getDouble(2); val ui = r.getDouble(3)
      assert(maxDd <= 1e-12, s"max drawdown $maxDd positive")
      assert(ui >= 0.0 && ui <= math.abs(maxDd) + 1e-9,
        s"ulcer $ui outside [0, |maxDD|=${math.abs(maxDd)}]")
    }
  }

  test("text_burrows_delta: full pair grid, non-negative distances") {
    val rows = run("text_burrows_delta")
    val nSources = graft.core.Tables.load(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"expected C($nSources,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 15)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("llm_rouge_decontam: recalls in [0,1], flag consistent, eval set excluded") {
    val rows = run("llm_rouge_decontam")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r1 = r.getDouble(1); val r2 = r.getDouble(2)
      assert(r1 >= 0.0 && r1 <= 1.0 + 1e-12)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
      assert(r.getBoolean(3) == (r2 > 0.5))
    }
    val total = graft.core.Tables.load(spark, sf, "documents").count()
    assert(rows.length == total - 10, "eval docs not excluded")
  }

  test("sql_named_params: binding equals the inlined literal query") {
    val param = run("sql_named_params").map(_.mkString("|")).sorted.toSeq
    graft.core.Tables.load(spark, sf, "orders")
      .createOrReplaceTempView("graft_np2_orders")
    val inlined = spark.sql(
      """SELECT o_orderpriority AS priority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_np2_orders
        |WHERE o_totalprice >= 50000
        |  AND o_orderdate < CAST('1999-01-01' AS TIMESTAMP)
        |GROUP BY o_orderpriority""".stripMargin)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(param == inlined)
  }

  test("mm_scene_cuts: cut count bounded by transitions, diffs by frame size") {
    val rows = run("mm_scene_cuts")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getLong(1); val cuts = r.getLong(2); val md = r.getLong(3)
      assert(nf >= 2)
      assert(cuts <= nf - 1, s"cuts $cuts exceed ${nf - 1} transitions")
      assert(md >= 0 && md <= 255L * 32, s"max diff $md out of byte range")
    }
  }
}
