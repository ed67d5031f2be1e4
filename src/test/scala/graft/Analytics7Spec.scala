package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 sixth widening batch
  * ([[graft.queries.Analytics7]] + [[graft.queries.LlmVectors]]'s
  * rank fusion): driver-side replicas of RSI/Bollinger on one user,
  * an exact BigDecimal drawdown fold, the runs-test census, the BPE
  * pair census, and fusion membership/ordering invariants. */
class Analytics7Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def userSeries(uid: Long): Array[Double] =
    spark.read.parquet(s"$sf/events.parquet")
      .filter(org.apache.spark.sql.functions.col("user_id") === uid)
      .orderBy("ts", "event_id").select("value").collect().map(_.getDouble(0))

  test("win_rsi: bounded in [0,100], one-user SMA replica agrees") {
    val out = q("win_rsi").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rsi = r.getAs[Double]("rsi14")
      assert(rsi >= 0.0 && rsi <= 100.0, s"rsi=$rsi")
    }
    val uid = out.map(_.getAs[Long]("user_id")).min
    val vs = userSeries(uid)
    val diffs = vs.zip(vs.tail).map { case (a, b) => b - a }
    val expected = (13 until diffs.length).map { i =>
      val win = diffs.slice(i - 13, i + 1)
      val ag = win.map(math.max(_, 0.0)).sum / 14
      val al = win.map(d => math.max(-d, 0.0)).sum / 14
      if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al)
    }
    val got = out.filter(_.getAs[Long]("user_id") == uid)
      .sortBy(_.getAs[Long]("event_id")).map(_.getAs[Double]("rsi14"))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$g vs $e")
    }
  }

  test("win_bollinger: band geometry and one-user midline replica") {
    val out = q("win_bollinger").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("bb_up") >= r.getAs[Double]("bb_mid"))
      assert(r.getAs[Double]("bb_mid") >= r.getAs[Double]("bb_dn"))
    }
    val uid = out.map(_.getAs[Long]("user_id")).min
    val vs = userSeries(uid)
    val expectedMid = (19 until vs.length).map(i => vs.slice(i - 19, i + 1).sum / 20)
    val got = out.filter(_.getAs[Long]("user_id") == uid)
      .sortBy(_.getAs[Long]("event_id")).map(_.getAs[Double]("bb_mid"))
    assert(got.length == expectedMid.length)
    got.zip(expectedMid).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$g vs $e")
    }
  }

  test("win_drawdown matches an exact BigDecimal fold") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        var cum = JBD.ZERO; var peak: JBD = null; var maxDd = JBD.ZERO
        var n = 0L
        rows.map(_.getDouble(1)).foreach { v =>
          // valueOf (shortest-string repr), matching Spark's
          // double→decimal cast — new JBD(d) would take the full
          // binary expansion and drift at 1e-14
          val pnl = JBD.valueOf(v - 50.0).setScale(2, RoundingMode.HALF_UP)
          cum = cum.add(pnl)
          peak = if (peak == null || cum.compareTo(peak) > 0) cum else peak
          val dd = peak.subtract(cum)
          if (dd.compareTo(maxDd) > 0) maxDd = dd
          n += 1
        }
        u -> ((n, cum.doubleValue, peak.doubleValue, maxDd.doubleValue))
      }
    val got = q("win_drawdown").collect()
    assert(got.map(_.getAs[Long]("user_id")).toSet == byUser.keySet)
    got.foreach { r =>
      val (n, total, peak, dd) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Double]("total_end") == total)
      assert(r.getAs[Double]("peak_max") == peak)
      assert(r.getAs[Double]("max_drawdown") == dd)
      assert(dd >= 0.0 && peak >= total)
    }
  }

  test("agg_runs_test matches a driver-side runs census") {
    val Array(row: Row) = q("agg_runs_test").collect()
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS d",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS y")
      .groupBy("d").agg(org.apache.spark.sql.functions.expr("CAST(sum(y) AS DOUBLE)").as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1))).sortBy(_._1)
    val ys = daily.map(_._2)
    val sorted = ys.sorted
    val med = (sorted((ys.length + 1) / 2 - 1) + sorted((ys.length + 2) / 2 - 1)) / 2
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val runs = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    val n1 = signs.count(identity); val n2 = signs.length - n1
    assert(row.getAs[Long]("n_runs") == runs.toLong)
    assert(row.getAs[Long]("n_above") == n1.toLong)
    assert(row.getAs[Long]("n_below") == n2.toLong)
    assert(!row.getAs[Double]("runs_z").isNaN)
  }

  test("llm_bpe_pairs matches a driver-side pair census") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val census = docs.flatMap { t =>
      val ts = t.split(" ", -1)
      ts.zip(ts.tail).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expected = census.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = q("llm_bpe_pairs").collect().sortBy(_.getAs[Long]("rnk"))
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((r, (p, c)), i) =>
      assert(r.getAs[Long]("rnk") == i + 1L)
      assert(r.getAs[String]("pair") == p, s"rank ${i + 1}: ${r.getAs[String]("pair")} vs $p")
      assert(r.getAs[Long]("cnt") == c)
    }
  }

  test("llm_rank_fusion: membership, score bounds, per-query ordering") {
    val fused = q("llm_rank_fusion").collect()
    assert(fused.nonEmpty)
    val lsh = q("llm_ann_lsh").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = q("llm_ann_ivf").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    fused.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq == (1L to byRank.length))
      val scores = byRank.map(_.getAs[Double]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    fused.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(lsh.contains(key) || ivf.contains(key),
        s"fused candidate $key in neither source ranking")
      val sc = r.getAs[Double]("rrf_score")
      assert(sc > 0.0 && sc <= 2.0 / 61.0 + 1e-12)
    }
  }
}
