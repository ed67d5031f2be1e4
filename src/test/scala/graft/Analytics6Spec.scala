package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 fifth widening batch
  * ([[graft.queries.Analytics6]] + [[graft.queries.LlmVectors]]'s
  * NDCG): the Kalman fold recurrence and its steady-state variance,
  * a Brown-Forsythe replica, assortativity replica, sentiment sign
  * consistency, the Gumbel moment identities, inter-arrival gap
  * accounting, and NDCG range/ratio invariants. */
class Analytics6Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("win_kalman matches a driver-side fold; variance in (0, R]") {
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val vs = rows.map(_.getDouble(1))
        var x = vs.head; var p = 25.0d; var k = 0.0d
        vs.tail.foreach { z =>
          val pp = p + 4.0d
          k = pp / (pp + 25.0d)
          x = x + k * (z - x)
          p = (1.0d - k) * pp
        }
        u -> ((vs.length.toLong, x, p, k))
      }
    val got = q("win_kalman").collect()
    assert(got.map(_.getAs[Long]("user_id")).toSet == byUser.keySet)
    got.foreach { r =>
      val (n, x, p, k) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Double]("kf_level") == x)
      assert(r.getAs[Double]("kf_var") == p)
      assert(r.getAs[Double]("kf_gain") == k)
      assert(p > 0.0 && p <= 25.0)
      // steady state of p' = R(p+Q)/(p+Q+R): p² + Qp − QR = 0
      if (n > 20) assert(math.abs(p - (math.sqrt(416.0) - 4.0) / 2) < 1e-9)
    }
  }

  test("agg_levene matches a driver-side Brown-Forsythe replica") {
    val Array(row: Row) = q("agg_levene").collect()
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1) / 100000.0))
    def med(g: Array[Double]): Double = {
      val s = g.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2
    }
    val groups = xs.groupBy(_._1).values.map(_.map(_._2)).toArray
    val zsGroups = groups.map { g => val m = med(g); g.map(x => math.abs(x - m)) }
    val k = zsGroups.length; val n = xs.length
    assert(row.getAs[Long]("k_groups") == k.toLong)
    assert(row.getAs[Long]("n_rows") == n.toLong)
    val all = zsGroups.flatten
    val gm = all.sum / n
    val ssb = zsGroups.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = zsGroups.map(g => { val m = g.sum / g.length; g.map(z => (z - m) * (z - m)).sum }).sum
    val w = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(row.getAs[Double]("w_stat") - w) < 1e-6 * math.max(w, 1.0),
      s"${row.getAs[Double]("w_stat")} vs $w")
  }

  test("graph_assortativity matches a driver-side Pearson over edges") {
    val Array(row: Row) = q("graph_assortativity").collect()
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ds = edges.groupBy(_._1).map { case (key, es) => key -> es.length.toDouble }
    val dp = edges.groupBy(_._2).map { case (key, es) => key -> es.length.toDouble }
    assert(row.getAs[Long]("n_edges") == edges.length.toLong)
    assert(row.getAs[Long]("n_suppliers") == ds.size.toLong)
    assert(row.getAs[Long]("n_parts") == dp.size.toLong)
    val pairs = edges.map { case (sKey, pKey) => (ds(sKey), dp(pKey)) }
    val n = pairs.length
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val cov = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val expected = cov / (sx * sy)
    assert(math.abs(row.getAs[Double]("assortativity") - expected) < 1e-6,
      s"${row.getAs[Double]("assortativity")} vs $expected")
  }

  test("text_sentiment: label matches sign; replica on one doc") {
    val out = q("text_sentiment").collect()
    out.foreach { r =>
      val sum = r.getAs[Long]("sent_sum")
      val label = r.getAs[String]("sent_label")
      assert(label == (if (sum > 0) "pos" else if (sum < 0) "neg" else "neu"))
      assert(r.getAs[Double]("sent_mean") ==
        sum.toDouble / r.getAs[Long]("n_tokens"))
    }
    val first = out.minBy(_.getAs[Long]("doc_id"))
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === first.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val lex = Map("fast" -> 2L, "slow" -> -2L, "big" -> 1L,
      "small" -> -1L, "dup" -> -2L, "merge" -> 1L)
    val toks = text.split(" ", -1)
    assert(first.getAs[Long]("n_tokens") == toks.length.toLong)
    assert(first.getAs[Long]("sent_sum") == toks.map(lex.getOrElse(_, 0L)).sum)
  }

  test("agg_gumbel_fit: moment identities hold exactly") {
    val Array(row: Row) = q("agg_gumbel_fit").collect()
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS d", "value")
      .groupBy("d").agg(org.apache.spark.sql.functions.max("value").as("mx"))
      .collect().map(_.getDouble(1))
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    val mean = row.getAs[Double]("mean_max")
    val std = row.getAs[Double]("std_max")
    val beta = row.getAs[Double]("gumbel_beta")
    val mu = row.getAs[Double]("gumbel_mu")
    assert(math.abs(mean - daily.sum / daily.length) < 1e-9)
    assert(beta == std * math.sqrt(6.0) / math.Pi)
    assert(mu == mean - 0.5772156649015329 * beta)
    assert(std > 0 && beta > 0 && mu < mean)
  }

  test("events_interarrival: gap accounting per type, median within range") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(t => (t._1, t._2)).values.flatMap { rows =>
      val sorted = rows.sortBy(t => (t._3, t._4)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => b - a }
    }.toArray
    val byType = ev.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((_, ty), rows) =>
      val sorted = rows.sortBy(t => (t._3, t._4)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => (ty, b - a) }
    }.groupBy(_._1).map { case (ty, gs) => ty -> gs.map(_._2).toArray }
    val got = q("events_interarrival").collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    assert(got.map(_.getAs[Long]("n_gaps")).sum == gaps.length.toLong)
    got.foreach { r =>
      val gs = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_gaps") == gs.length.toLong)
      assert(r.getAs[Double]("mean_gap_s") ==
        gs.sum.toDouble / gs.length / 1000000.0)
      assert(r.getAs[Double]("max_gap_s") == gs.max.toDouble / 1000000.0)
      val s = gs.sorted
      val medUs = (s((gs.length + 1) / 2 - 1).toDouble + s((gs.length + 2) / 2 - 1)) / 2
      assert(r.getAs[Double]("med_gap_s") == medUs / 1000000.0)
    }
  }

  test("llm_ann_ndcg: range, ratio and constant-IDCG invariants") {
    val out = q("llm_ann_ndcg").collect()
    assert(out.length == 10)
    val idcg = 3.0 / (math.log(2.0) / math.log(2.0)) +
      2.0 / (math.log(3.0) / math.log(2.0)) + 1.0 / (math.log(4.0) / math.log(2.0))
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("idcg") - idcg) < 1e-9)
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12, s"ndcg=$ndcg")
      assert(math.abs(ndcg - r.getAs[Double]("dcg") / r.getAs[Double]("idcg")) < 1e-12)
    }
    // the LSH index finds SOMETHING across ten queries
    assert(out.map(_.getAs[Double]("ndcg")).sum > 0.0)
  }
}
