package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 fourth widening batch
  * ([[graft.queries.Analytics5]]): market-basket count identities and
  * a brute-force lift replica, degree-histogram mass conservation, an
  * exact driver-side Theil-Sen median, the CUSUM fold recurrence, a
  * readability census replica, an ANOVA sum-of-squares identity, and
  * the Benford digit census. */
class Analytics5Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_market_basket matches a driver-side co-occurrence census") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val cnt = baskets.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val pairCnt = baskets.groupBy(_._1).values.flatMap { bs =>
      val sorted = bs.map(_._2).sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expected = pairCnt.filter(_._2 >= 2)
    val got = q("agg_market_basket").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      val ab = expected(key)
      assert(r.getAs[Long]("cnt_ab") == ab)
      assert(r.getAs[Long]("cnt_a") == cnt(key._1))
      assert(r.getAs[Long]("cnt_b") == cnt(key._2))
      assert(r.getAs[Long]("n_orders") == nOrders)
      val lift = ab.toDouble * nOrders / (cnt(key._1) * cnt(key._2))
      assert(r.getAs[Double]("lift") == lift)
    }
  }

  test("graph_degree_dist conserves suppliers and edge mass") {
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hist = q("graph_degree_dist").collect()
    assert(hist.map(_.getAs[Long]("n_suppliers")).sum ==
      edges.map(_._1).distinct.length.toLong)
    assert(hist.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_suppliers")).sum ==
      edges.length.toLong)
  }

  test("agg_theil_sen matches a driver-side exact pairwise-slope median") {
    val Array(row: Row) = q("agg_theil_sen").collect()
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr(
        "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS x",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS y")
      .groupBy("x").agg(org.apache.spark.sql.functions.expr("CAST(sum(y) AS DOUBLE)").as("y"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2
    }
    val slopes = for {
      i <- daily.indices.toArray; j <- (i + 1 until daily.length).toArray
    } yield (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1)
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    val slope = row.getAs[Double]("ts_slope")
    val expSlope = medianOf(slopes)
    assert(math.abs(slope - expSlope) <= 1e-9 * math.max(1.0, math.abs(expSlope)),
      s"$slope vs $expSlope")
    val icpts = daily.map { case (x, y) => y - slope * x }
    val expIcpt = medianOf(icpts)
    assert(math.abs(row.getAs[Double]("ts_intercept") - expIcpt) <=
      1e-9 * math.max(1.0, math.abs(expIcpt)))
  }

  test("win_cusum matches a driver-side fold; peak dominates final") {
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        var s = 0.0d; var m = 0.0d; var a = 0L
        rows.map(_.getDouble(1)).foreach { x =>
          val s1 = math.max(0.0, s + x - 55.0)
          m = math.max(m, s1)
          if (s1 > 250.0) { a += 1; s = 0.0 } else s = s1
        }
        u -> ((rows.length.toLong, s, m, a))
      }
    val got = q("win_cusum").collect()
    assert(got.map(_.getAs[Long]("user_id")).toSet == byUser.keySet)
    got.foreach { r =>
      val (n, s, m, a) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Double]("cusum_final") == s)
      assert(r.getAs[Double]("cusum_max") == m)
      assert(r.getAs[Long]("n_alarms") == a)
      assert(m >= s && s >= 0.0)
    }
  }

  test("text_readability matches a driver-side census on one doc") {
    val row = q("text_readability").orderBy("doc_id").head()
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === row.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val words = text.split(" ", -1).length.toLong
    val sents = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
    val syll = math.max(words, "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong)
    assert(row.getAs[Long]("n_words") == words)
    assert(row.getAs[Long]("n_sents") == sents)
    assert(row.getAs[Long]("n_syll") == syll)
    val flesch = 206.835 - 1.015 * (words.toDouble / sents) - 84.6 * (syll.toDouble / words)
    assert(math.abs(row.getAs[Double]("flesch") - flesch) < 1e-9)
  }

  test("agg_anova: SS identity (total = between + within), F replica") {
    val Array(row: Row) = q("agg_anova").collect()
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1) / 100000.0))
    val k = xs.map(_._1).distinct.length
    val n = xs.length
    assert(row.getAs[Long]("k_groups") == k.toLong)
    assert(row.getAs[Long]("n_rows") == n.toLong)
    val gm = xs.map(_._2).sum / n
    val groups = xs.groupBy(_._1).values.map(_.map(_._2))
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    assert(math.abs(row.getAs[Double]("ss_between") - ssb) < 1e-6 * math.max(ssb, 1.0))
    assert(math.abs(row.getAs[Double]("ss_within") - ssw) < 1e-6 * math.max(ssw, 1.0))
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-6 * math.max(f, 1.0))
  }

  test("agg_benford matches a driver-side digit census; chi2 terms sane") {
    val digits = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_extendedprice").collect()
      .map(r => r.getDouble(0).toString.charAt(0).asDigit)
    val census = digits.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val n = digits.length.toLong
    val got = q("agg_benford").collect()
    assert(got.map(_.getAs[Int]("digit")).toSet == census.keySet)
    got.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      val obs = r.getAs[Long]("n_obs")
      assert(obs == census(d))
      assert(r.getAs[Double]("p_obs") == obs.toDouble / n)
      val p = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getAs[Double]("p_benford") - p) < 1e-15)
      val term = math.pow(obs - n * p, 2) / (n * p)
      assert(math.abs(r.getAs[Double]("chi2_term") - term) < 1e-9 * math.max(term, 1.0))
    }
  }
}
