package graft

/** Semantic pins for the round-10 session-2 batch
  * ([[graft.queries.Analytics11]]): temperature-mixing algebra, a
  * per-doc TTR replica, Heaps-fit sanity, an integer-HITS replica, and
  * the k-core peel invariants. */
class Analytics11Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("llm_lang_temperature: weights normalize and flatten the mix") {
    val out = q("llm_lang_temperature").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("p"), r.getAs[Double]("q"),
        r.getAs[Double]("boost")))
    assert(out.length >= 2)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-9)
    // α<1 flattens: every language's q sits strictly between its p and
    // the uniform share, so minority languages are up-sampled …
    val u = 1.0 / out.length
    out.foreach { case (lang, _, p, qq, boost) =>
      if (p < u) assert(qq > p && boost > 1.0, s"$lang not up-sampled")
      if (p > u) assert(qq < p && boost < 1.0, s"$lang not down-sampled")
      assert(math.abs(boost - qq / p) < 1e-12)
    }
    // … and the ranking by mass is preserved (q is monotone in p).
    val byP = out.sortBy(_._3).map(_._1).toSeq
    assert(out.sortBy(_._4).map(_._1).toSeq == byP)
  }

  test("text_ttr matches a per-document driver replica") {
    val out = q("text_ttr").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Double]("ttr"),
          r.getAs[Double]("hapax_frac"))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    assert(out.size == docs.length)
    docs.foreach { r =>
      val cnt = r.getString(1).split(" ", -1).toSeq
        .groupBy(identity).view.mapValues(_.length).toMap
      val nTok = cnt.values.sum.toLong
      val nTyp = cnt.size.toLong
      val nHap = cnt.values.count(_ == 1).toLong
      val (gt, gy, gh, ttr, hf) = out(r.getLong(0))
      assert((gt, gy, gh) == ((nTok, nTyp, nHap)), s"doc ${r.getLong(0)}")
      assert(ttr == nTyp.toDouble / nTok)
      assert(hf == nHap.toDouble / nTyp)
    }
  }

  test("agg_heaps_law: sublinear growth with a faithful endpoint") {
    val r = q("agg_heaps_law").collect().head
    val beta = r.getAs[Double]("beta")
    val k = r.getAs[Double]("k")
    val nTot = r.getAs[Long]("n_total")
    val vTot = r.getAs[Long]("v_total")
    // Trigram vocabulary grows sub-linearly but genuinely (the unigram
    // space saturates — the reason this census runs on trigrams).
    assert(beta > 0.3 && beta < 1.0, s"beta=$beta")
    assert(k > 0.0)
    assert(vTot > 100 && vTot <= nTot)
    // The fitted curve reproduces the full-corpus endpoint within 25%
    // (OLS in log space, 10 points — a sanity bound, not a tolerance).
    val fitted = k * math.pow(nTot.toDouble, beta)
    assert(math.abs(fitted - vTot) / vTot < 0.25,
      s"fit $fitted vs observed $vTot")
  }

  test("graph_hits matches an integer driver replica and is total-ordered") {
    val out = q("graph_hits").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("authority")))
    assert(out.length == 15)
    // Strictly decreasing under (authority desc, partkey asc).
    out.sliding(2).foreach { case Array((p1, a1), (p2, a2)) =>
      assert(a1 > a2 || (a1 == a2 && p1 < p2))
    }
    val e = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val a1 = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = e.groupBy(_._1).view
      .mapValues(_.map(x => a1(x._2)).sum).toMap
    val a2 = e.groupBy(_._2).view
      .mapValues(_.map(x => h1(x._1)).sum).toMap
    val want = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(15)
    assert(out.toSeq == want)
  }

  test("agg_kaplan_meier: monotone step curve with live censoring") {
    val out = q("agg_kaplan_meier").collect()
      .map(r => (r.getAs[Long]("t_hours"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("s")))
      .sortBy(_._1)
    assert(out.nonEmpty)
    // S is strictly decreasing at event times, within (0, 1].
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 < a._4); assert(b._2 < a._2)
    }
    out.foreach { case (t, n, d, s) =>
      assert(t >= 0 && t <= 48); assert(d >= 1 && d <= n)
      assert(s > 0.0 - 1e-12 && s <= 1.0)
    }
    // The product form holds exactly: S(t_i) = S(t_{i-1})·(1 - d/n).
    out.foldLeft(1.0) { case (prev, (_, n, d, s)) =>
      val want = prev * (1.0 - d.toDouble / n)
      assert(math.abs(s - want) < 1e-9); s
    }
    // Administrative censoring fired: some users never reach the event,
    // so the last at-risk count exceeds the remaining event count.
    assert(out.last._2 > out.last._3)
  }

  test("mm_vad_segments: islands are maximal voiced runs") {
    val out = q("mm_vad_segments").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("seg_start"),
        r.getAs[Long]("seg_end"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("energy")))
    assert(out.length > out.map(_._1).distinct.length,
      "gate never alternated — some blob must yield multiple segments")
    out.foreach { case (_, s0, e0, n, en) =>
      assert(e0 - s0 + 1 == n)
      assert(en >= 3000L * n, "every member frame passed the gate")
    }
    // Segments of one media never touch (maximality of islands).
    out.groupBy(_._1).foreach { case (_, segs) =>
      segs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1)
        case _ =>
      }
    }
  }

  test("agg_poisson_bootstrap: CI brackets the estimate and weights are fair") {
    val r = q("agg_poisson_bootstrap").collect().head
    val est = r.getAs[Double]("est")
    val lo = r.getAs[Double]("ci_lo")
    val hi = r.getAs[Double]("ci_hi")
    assert(r.getAs[Long]("n_replicates") == 32L)
    assert(lo < hi)
    assert(lo < est && est < hi, s"CI [$lo, $hi] misses estimate $est")
    // CI width is plausible for n≈1500 iid prices: within an order of
    // magnitude of 4·sd/√n around the point estimate on each side.
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val mu = o.sum / o.length
    val sd = math.sqrt(o.map(x => (x - mu) * (x - mu)).sum / (o.length - 1))
    val se = sd / math.sqrt(o.length.toDouble)
    assert(hi - lo > 0.5 * se && hi - lo < 8 * se,
      s"CI width ${hi - lo} implausible vs se $se")
  }

  test("graph_closeness: BFS counts against a driver Floyd-Warshall") {
    val out = q("graph_closeness").collect()
      .map(r => r.getAs[Long]("nk") -> (r.getAs[Long]("c1"),
        r.getAs[Long]("c2"), r.getAs[Long]("c3"), r.getAs[Long]("c4"),
        r.getAs[Double]("harmonic"))).toMap
    assert(out.nonEmpty)
    Seq("lineitem", "orders", "customer", "supplier").foreach(n =>
      spark.read.parquet(s"$sf/$n.parquet")
        .createOrReplaceTempView("cls_" + n))
    val und = spark.sql(
      """SELECT least(na, nb) AS a, greatest(na, nb) AS b, sum(cnt) AS cnt
        |FROM (SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
        |        count(*) AS cnt
        |      FROM cls_lineitem l
        |        JOIN cls_orders o ON l.l_orderkey = o.o_orderkey
        |        JOIN cls_customer c ON o.o_custkey = c.c_custkey
        |        JOIN cls_supplier s ON l.l_suppkey = s.s_suppkey
        |      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2)
        |GROUP BY 1, 2""".stripMargin).collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue))
    val tot = und.map(_._3).sum
    val np = und.length
    val sym = und.filter { case (_, _, c) => c * np * 100 > 115 * tot }
      .flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
    val nodes = sym.map(_._1).distinct.sorted
    // Floyd-Warshall on the tiny graph, then distance censuses ≤ 4.
    val inf = 1 << 20
    val d = collection.mutable.Map[(Long, Long), Int]()
      .withDefaultValue(inf)
    nodes.foreach(n => d((n, n)) = 0)
    sym.foreach { case (a, b) => d((a, b)) = 1 }
    for (k <- nodes; i <- nodes; j <- nodes)
      if (d((i, k)) + d((k, j)) < d((i, j)))
        d((i, j)) = d((i, k)) + d((k, j))
    nodes.foreach { n =>
      def c(k: Int) = nodes.count(v => v != n && d((n, v)) == k).toLong
      val (g1, g2, g3, g4, h) = out(n)
      assert((g1, g2, g3, g4) == ((c(1), c(2), c(3), c(4))), s"node $n")
      assert(h == c(1) + c(2) * 0.5 + c(3).toDouble / 3.0 + c(4) * 0.25)
    }
  }

  test("win_garch matches a per-user driver fold replica") {
    val out = q("win_garch").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("garch_var"),
          r.getAs[Double]("garch_vol"))).toMap
    assert(out.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val rows = graft.core.Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime,
        r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      var prev = vs.head
      var s2 = 25.0
      vs.tail.foreach { z =>
        s2 = 2.0 + 0.1 * (z - prev) * (z - prev) + 0.85 * s2
        prev = z
      }
      val (n, gv, gvol) = out(u)
      assert(n == vs.length.toLong)
      assert(gv == s2, s"user $u: $gv vs replica $s2")
      assert(gvol == math.sqrt(s2))
    }
    assert(ev.select("user_id").distinct().count() == out.size)
  }

  test("agg_hurst: exponent in range, R/S grows with window size") {
    val r = q("agg_hurst").collect().head
    val h = r.getAs[Double]("h")
    val rs = Seq(r.getAs[Double]("rs_8"), r.getAs[Double]("rs_16"),
      r.getAs[Double]("rs_32"))
    assert(h > 0.0 && h < 1.0, s"h=$h")
    assert(rs.forall(_ > 0.0))
    // E[R/S] ~ c·n^h is increasing in n for any positive exponent.
    assert(rs == rs.sorted, s"R/S not monotone: $rs")
    // The fitted slope reproduces the endpoints' two-point slope
    // within the 3-point OLS tolerance.
    val twoPoint = math.log(rs(2) / rs(0)) / math.log(32.0 / 8.0)
    assert(math.abs(h - twoPoint) < 0.15, s"h=$h vs 2-pt $twoPoint")
  }

  test("win_seasonal_decompose: components re-add and edges stay null") {
    val out = q("win_seasonal_decompose").collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Double]("rev"),
        Option(r.getAs[java.lang.Double]("trend")).map(_.doubleValue),
        r.getAs[Double]("seasonal"),
        Option(r.getAs[java.lang.Double]("resid")).map(_.doubleValue)))
      .sortBy(_._1)
    assert(out.length > 100)
    // Exactly the first and last 3 days lack a full centered window.
    val nullTrend = out.filter(_._3.isEmpty).map(_._1)
    assert(nullTrend.toSet ==
      (out.take(3) ++ out.takeRight(3)).map(_._1).toSet)
    // Additivity: rev = trend + seasonal + resid wherever defined.
    out.foreach {
      case (_, rev, Some(tr), se, Some(res)) =>
        assert(math.abs(rev - (tr + se + res)) < 1e-6)
      case (d, _, tr, _, res) =>
        assert(tr.isEmpty && res.isEmpty, s"$d: trend/resid nullity split")
    }
    // Seasonal effects are centered-ish: they sum to ~0 across the
    // seven day-of-week groups (each weighted mean of detrended rev).
    val seasonals = out.map(r => (r._1.takeRight(10), r._4))
    assert(seasonals.map(_._2).distinct.size == 7)
  }

  test("mm_audio_fingerprint: peaks are local maxima with integer hashes") {
    val out = q("mm_audio_fingerprint").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("f1"),
        r.getAs[Long]("dt"), r.getAs[Long]("fp")))
    assert(out.nonEmpty)
    out.foreach { case (_, f1, dt, fp) =>
      assert(f1 >= 1); assert(dt >= 1)
      assert(fp >= 0 && fp < 251L * 251 * 64 + 64)
      assert(fp % 64 == math.min(dt, 63),
        "gap bits must encode the capped frame gap")
    }
    // Replica on one media: recompute peaks from the frame energies.
    val frames = graft.multimodal.Multimodal.vadFrames(
      graft.multimodal.Multimodal.mediaFromDocuments(spark, sf))
      .collect().groupBy(_.media_id)
    val byMedia = out.groupBy(_._1)
    byMedia.keys.take(5).foreach { m =>
      val es = frames(m).sortBy(_.frame_no).map(_.energy)
      val peaks = (1 until es.length - 1)
        .filter(i => es(i) > es(i - 1) && es(i) >= es(i + 1))
      val want = peaks.zip(peaks.tail).map { case (a, b) =>
        (m, a.toLong, (b - a).toLong,
          ((es(a) % 251) * 251 + es(b) % 251) * 64 + math.min(b - a, 63))
      }
      assert(byMedia(m).sortBy(_._2).toSeq == want, s"media $m")
    }
  }

  test("graph_kcore: survivors satisfy k, removed nodes were peelable") {
    val out = q("graph_kcore").collect()
      .map(r => r.getAs[Long]("nk") -> r.getAs[Long]("deg")).toMap
    assert(out.nonEmpty)
    // Every survivor keeps >= 4 within-core neighbors (the defining
    // property of a 4-core once the peel has converged).
    out.values.foreach(d => assert(d >= 4, s"survivor below k: $out"))
    // The peel actually fired: some node of the full graph is gone.
    Seq("lineitem", "orders", "customer", "supplier").foreach(n =>
      spark.read.parquet(s"$sf/$n.parquet")
        .createOrReplaceTempView("kcs_" + n))
    val und = spark.sql(
      """SELECT least(na, nb) AS a, greatest(na, nb) AS b, sum(cnt) AS cnt
        |FROM (SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
        |        count(*) AS cnt
        |      FROM kcs_lineitem l
        |        JOIN kcs_orders o ON l.l_orderkey = o.o_orderkey
        |        JOIN kcs_customer c ON o.o_custkey = c.c_custkey
        |        JOIN kcs_supplier s ON l.l_suppkey = s.s_suppkey
        |      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2)
        |GROUP BY 1, 2""".stripMargin).collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue))
    val tot = und.map(_._3).sum
    val np = und.length
    val sym = und.filter { case (_, _, c) => c * np * 100 > 115 * tot }
      .flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
    val nodes = sym.map(_._1).toSet
    assert(out.keySet.subsetOf(nodes))
    assert(out.keySet != nodes, "peel removed nothing — rule is vacuous")
    // Driver replica of the same 8 synchronous rounds.
    var alive = nodes
    for (_ <- 1 to 8) {
      val deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.length).toMap
      alive = alive.filter(n => deg.getOrElse(n, 0) >= 4)
    }
    val degFinal = sym.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(out == degFinal)
  }
}
