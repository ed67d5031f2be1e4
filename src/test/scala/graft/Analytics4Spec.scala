package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 widening batch
  * ([[graft.queries.Analytics4]]): winnowing's density guarantee, the
  * KS/Mann-Whitney integer statistics against driver-side replicas,
  * ACF pair accounting, best-path optimality, the triangle census's
  * 3-corner invariant, and the Holt fold recurrence. */
class Analytics4Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text_winnowing: fingerprint counts within winnowing bounds") {
    val out = q("text_winnowing").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ng = r.getAs[Long]("n_grams")
      val nfp = r.getAs[Long]("n_fp")
      // every window of w=4 grams contributes >= 1 fingerprint and the
      // distinct set can't exceed the gram count
      assert(nfp >= 1 && nfp <= ng)
      // density: expected 2/(w+1)=0.4; distinct-set upper bound is ng,
      // lower bound is ceil(ng/w) (one shared min per full window)
      assert(nfp >= (ng + 3) / 4, s"doc ${r.getAs[Long]("doc_id")}: " +
        s"$nfp fingerprints for $ng grams is below the 1/w floor")
    }
  }

  test("text_winnowing matches a driver-side brute force on one doc") {
    val row = q("text_winnowing").orderBy("doc_id").head()
    val docId = row.getAs[Long]("doc_id")
    val text = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === docId)
      .head().getAs[String]("text")
    val ts = text.split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long =
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16)
    val cs = (0 until ts.length - 2).map { i =>
      h(s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}") * 100000L - (i + 1)
    }
    val fp = (1 to cs.length).map { p =>
      cs.slice(math.max(0, p - 4), p).min
    }.distinct
    assert(row.getAs[Long]("n_grams") == cs.length)
    assert(row.getAs[Long]("n_fp") == fp.length)
    assert(row.getAs[Long]("fp_sum") == fp.sum)
  }

  test("agg_ks_test matches a driver-side exact D computation") {
    val Array(row: Row) = q("agg_ks_test").collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter("event_type IN ('purchase', 'click')")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.filter(_._1 == "purchase").map(_._2).sorted
    val b = ev.filter(_._1 != "purchase").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    val dNum = values.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }.max
    assert(row.getAs[Long]("n_a") == a.length.toLong)
    assert(row.getAs[Long]("n_b") == b.length.toLong)
    val expected = dNum.toDouble / (a.length.toLong * b.length)
    assert(row.getAs[Double]("d_stat") == expected,
      s"${row.getAs[Double]("d_stat")} vs $expected")
  }

  test("agg_mannwhitney: U_a + U_b = n_a * n_b, rank-sum replica agrees") {
    val Array(row: Row) = q("agg_mannwhitney").collect()
    val na = row.getAs[Long]("n_a"); val nb = row.getAs[Long]("n_b")
    val ua = row.getAs[Double]("u_a"); val ub = row.getAs[Double]("u_b")
    assert(ua + ub == na.toDouble * nb)
    // driver-side rank-sum: average ranks over the pooled sample
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter("event_type IN ('purchase', 'click')")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val pooled = ev.sortBy(_._2)
    val rankByValue = pooled.map(_._2).zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2 + 1).sum.toDouble / xs.length
      }
    val ra = ev.filter(_._1 == "purchase").map(p => rankByValue(p._2)).sum
    val expectedUa = ra - na.toDouble * (na + 1) / 2
    assert(math.abs(ua - expectedUa) < 1e-6, s"$ua vs $expectedUa")
    assert(!row.getAs[Double]("mw_z").isNaN)
  }

  test("agg_spearman: strong positive monotone association, exact n") {
    val Array(row: Row) = q("agg_spearman").collect()
    val rho = row.getAs[Double]("rho")
    // n_chars and whitespace-token count are near-monotone in each other
    assert(rho > 0.5 && rho <= 1.0, s"rho=$rho")
    assert(row.getAs[Long]("n") ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("events_acf: lags 1..7, acf bounded, pair counts nonincreasing") {
    val out = q("events_acf").collect().sortBy(_.getAs[Int]("lag"))
    assert(out.map(_.getAs[Int]("lag")).toSeq == (1 to 7))
    out.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-12 && acf <= 1.0 + 1e-12)
    }
    val pairs = out.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair counts must shrink with lag: ${pairs.mkString(",")}")
  }

  test("graph_best_path: positive costs, prob = exp(-cost), beats direct edge") {
    val out = q("graph_best_path").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cost = r.getAs[Double]("cost")
      assert(cost > 0)
      assert(math.abs(r.getAs[Double]("prob") - math.exp(-cost)) < 1e-12)
    }
    // multi-hop minimum can only improve on any single path: every
    // (src,dst) appears at most once
    val keys = out.map(r => (r.getAs[String]("src"), r.getAs[String]("dst")))
    assert(keys.distinct.length == keys.length)
  }

  test("graph_triangles: corner counts sum to a multiple of 3") {
    val out = q("graph_triangles").collect()
    out.foreach(r => assert(r.getAs[Long]("n_tri") > 0))
    val total = out.map(_.getAs[Long]("n_tri")).sum
    // each (ordered) triangle contributes exactly 3 corner rows
    assert(total % 3 == 0, s"corner total $total not a multiple of 3")
  }

  test("win_holt matches a driver-side fold of the sorted values") {
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "value")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val vs = rows.map(_.getDouble(1))
        var l = vs.head; var b = 0.0d
        vs.tail.foreach { x =>
          val nl = 0.3d * x + 0.7d * (l + b)
          val nb = 0.1d * (nl - l) + 0.9d * b
          l = nl; b = nb
        }
        u -> ((vs.length.toLong, l, b))
      }
    val got = q("win_holt").collect()
    assert(got.map(_.getAs[Long]("user_id")).toSet == byUser.keySet)
    got.foreach { r =>
      val (n, l, b) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Double]("holt_level") == l)
      assert(r.getAs[Double]("holt_trend") == b)
      assert(r.getAs[Double]("holt_fcst") == l + b)
    }
  }
}
