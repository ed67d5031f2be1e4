package graft

import org.apache.spark.sql.Row

/** Semantic pins for the final round-9 batch
  * ([[graft.queries.Analytics9]] + the StockEtl indicator tail):
  * clustering-coefficient identities against the triangle census, a
  * Jarque-Bera moment replica, and stochastic/ATR range invariants. */
class Analytics9Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph_clustering: identities vs the triangle census") {
    val Array(row: Row) = q("graph_clustering").collect()
    val nTri = row.getAs[Long]("n_triangles")
    val nTriads = row.getAs[Long]("n_triads")
    val c = row.getAs[Double]("clustering_coeff")
    // graph_triangles emits per-nation corner counts; corners = 3T
    val corners = q("graph_triangles").collect()
      .map(_.getAs[Long]("n_tri")).sum
    assert(corners == 3 * nTri, s"corner total $corners vs 3x$nTri")
    assert(nTriads >= nTri * 3 || nTriads == 0,
      s"every triangle closes 3 triads: $nTri tri vs $nTriads triads")
    if (nTriads > 0) {
      assert(c == 3.0 * nTri / nTriads)
      assert(c >= 0.0 && c <= 1.0 + 1e-12, s"C=$c")
    }
    assert(row.getAs[Long]("n_edges") * 2 >=
      row.getAs[Long]("n_nodes"), "every node has >= 1 incident edge")
  }

  test("agg_jarque_bera matches a driver-side moment replica") {
    val Array(row: Row) = q("agg_jarque_bera").collect()
    val ys = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS d",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS p")
      .groupBy("d")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(sum(p) AS DOUBLE) / 1000000.0").as("y"))
      .collect().map(_.getDouble(1))
    val n = ys.length
    assert(row.getAs[Long]("n_days") == n.toLong)
    val mu = ys.sum / n
    val m2 = ys.map(y => (y - mu) * (y - mu)).sum / n
    val m3 = ys.map(y => math.pow(y - mu, 3)).sum / n
    val m4 = ys.map(y => math.pow(y - mu, 4)).sum / n
    val skew = m3 / math.pow(m2, 1.5)
    val kurtEx = m4 / (m2 * m2) - 3.0
    // central-moment replica vs the engine's raw-moment algebra:
    // algebraically equal, numerically ~1e-9 apart on O(1) inputs
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-6,
      s"${row.getAs[Double]("skewness")} vs $skew")
    assert(math.abs(row.getAs[Double]("kurtosis_ex") - kurtEx) < 1e-6)
    val jb = n / 6.0 * (skew * skew + kurtEx * kurtEx / 4.0)
    assert(math.abs(row.getAs[Double]("jb_stat") - jb) <
      1e-5 * math.max(jb, 1.0))
  }

  test("etl_stock_stochastic: %K and %D stay in [0, 100]") {
    val out = q("etl_stock_stochastic").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getAs[Double]("pct_k"); val d = r.getAs[Double]("pct_d")
      assert(k >= 0.0 && k <= 100.0, s"pct_k=$k")
      assert(d >= 0.0 && d <= 100.0, s"pct_d=$d")
    }
  }

  test("scalar_bitwise matches JVM two's-complement ops") {
    val out = q("scalar_bitwise").collect()
    assert(out.length > 0)
    out.foreach { r =>
      val k = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("band") == (k & 170L))
      assert(r.getAs[Long]("bor") == (k | 85L))
      assert(r.getAs[Long]("bxor") == (k ^ 204L))
      assert(r.getAs[Long]("bnot") == ~k)
      assert(r.getAs[Long]("shl") == (k << 2))
      assert(r.getAs[Long]("shr") == (k >> 1))
      assert(r.getAs[Int]("bcnt") == java.lang.Long.bitCount(k))
    }
  }

  test("events_burstiness: bounded in (-1, 1), gap accounting matches") {
    val out = q("events_burstiness").collect()
    assert(out.nonEmpty)
    val gapsByType = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((_, ty), rows) =>
        val sorted = rows.sortBy(t => (t._3, t._4)).map(_._3)
        sorted.zip(sorted.tail).map { case (a, b) => (ty, b - a) }
      }.groupBy(_._1).map { case (ty, gs) => ty -> gs.map(_._2) }
    out.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0, s"B=$b")
      val gs = gapsByType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_gaps") == gs.length.toLong)
      val mean = gs.map(_.toDouble).sum / gs.length / 1e6
      assert(math.abs(r.getAs[Double]("mean_s") - mean) < 1e-6 * mean)
      assert(math.abs(b - (r.getAs[Double]("std_s") - r.getAs[Double]("mean_s"))
        / (r.getAs[Double]("std_s") + r.getAs[Double]("mean_s"))) < 1e-12)
    }
  }

  test("etl_stock_atr: TR dominates high-low, ATR positive") {
    val out = q("etl_stock_atr").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("tr") >= 0.0)
      assert(r.getAs[Double]("atr14") > 0.0)
    }
  }
}
