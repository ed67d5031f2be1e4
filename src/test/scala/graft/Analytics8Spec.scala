package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-9 seventh widening batch
  * ([[graft.queries.Analytics8]]): logit feature replicas and sigmoid
  * monotonicity, DSIR weight direction (English docs score higher
  * under the English target model), an exact Sharpe replica from
  * integer cents, and seasonality mass conservation. */
class Analytics8Spec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("llm_quality_logit: feature replica on one doc, sigmoid sanity") {
    val out = q("llm_quality_logit").collect()
    out.foreach { r =>
      val z = r.getAs[Double]("quality_logit")
      val sc = r.getAs[Double]("quality_score")
      // ulp tolerance: Spark's exp is StrictMath, the JVM's is the
      // (possibly different-by-1-ulp) intrinsic
      assert(math.abs(sc - 1.0 / (1.0 + math.exp(-z))) < 1e-14)
      assert(r.getAs[Boolean]("keep") == (sc >= 0.5))
    }
    val first = out.minBy(_.getAs[Long]("doc_id"))
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") === first.getAs[Long]("doc_id"))
      .head()
    val ts = doc.getAs[String]("text").split(" ", -1)
    assert(first.getAs[Long]("n_words") == ts.length.toLong)
    assert(first.getAs[Double]("uniq_ratio") == ts.distinct.length.toDouble / ts.length)
    assert(first.getAs[Double]("stop_ratio") ==
      ts.count(t => t == "the" || t == "a").toDouble / ts.length)
    val mwl = (doc.getAs[Long]("n_chars") - (ts.length - 1)).toDouble / ts.length
    assert(first.getAs[Double]("mean_word_len") == mwl)
  }

  test("llm_dsir_weights: English docs outscore non-English on average") {
    val langOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = q("llm_dsir_weights").collect()
    assert(out.length == langOf.size)
    val (en, other) = out.partition(r => langOf(r.getAs[Long]("doc_id")) == "en")
    assert(en.nonEmpty && other.nonEmpty)
    def meanW(rs: Array[Row]) =
      rs.map(_.getAs[Double]("log_weight")).sum / rs.length
    assert(meanW(en) > meanW(other),
      s"en mean ${meanW(en)} should exceed other mean ${meanW(other)}")
    // token accounting
    out.foreach { r => assert(r.getAs[Long]("n_tokens") > 0L) }
  }

  test("win_sharpe matches an exact integer-cent replica") {
    val byUser = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        // cents are exact: value-50.0 rounded to 2 decimals via the
        // same shortest-string path as the engine's decimal cast
        val cents = rows.map(r => math.round(
          java.math.BigDecimal.valueOf(r.getDouble(1) - 50.0)
            .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue * 100))
        val n = cents.length
        val sx = cents.sum.toDouble / 100
        val sxx = cents.map(c => (c.toDouble / 100) * (c.toDouble / 100)).sum
        u -> ((n.toLong, sx / n, sxx))
      }
    val got = q("win_sharpe").collect()
    got.foreach { r =>
      val (n, mean, _) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("pnl_mean") - mean) < 1e-9,
        s"${r.getAs[Double]("pnl_mean")} vs $mean")
      val std = r.getAs[Double]("pnl_std")
      assert(std >= 0.0)
      if (std > 0)
        assert(math.abs(r.getAs[Double]("sharpe")
          - r.getAs[Double]("pnl_mean") / std * math.sqrt(252.0)) < 1e-9)
    }
  }

  test("agg_seasonality: mass conservation and index mean ~ 1") {
    val out = q("agg_seasonality").collect()
    assert(out.length == 7)
    assert(out.map(_.getAs[Int]("dow")).sorted.toSeq == (0 to 6))
    val nDays = out.map(_.getAs[Long]("n_days")).sum
    val distinctDays = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS d").distinct().count()
    assert(nDays == distinctDays)
    // n_days-weighted mean of the index is 1 by construction:
    // Σ n_d·idx_d / n_total = Σ n_d·avg_d / (n_total·overall) = 1
    val weighted = out.map(r =>
      r.getAs[Double]("seasonality_idx") * r.getAs[Long]("n_days")).sum / nDays
    assert(math.abs(weighted - 1.0) < 1e-9, s"weighted idx mean $weighted")
    out.foreach(r => assert(r.getAs[Double]("seasonality_idx") > 0.5
      && r.getAs[Double]("seasonality_idx") < 1.5))
  }
}
