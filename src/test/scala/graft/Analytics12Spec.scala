package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-10 session-4 batch ([[graft.queries.Analytics12]]).
  * Oracle equality is the driver's job; these pin the METRICS' internal
  * invariants — the identities a wrong-but-plausible implementation
  * breaks. */
class Analytics12Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_rolling_beta: full-coverage windows' betas sum to 1") {
    val rows = run("win_rolling_beta")
    assert(rows.nonEmpty)
    // β_i = cov(y_i, x)/var(x) and Σ_i y_i = x, so whenever all five
    // priorities have a full 12-month window over the SAME month set,
    // Σ_i β_i = 1 exactly (up to double arithmetic). Months where any
    // priority is missing (n < 12) don't satisfy the decomposition.
    val full = rows.filter(r => !r.isNullAt(3))
      .groupBy(_.getInt(1))
      .filter { case (_, rs) => rs.length == 5 && rs.forall(_.getLong(2) == 12L) }
    assert(full.nonEmpty, "no month with all five priorities at full window")
    full.foreach { case (mn, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-6, s"betas at mn=$mn sum to $s, not 1")
    }
  }

  test("agg_vol_estimators: non-negative, finite, n_days floor holds") {
    val rows = run("agg_vol_estimators")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5L)
      val pk = r.getDouble(2); val gk = r.getDouble(3)
      assert(pk >= 0.0 && !pk.isNaN && !pk.isInfinite, s"parkinson $pk")
      assert(gk >= 0.0 && !gk.isNaN && !gk.isInfinite, s"garman_klass $gk")
    }
  }

  test("agg_cointegration: ADF gamma sits in the stationary band") {
    val rows = run("agg_cointegration")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0)
    assert(!r.getDouble(1).isNaN, "hedge ratio NaN")
    // γ = Σe₋Δe/Σe₋² = Σe₋e/Σe₋² − 1; the first term is a lag-1
    // autocorrelation-like ratio, so γ ∈ (−2, 0) for any series that
    // is not strongly anti/super-persistent. A sign bug (e.g. Δe
    // direction flipped) lands outside the band.
    val gamma = r.getDouble(3)
    assert(gamma > -2.5 && gamma < 0.5, s"gamma $gamma outside band")
  }

  test("agg_pacf: lag-1 PACF equals lag-1 ACF; correlations bounded") {
    val r = run("agg_pacf").head
    assert(r.getDouble(0) == r.getDouble(3), "pacf1 != rho1")
    (0 to 2).foreach(i =>
      assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-12, s"rho${i + 1} out of [-1,1]"))
  }

  test("agg_ljung_box: Q is cumulative and non-decreasing over lags") {
    val rows = run("agg_ljung_box").sortBy(_.getInt(0))
    assert(rows.length == 7)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) >= a.getDouble(2) - 1e-9,
        s"Q decreased from lag ${a.getInt(0)} to ${b.getInt(0)}")
    }
    assert(rows.head.getDouble(2) >= 0.0)
  }

  test("llm_bpe_train: three merges, monotone counts, merged = pair sans space") {
    val rows = run("llm_bpe_train").sortBy(_.getInt(0))
    assert(rows.length == 3)
    // After merging the argmax pair, every surviving pair's count and
    // every newly created pair's count is bounded by the merged
    // count, so the merge-count sequence is non-increasing.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) <= a.getLong(3), "merge counts not non-increasing")
    }
    rows.foreach { r =>
      val pair = r.getString(1); val merged = r.getString(2)
      assert(pair.contains(" ") && merged == pair.replace(" ", ""))
      assert(merged.length >= 2)
      assert(r.getLong(3) > 0)
    }
  }

  test("llm_dp_histogram: noise bounded by the lattice's inverse CDF range") {
    val rows = run("llm_dp_histogram")
    assert(rows.nonEmpty)
    // u lives on (2k+1)/2^17, so |noise| ≤ ln(2^17) ≈ 11.78 at ε=1.
    rows.foreach { r =>
      val d = math.abs(r.getDouble(2) - r.getLong(1).toDouble)
      assert(d <= 11.79, s"noise $d exceeds the lattice bound")
    }
  }

  test("graph_adamic_adar: score sandwiched by common-neighbor count") {
    val rows = run("graph_adamic_adar")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cn = r.getLong(2); val j = r.getDouble(3); val aa = r.getDouble(4)
      assert(cn >= 1)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j")
      // each AA term is 1/ln(deg z) with deg z in [2, |nations|-1]
      assert(aa <= cn / math.log(2.0) + 1e-6)
      assert(aa >= cn / math.log(25.0) - 1e-6)
    }
  }

  test("sql_pipe_syntax: pipe chain result equals the ANSI spelling") {
    val pipe = run("sql_pipe_syntax").map(_.mkString("|")).sorted.toSeq
    graft.core.Tables.load(spark, sf, "orders")
      .createOrReplaceTempView("graft_pipe_ansi_orders")
    val ansi = spark.sql(
      """SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_pipe_ansi_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY o_orderpriority""".stripMargin)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(pipe == ansi)
  }

  test("scan_metadata_cols: one file per bucket, census covers the table") {
    val rows = run("scan_metadata_cols")
    assert(rows.length == 4)
    assert(rows.forall(_.getLong(2) == 1L), "a bucket spilled into >1 file")
    val total = rows.map(_.getLong(1)).sum
    val expected = graft.core.Tables.load(spark, sf, "orders").count()
    assert(total == expected, s"per-file counts $total != table rows $expected")
  }
}
