package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch Q ([[graft.queries.Analytics37]]). */
class Analytics37Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_beta_binomial_eb: shrinkage pulls every rate toward the " +
    "grand mean, small groups hardest") {
    val rows = run("agg_beta_binomial_eb")
    assert(rows.length == 25)
    val mu = rows.map(_.getDouble(3)).sum / rows.length
    rows.foreach { r =>
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(4))
      assert(shrunk >= 0.0 && shrunk <= 1.0)
      // shrunk estimate lies between the raw rate and the pooled mean
      assert((shrunk - raw) * (mu - raw) >= -1e-9,
        s"shrinkage must move toward the prior mean: raw=$raw " +
          s"shrunk=$shrunk mu=$mu")
    }
  }

  test("agg_capture_recapture: Chapman estimate lands within 15% of " +
    "the true closed population") {
    val rows = run("agg_capture_recapture")
    assert(rows.length == 1)
    val r = rows.head
    val (a, b, m, nTrue) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(m <= a && m <= b && a <= nTrue && b <= nTrue)
    val nHat = r.getDouble(4)
    assert(math.abs(nHat - nTrue) / nTrue < 0.15,
      s"estimate $nHat vs true $nTrue")
  }

  test("llm_subsample_frequent: p_keep in (0,1], monotone decreasing " +
    "in frequency, rare words kept whole") {
    val rows = run("llm_subsample_frequent").sortBy(_.getLong(1))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(math.abs(r.getDouble(4) - r.getLong(1) * r.getDouble(3))
        < 1e-6)
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) >= hi.getDouble(3) - 1e-12,
        "keep probability must not increase with frequency")
    }
  }

  test("etl_dedup_survivorship: golden record is the max-balance " +
    "member and groups census the table") {
    val rows = run("etl_dedup_survivorship")
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val n = graft.core.Tables.load(spark, sf, "customer").count()
    assert(total == n, "blocks partition the customer table")
    // recompute the expected winner balance per block independently
    import org.apache.spark.sql.functions._
    val expected = graft.core.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"),
        (regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long") % 50)
          .as("res"),
        col("c_acctbal"), col("c_custkey"))
      .groupBy("c_nationkey", "res")
      .agg(max(col("c_acctbal")).as("max_bal"),
        min(col("c_custkey")).as("min_key"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      val (maxBal, minKey) = expected(key)
      assert(r.getDouble(6) == maxBal, "golden balance is the block max")
      assert(r.getLong(3) == minKey, "canonical key is the block min")
    }
  }
}
