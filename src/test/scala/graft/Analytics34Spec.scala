package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for round-11 batch N ([[graft.queries.Analytics34]]). */
class Analytics34Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("etl_psi_drift: smoothed distributions each sum to ~1 and the " +
    "PSI is small for a stationary value stream") {
    val rows = run("etl_psi_drift")
    assert(rows.length == 10, "all 10 bins present on this fixture")
    val pSum = rows.map(_.getDouble(3)).sum
    val qSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(pSum - 1.0) < 1e-9 && math.abs(qSum - 1.0) < 1e-9)
    val psi = rows.map(_.getDouble(5)).sum
    assert(psi >= 0.0, "PSI is a divergence — nonnegative")
    assert(psi < 0.25, s"stationary fixture should not flag drift: $psi")
  }

  test("etl_write_audit_publish: audits pass and publish equals stage") {
    val rows = run("etl_write_audit_publish")
    assert(rows.length == 25)
    assert(rows.forall(_.getBoolean(3)), "all audits green on full load")
    val total = rows.map(_.getLong(1)).sum
    val expected = graft.core.Tables.load(spark, sf, "orders").count()
    assert(total == expected, "published rows census every order")
  }

  test("etl_write_audit_publish: a failing audit blocks publication " +
    "entirely (zero rows, not partial)") {
    // drop one nation's orders: completeness (25 nations) must fail
    val rows = graft.queries.Analytics34.writeAuditPublish(spark, sf,
      col("c_nationkey") =!= 0).collect()
    assert(rows.isEmpty, "WAP must publish nothing when any audit fails")
  }

  test("llm_mmr_rerank: three distinct picks per query; the first " +
    "pick is the bucket's most similar candidate") {
    val rows = run("llm_mmr_rerank")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rs.map(_.getLong(2)).distinct.length == 3,
        "MMR never re-selects")
    }
    // scores are 0.7·cos − 0.3·cos-combinations: bounded by [−1, 1]
    // (the penalty can RAISE a score when bucket-mates anti-correlate,
    // so rank-1 does not dominate — that's MMR working, not a bug)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1.0 - 1e-12 && r.getDouble(3) <= 1.0 + 1e-12)
    }
  }

  test("win_sax: one word per user, alphabet a-d, length = ceil(n/8)") {
    val rows = run("win_sax")
    assert(rows.nonEmpty)
    val counts = graft.core.Tables.load(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (uid, nSegs, word) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(word.length == nSegs)
      assert(nSegs == (counts(uid) + 7) / 8)
      assert(word.forall(c => c >= 'a' && c <= 'd'))
    }
    assert(rows.exists(_.getString(2).toSet.size > 1),
      "a volatile series must use more than one symbol")
  }
}
