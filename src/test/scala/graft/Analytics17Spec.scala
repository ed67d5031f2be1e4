package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 session-4 batch F
  * ([[graft.queries.Analytics17]]). */
class Analytics17Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_mann_kendall: S bounded by the pair count, variance positive") {
    val rows = run("agg_mann_kendall")
    assert(rows.length == 1)
    val r = rows.head
    val n = r.getLong(0); val s = r.getLong(1)
    assert(math.abs(s) <= n * (n - 1) / 2, s"|S|=$s exceeds pair count")
    assert(r.getDouble(2) > 0.0, "variance not positive")
    assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
  }

  test("etl_freshness_sla: watermark source has zero lag, flags consistent") {
    val rows = run("etl_freshness_sla")
    val nTypes = graft.core.Tables.load(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(rows.length == nTypes)
    assert(rows.forall(_.getLong(3) >= 0), "negative lag")
    assert(rows.exists(_.getLong(3) == 0), "no source at the watermark")
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) <= 24)))
  }

  test("llm_hard_negatives: thresholds hold, eval set never mined") {
    val rows = run("llm_hard_negatives")
    assert(rows.nonEmpty)
    val eval = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(eval.contains(r.getLong(0)), "eval_doc_id not in the eval set")
      assert(!eval.contains(r.getLong(2)), "negative drawn from the eval set")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 3)
      assert(r.getDouble(3) >= 0.5, s"rouge1 ${r.getDouble(3)} below floor")
      assert(r.getDouble(4) < 0.3, s"rouge2 ${r.getDouble(4)} above ceiling")
    }
  }
}
