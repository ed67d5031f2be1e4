package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the round-7 curation operators. */
class CurationSpec extends SparkTestBase {

  test("segment dedup: counts consistent, near-dup docs yield boilerplate") {
    val dir = "/root/testdata/sf0.01"
    val seg = graft.queries.LlmText.segmentDedup(spark, dir)
    // n_segments must equal floor(tokens/10), independently recomputed
    val expected = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (size(split(col("text"), " ")) / 10).cast("long").as("exp_segs"))
      .filter(col("exp_segs") >= 1)
    val joined = seg.join(expected, Seq("doc_id"), "full")
    assert(joined.filter(col("n_segments").isNull ||
      col("exp_segs").isNull ||
      col("n_segments") =!= col("exp_segs")).count() == 0)
    // the fixture's near-dup docs share exact 10-token runs — the
    // corpus-wide frequency pass must surface them
    assert(seg.agg(sum(col("n_boilerplate"))).head().getLong(0) > 0)
    // and tokens_kept is consistent with the counts everywhere
    assert(seg.filter(col("tokens_kept") =!=
      (col("n_segments") - col("n_boilerplate")) * 10).count() == 0)
  }

  test("oov rate: bounded, consistent, and non-trivial at top-20") {
    val df = graft.queries.LlmText.oovRate(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nCov = r.getAs[Long]("n_covered")
      val oov = r.getAs[Double]("oov_rate")
      assert(nCov <= nTok && nCov >= 0)
      assert(oov >= 0.0 && oov <= 1.0)
    }
    // the 31-token fixture vocab truncated to 20 must leave real OOV mass
    assert(rows.exists(_.getAs[Double]("oov_rate") > 0.0))
  }

  test("variant extraction agrees with get_json_object") {
    val dir = "/root/testdata/sf0.001"
    val v = graft.queries.Scalars.jsonVariant(spark, dir)
      .select(col("event_id"), col("k_long"))
    val j = graft.core.Tables.load(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_json"))
    val diff = v.join(j, Seq("event_id"))
      .filter(!(col("k_long") <=> col("k_json")))
    assert(diff.count() == 0)
    assert(v.filter(col("k_long").isNull).count() == 0)
  }
}
