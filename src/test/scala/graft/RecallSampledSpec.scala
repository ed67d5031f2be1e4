package graft

import org.apache.spark.sql.Row

/** Semantic pins for the sampled MinHash-recall audit (r15): the
  * production-shape estimator must be internally consistent with the
  * exhaustive audit it approximates — same LSH side, per-probe truth
  * a restriction of the exhaustive truth — and deterministic (the
  * probe draw is md5-ordered, not rand()). */
class RecallSampledSpec extends SparkTestBase {

  private def row(name: String): Row =
    SparkEntry.queries(name)(spark, sf).collect() match {
      case Array(r) => r
      case rs => fail(s"$name returned ${rs.length} rows, expected 1")
    }

  test("llm_minhash_recall_sampled: counts consistent, probes bounded") {
    val r = row("llm_minhash_recall_sampled")
    val nDocs = graft.core.Tables.load(spark, sf, "documents").count()
    assert(r.getAs[Long]("n_probes") == math.min(64L, nDocs),
      "probe draw must be min(k, corpus)")
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"),
      "hits are a subset of per-probe truth")
    val recall = Option(r.getAs[java.lang.Double]("recall"))
    if (r.getAs[Long]("n_truth") > 0) {
      assert(recall.isDefined)
      assert(recall.get >= 0.0 && recall.get <= 1.0 + 1e-12)
    }
  }

  test("llm_minhash_recall_sampled: estimator consistent with the " +
      "exhaustive audit (same LSH side, truth restricted to probes)") {
    val sampled = row("llm_minhash_recall_sampled")
    val full = row("llm_minhash_recall")
    // Per-probe truth counts each true pair once per probe side, so it
    // is bounded by twice the exhaustive truth (both ends probes) and
    // the LSH totals are literally the same relation.
    assert(sampled.getAs[Long]("n_truth") <= 2 * full.getAs[Long]("n_truth"),
      "sampled truth exceeded its per-probe bound")
    // The exhaustive audit pins recall 1.0 at graded scales: with
    // lsh ⊆ truth and every probe-truth pair present in the exhaustive
    // truth, the sampled estimate must then also be 1.0 (or NULL on a
    // truthless draw) — a lower value means the sampled ground truth
    // found a pair the pipeline missed, which the exhaustive audit
    // would have flagged first.
    if (full.getAs[Long]("n_hit") == full.getAs[Long]("n_truth")
        && sampled.getAs[Long]("n_truth") > 0) {
      assert(sampled.getAs[Long]("n_hit") == sampled.getAs[Long]("n_truth"),
        "sampled recall < 1 while the exhaustive audit is at 1.0")
    }
  }

  test("llm_minhash_recall_sampled: deterministic across runs") {
    val a = row("llm_minhash_recall_sampled")
    val b = row("llm_minhash_recall_sampled")
    assert(a == b, s"probe draw not deterministic: $a vs $b")
  }
}
