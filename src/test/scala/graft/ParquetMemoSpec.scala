package graft

/** The parquet-backed staging mode (r15 stretch): with
  * graft.memo.parquet=1 (or SPARK_GRAFT_MEMO_PARQUET=1) the shared
  * index memos materialize as local parquet tables instead of
  * localCheckpoint blocks — the real-cluster shape (a shared index is
  * a TABLE on storage, not cached executor heap) and the host-noise
  * control for the staging step. The mode must be result-identical to
  * the checkpoint mode for every memo consumer. */
class ParquetMemoSpec extends SparkTestBase {

  private val consumers = Seq(
    "llm_minhash_sigs", "llm_minhash_neardup", "llm_dedup_clusters",
    "llm_substring_runs", "llm_ngram_jaccard", "llm_stage_index")

  test("parquet-staged memos are result-identical to checkpoint-staged") {
    val before = consumers.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().toSet
    }
    graft.queries.LlmText.releaseMemo(spark)
    sys.props("graft.memo.parquet") = "1"
    try {
      before.foreach { case (n, expected) =>
        val got = SparkEntry.queries(n)(spark, sf).collect().toSet
        assert(got == expected, s"$n differs under parquet staging")
      }
      // the staged relations really are parquet files on scratch
      val dirs = Option(new java.io.File(
        System.getProperty("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft-memo-"))
      assert(dirs.exists(d => Option(d.listFiles()).exists(_.nonEmpty)),
        "no parquet memo directory was written")
    } finally {
      sys.props.remove("graft.memo.parquet"): Unit
      // drop the parquet-backed memos (and their files) so later
      // suites rebuild in the default checkpoint mode
      graft.queries.LlmText.releaseMemo(spark)
    }
  }
}
