package graft

/** Executable pins for the plan shapes PLANS.md claims — a regression
  * here means a scale property silently degraded, even if results stay
  * correct. */
class PlanShapeSpec extends SparkTestBase {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_inner_star: all dim joins broadcast, none sort-merge") {
    val p = physical("join_inner_star")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "a star-schema dim join regressed to SortMergeJoin")
  }

  test("stream_static_join: dim side is broadcast") {
    val p = physical("stream_static_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("win_topk_per_group: WindowGroupLimit prunes before the shuffle") {
    val p = physical("win_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      "top-k should plan WindowGroupLimit (k rows per group pre-shuffle)")
  }

  test("q1_agg: ship-date filter is pushed to the parquet scan") {
    val p = physical("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)")
      || p.contains("PushedFilters: [LessThan(l_shipdate")
      || p.contains("l_shipdate"), "no trace of pushdown in scan node")
    assert(p.contains("HashAggregate"), "Q1 should hash-aggregate")
  }

  test("join_interval: bucketed formulation never plans a nested loop") {
    val p = physical("join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"),
      "keyless interval join regressed to a nested loop")
  }

  test("mm_phash_neardup: banded LSH join, never all-pairs") {
    val p = physical("mm_phash_neardup")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      "image near-dup regressed to an all-pairs comparison")
  }

  test("llm_minhash_sigs: signature agg is hash-based, not sort-based") {
    // The graded query serves the staged index memo (a plan-free
    // checkpoint scan), so the aggregate property lives on the BUILD
    // plan — the thing stageIndex actually executes.
    val p = queries.LlmText.minhashSigsBuildPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortAggregate"),
      "numeric band-min regressed to SortAggregate (string agg buffer?)")
  }

  test("scan_partitioned_roundtrip: read side prunes partitions") {
    val p = physical("scan_partitioned_roundtrip")
    assert(p.contains("PartitionFilters: [") &&
      (p.contains("o_orderpriority#") || p.contains("o_orderpriority IN")),
      s"priority predicate did not become a partition filter:\n$p")
  }

  test("staged text queries build the token array once per row") {
    // the round-6 regression class: inlining the split into several
    // consumers (behind `when` guards that defeat codegen CSE) ran it
    // up to ~6x per row. The staged plans must carry exactly ONE
    // split(text ...) across the whole physical tree.
    for (q <- Seq("text_repetition", "text_fingerprint")) {
      val p = physical(q)
      val n = "split\\(text".r.findAllIn(p).size
      assert(n == 1, s"$q evaluates split(text) $n times; expected 1:\n$p")
    }
  }

  test("llm_segment_dedup: boilerplate set joins back as a hash join") {
    val p = physical("llm_segment_dedup")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"), s"no equi-join on digest:\n$p")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("graph_adamic_adar: scoring runs on equi-joins of the checkpointed edges") {
    val p = physical("graph_adamic_adar")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"link-prediction scoring regressed to a non-equi join:\n$p")
  }

  test("llm_rouge_decontam: eval exclusion is a hash anti join, overlap joins equi") {
    // NOT EXISTS on a non-null key must plan LeftAnti hash, not the
    // null-aware BroadcastNestedLoopJoin a NOT IN spelling produces.
    val p = physical("llm_rouge_decontam")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination planned a nested-loop/cartesian:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join for the eval exclusion:\n$p")
  }

  test("llm_cooccurrence: pair generation never goes all-pairs") {
    // the two 1-row normalization cross joins legitimately plan BNLJ;
    // anything beyond that means the (doc_id, pos) equi-join degraded
    // to a per-document token cross product.
    val p = physical("llm_cooccurrence")
    assert(!p.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"$bnlj nested-loop joins (expected ≤2 one-row):\n$p")
  }

  test("etl_late_arriving_dim: both dim lookups broadcast, never shuffled") {
    val p = physical("etl_late_arriving_dim")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dim lookups must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a broadcast-sized dim lookup regressed to a shuffle join")
  }

  test("agg_tukey / agg_winsorized_mean: quartile constants broadcast back") {
    Seq("agg_tukey", "agg_winsorized_mean").foreach { q =>
      val p = physical(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the bounded quantile relation must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("llm_contrastive_pairs: only the bounded negative reservoir nests") {
    // The anchors × 64-candidate product is an intentional bounded
    // BroadcastNestedLoopJoin; a CartesianProduct (or a second NLJ)
    // would mean the pair or anti-join side degraded to all-pairs.
    val p = physical("llm_contrastive_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested loops (expected the 1 bounded reservoir):\n$p")
  }

  test("graph_betweenness: walk expansion is equi-joins on the checkpointed edges") {
    val p = physical("graph_betweenness")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"path enumeration regressed to a non-equi join:\n$p")
  }

  test("scan_csv_multiline: the read side is a whole-file (non-split) scan") {
    // multiLine=true must reach the FileScan options — a split read
    // would corrupt quoted multi-line records.
    val df = SparkEntry.queries("scan_csv_multiline")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FileScan csv"), s"expected a csv scan:\n$p")
  }
}
