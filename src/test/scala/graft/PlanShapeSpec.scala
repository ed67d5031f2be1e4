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

  test("join_interval: sweep-line counting, no pair enumeration") {
    // The r12 shape equi-joined points × exploded windows — bounded
    // per bucket, but the PAIR STREAM is inherently quadratic when
    // events densify over a fixed span (measured 15.1× on 10× data).
    // The sweep shape: one partitioned running-sum window over the
    // merged boundary/point stream, plus the device's single BOUNDED
    // nested loop (the ≤1025-row bucket-histogram triangular offset
    // join — broadcast, O(G²) on G=1024 rows, data-independent).
    val p = physical("join_interval")
    assert(!p.contains("CartesianProduct"))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested loops (expected the 1 bounded " +
      s"histogram-offset join):\n$p")
    assert(p.contains("Window"), "sweep-line running sum missing")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a data×data join reappeared in the counting path:\n$p")
  }

  test("join_range: pair fan-out is bucket-bounded (compound equi key)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("join_range")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "join_range lost its join?")
    val cond = joins.head.condition.map(_.toString).getOrElse("")
    assert(cond.contains("a_bkt") && cond.contains("b_bkt"),
      s"range join lost its 10-minute-bucket equi key (per-key " +
        s"quadratic fan-out under skew):\n$cond")
    val p = physical("join_range")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"))
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
    // llm_decontaminate (an r14 staging site) is since r15 a pure
    // consumer of the staged shingle index: its graded plan must carry
    // NO text split at all — a split reappearing means it stopped
    // riding the index and went back to scanning the corpus per branch.
    val pd = physical("llm_decontaminate")
    val nd = "split\\(text".r.findAllIn(pd).size
    assert(nd == 0,
      s"llm_decontaminate evaluates split(text) $nd times; expected 0 " +
        s"(staged-index consumer):\n$pd")
    // The staged-index builds the graded queries consume as checkpoint
    // scans (the r14 interpreted-split regression sites): the property
    // must be pinned on the BUILD plans, like the sigs aggregate above.
    val shpos = queries.LlmText.shinglePositionsBuildPlan(spark, sf)
      .queryExecution.executedPlan.toString
    val nShpos = "split\\(text".r.findAllIn(shpos).size
    assert(nShpos == 1,
      s"shingle_positions build evaluates split(text) $nShpos times; expected 1:\n$shpos")
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

  // -------------------------------------------------------------------
  // Global-window census: an unpartitioned Window forces its WHOLE
  // input through one task, so every graded plan may carry one ONLY
  // over a relation whose cardinality is bounded by something other
  // than the data volume. The allowlist below is exhaustive and each
  // entry names its bound; queries ranking O(data) relations
  // (events_rfm, llm_ccnet_buckets, agg_auc_roc, ...) instead ride
  // graft.operators.ScalableNtile's parallel bucket decomposition and
  // must stay at ZERO. Counts are pinned so a new global window
  // sneaking into an allowlisted query also fails.
  // -------------------------------------------------------------------
  private val boundedGlobalWindows: Map[String, Int] = Map(
    // --- bounded by the CALENDAR (daily-series statistics: the window
    //     input is one row per day, fixed by the fixture's date span,
    //     invariant under row-count scale-up) ---
    "agg_adf_test" -> 1, "agg_anderson_darling" -> 2,
    "agg_binseg_split" -> 1, "agg_cointegration" -> 1,
    "agg_conformal_interval" -> 6, "agg_durbin_watson" -> 1,
    "agg_granger" -> 4, "agg_hurst" -> 2, "agg_newey_west" -> 1,
    "agg_probit_qq" -> 2, "agg_runs_test" -> 3, "agg_sign_test" -> 3,
    "agg_vif" -> 1,
    "agg_wilcoxon_signed_rank" -> 1, "events_bass_diffusion" -> 1,
    "events_ccf" -> 2, "win_frac_diff" -> 1, "win_haar" -> 4,
    "win_seasonal_decompose" -> 2, "win_stl_anomaly" -> 12,
    "win_stl_decompose" -> 6,
    // --- bounded by the VALUE GRID (cumulatives over GROUP BY value
    //     histograms; events.value is a 2-dp grid whose distinct count
    //     saturates — 952/6.6k/17.8k at sf0.001/0.01/0.1) ---
    "agg_decision_stump" -> 2, "agg_dunn_posthoc" -> 2,
    "agg_energy_distance" -> 1, "agg_kruskal_wallis" -> 1,
    "agg_ks_test" -> 2, "agg_mannwhitney" -> 1,
    "agg_qq_two_sample" -> 4, "agg_youden" -> 2,
    "agg_hodges_lehmann" -> 1, // 1000-dollar Walsh-bin histogram
    // --- bounded by a FIXED k (deciles, top-k, lag sets, dims,
    //     bootstrap replicas, duration censuses) ---
    "agg_benford" -> 1, "agg_bh_fdr" -> 3, "agg_cooks_distance" -> 1,
    "agg_fisher_exact" -> 9, "agg_hill_tail" -> 2,
    "agg_kaplan_meier" -> 2, "agg_ljung_box" -> 1, "agg_logrank" -> 1,
    "agg_lorenz_curve" -> 2, "agg_mahalanobis" -> 1,
    "agg_nelson_aalen" -> 2, "agg_poisson_bootstrap" -> 2,
    "etl_surrogate_key" -> 1,
    "events_weibull_fit" -> 2, "llm_bpe_pairs" -> 1,
    "llm_embed_outlier" -> 1, "llm_vocab" -> 1,
    "llm_vocab_coverage" -> 1, "llm_zipf" -> 1,
    "stream_lateness_profile" -> 1,
    // --- inherent to the SEMANTICS (stream-replay arrival order; a
    //     single instrument's tick-chart indicator — per-series
    //     sequential by definition) ---
    "stream_late_drop" -> 1, "win_ichimoku" -> 3)

  test("no graded plan sorts an unbounded relation in one task " +
      "(unpartitioned-Window census)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val k = fn(spark, sf).queryExecution.optimizedPlan
          .collect { case w: LWindow if w.partitionSpec.isEmpty => w }
          .size
        val allowed = boundedGlobalWindows.getOrElse(name, 0)
        if (k != allowed) Some(s"$name: $k global windows (allowed " +
          s"$allowed — if the new one is bounded, justify it in the " +
          "allowlist; if not, use ScalableNtile)")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("scan_csv_multiline: the read side is a whole-file (non-split) scan") {
    // multiLine=true must reach the FileScan options — a split read
    // would corrupt quoted multi-line records.
    val df = SparkEntry.queries("scan_csv_multiline")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FileScan csv"), s"expected a csv scan:\n$p")
  }
}
