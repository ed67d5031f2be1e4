package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.CkptTap._

/** Exact global ranking (row_number / rank / ntile) without a
  * corpus-sized single-task window.
  *
  * `rank() OVER (ORDER BY ...)` (and its per-group form whose dominant
  * group is still O(data)) forces the WHOLE ordered relation through
  * ONE task — the classic 100 TB straggler/OOM. But a global ordinal
  * does NOT need a global sort: range-bucket the order key, rank
  * WITHIN each bucket (a partitioned window — parallel), and add the
  * broadcast count of all lower buckets. This is the standard
  * distributed-ranking decomposition (TeraSort's partitioner applied
  * to ranking); CCNet (Wenzek et al. 2020) ships the same idea for its
  * perplexity terciles — cutoffs learned once, applied as comparisons.
  *
  * Exactness does not depend on the bucket boundaries: they only have
  * to be MONOTONE in the order key (any row of a lower bucket sorts
  * strictly before any row of a higher one; ties always share a
  * bucket). Buckets are a 1024-cell min/max grid — one O(1)-output
  * aggregate instead of a quantile sketch (measured: the GK pass cost
  * 2.0 s on 2.9M cached rows where min/max costs 0.25 s). A skewed key
  * distribution concentrates rows in fewer cells, which degrades
  * PARALLELISM only, never correctness; under adversarial skew swap
  * the grid for an approx-quantile boundary pass — same contract.
  *
  * NTILE is then integer arithmetic on (row_number, n, k) —
  * bit-identical to a native NTILE on both engines: the first n%k
  * tiles take DIV(n,k)+1 rows, the rest DIV(n,k).
  *
  * Cost: one quantile pass + one count-by-bucket aggregate (tiny, ≤
  * groups×64 rows, broadcast back) + one partitioned window — every
  * stage parallel, no task ever holds more than one bucket.
  */
object ScalableNtile {

  private val G = 1024 // min/max grid cells (window-partition grain)

  private val ordC = "__gnt_ord"; private val bC = "__gnt_b"
  private val cC = "__gnt_c"; private val offC = "__gnt_off"
  private val nC = "__gnt_n"; private val rC = "__gnt_r"

  /** Grid-bucket expression for key slot `i`: cell over [min, max]
    * (slots 2i / 2i+1 of the min/max row). The double cast is lossy
    * above 2^53 but monotone, which is all bucketing needs — the rank
    * orders by the EXACT key. Degenerate ranges (empty, all-null,
    * constant, non-finite) fall back to one bucket — correct, just
    * unparallel, and only reachable when the relation is all ties
    * anyway. NULL keys get a DEDICATED lowest bucket (-1): native
    * windows rank nulls FIRST under ASC order, and without the
    * carve-out the inner meta join on the (NULL) bucket column would
    * silently DROP null-key rows instead. */
  private def bucketExpr(mm: org.apache.spark.sql.Row, i: Int,
      oc: String): Column = {
    val grid =
      if (mm.isNullAt(2 * i) || mm.isNullAt(2 * i + 1)) lit(0)
      else {
        val lo = mm.getDouble(2 * i); val hi = mm.getDouble(2 * i + 1)
        val w = (hi - lo) / G
        if (!java.lang.Double.isFinite(lo) ||
          !java.lang.Double.isFinite(hi) || !(w > 0)) lit(0)
        else least(lit(G - 1), floor((col(oc) - lit(lo)) / lit(w)))
          .cast("int")
      }
    when(col(oc).isNull, lit(-1)).otherwise(grid)
  }

  /** Multi-key core: appends `__gnt_r_i` (the global ordinal, LONG)
    * and `__gnt_n_i` (the per-partition row count, LONG) per key spec
    * — ONE persisted base and ONE min/max action fund every key's
    * decomposition (the r12 events_rfm lesson: three nested single-key
    * devices persist three progressively wider bases and pay three
    * boundary actions for one logical pass).
    *
    * @param specs (orderKey, tiebreak) per ordinal. orderKey numeric,
    *              ranked ASCENDING — negate it for descending. NULL
    *              keys rank first (native window semantics). tiebreak
    *              completes a total order — required for row_number
    *              semantics; pass Nil with `useRank = true` for SQL
    *              rank() (ties share the ordinal of their first row).
    */
  private def ordinalMulti(df: DataFrame, partitionCols: Seq[String],
      specs: Seq[(Column, Seq[Column])], useRank: Boolean): DataFrame = {
    // One materialization funds all passes (boundaries, counts, rank)
    // — without it the full upstream lineage (often a join tree) would
    // re-execute per pass. persist (not an eager localCheckpoint) so
    // the boundary pass below both computes the min/max AND populates
    // the cache in a single job; the blocks are released by the
    // end-of-run CacheRelease hook like every other cached base.
    val ocs = specs.indices.map(i => s"${ordC}_$i")
    val base = specs.zipWithIndex.foldLeft(df) {
        case (d, ((key, _), i)) => d.withColumn(ocs(i), key.cast("double"))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Boundary discovery: ALL keys' min/max in one O(1)-output
    // aggregate (one job, also populates the cache) instead of a
    // quantile sketch (measured: GK cost 2.0 s on 2.9M cached rows
    // where min/max costs 0.25 s).
    val aggs = ocs.flatMap(oc => Seq(min(col(oc)), max(col(oc))))
    val mm = base.agg(aggs.head, aggs.drop(1): _*).head()
    val withB = specs.indices.foldLeft(base) { (d, i) =>
      d.withColumn(s"${bC}_$i", bucketExpr(mm, i, ocs(i)))
    }

    specs.zipWithIndex.foldLeft(withB) { case (acc, ((key, tie), i)) =>
      val bc = s"${bC}_$i"; val offc = s"${offC}_$i"; val nc = s"${nC}_$i"
      // Bucket histogram (≤ partitions×B rows), computed from the
      // shared bucketed base. Offsets via a broadcast triangular
      // self-join rather than a window, so the rewritten plan contains
      // NO unpartitioned window at all (PlanShapeSpec pins it).
      // counts appears three times below (lower/off/tot) — the
      // subplans are identical, so Spark's ReuseExchange serves all
      // three from one shuffle of the cached base; no checkpoint
      // needed.
      val counts = withB.groupBy((partitionCols :+ bc).map(col): _*)
        .agg(count(lit(1)).as(cC))
      val lower = counts.select(
        partitionCols.map(c => col(c).as(s"__gnt_p_$c")) ++
          Seq(col(bc).as("__gnt_lb"), col(cC).as("__gnt_lc")): _*)
      val offCond = partitionCols.foldLeft(col("__gnt_lb") < col(bc)) {
        (a, c) => a && col(c) === col(s"__gnt_p_$c")
      }
      val off = counts.join(broadcast(lower), offCond, "left")
        .groupBy((partitionCols :+ bc).map(col): _*)
        .agg(coalesce(sum("__gnt_lc"), lit(0L)).as(offc))
      val tot = counts.groupBy(partitionCols.map(col): _*)
        .agg(sum(cC).as(nc))
      val meta =
        if (partitionCols.isEmpty) off.crossJoin(tot)
        else off.join(tot, partitionCols)

      // Parallel ordinal: per-bucket window (PARTITIONED by bucket) +
      // broadcast offset of all lower buckets. rank() ties never span
      // a bucket boundary (equal keys share a bucket by monotonicity),
      // so per-bucket rank + offset IS the global rank.
      val w = Window.partitionBy((partitionCols :+ bc).map(col): _*)
        .orderBy(key +: tie: _*)
      val ord = if (useRank) rank() else row_number()
      acc.join(broadcast(meta), partitionCols :+ bc)
        .withColumn(s"${rC}_$i", ord.over(w).cast("long") + col(offc))
    }
  }

  /** Single-key core (the historical shape): `__gnt_r` / `__gnt_n`. */
  private def ordinal(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column],
      useRank: Boolean): DataFrame =
    ordinalMulti(df, partitionCols, Seq((orderKey, tiebreak)), useRank)
      .withColumnRenamed(s"${rC}_0", rC)
      .withColumnRenamed(s"${nC}_0", nC)

  private def cleanup(df: DataFrame, keep: Seq[String]): DataFrame =
    df.select(keep.map(col): _*)

  /** Appends `out` = ROW_NUMBER() OVER (PARTITION BY `partitionCols`
    * ORDER BY `orderKey` ASC, `tiebreak` ASC) as LONG — planned as the
    * parallel bucket decomposition above, never a single-task sort. */
  def withRowNumber(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column], out: String): DataFrame =
    cleanup(ordinal(df, partitionCols, orderKey, tiebreak, useRank = false)
      .withColumn(out, col(rC)), df.columns.toSeq :+ out)

  /** Appends `out` = RANK() OVER (PARTITION BY `partitionCols` ORDER
    * BY `orderKey` ASC) as LONG (ties share the rank of their first
    * row — SQL rank semantics, gaps after ties). */
  def withRank(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, out: String): DataFrame =
    cleanup(ordinal(df, partitionCols, orderKey, Nil, useRank = true)
      .withColumn(out, col(rC)), df.columns.toSeq :+ out)

  /** Appends `out` = NTILE(`k`) OVER (PARTITION BY `partitionCols`
    * ORDER BY `orderKey` ASC, `tiebreak` ASC) as LONG, and optionally
    * `outN` = the partition row count (for trim-style cutoffs). */
  def withNtile(df: DataFrame, k: Int, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column], out: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ranked = ordinal(df, partitionCols, orderKey, tiebreak,
      useRank = false)
    cleanup(ranked.withColumn(out, tileExpr(rC, nC, k)),
      df.columns.toSeq :+ out)
  }

  /** NTILE(k) from (rank, n): tiles 1..n%k hold DIV(n,k)+1 rows, the
    * rest DIV(n,k). Pure BIGINT arithmetic — exact on both engines.
    * The ELSE branch divides by DIV(n,k), which is 0 only when
    * n < k — but then n%k = n and every rank takes the THEN branch,
    * and CASE evaluates branches lazily, so ANSI mode never sees a
    * division by zero. */
  private def tileExpr(rc: String, nc: String, k: Int): Column =
    expr(
      s"""CASE WHEN $rc <= ($nc % $k) * ($nc DIV $k + 1)
         |  THEN ($rc - 1) DIV ($nc DIV $k + 1) + 1
         |  ELSE ($nc % $k) + ($rc - 1 - ($nc % $k) * ($nc DIV $k + 1))
         |         DIV ($nc DIV $k) + 1
         |END""".stripMargin).cast("long")

  /** Several NTILE(k) columns over DIFFERENT order keys of the same
    * relation in ONE device instantiation: one persisted base, one
    * combined min/max boundary action, then per key a tiny broadcast
    * histogram + one partitioned window. The RFM shape — per-user
    * recency/frequency/monetary quintiles — needs three ordinals of
    * one aggregate; as three nested [[withNtile]] calls it persisted
    * three progressively wider frames and tripled both the cache
    * footprint and the boundary actions.
    *
    * @param specs (orderKey, tiebreak, outputColumn) per quintile */
  def withNtiles(df: DataFrame, k: Int, partitionCols: Seq[String],
      specs: Seq[(Column, Seq[Column], String)]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ranked = ordinalMulti(df, partitionCols,
      specs.map(s => (s._1, s._2)), useRank = false)
    val withTiles = specs.zipWithIndex.foldLeft(ranked) {
      case (d, ((_, _, out), i)) =>
        d.withColumn(out, tileExpr(s"${rC}_$i", s"${nC}_$i", k))
    }
    cleanup(withTiles, df.columns.toSeq ++ specs.map(_._3))
  }

  /** Appends `out` = SUM(`value`) OVER (PARTITION BY `partitionCols`
    * ORDER BY `orderKey`, `tiebreak`) as LONG — the SQL default
    * RANGE-UNBOUNDED-PRECEDING-TO-CURRENT-ROW running sum (peer rows,
    * i.e. ties on the full order, are INCLUDED — deterministic under
    * any tie pattern, unlike a ROWS frame) — planned as the parallel
    * bucket decomposition, never a single-task global window. This is
    * the sweep-line primitive: interval-coverage counting unions
    * (boundary, ±1) deltas with (point, 0) probes and reads coverage
    * off the running sum, turning an O(points × intervals) pair
    * enumeration into one linear pass ([[graft.queries.Relational
    * .joinInterval]]). NULL order keys rank first (native semantics).
    * `value` must be integral; sums accumulate exactly in LONG. */
  def withRunningSum(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column], value: Column,
      out: String): DataFrame = {
    val vC = "__gnt_v"
    val base = df.withColumn(ordC, orderKey.cast("double"))
      .withColumn(vC, value.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mm = base.agg(min(col(ordC)), max(col(ordC))).head()
    val withB = base.withColumn(bC, bucketExpr(mm, 0, ordC))
    // Per-bucket value totals; a bucket's offset = Σ totals of all
    // lower buckets (broadcast triangular join, same shape as the
    // ordinal's count offsets — sums replace counts).
    val sums = withB.groupBy((partitionCols :+ bC).map(col): _*)
      .agg(coalesce(sum(vC), lit(0L)).as(cC))
    val lower = sums.select(
      partitionCols.map(c => col(c).as(s"__gnt_p_$c")) ++
        Seq(col(bC).as("__gnt_lb"), col(cC).as("__gnt_lc")): _*)
    val offCond = partitionCols.foldLeft(col("__gnt_lb") < col(bC)) {
      (a, c) => a && col(c) === col(s"__gnt_p_$c")
    }
    val off = sums.join(broadcast(lower), offCond, "left")
      .groupBy((partitionCols :+ bC).map(col): _*)
      .agg(coalesce(sum("__gnt_lc"), lit(0L)).as(offC))
    // Default (RANGE) frame: peers never span a bucket boundary (equal
    // order keys share a bucket by monotonicity; peers must also agree
    // on the tiebreak, a strictly finer condition), so per-bucket
    // running sum + lower-bucket offset IS the global running sum.
    val w = Window.partitionBy((partitionCols :+ bC).map(col): _*)
      .orderBy(orderKey +: tiebreak: _*)
    cleanup(withB.join(broadcast(off), partitionCols :+ bC)
        .withColumn(out, (coalesce(sum(col(vC)).over(w), lit(0L))
          + col(offC)).cast("long")),
      df.columns.toSeq :+ out)
  }

  /** Appends `out` = ROW_NUMBER() and `outN` = COUNT(*) OVER () as
    * LONGs in one pass — the trim/ECDF shape (`rn` of `n`). The global
    * count rides the same broadcast bucket metadata, not a second
    * unpartitioned window. */
  def withRowNumberAndCount(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column], out: String,
      outN: String): DataFrame =
    cleanup(ordinal(df, partitionCols, orderKey, tiebreak, useRank = false)
      .withColumn(out, col(rC)).withColumn(outN, col(nC)),
      df.columns.toSeq ++ Seq(out, outN))

  /** One row: `avgOut` = AVG(orderKey at ranks (n+1) DIV 2 and
    * (n+2) DIV 2 of the ascending order, i.e. the explicit-middle
    * exact median) and `nOut` = n — by RECURSIVE HISTOGRAM REFINEMENT
    * instead of a full rank. Each level grid-buckets the surviving
    * range into [[G]] cells (a map-side-combined census), locates the
    * cell(s) holding the middle ranks via broadcast cumulative
    * offsets, and recurses INTO those cells with the range rescaled —
    * so after L levels only ~n/G^L rows are sorted (one window over a
    * sliver), no matter how concentrated the key distribution is. A
    * single-level grid is not enough in practice: Theil–Sen slope
    * pairs put ~half the mass in the center cell, and ranking it cost
    * the same as the global sort it replaced. The full relation is
    * scanned per level but NEVER shuffled or globally sorted — the
    * shape a 100 TB exact median needs (`agg_hodges_lehmann`'s
    * dollar-bin refinement, generalized and made recursive). Range
    * state (cell bounds, rank offset) rides IN the group keys, so
    * straddling selections (t1/t2 in different cells) refine each cell
    * independently. Keys must be non-NaN. Ties are safe: equal keys
    * share a cell, and equal ranks select equal values. Empty or
    * all-null input yields the SQL aggregate-over-empty row (NULL avg,
    * NULL n — matching `min(count(*) OVER ())` over an empty
    * relation). */
  def middleTwo(df: DataFrame, orderKey: Column, avgOut: String,
      nOut: String): DataFrame = {
    val sLo = "__gnt_slo"; val sW = "__gnt_sw"; val sOff = "__gnt_soff"
    val base = df.select(orderKey.cast("double").as(ordC))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mm = base.agg(min(col(ordC)), max(col(ordC)),
      count(col(ordC))).head()
    val n = mm.getLong(2)
    if (n == 0L)
      return base.agg(avg(col(ordC)).as(avgOut))
        .withColumn(nOut, lit(null).cast("long"))
    val (t1, t2) = ((n + 1) / 2, (n + 2) / 2)
    val lo = mm.getDouble(0); val hi = mm.getDouble(1)
    val w0 =
      if (java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi)
        && hi - lo > 0) hi - lo
      else 0.0
    var cand = base.filter(col(ordC).isNotNull)
      .withColumn(sLo, lit(lo)).withColumn(sW, lit(w0))
      .withColumn(sOff, lit(0L))
    // G2 cells x 2 levels bound the final sorted sliver at n/G2^2
    // (~60k rows even at 1e12 input). Each level's cell selection is a
    // <=2-row frame, eagerly checkpointed: left lazy, level L's
    // broadcast subtree re-executes every previous level's census per
    // reference and the refinement costs more than the sort it saves.
    val G2 = 4096
    val levels = 2
    for (_ <- 1 to levels) {
      val cw = col(sW) / G2
      val cell = when(col(sW) > 0,
        least(lit(G2 - 1), floor((col(ordC) - col(sLo)) / cw)))
        .otherwise(lit(0)).cast("int")
      val c = cand.withColumn(bC, cell)
      val keys = Seq(sLo, sW, sOff, bC)
      val hist = c.groupBy(keys.map(col): _*).agg(count(lit(1)).as(cC))
      val lower = hist.select(col(sLo).as("__gnt_llo"),
        col(sW).as("__gnt_lw"), col(sOff).as("__gnt_loff"),
        col(bC).as("__gnt_lb"), col(cC).as("__gnt_lc"))
      val cum = hist.join(broadcast(lower),
          col("__gnt_llo") === col(sLo) && col("__gnt_lw") === col(sW) &&
            col("__gnt_loff") === col(sOff) && col("__gnt_lb") < col(bC),
          "left")
        .groupBy((keys :+ cC).map(col): _*)
        .agg((col(sOff) + coalesce(sum("__gnt_lc"), lit(0L))).as("__gnt_abs"))
      val sel = cum
        .filter(col("__gnt_abs") < t2 && col("__gnt_abs") + col(cC) >= t1)
        .select(keys.map(col) :+
          (col(sLo) + col(bC) * (col(sW) / G2)).as("__gnt_nlo") :+
          (col(sW) / G2).as("__gnt_nw") :+ col("__gnt_abs").as("__gnt_noff"): _*)
        .tappedLocalCheckpoint()
      cand = c.join(broadcast(sel), keys)
        .select(col(ordC), col("__gnt_nlo").as(sLo),
          col("__gnt_nw").as(sW), col("__gnt_noff").as(sOff))
    }
    val wnd = Window.partitionBy(col(sLo), col(sW), col(sOff))
      .orderBy(col(ordC))
    cand.withColumn(rC, row_number().over(wnd).cast("long") + col(sOff))
      .filter(col(rC) === t1 || col(rC) === t2)
      .agg(avg(col(ordC)).as(avgOut))
      .withColumn(nOut, lit(n))
  }
}
