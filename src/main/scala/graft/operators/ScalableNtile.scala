package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * bucket). Boundaries come from one `approxQuantile` pass, so buckets
  * stay balanced (~n/64 rows) under arbitrary key distributions; a
  * skewed-quantile estimate degrades parallelism, never correctness.
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

  private val B = 64 // quantile buckets; ≤ B-1 boundaries survive dedup

  private val ordC = "__gnt_ord"; private val bC = "__gnt_b"
  private val cC = "__gnt_c"; private val offC = "__gnt_off"
  private val nC = "__gnt_n"; private val rC = "__gnt_r"

  /** Core: appends `__gnt_r` (the global ordinal, LONG) and `__gnt_n`
    * (the per-partition row count, LONG) to `df`.
    *
    * @param orderKey numeric, non-null, ranked ASCENDING — negate it
    *                 for a descending ordinal
    * @param tiebreak completes (orderKey, tiebreak) to a total order —
    *                 required for row_number semantics; pass Nil with
    *                 `useRank = true` for SQL rank() (ties share the
    *                 ordinal of their first row)
    */
  private def ordinal(df: DataFrame, partitionCols: Seq[String],
      orderKey: Column, tiebreak: Seq[Column],
      useRank: Boolean): DataFrame = {
    // One materialization funds all three passes (quantiles, counts,
    // rank) — without it the full upstream lineage (often a join tree)
    // would re-execute per pass. Tiny frames ride the same call.
    val base = df.withColumn(ordC, orderKey.cast("double"))
      .localCheckpoint(true)

    // Monotone bucketing: bucket id = #boundaries <= key. The double
    // cast is lossy above 2^53 but monotone, which is all bucketing
    // needs — the rank below orders by the EXACT key.
    val bounds = base.filter(col(ordC).isNotNull)
      .stat.approxQuantile(ordC, (1 until B).map(_.toDouble / B).toArray,
        0.01)
      .distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(ordC) >= lit(b), 1).otherwise(0)
    }
    val withB = base.withColumn(bC, bucket)

    // Bucket histogram (≤ partitions×B rows). Offsets via a broadcast
    // triangular self-join rather than a window, so the rewritten plan
    // contains NO unpartitioned window at all (PlanShapeSpec pins it).
    val counts = withB.groupBy((partitionCols :+ bC).map(col): _*)
      .agg(count(lit(1)).as(cC))
      .localCheckpoint(true)
    val lower = counts.select(
      partitionCols.map(c => col(c).as(s"__gnt_p_$c")) ++
        Seq(col(bC).as("__gnt_lb"), col(cC).as("__gnt_lc")): _*)
    val offCond = partitionCols.foldLeft(col("__gnt_lb") < col(bC)) {
      (acc, c) => acc && col(c) === col(s"__gnt_p_$c")
    }
    val off = counts.join(broadcast(lower), offCond, "left")
      .groupBy((partitionCols :+ bC).map(col): _*)
      .agg(coalesce(sum("__gnt_lc"), lit(0L)).as(offC))
    val tot = counts.groupBy(partitionCols.map(col): _*)
      .agg(sum(cC).as(nC))
    val meta =
      if (partitionCols.isEmpty) off.crossJoin(tot)
      else off.join(tot, partitionCols)

    // Parallel ordinal: per-bucket window (PARTITIONED by bucket) +
    // broadcast offset of all lower buckets. rank() ties never span a
    // bucket boundary (equal keys share a bucket by monotonicity), so
    // per-bucket rank + offset IS the global rank.
    val w = Window.partitionBy((partitionCols :+ bC).map(col): _*)
      .orderBy(orderKey +: tiebreak: _*)
    val ord = if (useRank) rank() else row_number()
    withB.join(broadcast(meta), partitionCols :+ bC)
      .withColumn(rC, ord.over(w).cast("long") + col(offC))
  }

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
    // NTILE(k) from (rank, n): tiles 1..n%k hold DIV(n,k)+1 rows, the
    // rest DIV(n,k). Pure BIGINT arithmetic — exact on both engines.
    // The ELSE branch divides by DIV(n,k), which is 0 only when
    // n < k — but then n%k = n and every rank takes the THEN branch,
    // and CASE evaluates branches lazily, so ANSI mode never sees a
    // division by zero.
    val tile = expr(
      s"""CASE WHEN $rC <= ($nC % $k) * ($nC DIV $k + 1)
         |  THEN ($rC - 1) DIV ($nC DIV $k + 1) + 1
         |  ELSE ($nC % $k) + ($rC - 1 - ($nC % $k) * ($nC DIV $k + 1))
         |         DIV ($nC DIV $k) + 1
         |END""".stripMargin)
    cleanup(ranked.withColumn(out, tile.cast("long")),
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
}
