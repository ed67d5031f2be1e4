package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (left outer): for every left row, the LAST right
  * row with the same key and `rightTime <= leftTime` — the second
  * whole-operator (plan → strategy → exec) node after
  * [[TopKPerGroupPlan]], registered through [[GraftExtensions]].
  *
  * WHY a custom operator: Spark has no as-of join. The compositional
  * fallback ([[graft.operators.AsOf]]) unions both sides and runs a
  * `last(_, ignoreNulls)` window — correct and one shuffle, but it
  * drags every left row through the window machinery, can only carry
  * ONE right column per window pass (k payload columns = k window
  * expressions), and materializes the union. This exec is the classic
  * merge formulation (pandas merge_asof / DuckDB ASOF JOIN / kdb aj):
  * both sides hash-clustered on the key and sorted by (key, time)
  * inside each partition, then a single streaming merge with O(1)
  * state — one remembered right row per in-flight group. At 100 TB the
  * exchange is the same one a sort-merge join would pay; the merge
  * itself is a linear scan with no buffered frame, and the full right
  * payload rides along for free.
  *
  * SQL-equality semantics: rows whose key (either side) contains a
  * null never match — same as `l.k = r.k` in DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`; a null time on
  * either side also never matches. Ties (`rightTime == leftTime`)
  * DO match ("at-or-before").
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // The same contract SortMergeJoin declares: both sides clustered on
  // their keys (EnsureRequirements co-partitions them into one
  // compatible HashPartitioning) and sorted by (key, time) — so the
  // per-partition merge below sees both streams grouped and
  // time-ordered.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)) ::
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // Left rows stream through in their sorted order.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeysB = leftKeys; val rKeysB = rightKeys
    val lTimeB = leftTime; val rTimeB = rightTime
    val lOut = left.output; val rOut = right.output
    val outB = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val tsOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outB, lOut ++ rOut)
      val rBuf = rIter.buffered

      var curKey: UnsafeRow = null      // current left group key (copied)
      var lastMatch: InternalRow = null // best right row so far for curKey
      lIter.map { l =>
        val lk = lKeyProj(l)
        if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
          curKey = lk.copy(); lastMatch = null
          // Drop right groups we've merged past (nulls sort first, so a
          // leading null-key right block is consumed here, unmatched).
          while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), curKey) < 0)
            rBuf.next()
        }
        if (!curKey.anyNull) {
          val lt = lTsProj(l).copy() // lTsProj's buffer survives the loop
          if (!lt.isNullAt(0)) {
            var advance = true
            while (advance && rBuf.hasNext &&
                keyOrd.compare(rKeyProj(rBuf.head), curKey) == 0) {
              val rts = rTsProj(rBuf.head)
              if (rts.isNullAt(0)) rBuf.next() // null time: never a match
              else if (tsOrd.compare(rts, lt) <= 0) lastMatch = rBuf.next().copy()
              else advance = false
            }
          }
        }
        outProj(joined(l,
          if (lastMatch == null || curKey.anyNull) nullRight else lastMatch))
      }
    }
  }
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** Left as-of join: all left columns plus all right columns from the
    * latest right row at-or-before the left row's time (nulls when no
    * such row). Right-side columns keep their names — disambiguate
    * before calling if they collide with left names. */
  def apply(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // A self-join (both frames from one scan) repeats attribute ids
    // across sides; re-aliasing every right column mints fresh ids.
    val rPlan0 = right.queryExecution.analyzed
    val rDf =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        right.select(right.columns.map(c =>
          org.apache.spark.sql.functions.col(c).as(c)).toIndexedSeq: _*)
      else right
    val rPlan = rDf.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftshims.DatasetShim.ofRows(left.sparkSession,
      AsOfJoinPlan(
        leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
        resolve(lPlan, leftTs), resolve(rPlan, rightTs), lPlan, rPlan))
  }
}
