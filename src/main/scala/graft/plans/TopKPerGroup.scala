package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-group: logical node → strategy → physical
  * exec, registered through [[GraftExtensions]] — the "(c)" tier of the
  * custom-operator ladder (compose < expression < plan+strategy).
  *
  * WHY a custom operator: the composable formulation
  * (`row_number().over(Window...) <= k`) requires a FULL sort of every
  * partition — O(n log n) comparisons and a sort buffer proportional to
  * the partition. This exec keeps one bounded k-row heap per group —
  * O(n log k) comparisons and memory proportional to groups × k, not to
  * rows. At 100 TB with k=5 that is the difference between sorting the
  * fact table and streaming over it once.
  *
  * The operator declares `ClusteredDistribution(groupExprs)`, so Spark
  * plans the same hash-exchange a groupBy would need — AQE still
  * coalesces/splits it — and nothing else: no sort is requested.
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = order
    val outLocal = child.output
    val kLocal = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, outLocal)
      // BaseOrdering extends Ordering[InternalRow]; scala's PriorityQueue
      // is a max-heap, so the head is the WORST kept row under the
      // requested order — evict it when a better row arrives.
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(orderLocal, outLocal)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Public API: first k rows of each group under `orderBy` (ascending
    * SortOrder unless the Column already carries a direction; make the
    * order TOTAL — include a tiebreak — for deterministic results). */
  def apply(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    // Let the analyzer do Column → catalyst SortOrder resolution: build
    // a throwaway sort, then harvest its fully-analyzed order and child
    // (attribute ids consistent by construction).
    val analyzedSort = df.sort(orderBy: _*).queryExecution.analyzed
    val (order, child) = analyzedSort.collectFirst {
      case s: Sort => (s.order, s.child)
    }.getOrElse(throw new IllegalStateException(
      s"analyzer did not produce a Sort node:\n$analyzedSort"))
    val g = groupCols.map(c => child.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"column $c not in ${child.output.map(_.name)}")))
    org.apache.spark.sql.graftshims.DatasetShim.ofRows(df.sparkSession,
      TopKPerGroupPlan(g, order, k, child))
  }
}
