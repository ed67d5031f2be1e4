package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.TopKPerGroup

/** The custom top-k-per-group physical operator: result parity with
  * the window formulation, heap (not sort) plan shape, and exchange
  * reuse. */
class TopKPerGroupSpec extends SparkTestBase {

  private def li = Tables.load(spark, sf, "lineitem")
    .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")

  private val orderCols = Seq(col("l_extendedprice").desc,
    col("l_orderkey").asc, col("l_linenumber").asc)

  test("matches the row_number window formulation exactly") {
    val heap = TopKPerGroup(li, Seq("l_suppkey"), orderCols, 5)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(orderCols: _*)
    val window = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    val a = heap.collect().map(_.mkString("|")).sorted
    val b = window.collect().map(_.mkString("|")).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("plans a bounded heap, not a partition sort") {
    val plan = TopKPerGroup(li, Seq("l_suppkey"), orderCols, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"operator not planned:\n$plan")
    assert(!plan.contains("Sort "),
      s"top-k-per-group must not sort whole partitions:\n$plan")
  }

  test("k larger than every group degrades to identity") {
    val all = TopKPerGroup(li, Seq("l_suppkey"), orderCols, 1000000)
    assert(all.count() == li.count())
  }

  test("requires exactly the groupBy hash exchange (one, reused)") {
    val plan = TopKPerGroup(li, Seq("l_suppkey"), orderCols, 5)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one hash exchange:\n$plan")
  }
}
