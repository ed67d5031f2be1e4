package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The opt-in optimizer rewrite: `row_number() <= k` window filters
  * become the heap operator when spark.graft.topk.rewrite=true, results
  * unchanged; default-off leaves plans untouched. */
class TopKRewriteSpec extends SparkTestBase {

  private def topkDf = {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    li.withColumn("rn", row_number().over(
        Window.partitionBy("l_suppkey")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))))
      .filter(col("rn") <= 5)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
  }

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.topk.rewrite", on.toString)
    try f finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  test("flag off: the window plan is untouched") {
    val plan = topkDf.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerGroup"),
      s"rewrite fired without opt-in:\n$plan")
  }

  test("flag on: the idiom is rewritten to the heap operator") {
    withFlag(on = true) {
      val plan = topkDf.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("WindowGroupLimit"),
        s"window machinery survived the rewrite:\n$plan")
    }
  }

  test("flag on: results identical to the window formulation") {
    val expected = topkDf.collect().map(_.mkString("|")).sorted
    val got = withFlag(on = true) {
      topkDf.collect().map(_.mkString("|")).sorted
    }
    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("rank column consumed downstream: rewrite must NOT fire") {
    withFlag(on = true) {
      val li = Tables.load(spark, sf, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_extendedprice")
      val withRank = li.withColumn("rn", row_number().over(
          Window.partitionBy("l_suppkey")
            .orderBy(col("l_extendedprice").desc, col("l_orderkey"))))
        .filter(col("rn") <= 5)
      // rn is in the output — dropping it would change results
      val plan = withRank.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerGroup"),
        s"rewrite fired while the rank column is still consumed:\n$plan")
      assert(withRank.columns.contains("rn"))
    }
  }
}
