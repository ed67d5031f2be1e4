package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-only bridge: materialize a logical SUBPLAN (e.g. one side of a
  * join harvested from an optimized plan) back into a DataFrame so the
  * plan-shape censuses can MEASURE properties of join inputs (row
  * counts, key cardinalities) instead of guessing them from expression
  * syntax. Lives in an org.apache.spark.sql subpackage purely to reach
  * the private[sql] Dataset.ofRows; nothing in src/main uses this.
  */
object PlanDf {
  def ofRows(s: SparkSession, p: LogicalPlan): DataFrame =
    Dataset.ofRows(s.asInstanceOf[ClassicSession], p)
}
