package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (finance-idiomatic "latest right row at-or-before the left
  * row"), composed from built-ins rather than a custom physical operator.
  *
  * Formulation: tag and union both inputs, sort within each key group by
  * time, and carry the last non-null right timestamp forward
  * (`last(..., ignoreNulls).over(unboundedPreceding..current)`).
  *
  * Scale notes (the reason for this shape): a join-then-filter as-of
  * explodes to |left| × |matching rights| intermediate rows before the
  * row_number filter; the union formulation is ONE shuffle on the key
  * columns and linear state — at 100 TB the window's running `last` is a
  * constant-size carry, never a buffered frame. Equal timestamps order
  * the right row first, so "at-or-before" includes exact ties, matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOf {

  /** @param outCol name of the added column holding the as-of matched
    *               right timestamp (null when no right row precedes). */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, outCol: String): DataFrame = {
    val rType = right.schema(rightTs).dataType
    val lt = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
      .withColumn("__r_ts", lit(null).cast(rType))
    val rt = right
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+
        col(rightTs).as("__r_ts")): _*)
      .withColumn("__is_left", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lt.unionByName(rt, allowMissingColumns = true)
      .withColumn(outCol, last(col("__r_ts"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__ts", "__is_left", "__r_ts")
  }
}
