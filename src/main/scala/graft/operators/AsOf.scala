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
      leftTs: String, rightTs: String, outCol: String): DataFrame =
    asOfDirected(left, right, keys, leftTs, rightTs, outCol,
      backward = true)

  /** FORWARD as-of: earliest right row at-or-AFTER each left row —
    * the "next scheduled event" direction (next rebalance after a
    * trade, next deploy after an alert). Same union-and-carry shape
    * as the backward join, traversed in descending time order; ties
    * still match (at-or-after includes equality). */
  def leftAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, outCol: String): DataFrame =
    asOfDirected(left, right, keys, leftTs, rightTs, outCol,
      backward = false)

  /** NEAREST as-of: whichever of the backward/forward matches is
    * closer in absolute time; equidistant ties take the BACKWARD match
    * (pinned — engines disagree on this tie, so the operator decides).
    * Two linear window passes over the same key partitioning — the
    * second pass reuses the first's shuffle output partitioning, so
    * the marginal cost is one more in-partition sort, not a shuffle. */
  def leftAsOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, outCol: String): DataFrame = {
    val taken = (left.columns ++ right.columns).toSet + outCol
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!taken.contains(_)).get
    val backC = fresh("__back"); val fwdC = fresh("__fwd")
    val withBoth = leftAsOfForward(
      leftAsOf(left, right, keys, leftTs, rightTs, backC),
      right, keys, leftTs, rightTs, fwdC)
    def us(c: String) = unix_micros(col(c))
    withBoth
      .withColumn(outCol,
        when(col(backC).isNull, col(fwdC))
          .when(col(fwdC).isNull, col(backC))
          .when(us(leftTs) - us(backC) <= us(fwdC) - us(leftTs), col(backC))
          .otherwise(col(fwdC)))
      .drop(backC, fwdC)
  }

  private def asOfDirected(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String, outCol: String,
      backward: Boolean): DataFrame = {
    // Helper columns must not collide with user columns on either input
    // (withColumn would silently REPLACE them and the final drop would
    // remove the user's data) — pick the first unused suffixed names.
    val taken = (left.columns ++ right.columns).toSet + outCol
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!taken.contains(_)).get
    val tsC = fresh("__ts"); val sideC = fresh("__is_left")
    val rtsC = fresh("__r_ts")
    val rType = right.schema(rightTs).dataType
    val lt = left
      .withColumn(tsC, col(leftTs))
      .withColumn(sideC, lit(1))
      .withColumn(rtsC, lit(null).cast(rType))
    val rt = right
      .select((keys.map(col) :+ col(rightTs).as(tsC) :+
        col(rightTs).as(rtsC)): _*)
      .withColumn(sideC, lit(0))
    // Backward scans time ascending (carry the latest right row seen);
    // forward scans descending (carry the earliest right row still
    // ahead). Right-before-left on equal timestamps in BOTH directions
    // keeps ties matching ("at-or-before" / "at-or-after").
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (backward) col(tsC).asc else col(tsC).desc,
        col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lt.unionByName(rt, allowMissingColumns = true)
      .withColumn(outCol, last(col(rtsC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .drop(tsC, sideC, rtsC)
  }
}
