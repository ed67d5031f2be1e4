package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The range-bucketed two-pass high-water mark in
  * [[graft.streaming.StreamingOps.latenessProfile]] must equal the
  * naive un-partitioned prefix max it replaced (the naive form is a
  * single-task global sort — fine as a tiny-data oracle, wrong as the
  * production plan). */
class LatenessProfileSpec extends SparkTestBase {

  test("two-pass bucketed prefix max equals the naive global window") {
    val e = core.Tables.load(spark, sf, "events")
    val twoPass = streaming.StreamingOps.latenessProfile(e)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val w = Window.orderBy("arrival", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = e.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("arrival", md5(col("event_id").cast("string")))
      .withColumn("hwm", max(col("us")).over(w))
      .withColumn("late_bucket",
        expr("""CASE WHEN (hwm - us) div 1000000 < 1 THEN 0
               |     WHEN (hwm - us) div 1000000 < 10 THEN 1
               |     WHEN (hwm - us) div 1000000 < 100 THEN 2
               |     WHEN (hwm - us) div 1000000 < 1000 THEN 3
               |     WHEN (hwm - us) div 1000000 < 10000 THEN 4
               |     ELSE 5 END""".stripMargin))
      .groupBy("late_bucket")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(twoPass === naive && twoPass.nonEmpty)
  }

  test("plan has no un-partitioned window over the events table") {
    val e = core.Tables.load(spark, sf, "events")
    val plan = streaming.StreamingOps.latenessProfile(e)
      .queryExecution.optimizedPlan
    // Every window over the big table must carry partition keys; the
    // only global (partition-free) window runs over the 16-row bucket
    // summary, whose child is an Aggregate.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    plan.foreach {
      case win: LW if win.partitionSpec.isEmpty =>
        val overSummary = win.child.collectFirst {
          case _: Aggregate => true }.getOrElse(false)
        assert(overSummary,
          s"un-partitioned window over non-aggregated input:\n$win")
      case _ =>
    }
  }
}
