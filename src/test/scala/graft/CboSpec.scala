package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer pins: ANALYZE TABLE statistics must actually
  * change plans. Without column stats Spark sizes a filtered table by
  * its file bytes (no selectivity), so a selective filter on a
  * too-big-to-broadcast table still plans a shuffle join; with column
  * stats the estimated post-filter size shrinks below the broadcast
  * threshold and the same query flips to BroadcastHashJoin — the
  * stats-refresh discipline that decides shuffle-vs-broadcast for
  * every dimension-ish table at warehouse scale. */
class CboSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("column statistics flip a selective-filtered join to broadcast") {
    val s = spark
    graft.core.Tables.load(s, "/root/testdata/sf0.01", "orders")
      .write.mode("overwrite").saveAsTable("graft_cbo_orders")
    graft.core.Tables.load(s, "/root/testdata/sf0.01", "lineitem")
      .write.mode("overwrite").saveAsTable("graft_cbo_lineitem")

    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true",
      "spark.sql.statistics.size.autoUpdate.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = s.conf.get(thrKey)
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }

      def buildSide = s.table("graft_cbo_orders")
        .select("o_orderkey", "o_orderstatus")
        .filter(col("o_orderkey") < 100)
      def query() = s.table("graft_cbo_lineitem")
        .join(buildSide, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      // Without column stats the filtered projection is sized by a
      // column-ratio of the FILE bytes (no selectivity); with stats
      // the ~100-of-15000-row range estimate is far smaller. A
      // threshold at half the no-stats estimate separates the two, so
      // ONLY the statistics make the side broadcastable.
      val noStatsEst = buildSide.queryExecution.optimizedPlan
        .stats.sizeInBytes
      s.conf.set(thrKey, (noStatsEst / 2).toString)
      assert(!plan(query()).contains("BroadcastHashJoin"),
        "without column stats the filtered side must not broadcast")

      s.sql("ANALYZE TABLE graft_cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("ANALYZE TABLE graft_cbo_lineitem COMPUTE STATISTICS")
      assert(plan(query()).contains("BroadcastHashJoin"),
        "column stats should shrink the post-filter estimate below the threshold")

      // Same rows either way — the stats change the PLAN, never the data.
      val r = query().collect().map(_.mkString("|")).toSet
      assert(r.nonEmpty)
    } finally {
      s.conf.set(thrKey, prevThr)
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      s.sql("DROP TABLE IF EXISTS graft_cbo_orders")
      s.sql("DROP TABLE IF EXISTS graft_cbo_lineitem")
    }
  }
}
