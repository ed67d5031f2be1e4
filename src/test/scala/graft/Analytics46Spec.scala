package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch AA ([[graft.queries.Analytics46]]). */
class Analytics46Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("typed_user_stats: the typed mapGroups path equals the " +
    "declarative DataFrame twin row-for-row") {
    import org.apache.spark.sql.functions._
    val typed = run("typed_user_stats")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val df = graft.core.Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).cast("double").as("tv"),
        ((max(expr("unix_micros(ts)")) - min(expr("unix_micros(ts)")))
          .cast("double") / 3600000000.0).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(typed.keySet == df.keySet)
    typed.foreach { case (u, (n, tv, sh)) =>
      val (n2, tv2, sh2) = df(u)
      assert(n == n2 && tv == tv2 && sh == sh2,
        s"user $u typed/DataFrame divergence")
    }
  }

  test("stat_crosstab: melted crosstab equals the groupBy census") {
    import org.apache.spark.sql.functions._
    val ct = run("stat_crosstab")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val gb = graft.core.Tables.load(spark, sf, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ct == gb)
  }
}
