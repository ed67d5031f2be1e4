package graft

import graft.core.Tables

/** The SQL-text surface: all fixture tables registered as views
  * (mirroring how the DuckDB oracle sees them) and queried with plain
  * spark.sql, including graft's registered native functions. */
class SqlSurfaceSpec extends SparkTestBase {

  test("registerAll exposes every fixture table to SQL text") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin).count()
    assert(n == 5)
    assert(spark.sql("SELECT COUNT(*) FROM events").head().getLong(0) > 0)
  }

  test("native functions are callable over registered views") {
    Tables.registerAll(spark, sf)
    val sims = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |LIMIT 10""".stripMargin).collect()
    assert(sims.nonEmpty && sims.forall(r => math.abs(r.getDouble(1)) <= 1.0))
  }

  test("native aggregates are callable from SQL text") {
    Tables.registerAll(spark, sf)
    val hh = spark.sql(
      "SELECT heavy_hitters(event_type, 8) AS c FROM events")
      .head().getSeq[String](0)
    assert(hh.nonEmpty && hh.size <= 8)
    val cms = spark.sql(
      "SELECT cms_estimate(l_suppkey, 1, 4, 1024) AS est FROM lineitem")
      .head().getLong(0)
    assert(cms >= 0)
  }
}
