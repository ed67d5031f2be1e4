package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch V ([[graft.queries.Analytics42]]). */
class Analytics42Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("sql_pivot: SQL-clause spelling equals the DataFrame pivot twin") {
    val sqlRows = run("sql_pivot")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val dfRows = run("agg_pivot")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(sqlRows.sameElements(dfRows))
  }

  test("sql_unpivot: 2 rows per lineitem, both metrics present") {
    val n = graft.core.Tables.load(spark, sf, "lineitem").count()
    val rows = run("sql_unpivot")
    assert(rows.length == 2 * n)
    assert(rows.map(_.getString(2)).toSet ==
      Set("l_quantity", "l_extendedprice"))
  }

  test("etl_dynamic_partition_overwrite: only 1-URGENT changed") {
    import org.apache.spark.sql.functions._
    val src = graft.core.Tables.load(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    run("etl_dynamic_partition_overwrite").foreach { r =>
      val (prio, n, total) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val (sn, st) = src(prio)
      assert(n == sn, s"$prio row count unchanged by the refresh")
      if (prio == "1-URGENT")
        assert(math.abs(total - (st - 10.0 * sn)) < 1e-6)
      else assert(total == st, s"$prio untouched")
    }
  }

  test("etl_vacuum_retention: dead files deleted, live snapshot intact") {
    val r = run("etl_vacuum_retention").head
    assert(r.getLong(0) == 6 && r.getLong(1) == 2)
    assert(r.getBoolean(2), "pre-floor version must be unreadable")
    assert(r.getLong(3) > 0 && !r.isNullAt(4))
  }
}
