package graft

import org.apache.spark.sql.Row

/** Semantic pins for [[graft.sources.MemRowCatalog]] — the DSv2
  * row-level-operations catalog behind `sql_merge_into`. */
class MemRowCatalogSpec extends SparkTestBase {

  private def sql(q: String) = spark.sql(q)

  private def withTable(name: String)(body: => Unit): Unit = {
    spark.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.MemRowCatalog].getName)
    sql(s"DROP TABLE IF EXISTS graft_mem.db.$name")
    try body finally sql(s"DROP TABLE IF EXISTS graft_mem.db.$name")
  }

  private def mkTable(name: String): Unit = {
    sql(s"""CREATE TABLE graft_mem.db.$name
           |  (k BIGINT NOT NULL, status STRING, price DECIMAL(18,4),
           |   version INT)""".stripMargin)
    sql(s"""INSERT INTO graft_mem.db.$name VALUES
           |  (1, 'A', 10.5, 1), (2, 'B', 20.5, 1), (3, 'C', 30.5, 1)
           |""".stripMargin)
  }

  private def contents(name: String): Map[Long, (String, BigDecimal, Int)] =
    sql(s"SELECT * FROM graft_mem.db.$name ORDER BY k").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), BigDecimal(r.getDecimal(2)), r.getInt(3)))).toMap

  test("insert + read roundtrip; truncate-insert-overwrite replaces") {
    withTable("t_rw") {
      mkTable("t_rw")
      assert(contents("t_rw") == Map(
        1L -> (("A", BigDecimal("10.5000"), 1)),
        2L -> (("B", BigDecimal("20.5000"), 1)),
        3L -> (("C", BigDecimal("30.5000"), 1))))
      sql("INSERT OVERWRITE graft_mem.db.t_rw VALUES (9, 'Z', 1.0, 7)")
      assert(contents("t_rw") == Map(9L -> (("Z", BigDecimal("1.0000"), 7))))
    }
  }

  test("MERGE INTO: update, delete, insert, not-matched-by-source, carryover") {
    withTable("t_m") {
      mkTable("t_m")
      sql("""SELECT 2 AS k, CAST(99.9 AS DECIMAL(18,4)) AS price
            |UNION ALL SELECT 3, CAST(0.1 AS DECIMAL(18,4))
            |UNION ALL SELECT 4, CAST(44.4 AS DECIMAL(18,4))
            |""".stripMargin).createOrReplaceTempView("mrc_src")
      sql("""MERGE INTO graft_mem.db.t_m t USING mrc_src s ON t.k = s.k
            |WHEN MATCHED AND s.price > 1 THEN
            |  UPDATE SET price = s.price, status = 'U', version = t.version + 1
            |WHEN MATCHED THEN DELETE
            |WHEN NOT MATCHED THEN
            |  INSERT (k, status, price, version) VALUES (s.k, 'I', s.price, 1)
            |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN UPDATE SET status = 'S'
            |""".stripMargin)
      assert(contents("t_m") == Map(
        1L -> (("S", BigDecimal("10.5000"), 1)),  // stale-marked
        2L -> (("U", BigDecimal("99.9000"), 2)),  // updated
        // 3 deleted (matched, price <= 1)
        4L -> (("I", BigDecimal("44.4000"), 1)))) // inserted
    }
  }

  test("MERGE is atomic per statement: second identical merge is a no-op on versions") {
    withTable("t_i") {
      mkTable("t_i")
      sql("SELECT 2 AS k, CAST(99.9 AS DECIMAL(18,4)) AS price")
        .createOrReplaceTempView("mrc_src2")
      val merge =
        """MERGE INTO graft_mem.db.t_i t USING mrc_src2 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET price = s.price, version = 2
          |""".stripMargin
      sql(merge); sql(merge)
      assert(contents("t_i")(2L) == (("B", BigDecimal("99.9000"), 2)))
      assert(contents("t_i").size == 3)
    }
  }

  test("UPDATE and DELETE statements route through the same delta path") {
    withTable("t_ud") {
      mkTable("t_ud")
      sql("UPDATE graft_mem.db.t_ud SET status = 'X' WHERE k = 2")
      sql("DELETE FROM graft_mem.db.t_ud WHERE k = 3")
      assert(contents("t_ud") == Map(
        1L -> (("A", BigDecimal("10.5000"), 1)),
        2L -> (("X", BigDecimal("20.5000"), 1))))
    }
  }

  test("graded sql_merge_into returns plausible status census at sf0.001") {
    val rows: Array[Row] =
      SparkEntry.queries("sql_merge_into")(spark, sf).collect()
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts & stale-marks must both exist at this sf; every count > 0
    assert(byStatus.contains("I") && byStatus.contains("S"))
    assert(byStatus.values.forall(_ > 0))
  }
}
