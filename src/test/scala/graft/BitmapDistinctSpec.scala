package graft

class BitmapDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("exact distinct over in-range keys, SQL-callable") {
    graft.plans.GraftFunctions.register(spark)
    Seq(1L, 2L, 2L, 3L, 63L, 64L, 65L, 1L).toDF("k")
      .createOrReplaceTempView("graft_bmd_t")
    val n = spark.sql("SELECT bitmap_distinct(k, 1023) FROM graft_bmd_t")
      .head().getLong(0)
    assert(n == 6)
  }

  test("null and out-of-range keys contribute nothing") {
    graft.plans.GraftFunctions.register(spark)
    Seq(Some(5L), None, Some(-1L), Some(2000L), Some(5L))
      .toDF("k").createOrReplaceTempView("graft_bmd_t2")
    val n = spark.sql("SELECT bitmap_distinct(k, 1023) FROM graft_bmd_t2")
      .head().getLong(0)
    assert(n == 1)
  }

  test("negative, oversized, and non-literal maxKey are rejected with clear errors") {
    graft.plans.GraftFunctions.register(spark)
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("graft_bmd_t3")
    val neg = intercept[Exception] {
      spark.sql("SELECT bitmap_distinct(k, -1) FROM graft_bmd_t3").collect()
    }
    assert(neg.getMessage.contains("maxKey"))
    val big = intercept[Exception] {
      spark.sql("SELECT bitmap_distinct(k, 2147483647) FROM graft_bmd_t3").collect()
    }
    assert(big.getMessage.contains("maxKey"))
    val nonLit = intercept[Exception] {
      spark.sql("SELECT bitmap_distinct(k, CAST(k AS INT)) FROM graft_bmd_t3").collect()
    }
    assert(nonLit.getMessage.contains("foldable") ||
      nonLit.getMessage.contains("literal"))
  }

  test("matches countDistinct on fixture data per group") {
    graft.plans.GraftFunctions.register(spark)
    graft.core.Tables.load(spark, sf, "lineitem")
      .createOrReplaceTempView("graft_bmd_li")
    val rows = spark.sql(
      """SELECT l_returnflag,
        |  bitmap_distinct(l_partkey, 1048575) AS bm,
        |  COUNT(DISTINCT l_partkey) AS cd
        |FROM graft_bmd_li GROUP BY l_returnflag""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) == r.getLong(2)))
  }
}
