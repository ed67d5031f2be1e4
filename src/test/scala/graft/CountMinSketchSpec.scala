package graft

class CountMinSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("never underestimates, and stays within the collision bound") {
    graft.plans.GraftFunctions.register(spark)
    val n = 5000
    // skewed multiset: key k appears (k % 20) + 1 times
    val data = (0 until n).flatMap(k => Seq.fill(k % 20 + 1)(k.toLong))
    data.toDF("k").repartition(8).createOrReplaceTempView("graft_cms_t")
    for (probe <- Seq(0L, 19L, 4999L)) {
      val exact = data.count(_ == probe)
      val est = spark.sql(
        s"SELECT cms_estimate(k, $probe, 4, 2048) FROM graft_cms_t")
        .head().getLong(0)
      assert(est >= exact, s"probe $probe: est $est < exact $exact")
      assert(est <= exact + 8.0 * data.size / 2048,
        s"probe $probe: est $est too far above exact $exact")
    }
  }

  test("deterministic across repartitionings (merge order independent)") {
    graft.plans.GraftFunctions.register(spark)
    val data = (0 until 2000).map(k => (k % 37).toLong)
    def run(parts: Int): Long = {
      data.toDF("k").repartition(parts)
        .createOrReplaceTempView("graft_cms_t2")
      spark.sql("SELECT cms_estimate(k, 5, 4, 1024) FROM graft_cms_t2")
        .head().getLong(0)
    }
    assert(run(1) == run(13))
  }

  test("invalid depth/width and non-literal args are rejected") {
    graft.plans.GraftFunctions.register(spark)
    Seq(1L).toDF("k").createOrReplaceTempView("graft_cms_t3")
    val badDepth = intercept[Exception] {
      spark.sql("SELECT cms_estimate(k, 1, 0, 1024) FROM graft_cms_t3").collect()
    }
    assert(badDepth.getMessage.contains("depth"))
    val nonLit = intercept[Exception] {
      spark.sql("SELECT cms_estimate(k, k, 4, 1024) FROM graft_cms_t3").collect()
    }
    assert(nonLit.getMessage.contains("literal"))
  }
}
