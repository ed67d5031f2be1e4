package graft

import graft.plans.JaroWinklerUtil
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches the published reference values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-10)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-10)
    assert(jw("a", "a") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 1.0)
    // boost only above 0.7: BUILDING/AUTOMOBILE stays at raw Jaro
    assert(math.abs(jw("BUILDING", "AUTOMOBILE") - 0.48333333333333334) < 1e-10)
  }

  test("codegen and interpreted paths agree; SQL-callable; null-safe") {
    graft.plans.GraftFunctions.register(spark)
    Seq(("martha", "marhta"), ("dixon", "dicksonx"), (null, "x"))
      .toDF("a", "b").createOrReplaceTempView("graft_jw_t")
    val rows = spark.sql(
      "SELECT jaro_winkler(a, b) FROM graft_jw_t").collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(rows(1).getDouble(0) - 0.8133333333333332) < 1e-10)
    assert(rows(2).isNullAt(0))
    // interpreted path (no codegen) must agree bit-for-bit
    val interp = new graft.plans.JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal("martha"),
      org.apache.spark.sql.catalyst.expressions.Literal("marhta"))
      .eval(null).asInstanceOf[Double]
    assert(interp == rows(0).getDouble(0))
  }
}
