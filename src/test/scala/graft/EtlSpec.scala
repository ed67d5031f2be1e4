package graft

import org.apache.spark.sql.functions._

import graft.etl.StockEtl

/** Golden end-to-end: the reference's own stock_data.csv through the
  * full pipeline, checked against facts pinned in FIXTURES.md §1. */
class EtlSpec extends SparkTestBase {

  private lazy val table: org.apache.spark.sql.DataFrame = {
    val target = java.nio.file.Files
      .createTempDirectory("graft_etl_spec").toString + "/stock"
    StockEtl.runPipeline(spark, "/root/reference/stock_data.csv", target)
  }

  test("208 rows, 10 indices, canonical 8-column typed schema") {
    assert(table.count() == 208)
    assert(table.select("stock_name").distinct().count() == 10)
    assert(table.columns.toSeq == StockEtl.canonicalColumns)
    val types = table.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("Date") == "date")
    assert(Seq("Price", "Open", "High", "Low", "Vol", "Change")
      .forall(c => types(c) == "double"))
  }

  test("golden row: Dow Jones Mar 07 2025") {
    val r = table.filter(col("stock_name") === "Dow Jones"
      && col("Date") === lit("2025-03-07").cast("date")).head()
    assert(r.getAs[Double]("Price") == 42801.72)
    assert(r.getAs[Double]("Open") == 42503.07)
    assert(r.getAs[Double]("Vol") == 763440000.0)
    assert(r.getAs[Double]("Change") == 0.52)
  }

  test("null production: 80 empty-Vol rows -> null; no null prices") {
    assert(table.filter(col("Vol").isNull).count() == 80)
    assert(table.filter(col("Price").isNull).count() == 0)
    assert(table.filter(col("Date").isNull).count() == 0)
  }

  test("typed Dataset[StockBar] view agrees with the Column API") {
    val ds = StockEtl.typedBars(spark, "/root/reference/stock_data.csv")
    val typedCount = ds.filter(b => b.Vol.exists(_ > 5e8)).count()
    val colCount = table.filter(col("Vol") > 5e8).count()
    assert(typedCount == colCount && typedCount > 0)
    val dj = ds.filter(_.stock_name == "Dow Jones").collect()
    val djExpected = table.filter(col("stock_name") === "Dow Jones").count()
    assert(dj.length == djExpected && dj.nonEmpty && dj.forall(_.Price.isDefined))
  }

  test("overwrite sink is a full refresh (idempotent re-run)") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_etl_spec2").toString + "/stock"
    // count each run before the next overwrite invalidates its files
    val n1 = StockEtl.runPipeline(spark, "/root/reference/stock_data.csv", target).count()
    val n2 = StockEtl.runPipeline(spark, "/root/reference/stock_data.csv", target).count()
    assert(n1 == 208 && n2 == 208)
  }
}
