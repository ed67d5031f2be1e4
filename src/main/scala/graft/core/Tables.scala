package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (TESTDATA.md).
  *
  * All fixture access goes through here so that scan-level concerns
  * (format, future bucketing/partitioning of a materialized layout)
  * live in one place. At 100 TB these would be partitioned/bucketed
  * catalog tables; the API shape (name -> DataFrame) is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view named after the table,
    * mirroring how the DuckDB oracle sees them. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
