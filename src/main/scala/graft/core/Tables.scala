package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong (see
    // GraftSession) it surfaces as int64 nanos. Convert to TimestampType
    // with integer division — ns epochs (~1.7e18) exceed double's 2^53
    // mantissa, so a floating-point divide would corrupt timestamps.
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every fixture table as a temp view named after the table,
    * mirroring how the DuckDB oracle sees them. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
