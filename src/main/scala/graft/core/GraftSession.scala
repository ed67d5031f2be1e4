package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory: every entry point (Verify, Bench, tests) builds its
  * session here so semantics/config are pinned in one place.
  *
  * - ansi=false: failed casts produce null, matching the reference's
  *   null-on-unparseable rules (`dump_bigq.py:84-86`) and the DuckDB
  *   oracle's TRY_CAST.
  * - UTC session timezone: oracle parity for date/timestamp math.
  * - AQE on: runtime coalescing + skew-join handling — the local[N]
  *   stand-in for what a 1000-executor cluster needs even more.
  * - shuffle.partitions sized to cores, not the 200 default (local mode).
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // The driver fixtures write events.ts as parquet TIMESTAMP(NANOS),
      // which vanilla Spark 4.x rejects (PARQUET_TYPE_ILLEGAL). Read the
      // raw int64 nanos and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Always scan bucketed tables bucketed: the DisableUnnecessary-
      // BucketedScan rule only weighs interesting-distribution reuse,
      // not bucket PRUNING, so a key-probe on a bucketed table would
      // otherwise read every bucket (see scan_bucket_pruned).
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // Write-side defaults for the 100 TB layout: zstd parquet (best
      // scan-cost/size tradeoff for cold data) — readers are unaffected.
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def get(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    spark
  }
}
