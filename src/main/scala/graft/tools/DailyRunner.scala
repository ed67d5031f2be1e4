package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** O2 — the engine-side half of the reference's `@daily` Airflow DAG
  * (`stock_scraper_dag.py:10-42`): one scheduled invocation that
  * ingests whatever CSV files have landed since the last run, cleans
  * them with the pinned T1–T6 rules, and refreshes the warehouse
  * table, then exits.
  *
  * Split of responsibilities (the SURVEY §2A boundary, made concrete):
  * the ORCHESTRATOR only says "run once now"; INCREMENTALITY is the
  * engine's — the file source tracks already-seen input files in the
  * streaming checkpoint, `Trigger.AvailableNow` drains exactly the
  * backlog through that checkpointed path and terminates. A crashed
  * run resumes from the checkpoint; a double-fired run is a no-op
  * (zero new files → zero-row batches). That is strictly stronger
  * than the reference's cron semantics, where a re-fire re-scrapes
  * and re-truncates blindly.
  *
  * The documented schedule line (system crontab or any scheduler that
  * can say "run this command daily"):
  *
  * {{{
  * # m h dom mon dow  command            — daily at 00:05 UTC, like the DAG
  * 5 0 * * * spark-submit --class graft.tools.DailyRunner graft.jar \
  *   /data/landing/stock_csv /warehouse/stock_table /warehouse/_ckpt/stock_daily
  * }}}
  *
  * At 100 TB the same three paths point at object storage; nothing in
  * the run is driver-materialized (foreachBatch writes a partitioned
  * overwrite per micro-batch), so the daily increment streams through
  * executors regardless of backlog size.
  */
object DailyRunner {

  /** The landing-zone CSV schema, all-string: typing is [[graft.etl
    * .StockEtl.clean]]'s job (raw layer ≙ pandas object dtype), and a
    * streaming source cannot infer schemas. Header drift (`Vol.`,
    * `Change %`) is canonicalized by clean's drift map, so the schema
    * here names the RAW headers exactly as the reference emits them. */
  private val rawSchema = StructType(Seq(
    "Date", "Price", "Open", "High", "Low", "Vol.", "Change %",
    "stock_name").map(StructField(_, StringType)))

  /** One scheduled run: drain all unseen CSV files under `csvDir`
    * through clean → warehouse refresh, then return (files may be the
    * whole landing zone on day one, one file on a normal day, zero on
    * a double-fire). Returns the number of rows loaded by this run. */
  def runOnce(spark: SparkSession, csvDir: String, tablePath: String,
              checkpointDir: String): Long = {
    var loaded = 0L
    val q = spark.readStream
      .option("header", "true")
      .schema(rawSchema)
      .csv(csvDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit}
        // Unparseable dates get a sentinel partition instead of Hive's
        // default-partition directory — auditable, and the partition
        // column stays non-null for pruning.
        val cleaned = graft.etl.StockEtl.clean(batch)
          .withColumn("Date", coalesce(col("Date"),
            lit("1970-01-01").cast("date")))
          .cache()
        try {
          val n = cleaned.count()
          if (n > 0) {
            // Dynamic partition overwrite by trading date: a daily
            // increment rewrites only the dates it carries — the
            // 100 TB shape of the reference's WRITE_TRUNCATE refresh.
            graft.etl.StockEtl.overwritePartitioned(cleaned, tablePath, "Date")
            loaded += n
          }
        } finally { cleaned.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    loaded
  }

  def main(args: Array[String]): Unit = {
    val Array(csvDir, tablePath, ckpt) = args.take(3)
    val spark = graft.core.GraftSession.get()
    val n = runOnce(spark, csvDir, tablePath, ckpt)
    // The reference's post-load row-count verification (dump_bigq.py:
    // 148-149), as the run's one observable line.
    println(s"""{"daily_run":"ok","rows_loaded":$n,"table":"$tablePath"}""")
    spark.stop()
  }
}
