package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink + catalog surface (reference K1, L1/L2, O3; SURVEY §2B
  * scans/sinks row): header CSV, JSON-lines, parquet, get-or-create
  * warehouse table with full-refresh overwrite, preview. */
object Sinks {

  /** K1: header CSV, UTF-8 (the reference's DictWriter). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("encoding", "UTF-8").csv(path)

  /** JSON-lines sink. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** L1+L2: get-or-create catalog table, then full-refresh load
    * (WRITE_TRUNCATE semantics). Returns post-load count (the
    * reference's num_rows verification, dump_bigq.py:148-149). */
  def overwriteWarehouseTable(df: DataFrame, table: String): Long = {
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
    df.sparkSession.table(table).count()
  }

  /** O3: small preview (the reference's head(3) print). */
  def preview(df: DataFrame, n: Int = 3): Array[org.apache.spark.sql.Row] =
    df.limit(n).collect()
}
