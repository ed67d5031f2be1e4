package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family's named
  * queries; `oracleSql` their DuckDB twins (identical column names and
  * canonicalization — see graft.queries.Relational's determinism notes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_inner_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.ScaleOps.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Analytics2.queries ++
      graft.queries.Analytics3.queries ++
      graft.queries.Analytics4.queries ++
      graft.queries.Analytics5.queries ++
      graft.queries.Analytics6.queries ++
      graft.queries.Analytics7.queries ++
      graft.queries.Analytics8.queries ++
      graft.queries.Analytics9.queries ++
      graft.queries.Analytics10.queries ++
      graft.queries.Analytics11.queries ++
      graft.queries.Analytics12.queries ++
      graft.queries.Analytics13.queries ++
      graft.queries.Analytics14.queries ++
      graft.queries.Analytics15.queries ++
      graft.queries.Analytics16.queries ++
      graft.queries.Analytics17.queries ++
      graft.queries.Analytics18.queries ++
      graft.queries.Analytics19.queries ++
      graft.queries.Analytics20.queries ++
      graft.queries.Analytics21.queries ++
      graft.queries.Analytics22.queries ++
      graft.queries.Analytics23.queries ++
      graft.queries.Analytics24.queries ++
      graft.queries.Analytics25.queries ++
      graft.queries.Analytics26.queries ++
      graft.queries.Analytics27.queries ++
      graft.queries.Analytics28.queries ++
      graft.queries.Analytics29.queries ++
      graft.queries.Analytics30.queries ++
      graft.queries.Analytics31.queries ++
      graft.queries.Analytics32.queries ++
      graft.queries.Analytics33.queries ++
      graft.queries.Analytics34.queries ++
      graft.queries.Analytics35.queries ++
      graft.queries.Analytics36.queries ++
      graft.queries.Analytics37.queries ++
      graft.queries.Analytics38.queries ++
      graft.queries.Analytics39.queries ++
      graft.queries.Analytics40.queries ++
      graft.queries.Analytics41.queries ++
      graft.queries.Analytics42.queries ++
      graft.queries.Analytics43.queries ++
      graft.queries.Analytics44.queries ++
      graft.queries.Analytics45.queries ++
      graft.queries.Analytics46.queries ++
      graft.queries.Analytics47.queries ++
      graft.queries.Analytics48.queries ++
      graft.queries.Analytics49.queries ++
      graft.queries.Analytics50.queries ++
      graft.queries.Analytics51.queries ++
      graft.queries.Analytics52.queries ++
      graft.queries.Analytics53.queries ++
      graft.queries.Analytics54.queries ++
      graft.queries.Analytics55.queries ++
      graft.queries.Analytics56.queries ++
      graft.queries.Analytics57.queries ++
      graft.queries.Analytics58.queries ++
      graft.queries.Analytics59.queries ++
      graft.queries.Analytics60.queries ++
      graft.queries.Analytics61.queries ++
      graft.queries.Analytics62.queries ++
      graft.queries.Scalars.queries ++
      graft.etl.StockEtl.queries ++
      graft.udf.Udfs.queries ++
      graft.queries.LlmText.queries ++
      graft.queries.LlmVectors.queries ++
      graft.streaming.StreamingOps.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.streaming.StatefulOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Advanced.oracle ++
      graft.queries.ScaleOps.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.Analytics2.oracle ++
      graft.queries.Analytics3.oracle ++
      graft.queries.Analytics4.oracle ++
      graft.queries.Analytics5.oracle ++
      graft.queries.Analytics6.oracle ++
      graft.queries.Analytics7.oracle ++
      graft.queries.Analytics8.oracle ++
      graft.queries.Analytics9.oracle ++
      graft.queries.Analytics10.oracle ++
      graft.queries.Analytics11.oracle ++
      graft.queries.Analytics12.oracle ++
      graft.queries.Analytics13.oracle ++
      graft.queries.Analytics14.oracle ++
      graft.queries.Analytics15.oracle ++
      graft.queries.Analytics16.oracle ++
      graft.queries.Analytics17.oracle ++
      graft.queries.Analytics18.oracle ++
      graft.queries.Analytics19.oracle ++
      graft.queries.Analytics20.oracle ++
      graft.queries.Analytics21.oracle ++
      graft.queries.Analytics22.oracle ++
      graft.queries.Analytics23.oracle ++
      graft.queries.Analytics24.oracle ++
      graft.queries.Analytics25.oracle ++
      graft.queries.Analytics26.oracle ++
      graft.queries.Analytics27.oracle ++
      graft.queries.Analytics28.oracle ++
      graft.queries.Analytics29.oracle ++
      graft.queries.Analytics30.oracle ++
      graft.queries.Analytics31.oracle ++
      graft.queries.Analytics32.oracle ++
      graft.queries.Analytics33.oracle ++
      graft.queries.Analytics34.oracle ++
      graft.queries.Analytics35.oracle ++
      graft.queries.Analytics36.oracle ++
      graft.queries.Analytics37.oracle ++
      graft.queries.Analytics38.oracle ++
      graft.queries.Analytics39.oracle ++
      graft.queries.Analytics40.oracle ++
      graft.queries.Analytics41.oracle ++
      graft.queries.Analytics42.oracle ++
      graft.queries.Analytics43.oracle ++
      graft.queries.Analytics44.oracle ++
      graft.queries.Analytics45.oracle ++
      graft.queries.Analytics46.oracle ++
      graft.queries.Analytics47.oracle ++
      graft.queries.Analytics48.oracle ++
      graft.queries.Analytics49.oracle ++
      graft.queries.Analytics50.oracle ++
      graft.queries.Analytics51.oracle ++
      graft.queries.Analytics52.oracle ++
      graft.queries.Analytics53.oracle ++
      graft.queries.Analytics54.oracle ++
      graft.queries.Analytics55.oracle ++
      graft.queries.Analytics56.oracle ++
      graft.queries.Analytics57.oracle ++
      graft.queries.Analytics58.oracle ++
      graft.queries.Analytics59.oracle ++
      graft.queries.Analytics60.oracle ++
      graft.queries.Analytics61.oracle ++
      graft.queries.Analytics62.oracle ++
      graft.queries.Scalars.oracle ++
      graft.etl.StockEtl.oracle ++
      graft.udf.Udfs.oracle ++
      graft.queries.LlmText.oracle ++
      graft.queries.LlmVectors.oracle ++
      graft.streaming.StreamingOps.oracle ++
      graft.multimodal.Multimodal.oracle ++
      graft.streaming.StatefulOps.oracle
}
