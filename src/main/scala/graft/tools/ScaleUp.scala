package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Generate a ×N scaled copy of a fixture dir by key-shifted
  * replication, preserving referential integrity and per-replica data
  * distribution — the harness behind the measured scaling-curve table
  * in PLANS.md (the 100× story should be evidence, not just plan
  * audits).
  *
  *   runMain graft.tools.ScaleUp <srcDir> <outDir> <factor>
  *
  * Design choices, per table family:
  *  - fact/dim keys get per-replica offsets far above their source
  *    ranges, so joins stay key-correct and per-key group sizes are
  *    UNCHANGED — the workload scales in rows, not in skew;
  *  - nation/region stay fixed (they are constant-size in TPC-H at
  *    every scale factor);
  *  - document text gets a per-replica token suffix for replica > 0,
  *    making replicas lexically disjoint: shingle/minhash/dedup
  *    workloads keep their per-replica duplicate structure instead of
  *    collapsing into 10-way exact-duplicate clusters (which would
  *    inflate LSH pair counts quadratically and measure a DIFFERENT
  *    workload than the generator produces);
  *  - embeddings get a tiny per-replica additive shift so ANN
  *    neighborhoods stay non-degenerate.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = GraftSession.get()
    scale(spark, src, out, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def reps(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
    def shift(c: String, off: Long) =
      (col(c) + col("rep") * off).as(c)
    def write(name: String)(df: DataFrame): Unit = {
      df.drop("rep").write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name done")
    }
    val OK = 10000000L   // orderkey space per replica
    val CK = 1000000L    // custkey
    val SK = 100000L     // suppkey
    val PK = 1000000L    // partkey
    val EV = 100000000L  // event_id
    val UID = 10000000L  // user_id
    val DOC = 10000000L  // doc_id
    val VEC = 10000000L  // vec_id

    write("orders")(reps(Tables.load(spark, src, "orders")).select(
      shift("o_orderkey", OK), shift("o_custkey", CK),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"), col("rep")))
    write("lineitem")(reps(Tables.load(spark, src, "lineitem")).select(
      shift("l_orderkey", OK), shift("l_partkey", PK),
      shift("l_suppkey", SK), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
      col("rep")))
    write("customer")(reps(Tables.load(spark, src, "customer")).select(
      shift("c_custkey", CK), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"), col("rep")))
    write("supplier")(reps(Tables.load(spark, src, "supplier")).select(
      shift("s_suppkey", SK), col("s_name"), col("s_nationkey"),
      col("s_acctbal"), col("rep")))
    write("part")(reps(Tables.load(spark, src, "part")).select(
      shift("p_partkey", PK), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"), col("rep")))
    write("events")(reps(Tables.load(spark, src, "events")).select(
      shift("event_id", EV), col("ts"), shift("user_id", UID),
      col("event_type"), col("value"), col("props"), col("rep")))
    write("documents")(reps(Tables.load(spark, src, "documents"))
      .withColumn("text", when(col("rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("zz"), col("rep"))), " ")))
      .select(shift("doc_id", DOC), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"),
        col("rep")))
    write("embeddings")(reps(Tables.load(spark, src, "embeddings"))
      .select(shift("vec_id", VEC),
        transform(col("embedding"),
          x => x + col("rep").cast("float") * lit(0.001f)).as("embedding"),
        col("label"), col("rep")))
    // constant-size dimensions: straight copy
    Seq("nation", "region").foreach { n =>
      Tables.load(spark, src, n).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
      println(s"[scaleup] $n copied")
    }
  }
}
