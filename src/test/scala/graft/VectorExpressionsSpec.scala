package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.plans.GraftFunctions

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def cosOf(a: Seq[java.lang.Float], b: Seq[java.lang.Float]): Any = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c")).head()
    if (r.isNullAt(0)) null else r.getDouble(0)
  }

  test("cosine: orthogonal, identical, opposite") {
    assert(cosOf(Seq(1f, 0f), Seq(0f, 1f)) == 0.0)
    assert(math.abs(cosOf(Seq(1f, 2f), Seq(1f, 2f)).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(-1f, 0f)).asInstanceOf[Double] + 1.0) < 1e-12)
  }

  test("cosine: zero-norm, length mismatch, null element -> null") {
    assert(cosOf(Seq(0f, 0f), Seq(1f, 2f)) == null)
    assert(cosOf(Seq(1f, 2f, 3f), Seq(1f, 2f)) == null)
    assert(cosOf(Seq(1f, null), Seq(1f, 2f)) == null)
  }

  test("dot product via SQL registration") {
    val out = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)))").head().getDouble(0)
    assert(out == 9.0)
    assert(spark.sql(
      "SELECT dot_product(array(CAST(1 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)))").head().isNullAt(0))
  }

  test("PQ recall is at least IVF's on the ann_recall protocol") {
    // protocol of llm_ann_recall: hits against the exact cosine top-3
    // for queries vec_id < 10 (L2 and cosine ground truths coincide on
    // the near-constant-norm fixture embeddings, so the ADC index is
    // comparable on the same exact set).
    val exact = graft.queries.LlmVectors.cosineTopk(spark, sf)
      .filter(col("rnk") <= 3).select("q_id", "vec_id")
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = exact.join(approx.select("q_id", "vec_id"),
        Seq("q_id", "vec_id"), "left_semi").count()
      hits.toDouble / exact.count()
    }
    val pq = recallOf(graft.queries.LlmVectors.annPq(spark, sf))
    val ivf = recallOf(graft.queries.LlmVectors.annIvf(spark, sf))
    assert(pq >= ivf, s"PQ recall $pq < IVF recall $ivf")
    assert(pq > 0.0)
  }

  test("cosine agrees between codegen and interpreted paths on fixtures") {
    val e = graft.core.Tables.load(spark, sf, "embeddings").limit(50)
    val viaExpr = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => math.round(r.getDouble(0) * 1e9))
    assert(viaExpr.nonEmpty && viaExpr.forall(v => math.abs(v) <= 1e9))
  }
}
