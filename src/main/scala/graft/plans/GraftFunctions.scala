package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Runtime registration of graft's native Catalyst expressions so they
  * are callable from SQL text and via `call_function` from the
  * DataFrame API. Idempotent; safe to call once per session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "bitmap_distinct", exprs => BitmapDistinct(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "built-in")
  }

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
}
