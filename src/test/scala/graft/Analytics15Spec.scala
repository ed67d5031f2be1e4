package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 session-4 batch D
  * ([[graft.queries.Analytics15]]). */
class Analytics15Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("agg_pca_power: Rayleigh quotient between trace/16 and trace") {
    val rows = run("agg_pca_power")
    assert(rows.length == 16)
    val lambda = rows.head.getDouble(2)
    // G is PSD with Σλᵢ = trace(G): the dominant eigenvalue lives in
    // [trace/16, trace]. The Rayleigh quotient of the 8-round iterate
    // must already sit in that band (it converges from below).
    val trace = graft.core.Tables.load(spark, sf, "embeddings")
      .select(expr(
        "aggregate(slice(embedding, 1, 16), CAST(0.0 AS DOUBLE)," +
          " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("t"))
      .agg(sum("t")).head().getDouble(0)
    assert(lambda > 0.0)
    assert(lambda <= trace * (1 + 1e-9), s"lambda $lambda above trace $trace")
    assert(lambda >= trace / 16 * (1 - 1e-9),
      s"lambda $lambda below trace/16 ${trace / 16}")
    // L∞ normalization: the largest |loading| is exactly 1
    val maxAbs = rows.map(r => math.abs(r.getDouble(1))).max
    assert(math.abs(maxAbs - 1.0) < 1e-12, s"max |loading| $maxAbs != 1")
  }

  test("graph_random_walk: full walk grid, 4 hops, closed node set") {
    val rows = run("graph_random_walk")
    val types = graft.core.Tables.load(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(rows.length == types.size * 8,
      s"expected ${types.size * 8} walks, got ${rows.length}")
    rows.foreach { r =>
      val path = r.getString(2)
      assert(path.count(_ == '>') == 4, s"path $path not 4 hops")
      assert(path.split('>').forall(types.contains), s"unknown node in $path")
      assert(path.split('>').last == r.getString(3))
    }
  }

  test("win_donchian: signals consistent with the channel") {
    val rows = run("win_donchian")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(2); val hi = r.getDouble(3); val lo = r.getDouble(4)
      assert(hi >= lo)
      val b = r.getInt(5)
      assert(b == (if (v > hi) 1 else if (v < lo) -1 else 0))
    }
  }

  test("text_rake: top-3 per doc, phrases avoid the stopword panel") {
    val rows = run("text_rake")
    assert(rows.nonEmpty)
    val stop = graft.core.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(5)
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 3)
      val words = r.getString(2).split(' ')
      assert(words.length == r.getLong(3))
      assert(!words.exists(stop.contains),
        s"phrase '${r.getString(2)}' contains a stopword")
      assert(r.getDouble(4) >= 1.0 - 1e-9, "phrase score below 1 (deg>=freq)")
    }
  }

  test("etl_cdc_apply: key conservation across final ops") {
    val rows = run("etl_cdc_apply")
    val byOp = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val total = orders.count()
    val inserts = orders.filter(col("o_orderkey") % 11 === 3).count()
    assert(byOp.values.sum == total + inserts,
      s"final keys ${byOp.values.sum} != base $total + inserts $inserts")
    assert(byOp.getOrElse("I", 0L) == inserts)
    // deletes win over updates on keys divisible by both 5 and 7
    assert(byOp.contains("D") && byOp.contains("U") && byOp.contains("B"))
  }
}
