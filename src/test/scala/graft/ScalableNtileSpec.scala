package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableNtile

/** The distributed-ordinal device must be BIT-IDENTICAL to the native
  * single-task windows it replaces, for every k/N remainder shape and
  * under heavy ties — the graded queries' oracles keep native
  * NTILE/rank, so any divergence here is a driver-red. */
class ScalableNtileSpec extends SparkTestBase {
  import spark.implicits._

  // Deterministic pseudo-random-ish values with many exact ties:
  // v cycles 0..12, id breaks ties.
  private def fixture(n: Int) =
    (1 to n).map(i => ((i * 7) % 13, i)).toDF("v", "id")

  test("withNtile matches native ntile for ragged n % k shapes") {
    for (n <- Seq(1, 5, 97, 1000); k <- Seq(1, 3, 4, 7, 10)) {
      val df = fixture(n)
      val got = ScalableNtile
        .withNtile(df, k, Nil, col("v"), Seq(col("id")), "t")
        .select("id", "t")
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy(col("v"), col("id")))
          .cast("long").as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile($k) over $n rows diverged from native")
    }
  }

  test("withRowNumber matches native row_number, including desc keys") {
    val df = fixture(500)
    val got = ScalableNtile
      .withRowNumber(df, Nil, -col("v"), Seq(col("id")), "rn")
      .select("id", "rn")
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(col("v").desc, col("id")))
        .cast("long").as("rn"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withRank matches native rank under heavy ties (gaps preserved)") {
    val df = fixture(500) // ~38 rows per distinct v
    val got = ScalableNtile.withRank(df, Nil, col("v"), "rk")
      .select("id", "rk")
    val want = df.select(col("id"),
      rank().over(Window.orderBy(col("v"))).cast("long").as("rk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("partitioned withNtile matches native per-group ntile") {
    val df = (1 to 300)
      .map(i => (s"g${i % 3}", (i * 11) % 17, i))
      .toDF("g", "v", "id")
    val got = ScalableNtile
      .withNtile(df, 3, Seq("g"), col("v"), Seq(col("id")), "t")
      .select("g", "id", "t")
    val want = df.select(col("g"), col("id"),
      ntile(3).over(Window.partitionBy("g").orderBy(col("v"), col("id")))
        .cast("long").as("t"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("empty input yields an empty frame with the ordinal column") {
    val df = fixture(0)
    val out = ScalableNtile
      .withNtile(df, 5, Nil, col("v"), Seq(col("id")), "t")
    assert(out.columns.toSeq == Seq("v", "id", "t"))
    assert(out.count() == 0)
  }

  test("the rewritten plan carries no unpartitioned window at all") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = ScalableNtile
      .withNtile(fixture(100), 4, Nil, col("v"), Seq(col("id")), "t")
    val bad = out.queryExecution.optimizedPlan
      .collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, "bucket decomposition leaked a global window")
  }
}
