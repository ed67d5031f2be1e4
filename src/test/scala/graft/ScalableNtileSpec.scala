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

  test("withNtiles: three keys in one device match three native ntiles") {
    val df = (1 to 400)
      .map(i => ((i * 7) % 13, (i * 11) % 29, ((i * 3) % 7) * 0.5, i))
      .toDF("a", "b", "c", "id")
    val got = ScalableNtile.withNtiles(df, 5, Nil, Seq(
        (-col("a"), Seq(col("id")), "qa"),
        (-col("b"), Seq(col("id")), "qb"),
        (-col("c"), Seq(col("id")), "qc")))
      .select("id", "qa", "qb", "qc")
    def nat(c: String) = ntile(5)
      .over(Window.orderBy(col(c).desc, col("id"))).cast("long")
    val want = df.select(col("id"), nat("a").as("qa"), nat("b").as("qb"),
      nat("c").as("qc"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withRunningSum matches the native RANGE-frame running sum, ties included") {
    // heavy ties on (v): peers must all be included (RANGE semantics)
    val df = (1 to 600).map(i => ((i * 7) % 13, i % 3, (i % 5).toLong - 2))
      .toDF("v", "k", "x")
    val got = ScalableNtile
      .withRunningSum(df, Nil, col("v"), Seq(col("k")), col("x"), "rs")
    val want = df.withColumn("rs",
      sum(col("x")).over(Window.orderBy(col("v"), col("k"))))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("NULL order keys rank first (native semantics), never dropped") {
    val df = (1 to 200)
      .map(i => (if (i % 7 == 0) None else Some((i * 11) % 19), i))
      .toDF("v", "id")
    val got = ScalableNtile
      .withRowNumber(df, Nil, col("v"), Seq(col("id")), "rn")
      .select("id", "rn")
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(col("v").asc, col("id")))
        .cast("long").as("rn"))
    assert(got.count() == 200, "null-key rows were dropped")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val allNull = df.select(lit(null).cast("int").as("v"), col("id"))
    val gotAll = ScalableNtile
      .withNtile(allNull, 4, Nil, col("v"), Seq(col("id")), "t")
    assert(gotAll.count() == 200, "all-null relation lost rows")
  }

  test("adversarial skew: constant, two-point, and denormal-range keys") {
    // Each case drives the degenerate-range fallback or a near-zero
    // grid width; the ordinal must stay exact regardless.
    val shapes = Seq(
      "const" -> (1 to 300).map(i => (1.0, i)),
      "twopoint" -> (1 to 300).map(i => (if (i % 2 == 0) 0.0 else 1.0, i)),
      "denormal" -> (1 to 300).map(i =>
        (java.lang.Double.MIN_VALUE * (i % 3), i)),
      "infinite" -> (1 to 300).map(i =>
        (if (i % 5 == 0) Double.PositiveInfinity
        else if (i % 7 == 0) Double.NegativeInfinity else i.toDouble, i)))
    for ((name, rows) <- shapes) {
      val df = rows.toDF("v", "id")
      val got = ScalableNtile
        .withNtile(df, 4, Nil, col("v"), Seq(col("id")), "t")
        .select("id", "t")
      val want = df.select(col("id"),
        ntile(4).over(Window.orderBy(col("v"), col("id")))
          .cast("long").as("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$name skew diverged from native ntile")
    }
  }

  test("middleTwo under adversarial skew matches the explicit sorted middle") {
    val shapes = Seq(
      "const" -> (1 to 301).map(_ => 7.5),
      "twopoint" -> (1 to 300).map(i => if (i % 3 == 0) -1.0 else 2.0),
      "denormal" -> (1 to 257).map(i => java.lang.Double.MIN_VALUE * (i % 5)),
      "center-heavy" -> (1 to 1000).map(i =>
        if (i <= 990) 0.5 else i.toDouble)) // ~all mass in one cell
    for ((name, vals) <- shapes) {
      val df = vals.zipWithIndex.map { case (v, i) => (v, i) }.toDF("v", "id")
      val got = ScalableNtile.middleTwo(df, col("v"), "med", "n")
        .head()
      val sorted = vals.sorted
      val n = vals.size
      val want = (sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)) / 2.0
      assert(got.getLong(1) == n.toLong, s"$name: n mismatch")
      assert(got.getDouble(0) == want,
        s"$name: median ${got.getDouble(0)} != $want")
    }
  }

  test("middleTwo: empty, all-null, and mixed-null inputs") {
    val empty = Seq.empty[(Option[Double], Int)].toDF("v", "id")
    val e = ScalableNtile.middleTwo(empty, col("v"), "med", "n").head()
    assert(e.isNullAt(0) && e.isNullAt(1))
    val allNull = (1 to 50).map(i => (None: Option[Double], i)).toDF("v", "id")
    val a = ScalableNtile.middleTwo(allNull, col("v"), "med", "n").head()
    assert(a.isNullAt(0), "all-null median must be NULL (SQL avg-over-empty)")
    val mixed = (1 to 100)
      .map(i => (if (i % 4 == 0) None else Some(i.toDouble), i))
      .toDF("v", "id")
    val m = ScalableNtile.middleTwo(mixed, col("v"), "med", "n").head()
    val vals = (1 to 100).filter(_ % 4 != 0).map(_.toDouble).sorted
    val n = vals.size
    val want = (vals((n + 1) / 2 - 1) + vals((n + 2) / 2 - 1)) / 2.0
    assert(m.getLong(1) == n.toLong && m.getDouble(0) == want)
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
