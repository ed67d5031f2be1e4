package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-11 batch B queries
  * ([[graft.queries.Analytics23]] + the Analytics22 UPDATE/DELETE
  * statements). */
class Analytics23Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("text_entropy: bounds, all-distinct docs at norm 1") {
    val rows = run("text_entropy")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val d = r.getLong(2)
      val h = r.getDouble(3); val nh = r.getDouble(4)
      assert(d <= n)
      // entropy is rounded to 6 dp in the graded output, so the
      // log2(n) ceiling may be crossed by up to half an ulp of that
      // rounding (5e-7)
      assert(h >= -1e-9 && h <= math.log(n.toDouble) / math.log(2) + 1e-6)
      assert(nh >= -1e-9 && nh <= 1.0 + 1e-6)
      if (d == n && d > 1)
        assert(math.abs(nh - 1.0) < 1e-6, s"all-distinct doc must norm to 1: $r")
    }
  }

  test("agg_tukey: ordered quartiles, outliers a strict minority") {
    val rows = run("agg_tukey")
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), "q1 <= q3")
      val n = r.getLong(3)
      assert(r.getLong(4) + r.getLong(5) < n / 2,
        s"fences must not mark a majority as outliers: $r")
    }
  }

  test("agg_power_law: full tail selected, heavy-tail alpha > 1") {
    val rows = run("agg_power_law")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1000L)
    assert(r.getDouble(2) > 1.0)
  }

  test("llm_curriculum_order: 4 phases, difficulty bands ordered and disjoint") {
    val rows = run("llm_curriculum_order").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
        s"phase bands must not overlap: $a vs $b")
    }
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.core.Tables.load(spark, sf, "documents").count()
    assert(total == nDocs, s"every doc must land in a phase: $total != $nDocs")
  }

  test("llm_tokenizer_fertility: fertility >= 1, chars bound tokens") {
    val rows = run("llm_tokenizer_fertility")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 1.0 - 1e-9, s"a word is >= 1 token: $r")
      assert(r.getLong(2) <= r.getLong(4),
        s"3-round BPE tokens cannot exceed chars: $r")
    }
  }

  test("scan_csv_multiline: every doc covered, lines = tokens") {
    val rows = run("scan_csv_multiline")
    val docs = graft.core.Tables.load(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // each doc spans at least one line and the corpus more lines than docs
    assert(rows.map(_.getLong(3)).sum > rows.map(_.getLong(1)).sum)
  }

  test("sql_update: only the k%7 slice repriced, versions account exactly") {
    val rows = run("sql_update")
    val statuses = rows.map(_.getString(0)).toSet
    assert(statuses.contains("X"))
    // sum_version = n + n_updated; updated rows are exactly status 'X'
    val nUpd = rows.find(_.getString(0) == "X").get.getLong(1)
    val n = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(3)).sum == n + nUpd)
  }

  test("sql_delete: deleted slice gone, survivors keep version 1") {
    val rows = run("sql_delete")
    val n = rows.map(_.getLong(1)).sum
    assert(n > 0)
    assert(rows.map(_.getLong(3)).sum == n, "survivors untouched")
    // the k%5=0 fifth and the price tail are gone: survivor count is
    // strictly below the seeded k%3=0 slice
    val seed = graft.core.Tables.load(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 3 === 0)
      .count()
    assert(n < seed)
  }
}
