package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 session-4 batch H
  * ([[graft.queries.Analytics19]], `mm_patchify`, and the
  * `stream_timer_sessions` event-time-timer processor). */
class Analytics19Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("text_novelty: first doc fully novel, ratios bounded, novel sums to vocab") {
    val rows = run("text_novelty")
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) == 1.0, "earliest doc must be 100% novel")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // every distinct trigram is novel in exactly one doc
    val totalNovel = rows.map(_.getLong(2)).sum
    val vocab = graft.core.Tables.load(spark, sf, "documents")
      .select(explode(expr(
        """transform(
          |  CASE WHEN size(split(text, ' ')) >= 3
          |       THEN slice(split(text, ' '), 1, size(split(text, ' ')) - 2)
          |       ELSE array() END,
          |  (x, i) -> concat(x, ' ', element_at(split(text, ' '), i + 2),
          |            ' ', element_at(split(text, ' '), i + 3)))""".stripMargin))
        .as("tg")).select("tg").distinct().count()
    assert(totalNovel == vocab, s"novel sum $totalNovel != trigram vocab $vocab")
  }

  test("agg_effect_size: d and g share sign, |g| < |d|") {
    val rows = run("agg_effect_size")
    assert(rows.length == 1)
    val r = rows.head
    val d = r.getDouble(3); val g = r.getDouble(4)
    assert(math.signum(d) == math.signum(g))
    assert(math.abs(g) < math.abs(d) + 1e-15,
      "Hedges correction must shrink |d|")
  }

  test("sql_execute_immediate: equals the static spelling") {
    val dyn = run("sql_execute_immediate").map(_.mkString("|")).sorted.toSeq
    graft.core.Tables.load(spark, sf, "orders")
      .createOrReplaceTempView("graft_ei2_orders")
    val static = spark.sql(
      """SELECT o_orderstatus AS status, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_ei2_orders WHERE o_totalprice >= 100000
        |GROUP BY o_orderstatus""".stripMargin)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(dyn == static)
  }

  test("mm_patchify: patch sums recompose the decoded pixel total") {
    val rows = run("mm_patchify")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) == 32L
      && r.getLong(4) >= 0 && r.getLong(4) <= 32L * 255))
    // per-media patch totals vs the full-image pixel sums from
    // mm_decode_png, restricted to full-patch rows (h DIV 4 * 4 rows)
    val patchTotals = rows.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(4)).sum }
    val decoded = run("mm_decode_png")
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    patchTotals.foreach { case (id, pt) =>
      val (h, full) = decoded(id)
      if (h % 4 == 0)
        assert(pt == full, s"media $id: patches $pt != decoded total $full")
      else assert(pt <= full)
    }
  }

  test("stream_timer_sessions: timers flush only watermark-passed finals") {
    val rows = run("stream_timer_sessions")
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    assert(rows.exists(_.getString(4) == "timer"),
      "no timer ever fired — the no-data batch path is dead")
    byUser.foreach { case (u, rs) =>
      // at most one timer row per user, and it must be the LAST session
      val timers = rs.filter(_.getString(4) == "timer")
      assert(timers.length <= 1, s"user $u emitted ${timers.length} timer rows")
      timers.foreach { t =>
        assert(rs.forall(_.getLong(2) <= t.getLong(2)),
          s"user $u: timer session is not the latest")
      }
      // gap sessions are strictly ordered and non-overlapping
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) < b.getLong(1),
            s"user $u: sessions overlap")
        case _ =>
      }
    }
  }
}
