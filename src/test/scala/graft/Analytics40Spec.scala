package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch T ([[graft.queries.Analytics40]]). */
class Analytics40Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_aroon: values are exact multiples of 4 in [4, 100] and the " +
    "oscillator recomposes") {
    val rows = run("win_aroon")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (up, dn, osc) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(up >= 4.0 && up <= 100.0 && up % 4.0 == 0.0)
      assert(dn >= 4.0 && dn <= 100.0 && dn % 4.0 == 0.0)
      assert(osc == up - dn)
    }
    assert(rows.exists(_.getDouble(2) == 100.0),
      "some row IS its frame's most recent high")
  }

  test("win_williams_r: bounded in [-100, 0]; 0 exactly when v = HH") {
    val rows = run("win_williams_r")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        val wr = r.getDouble(4)
        // the multiply-then-divide spelling can round a ulp past -100
        assert(wr >= -100.0 - 1e-9 && wr <= 0.0)
      }
    }
  }

  test("win_mfi: bounded in [0, 100]; pinned 100 iff no negative flow") {
    val rows = run("win_mfi")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pos, neg) = (r.getDouble(2), r.getDouble(3))
      if (!r.isNullAt(4)) {
        val mfi = r.getDouble(4)
        assert(mfi >= 0.0 && mfi <= 100.0)
        if (neg == 0.0) assert(mfi == 100.0 && pos > 0.0)
      } else assert(pos == 0.0 && neg == 0.0)
    }
  }

  test("win_trix: exact driver-side fold replica per user") {
    import org.apache.spark.sql.functions._
    val byUser = graft.core.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (u, xs) =>
        u -> xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
      }
    val got = run("win_trix").map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    byUser.filter(_._2.length >= 2).foreach { case (u, vs) =>
      var e1 = vs(0); var e2 = vs(0); var e3 = vs(0); var p3 = vs(0)
      vs.drop(1).foreach { v =>
        val prev3 = e3
        e1 = e1 + (v - e1) / 3.0
        e2 = e2 + (e1 - e2) / 3.0
        e3 = e3 + (e2 - e3) / 3.0
        p3 = prev3
      }
      val (n, tema) = got(u)
      assert(n == vs.length)
      assert(tema == e3, s"user $u tema mismatch: $tema vs $e3")
    }
  }
}
