package graft

import org.apache.spark.sql.Row

/** Semantic pins for round-11 batch K ([[graft.queries.Analytics31]]). */
class Analytics31Spec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("win_adx: DI/ADX bounded in [0,100] and present for every " +
    "user's mature rows") {
    val rows = run("win_adx")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        if (!r.isNullAt(i)) {
          val x = r.getDouble(i)
          assert(x >= 0.0 && x <= 100.0 + 1e-9, s"col $i out of range: $x")
        }
      }
    }
  }

  test("win_cci: deviation statistic recomposes (mad > 0 on real data)") {
    val rows = run("win_cci")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      if (!r.isNullAt(5)) {
        val cci = r.getDouble(5)
        val expect = (r.getDouble(2) - r.getDouble(3)) /
          (0.015 * r.getDouble(4))
        assert(math.abs(cci - expect) < 1e-9)
      }
    }
  }

  test("win_parabolic_sar: SAR sits on the correct side of the " +
    "extreme point and AF stays in [0.02, 0.2]") {
    val rows = run("win_parabolic_sar")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (up, sar, ep, af) = (r.getBoolean(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      if (up) assert(sar <= ep) else assert(sar >= ep)
      assert(af >= 0.02 - 1e-12 && af <= 0.2 + 1e-12)
      assert(r.getLong(6) >= 0)
    }
  }

  test("win_renko: reference stays within one brick of the last value " +
    "path and brick counts are consistent") {
    val rows = run("win_renko")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (up, dn, net) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(net == up - dn)
      assert(up >= 0 && dn >= 0)
      // brick grid: ref = v0 + k*5 for integer k
      assert(r.getDouble(2).isFinite)
    }
    // volatile event values must lay at least one brick somewhere
    assert(rows.map(r => r.getLong(3) + r.getLong(4)).sum > 0)
  }

  test("agg_croston: forecast = z/x for multi-demand parts; " +
    "single-demand parts emit nulls") {
    val rows = run("agg_croston")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      if (n >= 2) {
        assert(!r.isNullAt(3) && !r.isNullAt(4))
        assert(r.getDouble(3) >= 1.0 - 1e-12,
          "mean inter-demand interval is at least one day")
        assert(math.abs(r.getDouble(4)
          - r.getDouble(2) / r.getDouble(3)) < 1e-9)
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4))
      }
      assert(r.getDouble(2) > 0.0, "demand sizes are positive")
    }
  }
}
