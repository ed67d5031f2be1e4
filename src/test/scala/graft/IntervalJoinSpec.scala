package graft

import java.sql.Timestamp

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lo-inclusive, hi-exclusive, bucket-boundary crossing intervals match") {
    val pts = Seq(
      (1L, ts("2024-01-01 00:10:00")),  // inside w1
      (2L, ts("2024-01-01 00:00:00")),  // == lo of w1 -> match
      (3L, ts("2024-01-01 00:30:00")),  // == hi of w1 -> NO match
      (4L, ts("2024-01-01 01:14:59")),  // inside w2 (crosses bucket line)
      (5L, ts("2024-01-01 03:00:00"))   // in no window
    ).toDF("pt_id", "pt_ts")
    val wins = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      (11L, ts("2024-01-01 00:50:00"), ts("2024-01-01 01:20:00"))
    ).toDF("win_id", "lo", "hi")
    val out = IntervalJoin
      .pointInInterval(pts, wins, "pt_ts", "lo", "hi", widthSec = 900)
      .select("pt_id", "win_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (4L, 11L)))
  }

  test("each matching pair appears exactly once despite interval explode") {
    val pts = Seq((1L, ts("2024-01-01 00:29:00"))).toDF("pt_id", "pt_ts")
    // window spans 5 buckets at width 600
    val wins = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:45:00")))
      .toDF("win_id", "lo", "hi")
    val out = IntervalJoin
      .pointInInterval(pts, wins, "pt_ts", "lo", "hi", widthSec = 600)
    assert(out.count() == 1)
  }
}
