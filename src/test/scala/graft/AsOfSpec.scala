package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf: latest right at-or-before, per key, ties inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // after both signups of user 1
      (1L, ts("2024-01-01 08:30:00")),  // between them
      (1L, ts("2024-01-01 07:00:00")),  // before any -> null
      (2L, ts("2024-01-01 09:00:00")),  // exact tie with signup -> match
      (3L, ts("2024-01-01 09:00:00"))   // user with no rights -> null
    ).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")

    val out = AsOf.leftAsOf(left, right, Seq("user_id"), "ts", "ts", "matched")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet

    assert(out == Set(
      (1L, ts("2024-01-01 10:00:00"), "2024-01-01 09:00:00.0"),
      (1L, ts("2024-01-01 08:30:00"), "2024-01-01 08:00:00.0"),
      (1L, ts("2024-01-01 07:00:00"), null),
      (2L, ts("2024-01-01 09:00:00"), "2024-01-01 09:00:00.0"),
      (3L, ts("2024-01-01 09:00:00"), null)))
  }

  test("leftAsOfForward: earliest right at-or-after, ties inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 07:00:00")),  // before both -> earliest (08:00)
      (1L, ts("2024-01-01 08:30:00")),  // between -> 09:00
      (1L, ts("2024-01-01 10:00:00")),  // after all -> null
      (2L, ts("2024-01-01 09:00:00")),  // exact tie -> match
      (3L, ts("2024-01-01 09:00:00"))   // no rights -> null
    ).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")

    val out = AsOf.leftAsOfForward(left, right, Seq("user_id"), "ts", "ts",
        "matched")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet

    assert(out == Set(
      (1L, ts("2024-01-01 07:00:00"), "2024-01-01 08:00:00.0"),
      (1L, ts("2024-01-01 08:30:00"), "2024-01-01 09:00:00.0"),
      (1L, ts("2024-01-01 10:00:00"), null),
      (2L, ts("2024-01-01 09:00:00"), "2024-01-01 09:00:00.0"),
      (3L, ts("2024-01-01 09:00:00"), null)))
  }

  test("leftAsOfNearest: closer side wins, equidistant tie -> backward") {
    val left = Seq(
      (1L, ts("2024-01-01 08:20:00")),  // back 08:00 (20m) vs fwd 09:00 (40m) -> back
      (1L, ts("2024-01-01 08:50:00")),  // back 08:00 (50m) vs fwd 09:00 (10m) -> fwd
      (1L, ts("2024-01-01 08:30:00")),  // equidistant 30m/30m -> backward pinned
      (1L, ts("2024-01-01 07:00:00")),  // only fwd exists -> fwd
      (1L, ts("2024-01-01 10:00:00")),  // only back exists -> back
      (3L, ts("2024-01-01 09:00:00"))   // neither -> null
    ).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")

    val out = AsOf.leftAsOfNearest(left, right, Seq("user_id"), "ts", "ts",
        "matched")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)).map(_.toString).orNull)).toSet

    assert(out == Set(
      (1L, ts("2024-01-01 08:20:00"), "2024-01-01 08:00:00.0"),
      (1L, ts("2024-01-01 08:50:00"), "2024-01-01 09:00:00.0"),
      (1L, ts("2024-01-01 08:30:00"), "2024-01-01 08:00:00.0"),
      (1L, ts("2024-01-01 07:00:00"), "2024-01-01 08:00:00.0"),
      (1L, ts("2024-01-01 10:00:00"), "2024-01-01 09:00:00.0"),
      (3L, ts("2024-01-01 09:00:00"), null)))
  }

  test("leftAsOf: user columns named like the helpers survive intact") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "keepL", 42)
    ).toDF("user_id", "ts", "__ts", "__is_left")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"))
    ).toDF("user_id", "ts")

    val out = AsOf.leftAsOf(left, right, Seq("user_id"), "ts", "ts", "matched")
    assert(out.columns.toSet ==
      Set("user_id", "ts", "__ts", "__is_left", "matched"))
    val r = out.head()
    assert(r.getAs[String]("__ts") == "keepL")
    assert(r.getAs[Int]("__is_left") == 42)
    assert(r.getAs[Timestamp]("matched") == ts("2024-01-01 08:00:00"))
  }
}
