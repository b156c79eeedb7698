package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00")),   // after r10 → r10
      (2L, 7L, ts("2026-01-01 10:30:00")),   // exactly at r2's ts → inclusive
      (3L, 7L, ts("2026-01-01 09:00:00")),   // before any right → NULL
      (4L, 9L, ts("2026-01-01 12:00:00"))    // other key, no right rows → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 09:30:00"), 1.0),
      (11L, 7L, ts("2026-01-01 10:30:00"), 2.0),
      (12L, 7L, ts("2026-01-01 11:00:00"), 3.0)
    ).toDF("view_id", "user_id", "ts", "v")

    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("view_id", "v"))
      .orderBy("event_id")
      .select("event_id", "asof_view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, Some(10L)), (2L, Some(11L)), (3L, None), (4L, None)))
  }

  test("asofJoinNearest picks the closest side, backward on ties") {
    val left = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00")), // b@09:30 (30m) vs f@10:45 (45m) → b
      (2L, 7L, ts("2026-01-01 10:40:00")), // b@09:30 (70m) vs f@10:45 (5m)  → f
      (3L, 7L, ts("2026-01-01 09:00:00")), // nothing before → forward only
      (4L, 7L, ts("2026-01-01 12:00:00")), // nothing after → backward only
      (5L, 7L, ts("2026-01-01 10:07:30")), // EQUIDISTANT 37.5m each → backward
      (6L, 9L, ts("2026-01-01 12:00:00"))  // other key, no rights → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 09:30:00"), 1.0),
      (11L, 7L, ts("2026-01-01 10:45:00"), 2.0)
    ).toDF("view_id", "user_id", "ts", "v")

    val out = AsOf.asofJoinNearest(left, right, "user_id", "ts",
        Seq("view_id", "v"))
      .orderBy("event_id")
      .select("event_id", "asof_view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, Some(10L)), (2L, Some(11L)), (3L, Some(10L)),
      (4L, Some(11L)), (5L, Some(10L)), (6L, None)))
  }

  test("asofJoinNearest: an equal-time right row is a backward match") {
    val left = Seq((1L, 7L, ts("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 10:00:00"), 1.0),  // Δ = 0, backward
      (11L, 7L, ts("2026-01-01 10:00:01"), 2.0))  // Δ = 1 s forward
      .toDF("view_id", "user_id", "ts", "v")
    val out = AsOf.asofJoinNearest(left, right, "user_id", "ts",
        Seq("view_id", "v")).collect()
    assert(out.head.getAs[Long]("asof_view_id") == 10L)
    assert(out.head.getAs[Timestamp]("asof_ts") == ts("2026-01-01 10:00:00"))
  }

  test("asofJoinTolerance nulls matches staler than the bound, keeps fresh ones") {
    val left = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00")),   // 30 min after r10 → within 1h → kept
      (2L, 7L, ts("2026-01-01 12:00:00")),   // 60+ min after r12? r12 at 11:00 → exactly 1h → kept (inclusive)
      (3L, 7L, ts("2026-01-01 13:30:00"))    // 2.5h after r12 → stale → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 09:30:00"), 1.0),
      (12L, 7L, ts("2026-01-01 11:00:00"), 3.0)
    ).toDF("view_id", "user_id", "ts", "v")
    val out = AsOf.asofJoinTolerance(left, right, "user_id", "ts",
        Seq("view_id", "v"), toleranceSeconds = 3600L)
      .orderBy("event_id")
      .select("event_id", "asof_view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq((1L, Some(10L)), (2L, Some(12L)), (3L, None)))
  }

  test("asofJoin: duplicate (key, time) right rows pick deterministically; NULL right time never matches") {
    val left = Seq((1L, 7L, ts("2026-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 09:00:00"), 1.0),
      (11L, 7L, ts("2026-01-01 09:00:00"), 2.0), // same ts — greatest payload wins
      (99L, 7L, null.asInstanceOf[Timestamp], 9.0) // NULL ts must never match
    ).toDF("view_id", "user_id", "ts", "v")
    val rows = (1 to 3).map { _ =>
      AsOf.asofJoin(left, right, "user_id", "ts", Seq("view_id", "v"))
        .collect()(0)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("asof_view_id") == 11L, s"got $r")
      assert(r.getAs[Double]("asof_v") == 2.0)
    }
  }

  test("asofJoin emits exactly one row per left row and keeps left payloads") {
    val left = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00"), "a"),
      (2L, 7L, ts("2026-01-01 10:00:01"), "b")
    ).toDF("event_id", "user_id", "ts", "tag")
    val right = Seq(
      (10L, 7L, ts("2026-01-01 09:00:00"), 1.0),
      (11L, 7L, ts("2026-01-01 09:30:00"), 2.0)
    ).toDF("view_id", "user_id", "ts", "v")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "ts", "tag", "asof_v"))
    // both left rows see the latest (09:30) value
    assert(out.select("asof_v").collect().map(_.getDouble(0)).toSeq == Seq(2.0, 2.0))
  }
}
