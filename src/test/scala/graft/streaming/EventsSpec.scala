package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    // user A: two events 10 min apart (one session), third 50 min later (new)
    (1L, ts("2026-01-01 10:00:00"), 7L, "click", 1.5),
    (2L, ts("2026-01-01 10:10:00"), 7L, "click", 2.5),
    (3L, ts("2026-01-01 11:00:00"), 7L, "view", 4.0),
    // user B: single event
    (4L, ts("2026-01-01 10:05:00"), 9L, "click", 10.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("transitionMatrix: per-user consecutive pairs, exact conditional e6") {
    // user 7: click→click→view; user 9: single event contributes nothing.
    // from "click": 2 transitions (click→click, click→view) → 500000 each.
    val out = Events.transitionMatrix(events)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("click", "click", 1L, 500000L),
      ("click", "view", 1L, 500000L)))
  }

  test("sessionSummary: 30-min gap splits sessions; exact cent sums") {
    val out = Events.sessionSummary(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (7L, 1L, 2L, 400L),   // user 7 session 1: 2 events, 1.5+2.5 = 4.00 → 400c
      (7L, 2L, 1L, 400L),   // user 7 session 2: 1 event, 4.00
      (9L, 1L, 1L, 1000L))) // user 9: 10.00
  }

  test("sessionize boundary: a gap of exactly the threshold stays in-session") {
    val df = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2026-01-01 10:30:00"), 1L, "a", 1.0),  // exactly 30 min → same
      (3L, ts("2026-01-01 11:00:01"), 1L, "a", 1.0)   // 30m01s → new
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val seq = Events.sessionize(df, 30).orderBy("event_id")
      .select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(seq == Seq(1L, 1L, 2L))
  }

  test("hourlyRollup groups by (hour, type) with exact sums") {
    val out = Events.hourlyRollup(events)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2026-01-01 10:00:00.0", "click", 3L, 1400L),
      ("2026-01-01 11:00:00.0", "view", 1L, 400L)))
  }

  test("propsK extracts the JSON payload field") {
    val got = Seq("""{"k": 87}""", """{"other": 1}""", "not json")
      .toDF("props").select(Events.propsK(col("props")).as("k"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got == Seq(Some(87), None, None))
  }

  test("sessionWindows (batch): exact-gap event MERGES; gap+1us opens a new session") {
    // boundary semantics pinned empirically (they drive the oracle's
    // islands predicate): an event at EXACTLY prev + gap still merges
    // (inclusive bound), one microsecond past it does not.
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:15:00")),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 10:45:00")), // = prev + gap → merges
      (4L, java.sql.Timestamp.valueOf("2026-01-01 11:15:00.000001"))) // past it → new
      .toDF("event_id", "ts").withColumn("user_id", lit(7L))
    val out = Events.sessionWindows(ts, gap = "30 minutes")
      .orderBy("session_start")
      .collect().map(r => (r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      ("2026-01-01 10:00:00.0", "2026-01-01 11:15:00.0", 3L),
      ("2026-01-01 11:15:00.000001", "2026-01-01 11:45:00.000001", 1L)),
      s"got ${out.toSeq}")
  }

  test("streamingSessions: native session_window closes on the gap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sw").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Events.streamingSessions(stream, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(60000)
    val got = spark.table("sessions_test")
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 7: events at 10:00/10:10 merge (gap < 30m), 11:00 is a new
    // session (50m gap); user 9: one session
    assert(got == Set((7L, 2L), (7L, 1L), (9L, 1L)))
  }

  test("streamingSessionizeCustom: flatMapGroupsWithState closes by gap and by timeout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmgws").toString
    val schema = events.schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = Events.streamingSessionizeCustom(stream, gapMinutes = 30)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    // batch 1: user 7 has a 10:00-10:10 session then a 11:00 event (gap
    // 50m > 30m closes the first IN-BATCH); the 11:00 session stays open.
    Seq((1L, ts("2026-01-01 10:00:00"), 7L, "click", 1.5),
        (2L, ts("2026-01-01 10:10:00"), 7L, "click", 2.5),
        (3L, ts("2026-01-01 11:00:00"), 7L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val afterB1 = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(afterB1 == Set((7L, 2L, 400L)), s"batch1 emitted $afterB1")
    // batch 2: a much later event advances the watermark past
    // 11:00 + 30m, so the open session times out and is emitted.
    Seq((4L, ts("2026-01-01 18:00:00"), 9L, "click", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val afterB2 = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(afterB2.contains((7L, 1L, 400L)), s"timeout session missing: $afterB2")
  }

  test("streamingSessionizeCustom: a late event older than start-gap becomes its own session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmgws2").toString
    val schema = events.schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = Events.streamingSessionizeCustom(stream, gapMinutes = 30)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    // batch 1: user 7 open session at 12:40; user 9 at 13:00 pushes the
    // watermark to ~12:00
    Seq((1L, ts("2026-01-01 12:40:00"), 7L, "a", 1.0),
        (2L, ts("2026-01-01 13:00:00"), 9L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    // batch 2: user 7 events at 12:04 and 12:05 — within the watermark but
    // >30 min BEFORE the open session's start: they must NOT merge into
    // the open session, and being within the gap of EACH OTHER they must
    // form ONE earlier session (batch sessionize parity), not singletons
    Seq((3L, ts("2026-01-01 12:04:00"), 7L, "a", 2.0),
        (4L, ts("2026-01-01 12:05:00"), 7L, "a", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val sessions = spark.read.parquet(s"$dir/out")
      .filter(col("user_id") === 7)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3), r.getLong(4))).toSet
    assert(sessions.contains(("2026-01-01 12:04:00.0", 2L, 500L)),
      s"merged early chain missing: $sessions")
    assert(!sessions.exists(_._2 >= 3L), s"late events wrongly merged into open session: $sessions")
  }

  test("streamingSessionizeCustom: an event OLDER than the watermark is dropped, not merged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmgws3").toString
    val schema = events.schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = Events.streamingSessionizeCustom(stream, gapMinutes = 30)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    // batch 1: user 7 at 12:00; user 9 at 15:00 pushes the post-batch
    // watermark to 14:00 (1h horizon)
    Seq((1L, ts("2026-01-01 12:00:00"), 7L, "a", 1.0),
        (2L, ts("2026-01-01 15:00:00"), 9L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    // batch 2: user 7 at 12:30 — BELOW the 14:00 watermark → must be
    // dropped before the state function ever sees it (neither merged into
    // the 12:00 session nor emitted as its own); user 9 at 20:00 advances
    // the watermark far enough to time out and flush every open session
    Seq((3L, ts("2026-01-01 12:30:00"), 7L, "a", 99.0),
        (4L, ts("2026-01-01 20:00:00"), 9L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    // batch 3: one more far-future event so the 20:00 session also closes
    Seq((5L, ts("2026-01-02 09:00:00"), 9L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val u7 = spark.read.parquet(s"$dir/out")
      .filter(col("user_id") === 7)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3), r.getLong(4)))
    assert(u7.toSet == Set(("2026-01-01 12:00:00.0", 1L, 100L)),
      s"late event leaked into user 7's sessions: ${u7.toSeq}")
  }

  test("streamingHourly watermark drops events later than the horizon") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val schema = events.schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = Events.streamingHourly(stream, watermark = "1 hour")
        .select(col("window.start").as("win"), col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    // batch 1: events up to 12:05 → watermark advances to ~11:05
    Seq((1L, ts("2026-01-01 09:30:00"), 1L, "a", 1.0),
        (2L, ts("2026-01-01 12:05:00"), 1L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    // batch 2: an event at 09:45 is ~1.3h late vs the 11:05 watermark →
    // its (closed) 09:00 window must NOT be revised; a fresh event appends.
    Seq((3L, ts("2026-01-01 09:45:00"), 1L, "a", 1.0),
        (4L, ts("2026-01-01 13:10:00"), 1L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val got = spark.read.parquet(s"$dir/out")
      .groupBy(col("win").cast("string")).agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 09:00 window was emitted with ONLY the on-time event; the late
    // 09:45 event did not resurrect it
    assert(got.get("2026-01-01 09:00:00").contains(1L), s"got=$got")
  }

  test("streamingHourly over a file source produces the batch rollup counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Events.streamingHourly(stream)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(60000)
    val got = spark.table("hourly_test")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2026-01-01 10:00:00", "click", 3L),
      ("2026-01-01 11:00:00", "view", 1L)))
  }

  test("topKPerWindow: batch parity with a ranking window") {
    val counts = Seq(
      (ts("2026-01-01 10:00:00"), "click", 9L),
      (ts("2026-01-01 10:00:00"), "view", 5L),
      (ts("2026-01-01 10:00:00"), "scroll", 5L),
      (ts("2026-01-01 10:00:00"), "buy", 1L),
      (ts("2026-01-01 11:00:00"), "view", 2L)
    ).toDF("start", "event_type", "n")
      .select(struct(col("start"), col("start").as("end")).as("window"),
        col("event_type"), col("n"))
    val got = Events.topKPerWindow(counts, 2)
      .select("win_start", "event_type", "rnk")
      .as[(String, String, Int)].collect().toSet
    // ties on n=5 break by event_type ascending: scroll before view
    assert(got == Set(
      ("2026-01-01 10:00:00", "click", 1), ("2026-01-01 10:00:00", "scroll", 2),
      ("2026-01-01 11:00:00", "view", 1)))
  }

  test("streaming trending: append-mode windows + foreachBatch top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft_topk").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    def run(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
      val q = Events.streamingHourly(stream)
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty)
            Events.topKPerWindow(b, 1).write.mode("append").parquet(s"$dir/out")
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    run()
    // advance the watermark far past 10:00-11:00 so those windows close
    Seq((9L, ts("2026-01-01 15:00:00"), 7L, "late", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val got = spark.read.parquet(s"$dir/out")
      .select("win_start", "event_type", "rnk")
      .as[(String, String, Int)].collect().toSet
    // 10:00 window: click n=3 beats view; 11:00 window: view only
    assert(got.contains(("2026-01-01 10:00:00", "click", 1)), s"got=$got")
    assert(got.contains(("2026-01-01 11:00:00", "view", 1)), s"got=$got")
    assert(got.forall(_._3 == 1), s"k=1 but got=$got")
  }

  test("funnelReport enforces stage order and counts strictly-after conversions") {
    val fe = Seq(
      // user 1: full ordered funnel
      (10L, ts("2026-01-01 09:00:00"), 1L, "view", 0.0),
      (11L, ts("2026-01-01 09:05:00"), 1L, "click", 0.0),
      (12L, ts("2026-01-01 09:10:00"), 1L, "purchase", 0.0),
      // user 2: click BEFORE any view — click must not convert; later
      // click after the view does, but no purchase follows
      (20L, ts("2026-01-01 08:00:00"), 2L, "click", 0.0),
      (21L, ts("2026-01-01 08:30:00"), 2L, "view", 0.0),
      (22L, ts("2026-01-01 08:45:00"), 2L, "click", 0.0),
      // user 3: purchase before click — ordered funnel stops at click
      (30L, ts("2026-01-01 07:00:00"), 3L, "view", 0.0),
      (31L, ts("2026-01-01 07:10:00"), 3L, "purchase", 0.0),
      (32L, ts("2026-01-01 07:20:00"), 3L, "click", 0.0),
      // user 4: never views
      (40L, ts("2026-01-01 06:00:00"), 4L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnelReport(fe, Seq("view", "click", "purchase"))
      .select("stage_idx", "stage", "n_users", "conv_ppm")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1, "view", 3L, 1000000L), // users 1, 2, 3
      (2, "click", 3L, 1000000L), // all three clicked after their view
      (3, "purchase", 1L, 333333L))) // only user 1 purchased after the click
  }

  test("funnelReport windowed: slow conversions fall outside the stage bound") {
    val fe = Seq(
      // user 1: click 5 min after view (within 10-min bound), purchase
      // 5 min after click → fully converts
      (10L, ts("2026-01-01 09:00:00"), 1L, "view", 0.0),
      (11L, ts("2026-01-01 09:05:00"), 1L, "click", 0.0),
      (12L, ts("2026-01-01 09:10:00"), 1L, "purchase", 0.0),
      // user 2: click 30 min after the view — outside the 10-min bound,
      // so the windowed funnel stops at view (unbounded would convert)
      (20L, ts("2026-01-01 08:00:00"), 2L, "view", 0.0),
      (21L, ts("2026-01-01 08:30:00"), 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val windowed = Events.funnelReport(fe, Seq("view", "click", "purchase"),
        windowSeconds = Some(600L))
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(windowed == Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L))
    val unbounded = Events.funnelReport(fe, Seq("view", "click", "purchase"))
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(unbounded("click") == 2L, "unbounded funnel must still convert user 2")
  }
}
