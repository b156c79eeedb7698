package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // impressions (views) and clicks for two users
  private val views = Seq(
    (100L, ts("2026-01-01 10:00:00"), 1L, "view", 0.0),
    (101L, ts("2026-01-01 10:20:00"), 1L, "view", 0.0),
    (102L, ts("2026-01-01 09:00:00"), 2L, "view", 0.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  private val clicks = Seq(
    (200L, ts("2026-01-01 10:25:00"), 1L, "click", 0.0), // within 30m of both views
    (201L, ts("2026-01-01 10:45:00"), 1L, "click", 0.0), // 45m after view 100: only view 101 in range
    (202L, ts("2026-01-01 11:00:00"), 2L, "click", 0.0), // 2h after the view: no match
    (203L, ts("2026-01-01 09:59:59"), 1L, "click", 0.0) // one second BEFORE view 100
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  private val expectedPairs = Set((200L, 100L), (200L, 101L), (201L, 101L))

  test("attributionJoin (batch): inclusive 30-minute window, same user only") {
    val got = Joins.attributionJoin(views, clicks)
      .select("click_id", "imp_id").as[(Long, Long)].collect().toSet
    assert(got == expectedPairs)
  }

  test("attributionJoin (streaming): same pairs through two file-source streams") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    views.write.parquet(s"$dir/views")
    clicks.write.parquet(s"$dir/clicks")
    val vs = spark.readStream.schema(views.schema).parquet(s"$dir/views")
    val cs = spark.readStream.schema(clicks.schema).parquet(s"$dir/clicks")
    val q = Joins.attributionJoin(vs, cs)
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(60000)
    val got = spark.table("ssj_test")
      .select("click_id", "imp_id").as[(Long, Long)].collect().toSet
    assert(got == expectedPairs)
  }

  test("enrich: stream-static left join keeps unmatched events with nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sse").toString
    clicks.write.parquet(s"$dir/clicks")
    val dim = Seq((1L, "gold"), (3L, "silver")).toDF("user_id", "tier")
    val cs = spark.readStream.schema(clicks.schema).parquet(s"$dir/clicks")
    val q = Joins.enrich(cs, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("sse_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(60000)
    val got = spark.table("sse_test")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toMap
    // user 1's clicks enriched; user 2 (no dim row) flows through with null
    assert(got == Map(200L -> Some("gold"), 201L -> Some("gold"),
      203L -> Some("gold"), 202L -> None))
  }

  test("attributionJoinOuter (streaming): unmatched impressions flush after the watermark passes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssoj").toString
    // batch 1 per side: the real data (imp 300 never matched; imp 301
    // matched by click 400). batch 2 per side: far-future flush events
    // that drag BOTH watermarks past imp_ts + 30m so 300's state evicts
    // and the null-extended row emits. The flush rows themselves stay in
    // state (watermark never passes them) — they must NOT appear.
    Seq((300L, ts("2026-01-01 10:00:00"), 9L, "view", 0.0),
        (301L, ts("2026-01-01 10:20:00"), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/views/b1")
    Seq((390L, ts("2026-01-01 12:00:00"), 98L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/views/b2")
    Seq((400L, ts("2026-01-01 10:25:00"), 1L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/clicks/b1")
    Seq((490L, ts("2026-01-01 12:00:00"), 99L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/clicks/b2")

    val vs = spark.readStream.schema(views.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/views/*")
    val cs = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/clicks/*")
    val q = Joins.attributionJoinOuter(vs, cs)
      .writeStream.format("memory").queryName("ssoj_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssoj_test")
      .select("imp_id", "click_id").as[(Long, Option[Long])].collect().toSet
    // 301 matched inner-style; 300 flushed as an outer null row once the
    // watermark passed 10:30; the 12:00 flush rows are still in state.
    assert(got == Set(301L -> Some(400L), 300L -> None))
  }

  test("attributionJoinOuter (batch): plain left interval join, every impression emits") {
    val got = Joins.attributionJoinOuter(views, clicks)
      .select("imp_id", "click_id").as[(Long, Option[Long])].collect().toSet
    assert(got == Set(100L -> Some(200L), 101L -> Some(200L),
      101L -> Some(201L), 102L -> None))
  }

  test("lastTouch picks the most recent impression per click") {
    val got = Joins.lastTouch(Joins.attributionJoin(views, clicks))
      .select("click_id", "imp_id", "n_candidates")
      .as[(Long, Long, Long)].collect().toSet
    // click 200 had two candidates; the later view (101) wins
    assert(got == Set((200L, 101L, 2L), (201L, 101L, 1L)))
  }
}
