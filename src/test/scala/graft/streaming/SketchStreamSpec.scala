package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.analytics.Sketch

/** Streaming HLL == batch HLL, exactly: the state-store register path and
  * the oracle-verified Catalyst path must produce the same fixed-point
  * estimate on the same rows — that is the whole point of the md5-portable
  * register construction.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("per-JVM register construction matches the Catalyst construction exactly") {
    val p = Sketch.HllParams()
    val values = (1 to 2000).map(i => s"user_$i") ++ Seq("", "0", "ünïcode-Ω")
    // batch side: one group, values as the counted column
    val batch = Sketch.hllDistinct(
      values.map(v => ("g", v)).toDF("key", "v"), col("key"), col("v"), p)
      .collect()(0).getLong(1)
    // streaming-kernel side: fold the same values through the JVM register
    // update + estimator
    val regs = new Array[Byte](p.m)
    values.foreach { v =>
      val (b, r) = SketchStream.bucketAndRho(v, p)
      if (r > (regs(b) & 0xff)) regs(b) = r.toByte
    }
    assert(SketchStream.estimateE6(regs, p) == batch,
      "JVM kernel and Catalyst expressions must agree bit-for-bit")
  }

  test("streamingWindowDistinct: windows close by watermark with batch-exact estimates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_stream").toString
    val schema = Seq.empty[(Long, Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      val q = SketchStream.streamingWindowDistinct(stream, windowMinutes = 60)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      q.awaitTermination(60000)
    }
    // batch 1: two windows' worth of events — 3 distinct clickers and 2
    // distinct viewers in the 10:00 window, 1 clicker in the 11:00 window
    val b1 = Seq(
      (1L, ts("2026-01-01 10:00:10"), 1L, "click", 1.0),
      (2L, ts("2026-01-01 10:10:00"), 2L, "click", 1.0),
      (3L, ts("2026-01-01 10:20:00"), 3L, "click", 1.0),
      (4L, ts("2026-01-01 10:20:00"), 2L, "click", 1.0), // dup user
      (5L, ts("2026-01-01 10:30:00"), 7L, "view", 1.0),
      (6L, ts("2026-01-01 10:40:00"), 8L, "view", 1.0),
      (7L, ts("2026-01-01 11:15:00"), 9L, "click", 1.0))
    b1.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    // nothing closed yet: watermark (max ts - 1h) hasn't passed any window
    // end; batch 2's far-future event closes everything
    Seq((8L, ts("2026-01-01 20:00:00"), 99L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val got = spark.read.parquet(s"$dir/out")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    // expected: the batch HLL over the same (window, type) groups
    val expected = b1.map { case (_, t, uid, et, _) =>
      val winStart = Timestamp.valueOf(t.toLocalDateTime.withMinute(0).withSecond(0).withNano(0))
      (winStart.toString, et, uid)
    }.groupBy(e => (e._1, e._2))
    expected.foreach { case ((ws, et), rows) =>
      val batch = Sketch.hllDistinct(
        rows.map(_._3.toString).map(v => ("g", v)).toDF("key", "v"),
        col("key"), col("v")).collect()(0).getLong(1)
      assert(got.get((ws, et)).contains(batch),
        s"($ws, $et): streaming ${got.get((ws, et))} != batch $batch; all=$got")
    }
    // small windows: raw HLL on tiny cardinalities overestimates, but the
    // estimate is still deterministic and in a sane band
    assert(got.size == 3, s"three closed windows expected, got $got")
  }
}
