package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming corpus ingest with exact cross-batch dedup (bounded state:
  * the fingerprint store is parquet on disk, not the state store).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch and in-batch duplicates are dropped across stream restarts") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val src = s"$root/src"; val corpus = s"$root/corpus"
    val fps = s"$root/fps"; val ckpt = s"$root/ckpt"
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema

    // batch 1: two distinct docs
    Seq((1L, "alpha text one"), (2L, "beta text two"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val q1 = Ingest.startDedupedIngest(spark, src, schema, "doc_id", "text",
      corpus, fps, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L))

    // batch 2 (after a restart): one cross-batch dup (same text as doc 2),
    // one fresh doc duplicated within the batch (min id must win)
    Seq((3L, "beta text two"), (5L, "gamma text three"), (4L, "gamma text three"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val q2 = Ingest.startDedupedIngest(spark, src, schema, "doc_id", "text",
      corpus, fps, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 4L))
    // the store holds exactly one fingerprint per surviving doc
    assert(spark.read.parquet(fps).distinct().count() == 3)

    // replaying already-known content appends nothing (idempotent on
    // content, regardless of ids)
    Seq((9L, "alpha text one")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q3 = Ingest.startDedupedIngest(spark, src, schema, "doc_id", "text",
      corpus, fps, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(corpus).count() == 3)
  }

  test("watermark dedup: exact within the horizon, re-admits after expiry (bounded state)") {
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val root = Files.createTempDirectory("graft_wmdedup").toString
    val src = s"$root/src"; val corpus = s"$root/corpus"; val ckpt = s"$root/ckpt"
    val schema = Seq.empty[(Long, String, Timestamp)]
      .toDF("doc_id", "text", "ts").schema
    def run(rows: (Long, String, Timestamp)*): Unit = {
      rows.toDF("doc_id", "text", "ts").write.mode("append").parquet(src)
      Ingest.startWatermarkDedupedIngest(spark, src, schema, "text", "ts",
        corpus, ckpt, horizon = "30 minutes").awaitTermination()
    }
    def ids: Seq[Long] =
      spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq

    // in-batch duplicate content: one survivor
    run((1L, "alpha text", ts("2026-01-01 10:00:00")),
      (2L, "alpha text", ts("2026-01-01 10:01:00")))
    assert(ids.size == 1 && Set(1L, 2L).contains(ids.head))
    val kept = ids.head

    // cross-batch duplicate WITHIN the 30-min horizon: dropped
    run((3L, "alpha text", ts("2026-01-01 10:05:00")))
    assert(ids == Seq(kept))

    // advance the watermark well past the alpha entry's expiry…
    run((4L, "delta text", ts("2026-01-01 12:00:00")))
    assert(ids == Seq(kept, 4L).sorted)

    // …and the SAME content is now re-admitted: the documented horizon
    // contract of the bounded-state path (the store-backed ingest above
    // keeps exactness forever at the cost of owning a store)
    run((5L, "alpha text", ts("2026-01-01 12:01:00")))
    assert(ids == Seq(kept, 4L, 5L).sorted)
  }
}
