package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's scrape rate limit (extract.py:64 `time.sleep(2)`)
  * re-expressed as source admission control: `maxFilesPerTrigger = 1`
  * makes each micro-batch admit exactly one source file, and the
  * ProcessingTime trigger paces batch starts. The spec pins the admission
  * semantics (per-batch file granularity + no file lost or duplicated);
  * the wall-clock spacing itself is Spark's trigger contract, not ours.
  */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  test("maxFilesPerTrigger=1: one file per micro-batch, all files exactly once") {
    val root = Files.createTempDirectory("graft_ratelimit").toString
    val src = s"$root/src"
    // three "pages", one parquet file each (repartition(1) per write)
    for (p <- 1 to 3)
      Seq((p.toLong, s"page $p")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(src)
    val schema = Seq.empty[(Long, String)].toDF("id", "s").schema

    val batches = new ConcurrentLinkedQueue[(Long, Seq[String], Long)]()
    val q = Ingest.startRateLimitedIngest(spark, src, schema,
      filesPerTrigger = 1, interval = "50 milliseconds",
      checkpoint = s"$root/ckpt") { (df, id) =>
      val files = df.select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSeq
      batches.add((id, files, df.count()))
    }
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (batches.asScala.map(_._3).sum < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally q.stop()

    val done = batches.asScala.toSeq.filter(_._3 > 0)
    assert(done.map(_._3).sum == 3, s"expected 3 rows total, got $done")
    // admission granularity: every non-empty batch read exactly ONE file
    assert(done.forall(_._2.size == 1),
      s"a batch admitted more than one file: $done")
    // no file processed twice
    val allFiles = done.flatMap(_._2)
    assert(allFiles.distinct.size == allFiles.size)
  }
}
