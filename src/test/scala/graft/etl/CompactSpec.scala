package graft.etl

import java.nio.file.Files

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact merges small parquet files, preserves data, and is idempotent") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 1000).toDF("v").repartition(16).write.parquet(dir)
    val (n0, bytes) = Compact.parquetFootprint(spark, dir)
    assert(n0 == 16, s"fixture should start fragmented, got $n0 files")
    assert(Compact.compact(spark, dir, targetFileBytes = bytes) == 1)
    val (n1, _) = Compact.parquetFootprint(spark, Compact.resolve(spark, dir))
    assert(n1 == 1, s"expected a single compacted file, got $n1")
    assert(Compact.read(spark, dir).as[Int].collect().sorted.toSeq == (1 to 1000))
    // already compact → reported count unchanged, no rewrite pass
    assert(Compact.compact(spark, dir, targetFileBytes = bytes) == 1)
  }

  test("compact leaves a below-threshold directory untouched") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    (1 to 100).toDF("v").repartition(2).write.parquet(dir)
    assert(Compact.compact(spark, dir, targetFileBytes = 1L) == 2) // target ≥ current
    // never compacted → resolve is the plain directory, read still works
    assert(Compact.resolve(spark, dir) == dir)
    assert(Compact.read(spark, dir).count() == 100)
  }

  test("a reader succeeds at every step around the swap, seeing old or new data, never nothing") {
    val dir = Files.createTempDirectory("graft-compact3").toString + "/t"
    (1 to 500).toDF("v").repartition(8).write.parquet(dir)
    val (_, bytes) = Compact.parquetFootprint(spark, dir)
    def readSum(): Long = Compact.read(spark, dir).as[Int].collect().map(_.toLong).sum
    val expected = (1 to 500).map(_.toLong).sum

    // step 0: plain dir
    assert(readSum() == expected)
    // step 1: v=1 published (migration) — loose files gone, marker live
    Compact.compact(spark, dir, targetFileBytes = bytes)
    assert(readSum() == expected)
    assert(new java.io.File(dir + "/v=1", "_READY").isFile)

    // Now replay the publish of a SECOND compaction step by step, asserting
    // a reader succeeds between every pair of steps. Step A: the next
    // version directory exists, fully written, but carries no _READY marker
    // yet — reader must see OLD data.
    (501 to 600).toDF("v").write.mode("append").parquet(dir + "/v=1")
    val withAppend = (1 to 600).map(_.toLong).sum
    assert(readSum() == withAppend)
    spark.read.parquet(dir + "/v=1").repartition(1)
      .write.parquet(dir + "/v=2")
    assert(readSum() == withAppend, "pre-publish reader must still see v=1")

    // Step B: marker create — the same create-once publish compact
    // performs; reader flips to NEW data; old version stays as grace
    Compact.publish(spark, dir, 2L)
    assert(readSum() == withAppend, "post-publish reader must see v=2")
    assert(new java.io.File(dir, "v=1").isDirectory, "previous version kept as reader grace")
  }

  test("a concurrent reader never fails across repeated compaction cycles") {
    val dir = Files.createTempDirectory("graft-compact4").toString + "/t"
    (1 to 300).toDF("v").repartition(6).write.parquet(dir)
    val (_, bytes) = Compact.parquetFootprint(spark, dir)
    @volatile var readerError: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && readerError.isEmpty) {
        try {
          val n = Compact.read(spark, dir).count()
          assert(n >= 300, s"reader saw a truncated dataset: $n rows")
        } catch { case t: Throwable => readerError = Some(t) }
      }
    })
    reader.start()
    try {
      // retainPriorVersions=3: this test compacts every ~1s — a cadence
      // comparable to a loaded reader's scan — which is exactly the case
      // the retention knob exists for (grace is measured in CYCLES)
      Compact.compact(spark, dir, targetFileBytes = bytes,
        retainPriorVersions = 3)
      (1 to 3).foreach { i =>
        Thread.sleep(500)
        (1 to 50).map(_ + 300 * i).toDF("v").repartition(4)
          .write.mode("append").parquet(Compact.resolve(spark, dir))
        Compact.compact(spark, dir, targetFileBytes = Long.MaxValue / 2,
          retainPriorVersions = 3)
      }
    } finally {
      stop = true
      reader.join(30000)
    }
    assert(readerError.isEmpty, s"concurrent reader failed: ${readerError.map(_.getMessage)}")
  }

  test("writeClustered partitions by value and survives a pruned read") {
    val dir = Files.createTempDirectory("graft-clustered").toString + "/t"
    val df = Seq((1L, "click", 5), (2L, "view", 6), (3L, "click", 7),
      (4L, "purchase", 8)).toDF("id", "etype", "x")
    Compact.writeClustered(df, dir, Seq("etype"), Seq("id"))
    val root = new java.io.File(dir)
    val parts = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("etype=click", "etype=purchase", "etype=view"))
    // one data file per partition value (the repartition's purpose)
    parts.foreach { p =>
      val files = new java.io.File(root, p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$p fragmented into ${files.length} files")
    }
    val clicks = spark.read.parquet(dir).filter($"etype" === "click")
      .select("id").as[Long].collect().sorted
    assert(clicks.toSeq == Seq(1L, 3L))
  }
}
