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
    val (n1, _) = Compact.parquetFootprint(spark, dir)
    assert(n1 == 1, s"expected a single compacted file, got $n1")
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == (1 to 1000))
    // already compact → reported count unchanged, no rewrite pass
    assert(Compact.compact(spark, dir, targetFileBytes = bytes) == 1)
  }

  test("compact leaves a below-threshold directory untouched") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    (1 to 100).toDF("v").repartition(2).write.parquet(dir)
    assert(Compact.compact(spark, dir, targetFileBytes = 1L) == 2) // target ≥ current
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
