package graft.analytics

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, exact distincts and renders min/max") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), Some("a")),
      (Some(3L), None),
      (None, Some("a"))
    ).toDF("k", "s")
    val rows = Profile.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().sortBy(_._1).toList
    assert(rows == List(
      ("k", 4L, 1L, 2L, Some("1"), Some("3")),
      ("s", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("profile of an all-null column yields null min/max and zero distinct") {
    val df = Seq.fill(3)(Option.empty[Long]).toDF("k")
    val rows = Profile.profile(df, Seq("k"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toList
    assert(rows == List(("k", 3L, 3L, 0L, None, None)))
  }

  test("each profile branch scans only its own column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    spark.range(0, 100).selectExpr("id AS a", "id * 2 AS b", "CAST(id AS STRING) AS c")
      .write.mode("overwrite").parquet(dir)
    val q = Profile.profile(spark.read.parquet(dir), Seq("a"))
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.contains("ReadSchema") && !s.contains("b:") && !s.contains("c:"),
        s"profile branch reads columns it does not profile:\n$s")
    }
    intercept[IllegalArgumentException] { Profile.profile(q, Seq("nope")) }
  }

  test("fingerprint is order- and partitioning-independent, value-sensitive") {
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L))
      .toDF("g", "s", "v")
    val digest = Profile.fingerprint(base, col("g"), Seq(col("s"), col("v")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // shuffled row order + different partitioning → identical digest
    val shuffled = Profile.fingerprint(
        base.orderBy(col("v").desc).repartition(7), col("g"),
        Seq(col("s"), col("v")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(digest == shuffled)
    assert(digest.map(r => (r._1, r._2)) == List((1L, 2L), (2L, 1L)))
    // a single changed value changes its group's digest and no other
    val tweaked = Profile.fingerprint(
        Seq((1L, "a", 10L), (1L, "b", 21L), (2L, "c", 30L)).toDF("g", "s", "v"),
        col("g"), Seq(col("s"), col("v")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert((tweaked.head._3, tweaked.head._4) != (digest.head._3, digest.head._4))
    assert(tweaked(1) == digest(1))
  }

  test("fingerprint renders NULL positionally: (a,NULL) differs from (NULL,a)") {
    import org.apache.spark.sql.functions._
    val x = Seq((1L, Some("a"), Option.empty[String])).toDF("g", "c1", "c2")
    val y = Seq((1L, Option.empty[String], Some("a"))).toDF("g", "c1", "c2")
    val dx = Profile.fingerprint(x, col("g"), Seq(col("c1"), col("c2")))
      .as[(Long, Long, Long, Long)].collect().head
    val dy = Profile.fingerprint(y, col("g"), Seq(col("c1"), col("c2")))
      .as[(Long, Long, Long, Long)].collect().head
    assert((dx._3, dx._4) != (dy._3, dy._4),
      "NULL position must be part of the digest")
  }

  test("fingerprint hi/lo lanes each stay within the per-row 16-bit bound") {
    import org.apache.spark.sql.functions._
    // the lane split exists so a group's sum provably fits a long at any
    // realistic row count (< 2^47 rows): per row each lane is < 2^16
    val df = spark.range(0, 2000).selectExpr("id % 3 AS g", "id AS v")
    val perRow = df.select(
      Sketch.hashPoint32(concat(col("v").cast("string"))).as("h"))
    val bad = perRow.filter(
      shiftright(col("h"), 16) >= 65536L ||
        col("h").bitwiseAND(lit(0xFFFFL)) >= 65536L ||
        col("h") < 0L || col("h") > 0xFFFFFFFFL)
    assert(bad.count() == 0)
    val lanes = Profile.fingerprint(df, col("g"), Seq(col("v")))
      .as[(Long, Long, Long, Long)].collect()
    lanes.foreach { case (_, n, hi, lo) =>
      assert(hi >= 0 && hi < n * 65536L, s"hi lane out of bound: $hi")
      assert(lo >= 0 && lo < n * 65536L, s"lo lane out of bound: $lo")
    }
  }
}
