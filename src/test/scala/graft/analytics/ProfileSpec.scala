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
}
