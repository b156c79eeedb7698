package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, within KMV error bounds above k, nulls ignored") {
    // group "small": 50 distinct values (< k=64) → exact
    // group "big": 5000 distinct values → estimate within ~5/sqrt(64) ≈ 12%
    // group "nulls": only null values → no output row (count-distinct semantics)
    val rows =
      (1 to 50).map(i => ("small", Some(i.toLong))) ++
      (1 to 5000).flatMap(i => Seq(("big", Some(100000L + i)), ("big", Some(100000L + i)))) ++
      Seq(("nulls", Option.empty[Long]))
    val df = rows.toDF("key", "v")
    val out = Sketch.kmvDistinct(df, col("key"), col("v"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("small") == 50L * 1000000L, s"small group must be exact: $out")
    val bigEst = out("big").toDouble / 1e6
    assert(math.abs(bigEst - 5000.0) / 5000.0 < 0.25,
      s"big-group estimate too far off: $bigEst vs 5000")
    assert(!out.contains("nulls"))
  }

  test("CMS: never undercounts, exact when buckets are sparse, zero for absent items") {
    val stream = Seq.fill(40)("apple") ++ Seq.fill(7)("pear") ++
      (1 to 30).map(i => s"noise$i")
    val items = stream.toDF("w")
    val m = Sketch.cmsMatrix(items, col("w"), d = 4, w = 4096)
    val probes = Seq("apple", "pear", "absent").toDF("w")
    val est = Sketch.cmsEstimate(m, probes, col("w"), d = 4, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS is an overcount, and with 77 items in 4x4096 buckets collisions
    // are vanishingly unlikely → exact here
    assert(est("apple") == 40L, est.toString)
    assert(est("pear") == 7L, est.toString)
    assert(est("absent") == 0L, est.toString)
    // the matrix is fixed-size: at most d*w rows regardless of stream size
    assert(m.count() <= 4L * 4096L)
  }

  test("kmvDistinct is deterministic and insensitive to row order") {
    val rows = (1 to 3000).map(i => ("g", (i % 997).toLong))
    val a = Sketch.kmvDistinct(rows.toDF("key", "v"), col("key"), col("v"), k = 32)
      .collect()(0).getLong(1)
    val b = Sketch.kmvDistinct(scala.util.Random.shuffle(rows).toDF("key", "v"),
      col("key"), col("v"), k = 32).collect()(0).getLong(1)
    assert(a == b)
  }
}
