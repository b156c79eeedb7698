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

  test("kmvQuantiles: exact below k, rank error bounded above k, order-insensitive") {
    // "small" (40 rows < k=64): the sample IS the group → exact quantiles.
    // "big" (4000 rows, values 1..4000 uniform): a 256-row uniform sample's
    // median must land within ~3/sqrt(256) ≈ 19% rank error of the truth.
    val rows = (1 to 40).map(i => ("small", i.toLong, i.toLong * 10)) ++
      (1 to 4000).map(i => ("big", 1000L + i, i.toLong))
    val df = rows.toDF("key", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketch.kmvQuantiles(d, col("key"), col("id"), col("v"), k = 256,
          fractions = Seq(0.5))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val out = run(df)
    val (nSmall, medSmall) = out("small")
    assert(nSmall == 40L && medSmall == 205.0, // type-7 median of 10,20..400
      s"small group must be exact: $out")
    val (nBig, medBig) = out("big")
    assert(nBig == 256L)
    assert(math.abs(medBig - 2000.0) / 4000.0 < 0.19,
      s"big-group median rank error too large: $medBig vs 2000")
    // deterministic sample → identical answer under any row order
    val shuffled = run(scala.util.Random.shuffle(rows).toDF("key", "id", "v"))
    assert(shuffled == out)
  }

  test("kmvDistinct is deterministic and insensitive to row order") {
    val rows = (1 to 3000).map(i => ("g", (i % 997).toLong))
    val a = Sketch.kmvDistinct(rows.toDF("key", "v"), col("key"), col("v"), k = 32)
      .collect()(0).getLong(1)
    val b = Sketch.kmvDistinct(scala.util.Random.shuffle(rows).toDF("key", "v"),
      col("key"), col("v"), k = 32).collect()(0).getLong(1)
    assert(a == b)
  }

  test("hllDistinct: within HLL error of exact, agrees with the builtin twin, order-insensitive") {
    // m=256 registers → standard error ~ 1.04/sqrt(256) ≈ 6.5%; assert a
    // generous 3-sigma 20% on 5000 and 800 distincts (raw estimator, no
    // small-range correction — both are comfortably above 2.5m = 640)
    val rows = (1 to 5000).flatMap(i => Seq(("a", Some(i.toLong)), ("a", Some(i.toLong)))) ++
      (1 to 800).map(i => ("b", Some(900000L + i))) ++
      Seq(("nulls", Option.empty[Long]))
    val df = rows.toDF("key", "v")
    val out = Sketch.hllDistinct(df, col("key"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    assert(math.abs(out("a") - 5000.0) / 5000.0 < 0.20, s"a: $out")
    assert(math.abs(out("b") - 800.0) / 800.0 < 0.20, s"b: $out")
    assert(!out.contains("nulls"), "null-only group must vanish (count-distinct semantics)")
    // the builtin HLL++ twin (same raw-estimator family, rsd 5% default)
    // must land in the same neighborhood — a cheap cross-check that our
    // register construction implements the same estimator, not a lookalike
    val builtin = df.filter(col("v").isNotNull).groupBy("key")
      .agg(approx_count_distinct("v").as("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    for (k <- Seq("a", "b"))
      assert(math.abs(out(k) - builtin(k)) / builtin(k) < 0.25,
        s"md5-HLL and builtin disagree on $k: ${out(k)} vs ${builtin(k)}")
    // deterministic registers → identical answer under any row order
    val shuffled = Sketch.hllDistinct(
        scala.util.Random.shuffle(rows).toDF("key", "v"), col("key"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    assert(shuffled == out)
  }

  test("hllRollup: rolled-up fine registers give the identical coarse estimate") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 5000).map { i =>
      (s"m${i % 3}", s"d${i % 17}", rnd.nextInt(800).toLong)
    }
    val df = rows.toDF("month", "day", "v")
    val direct = Sketch.hllDistinct(df, col("month"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = Sketch.hllRollup(df, col("month"), col("day"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct, s"rollup must equal direct: $rolled vs $direct")
  }

  test("kmvSetOps: exact union/intersection/jaccard when both populations fit in the sketch") {
    val a = (0L until 100L).toDF("v") // A = [0, 100)
    val b = (60L until 150L).toDF("v") // B = [60, 150): |A∪B|=150, |A∩B|=40
    val Array(r) = Sketch.kmvSetOps(a, b, col("v"), col("v"), k = 256).collect()
    assert(r.getAs[Long]("union_e6") == 150L * 1000000)
    assert(r.getAs[Long]("intersect_e6") == 40L * 1000000)
    assert(r.getAs[Long]("jaccard_e6") == 40L * 1000000 / 150) // integer div
  }

  test("kmvSetOps: estimator path lands within KMV error bounds above k") {
    val a = (0L until 20000L).toDF("v") // |A∪B| = 30000, |A∩B| = 10000
    val b = (10000L until 30000L).toDF("v")
    val Array(r) = Sketch.kmvSetOps(a, b, col("v"), col("v"), k = 512).collect()
    val (u, i) = (r.getAs[Long]("union_e6") / 1e6, r.getAs[Long]("intersect_e6") / 1e6)
    // rel. error ~ 1/sqrt(k) ≈ 4.4%; allow 4 sigma
    assert(math.abs(u - 30000) / 30000.0 < 0.18, s"union est $u")
    assert(math.abs(i - 10000) / 10000.0 < 0.35, s"intersect est $i") // J error compounds
    // disjoint populations: intersection and jaccard exactly 0
    val c = (100000L until 120000L).toDF("v")
    val Array(d) = Sketch.kmvSetOps(a, c, col("v"), col("v"), k = 512).collect()
    assert(d.getAs[Long]("intersect_e6") == 0L && d.getAs[Long]("jaccard_e6") == 0L)
  }
}
