package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave for cross-checking the Column expression. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.foldLeft(0L)(_ | _)

  test("zvalue matches the reference interleave and masks out-of-range bits") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65536L, 1L)) // 65536 masks to 0
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), Zorder.zvalue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z == mortonRef(x & 65535L, y & 65535L, 16), s"($x, $y)")
    }
  }

  test("writeZordered files cover tight rectangles; a linear sort does not") {
    // 64x64 uniform grid: every (x, y) cell once
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), expr("id DIV 64").as("y"))
    val dir = Files.createTempDirectory("graft-zorder").toString

    // per-file min/max extents — what parquet row-group stats expose to
    // the scan's skipping logic
    def fileExtents(path: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x") as "x0", max("x") as "x1", min("y") as "y0", max("y") as "y1")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => (r._2, r._3, r._4, r._5)).toSeq

    Zorder.writeZordered(grid, s"$dir/z", col("x"), col("y"), numFiles = 16)
    val zExt = fileExtents(s"$dir/z")
    assert(zExt.size == 16, s"expected 16 z files, got ${zExt.size}")

    // baseline: sort by x only — every file spans ALL of y
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    val linExt = fileExtents(s"$dir/linear")

    // z files bound BOTH dimensions (16 contiguous ranges of a 12-bit
    // curve are exact 16x16 quadrants); the linear layout bounds only x
    assert(zExt.forall { case (x0, x1, y0, y1) => x1 - x0 <= 15 && y1 - y0 <= 15 },
      s"z files must be tight on both dims: $zExt")
    assert(linExt.forall { case (_, _, y0, y1) => y1 - y0 == 63 },
      s"x-sorted files should span all of y: $linExt")
    // the pruning consequence: a predicate on y alone skips 3/4 of the
    // z files but not one of the linear files
    def touched(ext: Seq[(Long, Long, Long, Long)]): Int =
      ext.count { case (_, _, y0, y1) => y0 <= 15 && y1 >= 0 } // y IN [0, 15]
    assert(touched(zExt) == 4 && touched(linExt) == 16,
      s"z touched ${touched(zExt)}, linear touched ${touched(linExt)}")
  }

  test("z-range buckets project to bounded extents on both dimensions") {
    // the query's audit shape: fixed-width z buckets over a uniform grid
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), expr("id DIV 64").as("y"))
    val ext = grid
      .select(Zorder.zvalue(col("x"), col("y"), bits = 6).as("z"),
        col("x"), col("y"))
      .groupBy(shiftright(col("z"), 8).as("bucket")) // 16 buckets of the 12-bit curve
      .agg(max(col("x")) - min(col("x")) as "xw", max(col("y")) - min(col("y")) as "yw")
      .as[(Long, Long, Long)].collect()
    assert(ext.length == 16)
    // a 256-point z-interval of a 6+6-bit curve is a 16x16 quadrant
    ext.foreach { case (b, xw, yw) =>
      assert(xw <= 15 && yw <= 15, s"bucket $b spans ${xw + 1} x ${yw + 1}")
    }
  }
}
