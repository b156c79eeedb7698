package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the two properties that make Hilbert clustering worth shipping:
  * (1) the generated expression IS the Hilbert curve — an exhaustive
  * bijection + unit-step check over the full 2^bits × 2^bits grid; (2) it
  * beats Morton on the layout metric that matters — average per-file
  * bounding-box semiperimeter at a file-sized, non-power-of-4-aligned
  * range width (aligned power-of-4 ranges are squares under BOTH curves;
  * real range-partitioned file boundaries are never aligned).
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("d-index is a bijection with unit Manhattan steps (exhaustive, bits=4)") {
    val bits = 4
    val n = 1 << bits
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), expr(s"id div $n").as("y"))
    val d2xy = Hilbert.addDvalue(grid, col("x"), col("y"), bits, "d")
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(d2xy.keySet == (0 until n * n).map(_.toLong).toSet, "not a bijection")
    val walk = (0 until n * n - 1).map(_.toLong)
    assert(walk.forall { d =>
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }, "curve is not edge-adjacent")
  }

  test("file-width ranges are tighter than Morton on unaligned widths") {
    val bits = 8
    // deterministic pseudo-random points in the 256×256 grid
    val pts = spark.range(0, 4096).select(
      ((col("id") * 2654435761L) % 256).as("x"),
      ((col("id") * 40503L) % 256).as("y"))
    val width = 1000L // ~66 cells/file-sized, NOT a power of 4
    def avgSemiPerimeter(keyed: org.apache.spark.sql.DataFrame): Double = {
      val r = keyed.groupBy(expr(s"k DIV $width").as("bucket"))
        .agg((max("x") - min("x") + max("y") - min("y")).as("sp"))
        .agg(sum("sp").cast("double").as("tot"), count(lit(1)).as("nb"))
        .head()
      r.getDouble(0) / r.getLong(1)
    }
    val hil = avgSemiPerimeter(
      Hilbert.addDvalue(pts, col("x"), col("y"), bits, "k"))
    val mor = avgSemiPerimeter(
      pts.withColumn("k", Zorder.zvalue(col("x"), col("y"), bits)))
    assert(hil < mor, s"hilbert=$hil should beat morton=$mor at width $width")
  }
}
