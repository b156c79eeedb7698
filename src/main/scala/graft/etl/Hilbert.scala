package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — the seam-free alternative to [[Zorder]].
  *
  * Both curves map pre-bucketed (x, y) to a 1-D sort key whose ranges
  * project to small (x, y) rectangles. Morton ranges are perfect squares
  * only when ALIGNED to power-of-4 boundaries; real file boundaries come
  * from range-partitioning row counts and land anywhere, and an unaligned
  * Morton range crosses bit-carry seams where the curve teleports across
  * the plane. The Hilbert curve is edge-adjacent at EVERY step (d and
  * d+1 are always Manhattan distance 1 apart — HilbertSpec proves the
  * bijection + unit-step property exhaustively), so arbitrary ranges stay
  * compact: measurably smaller per-file bounding boxes at file-sized
  * range widths (HilbertSpec pins Hilbert < Morton on the exact layout
  * metric). This is the clustering modern lakehouse formats expose as
  * `CLUSTER BY hilbert(...)`. (Hilbert 1891; xy→d recurrence as in the
  * standard iterated-rotation formulation.)
  *
  * The d-value is generated as ONE set of portable SQL fragments per
  * recursion level — CASE, &, +, -, times only: no shifts, no XOR, no UDF — and
  * consumed verbatim by both the Spark expression compiler and the DuckDB
  * oracle, so the two engines cannot drift. All intermediates stay in
  * [0, 2^bits), non-negative, LONG-typed.
  */
object Hilbert {

  /** Per-level rewrite (x', y', d') of the xy→d loop, as SQL text over
    * the prior level's column names. Level j consumes side s = 2^(bits-1-j):
    * quadrant = (3·rx) XOR ry spelled as a CASE (engine-portable), then
    * the conditional flip (n-1-·) and swap.
    */
  private def level(j: Int, bits: Int, xc: String, yc: String,
      dc: String): (String, String, String) = {
    val s = 1L << (bits - 1 - j)
    val n1 = (1L << bits) - 1
    val rx = s"(CASE WHEN ($xc & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($yc & $s) > 0 THEN 1 ELSE 0 END)"
    val quad = s"(CASE WHEN $rx = 0 THEN $ry WHEN $ry = 1 THEN 2 ELSE 3 END)"
    val d2 = s"($dc + ${s * s} * $quad)"
    val xr = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN $n1 - $xc ELSE $xc END)"
    val yr = s"(CASE WHEN $ry = 0 AND $rx = 1 THEN $n1 - $yc ELSE $yc END)"
    val xn = s"(CASE WHEN $ry = 0 THEN $yr ELSE $xr END)"
    val yn = s"(CASE WHEN $ry = 0 THEN $xr ELSE $yr END)"
    (xn, yn, d2)
  }

  /** Append column `out` = Hilbert d-index of (x, y), one narrow
    * projection per level (a linear column DAG — the textual expansion of
    * the recurrence is exponential, the DAG is not). Inputs must already
    * be bucketed to [0, 2^bits).
    */
  def addDvalue(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    var cur = df.withColumn("__hx0", x.cast("long"))
      .withColumn("__hy0", y.cast("long"))
      .withColumn("__hd0", lit(0L))
    for (j <- 0 until bits) {
      val (xn, yn, d2) = level(j, bits, s"__hx$j", s"__hy$j", s"__hd$j")
      cur = cur.selectExpr("*", s"$xn AS __hx${j + 1}",
        s"$yn AS __hy${j + 1}", s"$d2 AS __hd${j + 1}")
    }
    val keep = df.columns.toSeq :+ s"__hd$bits"
    cur.select(keep.map(col): _*).withColumnRenamed(s"__hd$bits", out)
  }

  /** The identical computation as a DuckDB CTE chain: `hl0 .. hl<bits>`
    * over base relation `base` (which must expose columns `xc`, `yc`),
    * final d column `__hd<bits>`. Fragments come from the same [[level]]
    * generator as [[addDvalue]] — one definition, two engines.
    */
  def dvalueCtes(base: String, bits: Int, xc: String, yc: String): String = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val head =
      s"hl0 AS (SELECT *, CAST($xc AS BIGINT) AS __hx0, CAST($yc AS BIGINT) AS __hy0, CAST(0 AS BIGINT) AS __hd0 FROM $base)"
    val steps = (0 until bits).map { j =>
      val (xn, yn, d2) = level(j, bits, s"__hx$j", s"__hy$j", s"__hd$j")
      s"hl${j + 1} AS (SELECT *, $xn AS __hx${j + 1}, $yn AS __hy${j + 1}, $d2 AS __hd${j + 1} FROM hl$j)"
    }
    (head +: steps).mkString(",\n")
  }

  /** Final d column name produced by [[dvalueCtes]]. */
  def dCol(bits: Int): String = s"__hd$bits"
}
