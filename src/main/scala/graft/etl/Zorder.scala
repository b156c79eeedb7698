package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimension data skipping.
  *
  * Sorting a table by one column makes parquet min/max row-group stats
  * razor-sharp on that column and useless on every other; interleaving the
  * bits of two bucketed dimensions into one z-value and range-sorting on
  * THAT gives every file a small z-interval whose projection onto EACH
  * dimension is a tight range — so selective predicates on either (or
  * both) dimensions skip most files/row-groups. This is the layout trick
  * modern lakehouse table formats expose as `ZORDER BY`/clustered writes;
  * at 100 TB it is the difference between a scan-everything query and one
  * that touches a few percent of the files. (Morton order, 1966; the same
  * curve that backs multi-dim indexing in Bayer's UB-trees.)
  *
  * The z-value is a pure arithmetic Column expression (shift/mask/sum —
  * whole-stage-codegen'd, no UDF) over PRE-BUCKETED non-negative ints;
  * bucketing the raw values (e.g. `floor(price / step)`) is the caller's
  * one obligation, because only the caller knows each dimension's range.
  */
object Zorder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions): z = Σᵢ ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1). Inputs
    * are masked to `bits` first, so out-of-range buckets wrap rather than
    * corrupt high bits.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xx = x.cast("long").bitwiseAND(lit(mask))
    val yy = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftright(xx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The identical interleave as portable SQL text over column exprs
    * `x`/`y` — the construction any engine (and the DuckDB oracle)
    * reproduces bit-for-bit.
    */
  def zvalueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"((((($x) >> $i) & 1) * ${1L << (2 * i)}) + (((($y) >> $i) & 1) * ${1L << (2 * i + 1)}))"
    }.mkString(" + ")
  }

  /** Write `df` as `numFiles` parquet files range-partitioned and sorted
    * by the z-value of the two bucketed dimensions: each file covers one
    * contiguous z-interval, i.e. a tight rectangle in (x, y) — the
    * data-skipping layout. Range partitioning samples z bounds, so files
    * are balanced even on skewed data; the sort keeps row-group stats
    * tight WITHIN each file too.
    */
  def writeZordered(df: DataFrame, dir: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zvalue(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }
}
