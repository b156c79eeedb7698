package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band/range join — pairs whose numeric or time attributes fall within a
  * band of each other (|l.t - r.t| <= width, or l.t in [r.lo, r.hi]).
  * Spark plans a raw inequality join as a broadcast nested loop (O(n·m));
  * the scale-safe composition is interval bucketing:
  *
  *  1. bucket both sides by floor(t / width)
  *  2. one side also probes the adjacent bucket(s) — any in-band pair is
  *     in the same or a neighboring bucket
  *  3. equi-join on the bucket key, then apply the exact band predicate
  *
  * The join fans out each right row to 3 bucket keys (own + both
  * neighbors) and each left row to 1, so the plan is a plain shuffled
  * equi-join — linear in input plus true-match volume (same shape as the
  * LSH/length-block dedup joins).
  */
object RangeJoin {

  /** Pairs (l, r) with |l(timeCol) - r(timeCol)| <= width, both sides
    * keyed by an equi key first (band within key). Columns from each side
    * are prefixed l_/r_. `timeCol` must be numeric (cast timestamps to
    * epoch micros upstream).
    */
  def bandPairs(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    // integer `div`, not floor(x / width): double division loses exactness
    // beyond ~2^53 and can shift a bucket by one. For an in-band pair
    // (|Δ| <= width) the truncating quotients differ by at most 1, so the
    // ±1 neighbor probes still cover the band for any sign of t.
    val lb = left.select(col(key).as("__k"), col(timeCol).as("__lt"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
      .withColumn("__b", expr(s"__lt div $width"))
    // probe own + both neighbor buckets so the band is fully covered
    // regardless of which side of the boundary the partner falls on
    val rb = right.select(col(key).as("__k"), col(timeCol).as("__rt"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
      .withColumn("__b0", expr(s"__rt div $width"))
      .select(col("__k"), col("__rt"), col("__r"),
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)).as("__b"))
    lb.join(rb, Seq("__k", "__b"))
      .filter(abs(col("__lt") - col("__rt")) <= width)
      .select(col("__l").as("l"), col("__r").as("r"))
  }
}
