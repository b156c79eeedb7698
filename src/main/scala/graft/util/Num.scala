package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers for oracle-comparable outputs. */
object Num {

  /** Fixed-point projection of a double: floor(x * 1e6) as long.
    *
    * Cross-engine double comparison is fragile at the formatting/rounding
    * layer (Spark rounds via BigDecimal HALF_UP, DuckDB via C round — they
    * can disagree in the last ulp). `floor` of an identical IEEE double is
    * identical in every engine, so compared queries emit `*_e6` longs
    * instead of raw doubles. The inputs stay exact (decimal sums, int/int
    * divisions), so the doubles themselves are bit-equal across engines.
    */
  def e6(c: Column): Column = floor(c * 1e6).cast("long")

  /** Exact cents of a DECIMAL(18,2)-summable measure, as long. */
  def cents(c: Column): Column =
    (sum(c.cast("decimal(18,2)")) * 100).cast("long")
}
