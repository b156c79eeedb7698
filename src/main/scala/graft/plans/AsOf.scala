package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (time-travel) join — for each left row, the single latest right
  * row of the same key with right.time <= left.time. Spark has no native
  * operator; the standard composition (SURVEY §2.12 / guide preference
  * order (a)) is union-tag → per-key ordered window → carry-forward:
  *
  *  1. tag both sides and union them (right payloads packed in a struct,
  *     left rows carry a NULL struct)
  *  2. one shuffle on key; within each key sort by (time, side, payload) —
  *     right rows sort BEFORE a left row at the same timestamp, giving
  *     the inclusive `right.time <= left.time` semantics, and the payload
  *     tiebreak makes duplicate (key, time) right rows pick
  *     deterministically (the greatest payload struct wins)
  *  3. `last(payload, ignoreNulls)` over rows-unbounded-preceding carries
  *     the latest right payload forward onto every left row
  *
  * Right rows with NULL time are dropped (NULL <= t is never true — the
  * same semantics as SQL ASOF). Scale shape: exactly one exchange (the
  * key), sort within partitions, no join explosion — each left row meets
  * only the carried-forward scalar, never the right side's history.
  * Skewed keys behave like any windowed aggregation (salt upstream if one
  * key dominates).
  */
object AsOf {

  /** @param left      probe side; one output row per left row
    * @param right     reference side, the "latest value as of t" source
    * @param key       equi-join key column name (both sides)
    * @param time      event-time column name (both sides)
    * @param rightVals right-side columns to carry (emitted as
    *                  `asof_<name>`, NULL when no right row precedes).
    *                  Must be ORDERABLE types (they serve as the
    *                  deterministic tiebreak for duplicate (key, time)
    *                  right rows) — carrying a map requires pre-
    *                  aggregating duplicates away first.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val leftCols = left.columns.toSeq
    val rvType = StructType(rightVals.map(v => right.schema(v)))

    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rvType).as("__rv")): _*)
    // single select: every left column either exists on the right (key,
    // time) or is null-padded — one projection, not a withColumn chain
    val r = right
      .filter(col(time).isNotNull)
      .select(
        leftCols.map { c =>
          if (c == key || c == time) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } ++ Seq(lit(0).as("__side"),
          struct(rightVals.map(col).toIndexedSeq: _*).as("__rv")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    carried.select(
      leftCols.map(col) ++
        rightVals.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }

  /** [[asofJoin]] with a staleness bound (pandas merge_asof `tolerance`):
    * a matched right row older than `toleranceSeconds` before the left
    * timestamp is treated as NO match — every carried column nulls out,
    * including the match time. Composed on top of asofJoin by carrying
    * the right row's own time and gating the payload on the measured
    * lag, so the tolerance costs one projection, not a different plan.
    * `time` must be a timestamp column on both sides.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      time: String, rightVals: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(!rightVals.contains(time), "time is carried implicitly")
    val j = asofJoin(left, right, key, time, rightVals :+ time)
    val stale = col(s"asof_$time").isNull ||
      unix_micros(col(time)) - unix_micros(col(s"asof_$time")) >
        toleranceSeconds * 1000000L
    (rightVals :+ time).foldLeft(j) { (df, v) =>
      df.withColumn(s"asof_$v", when(stale, lit(null)).otherwise(col(s"asof_$v")))
    }
  }
}
