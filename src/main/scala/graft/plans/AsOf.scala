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

  /** Nearest-neighbor as-of (pandas merge_asof `direction='nearest'`):
    * for each left row, the right row of the same key minimizing |Δt|,
    * looking BOTH ways. Composed from the same single-shuffle union-tag
    * frame: the backward candidate is the carry-forward window of
    * [[asofJoin]], the forward candidate is the mirrored
    * first-non-null over [current, unbounded following] — two window
    * functions over ONE sort, still exactly one exchange, no join
    * explosion. An equidistant pair resolves BACKWARD (and an equal-time
    * right row is a backward match with Δ = 0 — the forward frame sees
    * only strictly-later rights, since at the same timestamp right rows
    * sort before the left row and fall outside its following frame).
    * The right row's own `time` is carried as `asof_<time>` so callers
    * (and the oracle) can audit the chosen distance; `time` must be a
    * timestamp column on both sides.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      time: String, rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    require(!rightVals.contains(time), "time is carried implicitly")
    val vals = rightVals :+ time
    val leftCols = left.columns.toSeq
    val rvType = StructType(vals.map(v => right.schema(v)))

    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rvType).as("__rv")): _*)
    val r = right
      .filter(col(time).isNotNull)
      .select(
        leftCols.map { c =>
          if (c == key || c == time) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } ++ Seq(lit(0).as("__side"),
          struct(vals.map(col).toIndexedSeq: _*).as("__rv")): _*)

    val base = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__rv"))
    val wb = base.rowsBetween(Window.unboundedPreceding, 0)
    val wf = base.rowsBetween(0, Window.unboundedFollowing)
    val picked = l.unionByName(r)
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__rv"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__db",
        unix_micros(col(time)) - unix_micros(col(s"__b.$time")))
      .withColumn("__df",
        unix_micros(col(s"__f.$time")) - unix_micros(col(time)))
      .withColumn("__n",
        when(col("__b").isNotNull &&
          (col("__f").isNull || col("__db") <= col("__df")), col("__b"))
          .otherwise(col("__f")))
    picked.select(
      leftCols.map(col) ++
        vals.map(v => col(s"__n.$v").as(s"asof_$v")): _*)
  }
}
