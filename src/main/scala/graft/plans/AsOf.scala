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
  *  2. one shuffle on key; within each key sort by (time, side) — right
  *     rows sort BEFORE a left row at the same timestamp, giving the
  *     inclusive `right.time <= left.time` semantics
  *  3. `last(payload, ignoreNulls)` over rows-unbounded-preceding carries
  *     the latest right payload forward onto every left row
  *
  * Scale shape: exactly one exchange (the key), sort within partitions,
  * no join explosion — each left row meets only the carried-forward
  * scalar, never the right side's history. Skewed keys behave like any
  * windowed aggregation (salt upstream if one key dominates).
  */
object AsOf {

  /** @param left      probe side; one output row per left row
    * @param right     reference side, the "latest value as of t" source
    * @param key       equi-join key column name (both sides)
    * @param time      event-time column name (both sides)
    * @param rightVals right-side columns to carry (emitted as
    *                  `asof_<name>`, NULL when no right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val leftCols = left.columns.toSeq
    val rvType = StructType(rightVals.map(v => right.schema(v)))

    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(rvType).as("__rv")): _*)
    val rBase = right.select(col(key), col(time),
      struct(rightVals.map(col).toIndexedSeq: _*).as("__rv"))
    val r = leftCols.foldLeft(rBase) { (df, c) =>
        if (c == key || c == time) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select(leftCols.map(col) ++ Seq(lit(0).as("__side"), col("__rv")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightVals.foldLeft(carried) { (df, v) =>
        df.withColumn(s"asof_$v", col(s"__asof.$v"))
      }
      .drop("__side", "__rv", "__asof")
  }
}
