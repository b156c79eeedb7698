package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's analytical query surface (SURVEY.md §2.11,
  * images/etl1_bi_dashboard.png) as reusable aggregation shapes.
  *
  * Scale notes (100 TB): every shape here is a single hash aggregation with
  * map-side partial aggregation — one shuffle on the grouping key. The
  * percent-of-total uses a scalar total (two-phase: partial per partition,
  * one tiny final reduce) broadcast back, NOT a global window over the
  * grouped result, so no single-partition window bottleneck.
  */
object Dashboard {

  /** Exact decimal sum of a double measure, returned as double.
    *
    * Summing raw doubles is order-dependent (shuffle order differs run to
    * run and engine to engine); casting to DECIMAL(18,2) first makes the
    * aggregation exact and associative, so results are bit-stable at any
    * parallelism — which is also what makes the DuckDB oracle hash-match.
    */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact mean of a double measure (decimal sum / count), as double. */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** "frequency in %" donut: share of rows per dimension value. */
  def shareByDim(df: DataFrame, dim: String): DataFrame = {
    val counts = df.groupBy(col(dim)).agg(count(lit(1)).as("n"))
    // total via cross-join of a 1-row aggregate: a broadcast nested-loop
    // join of a scalar — no global window, scales to any cardinality of
    // `dim`. The broadcast hint is explicit (not left to stats estimation)
    // so a misestimate can never pick a shuffle BNLJ, matching Bloom.prune
    // and TextStats.tfIdf.
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("pct", col("n") * 100.0 / col("total"))
      .drop("total")
      .orderBy(col(dim))
  }

  /** "count of ads by region" map: plain count per dimension. */
  def countByDim(df: DataFrame, dim: String): DataFrame =
    df.groupBy(col(dim)).agg(count(lit(1)).as("n")).orderBy(col(dim))

  /** "average price per m2 by region" sorted bars. */
  def avgByDim(df: DataFrame, dim: String, measure: String): DataFrame =
    df.groupBy(col(dim))
      .agg(exactAvg(col(measure)).as("avg_measure"), count(lit(1)).as("n"))
      .orderBy(col("avg_measure").desc, col(dim))

  /** "average price per m2 daily" line: time-series mean per day.
    *
    * @param tsFormat when the time column is the reference's
    *                 "yyyy_MM_dd_HHmmss" STRING `dump_date`
    *                 (scripts/transform.py:106-111; README.md:130 notes
    *                 Looker re-parses it), pass Some("yyyy_MM_dd_HHmmss");
    *                 None for a real timestamp/date column.
    */
  def dailyAvg(df: DataFrame, ts: String, measure: String,
      tsFormat: Option[String] = None): DataFrame = {
    val day = tsFormat match {
      case Some(fmt) => to_date(to_timestamp(col(ts), fmt))
      case None      => to_date(col(ts))
    }
    df.groupBy(day.as("day"))
      .agg(exactAvg(col(measure)).as("avg_measure"), count(lit(1)).as("n"))
      .orderBy(col("day"))
  }

  /** Top-k rows per group by a measure — ranking window, one shuffle on the
    * group key; ties broken deterministically by `tieBreak`.
    */
  def topKPerGroup(df: DataFrame, group: String, measure: Column,
      tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(measure.desc, tieBreak)
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col(group), col("rnk"))
  }
}
