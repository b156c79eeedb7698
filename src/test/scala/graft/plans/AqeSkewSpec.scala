package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the OTHER half of the skew story: `agg_salted_distinct` shows
  * manual salting, but the engine's default answer to a skewed shuffle
  * join at 100 TB is AQE's OptimizeSkewedJoin — verify it actually fires
  * on this build (with thresholds scaled down to test size), so the
  * "AQE handles residual skew" claim in the scale notes is a tested
  * property, not an appeal to documentation.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: a partition counts as skewed at >16 KB and
      // 2x the median — the production defaults (256 MB, 5x) shrunk so a
      // local frame can trip them
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // force a shuffle join: broadcast would erase the skew entirely
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 200k fact rows, 99% on one key; dim has one row per key
      val fact = spark.range(0, 200000)
        .select((when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id") % 50))
          .as("k"), col("id").as("v"))
      val dim = spark.range(0, 50).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, Seq("k")).groupBy("name")
        .agg(count(lit(1)).as("n"))
      // execute THIS frame: AQE finalizes the adaptive plan per-execution,
      // so the skew inspection must read the executed QueryExecution
      val rows = joined.collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 200000L)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
