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

  test("AQE splits the hot cell of the clustered spatial grid join") {
    // join_spatial_grid_clustered's claim, measured on the shared
    // operator: half the points pile into the single 150×150 cell (0,0),
    // the rest spread over ~4.4k cells, so one cell key carries ~1000×
    // the median cell's rows. With thresholds shrunk to test scale, AQE
    // must split that hot shuffle partition (skew=true) — and the merge
    // pin must have kept the join a shuffle join for there to be
    // anything to split.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // enough partitions that the cold cells thin out per partition and
      // the hot cell's partition stands >2x above the median
      conf.set("spark.sql.shuffle.partitions", "64")

      val n = 6000L
      val pts = spark.range(0, n).select(col("id"),
        when(col("id") % 2 === 0, pmod(col("id") * 7919L, lit(150L)))
          .otherwise(pmod(col("id") * 104729L, lit(10000L))).as("x"),
        when(col("id") % 2 === 0, pmod(col("id") * 7907L, lit(150L)))
          .otherwise(pmod(col("id") * 15485863L, lit(10000L))).as("y"))
      // collect a post-join needle, not the ~4.5M-pair haystack — and
      // execute THE INSPECTED FRAME: count() builds its own
      // QueryExecution, leaving this one's adaptive plan un-finalized
      // (the first draft of this test asserted on a never-executed plan)
      val joined = graft.analytics.Spatial.gridRadiusJoin(pts, 150L,
          pinMerge = true)
        .filter(col("dist2") === 0L)
      val dup = joined.collect()
      assert(dup.forall(_.getAs[Long]("dist2") == 0L))

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("SortMergeJoin"),
        s"merge pin lost — nothing to skew-split:\n${finalPlan.take(1500)}")
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on the hot cell:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
