package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct evidence for two of the scale directives: bucketing co-locates
  * joins (no exchange on either side), and partition+filter pushdown
  * reaches the parquet scan.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("matching bucketed tables join with ZERO exchanges") {
    val facts = spark.range(0, 10000).toDF("k")
      .withColumn("v", col("k") * 2)
    val dims = spark.range(0, 1000).toDF("k")
      .withColumn("name", concat(lit("n"), col("k")))
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_facts")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_dims")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      val q = spark.table("bkt_facts").hint("merge")
        .join(spark.table("bkt_dims").hint("merge"), "k")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(q.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("partition pruning + filter pushdown reach the parquet scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    spark.range(0, 1000).toDF("id")
      .withColumn("region", (col("id") % 4).cast("string"))
      .withColumn("v", col("id") * 3)
      .write.mode("overwrite").partitionBy("region").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("region") === "2" && col("v") > 100)
      .select("id", "v")
    val formatted = q.queryExecution.executedPlan.toString
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // partition filter prunes directories; data filter is pushed to parquet
    assert(scan.contains("PartitionFilters") && scan.contains("region"), scan)
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(v,100"), scan)
    // pruned read schema: only the selected data columns, not the whole row
    assert(scan.contains("ReadSchema") && !scan.contains("struct<id:bigint,region"), scan)
    // region 2 holds ids ≡ 2 (mod 4); v = 3·id > 100 → id ≥ 34 → 34,38,…,998
    assert(q.count() == 242, formatted)
  }

  test("dynamic partition pruning fires on a dim-filtered fact join") {
    // the 100 TB date-partitioned-fact ⋈ filtered-dim shape: the fact
    // scan cannot prune statically (the filter is on the dim), so Spark
    // must inject a runtime DPP subquery filter into the fact's partition
    // column — without it, every partition of a year-long fact table is
    // read for a one-week dim selection
    val dir = Files.createTempDirectory("graft-dpp").toString
    spark.range(0, 2000).toDF("id")
      .withColumn("day_k", (col("id") % 20))
      .withColumn("v", col("id") * 7)
      .write.mode("overwrite").partitionBy("day_k").parquet(dir)
    val dim = spark.range(0, 20).toDF("day_k")
      .withColumn("flag", col("day_k") < 3)
    val q = spark.read.parquet(dir)
      .join(dim.filter(col("flag")), Seq("day_k"))
      .select(col("day_k"), col("v"))
    // rows from partitions 0,1,2 only
    assert(q.count() == 300)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") ||
      p.contains("DynamicPruning") || p.contains("SubqueryBroadcast"),
      s"no dynamic partition pruning in the fact scan:\n${p.take(2500)}")
  }
}
