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
}
