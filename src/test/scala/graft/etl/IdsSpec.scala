package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("contiguousIds matches the single-partition window result, without the single partition") {
    // shuffled keys spread over several input partitions
    val df = spark.range(0, 1000).select(
        (col("id") * 2654435761L % 1000003L).as("key"),
        col("id").as("payload"))
      .repartition(7)
    // explicit partition count: AQE would (correctly) coalesce this tiny
    // exchange to one partition and defeat the multi-partition assertion
    val got = Ids.contiguousIds(df, Seq(col("key")), numPartitions = Some(8))

    // ids are exactly the rank in key order (keys are unique here)
    val expected = df.withColumn("id",
      row_number().over(Window.orderBy("key")).cast("long") - 1)
    assert(got.select("key", "id").except(expected.select("key", "id")).isEmpty)

    // contiguity: 0..n-1, no gaps or dups
    val n = got.count()
    assert(got.agg(min("id"), max("id"), countDistinct("id"))
      .as[(Long, Long, Long)].head() == ((0L, n - 1, n)))

    // the data never collapsed to one partition: the sort stage is a
    // range exchange, and the output keeps that parallelism
    val plan = df.repartitionByRange(col("key"))
      .sortWithinPartitions(col("key"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(got.rdd.getNumPartitions > 1)
  }

  test("contiguousIds on an empty frame yields an empty frame with the id column") {
    val empty = spark.range(0).select(col("id").as("key"))
    val got = Ids.contiguousIds(empty, Seq(col("key")))
    assert(got.columns.toSeq == Seq("key", "id") && got.count() == 0)
  }

  test("runningMinExclusive matches the single-partition exclusive-min window") {
    val df = spark.range(0, 1000).select(
        (col("id") * 2654435761L % 1000003L).as("key"),
        (col("id") * 48271L % 99991L).as("v"))
      .repartition(7)
    val got = Ids.runningMinExclusive(df, Seq(col("key").desc), "v",
      numPartitions = Some(8))

    val expected = df.withColumn("prevmin",
      coalesce(
        min(col("v")).over(Window.orderBy(col("key").desc)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(Long.MaxValue)))
    assert(got.select("key", "v", "prevmin")
      .except(expected.select("key", "v", "prevmin")).isEmpty)

    // first row in sort order carries the neutral element
    assert(got.orderBy(col("key").desc).select("prevmin")
      .as[Long].head() == Long.MaxValue)
    assert(got.rdd.getNumPartitions > 1)
  }

  test("runningMinExclusive rejects NULL and non-integral value columns") {
    // all-NULL value run: rejected in pass 1, on the driver, with the
    // diagnostic (a partial-NULL run dies in pass 2 with the same message,
    // wrapped in the task failure)
    val nulls = Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("key", "v")
    val ex = intercept[IllegalArgumentException] {
      Ids.runningMinExclusive(nulls, Seq(col("key")), "v").count()
    }
    assert(ex.getMessage.contains("must not be NULL"))
    val dbl = Seq((1L, 1.5)).toDF("key", "v")
    val ex2 = intercept[IllegalArgumentException] {
      Ids.runningMinExclusive(dbl, Seq(col("key")), "v")
    }
    assert(ex2.getMessage.contains("integral"))
  }

  test("exactNtileSql matches engine ntile(k) for every group size") {
    // exhaustive over the shapes that exercise the remainder convention:
    // all n in 1..60 (covers n < k, n = k, remainder 0..k−1) for each k.
    // One frame per k: rows (n, r in 1..n), expected = ntile(k) OVER
    // (PARTITION BY n ORDER BY r) — the engine's own convention — and the
    // arithmetic form must agree cell for cell.
    val rows = for (n <- 1 to 60; r <- 1 to n) yield (n.toLong, r.toLong)
    for (k <- Seq(1, 2, 3, 4, 5, 7, 10)) {
      val df = rows.toDF("n", "r")
        .withColumn("expected",
          ntile(k).over(Window.partitionBy("n").orderBy("r")).cast("long"))
        .withColumn("got", expr(s"CAST(${Ids.exactNtileSql("r", "n", k)} AS BIGINT)"))
      val bad = df.filter(col("got") =!= col("expected") ||
        col("got").isNull).collect()
      assert(bad.isEmpty,
        s"k=$k mismatches: ${bad.take(5).mkString(", ")}")
    }
  }
}
