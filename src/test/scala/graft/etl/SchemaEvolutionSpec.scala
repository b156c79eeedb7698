package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet schema evolution at the source layer: a long-lived ingest
  * directory accretes files written under successive schema versions
  * (reference: the daily dump files only ever GAIN columns), and a
  * `mergeSchema` read must present the union schema with nulls for
  * columns a file predates — without rewriting history. Also pins that
  * projection under the merged schema still prunes at the scan.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema read unions column sets across file generations") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // generation 1: (id, price); generation 2 adds currency
    Seq((1L, 100.0), (2L, 200.0)).toDF("id", "price")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, 300.0, "EUR"), (4L, 400.0, "CZK")).toDF("id", "price", "currency")
      .write.parquet(s"$dir/gen=2")

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("currency", "gen", "id", "price"))

    val rows = df.orderBy("id")
      .select(col("id"), col("currency"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      1L -> None, 2L -> None, 3L -> Some("EUR"), 4L -> Some("CZK")))
  }

  test("projection under the merged schema still prunes the scan") {
    val dir = Files.createTempDirectory("graft-evolve2").toString
    import spark.implicits._
    Seq((1L, 100.0)).toDF("id", "price").write.parquet(s"$dir/gen=1")
    Seq((2L, 200.0, "EUR")).toDF("id", "price", "currency")
      .write.parquet(s"$dir/gen=2")
    val plan = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), "no file scan?")
    assert(!plan.contains("price"),
      "merged-schema scan reads a column the query never touches")
  }
}
