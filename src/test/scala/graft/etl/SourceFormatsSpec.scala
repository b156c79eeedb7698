package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source-format breadth beyond parquet/CSV-TSV: ORC round-trip with
  * pushdown, the binaryFile source (the ingestion face of the multimodal
  * asset pipeline — bytes + file metadata, never decoded on the driver),
  * and malformed-record policy on semi-structured reads (PERMISSIVE
  * captures the raw bad line in a corrupt-record column; DROPMALFORMED
  * silently drops — the difference between auditable and silent loss at
  * 100 TB ingest).
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip preserves schema and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    df.write.orc(s"$dir/t")
    val back = spark.read.orc(s"$dir/t")
    // names + types survive; nullability relaxes on read (file sources
    // always surface nullable columns), so compare without it
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val q = back.filter(col("id") > 1L).select("id", "tag")
    assert(q.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq(2L -> "b", 3L -> "c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
  }

  test("binaryFile source reads asset bytes + metadata without decoding") {
    val dir = Files.createTempDirectory("graft-bin").toString
    val payload = Array[Byte](0x50, 0x4b, 3, 4, 42, -1)
    Files.write(Paths.get(s"$dir/asset1.bin"), payload)
    Files.write(Paths.get(s"$dir/asset2.bin"),
      "hello".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("binaryFile").load(dir)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val got = df.select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), col("content"))
      .orderBy("name")
      .as[(String, Long, Array[Byte])].collect()
    assert(got.map(_._1).toSeq == Seq("asset1.bin", "asset2.bin"))
    assert(got(0)._2 == payload.length && got(0)._3.sameElements(payload))
    assert(new String(got(1)._3, StandardCharsets.UTF_8) == "hello")
  }

  test("PERMISSIVE JSON keeps bad records in the corrupt column; DROPMALFORMED drops them") {
    val dir = Files.createTempDirectory("graft-mal").toString
    Files.write(Paths.get(s"$dir/in.json"),
      """{"id": 1, "v": "ok"}
        |{"id": oops not json
        |{"id": 3, "v": "fine"}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val schema = "id LONG, v STRING, _bad STRING"

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(s"$dir/in.json")
    val rows = permissive.orderBy(col("id").asc_nulls_last)
      .as[(Option[Long], Option[String], Option[String])].collect().toSeq
    assert(rows.size == 3)
    assert(rows(0) == ((Some(1L), Some("ok"), None)))
    assert(rows(1) == ((Some(3L), Some("fine"), None)))
    assert(rows(2)._1.isEmpty && rows(2)._3.exists(_.contains("oops")),
      s"corrupt row not captured: ${rows(2)}")

    val dropped = spark.read.schema("id LONG, v STRING")
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/in.json")
    assert(dropped.count() == 2)
  }
}
