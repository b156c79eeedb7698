package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity: the fused SigAgreement expression must agree bit-for-bit with
  * the declarative zip_with+filter form it replaced in the MinHash pair
  * path (one DataFrame of many generated cases — a Spark job per sample
  * would dominate test time).
  */
class SigAgreementSpec extends SparkSpec {
  import spark.implicits._

  test("matches zip_with+filter across 500 random signature pairs") {
    val rnd = new scala.util.Random(42)
    // small value range → real per-position collisions; lengths 0..16
    val rows = (1 to 500).map { _ =>
      val n = rnd.nextInt(17)
      (Array.fill(n)(rnd.nextInt(8).toLong), Array.fill(n)(rnd.nextInt(8).toLong))
    }
    val df = rows.toDF("a", "b").select(
      SigAgreement(col("a"), col("b")).as("fused"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), v => v))
        .as("hof"))
    assert(df.filter(col("fused") =!= col("hof")).count() == 0)
    // and the fused count is actually exercised: some pair must agree somewhere
    assert(df.agg(sum("fused")).head().getLong(0) > 0)
  }

  test("unequal lengths compare the common prefix") {
    val df = spark.sql("SELECT array(1L, 2L, 3L) AS a, array(1L, 9L) AS b")
    assert(df.select(SigAgreement(col("a"), col("b"))).head().getInt(0) == 1)
  }

  test("null signature yields null") {
    val df = spark.sql("SELECT array(1L) AS a, CAST(NULL AS ARRAY<BIGINT>) AS b")
    assert(df.select(SigAgreement(col("a"), col("b"))).head().isNullAt(0))
  }
}
