package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after register()") {
    GraftFunctions.register(spark)
    Seq(("Pronájem bytu, Hlavní město Praha", "12 500 Kč"))
      .toDF("addr", "price").createOrReplaceTempView("t_sqlfn")
    val row = spark.sql(
      """SELECT transliterate(addr) AS a,
        |       CAST(digits_only(price) AS BIGINT) AS p,
        |       address_parts(addr).region AS r,
        |       text_counts(addr).n_tokens AS n
        |FROM t_sqlfn""".stripMargin).collect()(0)
    assert(row.getString(0) == "Pronajem bytu, Hlavni mesto Praha")
    assert(row.getLong(1) == 12500L)
    assert(row.getString(2) == "Praha")
    assert(row.getInt(3) == 5)
  }

  test("SQL minhash_sig/hyperplane_sig/cosine_sim_e6 match the Column forms") {
    GraftFunctions.register(spark)
    Seq(("alpha beta gamma delta epsilon",
        Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("txt", "va", "vb").createOrReplaceTempView("t_sqlfn2")
    val viaSql = spark.sql(
      """SELECT minhash_sig(txt, 3, 64) AS sig, hyperplane_sig(va, 12) AS hp,
        |       cosine_sim_e6(va, vb) AS cos
        |FROM t_sqlfn2""".stripMargin).collect()(0)
    val viaCol = spark.table("t_sqlfn2").select(
      graft.expr.MinHashSig(col("txt"), 3, 64).as("sig"),
      graft.llm.Similarity.hyperplaneSignature(col("va"), 12).as("hp"),
      graft.llm.Similarity.cosineE6(col("va"), col("vb")).as("cos")).collect()(0)
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getLong(2) == viaCol.getLong(2))
  }
}
