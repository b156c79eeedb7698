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

  test("arity violations raise real errors instead of silent truncation") {
    GraftFunctions.register(spark)
    val tooMany = intercept[Exception] {
      spark.sql("SELECT transliterate('a', 'b')").collect()
    }
    assert(tooMany.getMessage.contains("argument"), tooMany.getMessage)
    val tooFew = intercept[Exception] {
      spark.sql("SELECT cosine_sim_e6(array(1.0f))").collect()
    }
    assert(tooFew.getMessage.contains("argument"), tooFew.getMessage)
  }

  test("GraftExtensions injects the functions into a session built with withExtensions") {
    val prev = spark // force TestSpark session to exist first
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT transliterate('Plzeňský kraj') AS r")
        .collect()(0).getString(0)
      assert(got == "Plzensky kraj")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
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

  test("SQL sig_agreement matches the Column form") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS n")
      .collect()(0).getInt(0)
    assert(viaSql == 2)
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT sig_agreement(array(1L))").collect()
    }
    assert(wrongArity.getMessage.contains("argument"), wrongArity.getMessage)
  }

  test("SQL simhash_bits matches the Column form in both modes") {
    GraftFunctions.register(spark)
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("txt").createOrReplaceTempView("t_sqlfn3")
    val viaSql = spark.sql(
      "SELECT simhash_bits(txt) AS xx, simhash_bits(txt, true) AS m5 FROM t_sqlfn3")
      .collect()(0)
    val viaCol = spark.table("t_sqlfn3").select(
      graft.expr.SimHashBits(col("txt"), md5Base = false).as("xx"),
      graft.expr.SimHashBits(col("txt"), md5Base = true).as("m5")).collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
  }

  test("SQL long_dot matches the Column form and casts int arrays") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT long_dot(array(2L, -3L, 4L), array(5L, 7L, 11L)) AS d")
      .collect()(0).getLong(0)
    assert(got == 2L * 5 - 3L * 7 + 4L * 11)
    // declared input types: int arrays implicit-cast to long arrays
    assert(spark.sql("SELECT long_dot(array(1, 2), array(3, 4)) AS d")
      .collect()(0).getLong(0) == 11L)
  }
}
