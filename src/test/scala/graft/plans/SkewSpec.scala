package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: key "hot" holds 90% of rows and most distinct values
  private lazy val df = spark.range(0, 5000).toDF("id")
    .withColumn("k", when(col("id") % 10 < 9, lit("hot")).otherwise(lit("cold")))
    .withColumn("v", col("id") % 700)

  test("saltedDistinctCount equals plain count_distinct on skewed keys") {
    val plain = df.groupBy(col("k")).agg(count_distinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(df, col("k"), col("v"), salts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedDistinctCount: salts=1 degenerates to the plain result") {
    val plain = df.groupBy(col("k")).agg(count_distinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(Skew.saltedDistinctCount(df, col("k"), col("v"), salts = 1)
      .as[(String, Long)].collect().toMap == plain)
  }

  test("saltedJoin is row-for-row identical to the plain equi-join") {
    val build = Seq(("hot", 1.5), ("cold", 2.5), ("never", 9.9)).toDF("k", "w")
    val plain = df.join(build, Seq("k")).select("id", "k", "w")
      .as[(Long, String, Double)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(df, build, Seq("k"), col("id"), salts = 4)
      .select("id", "k", "w")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin keeps probe rows whose saltSource is NULL") {
    val probe = Seq((Some(1L), "hot"), (None, "hot"), (None, "cold"))
      .toDF("id", "k")
    val build = Seq(("hot", 1.5), ("cold", 2.5)).toDF("k", "w")
    val plain = probe.join(build, Seq("k")).count()
    val salted = Skew.saltedJoin(probe, build, Seq("k"), col("id"), salts = 4).count()
    assert(salted == plain && salted == 3)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val build = Seq(("hot", 1.5), ("cold", 2.5)).toDF("k", "w")
    val salted = Skew.saltedJoin(df, build, Seq("k"), col("id"), salts = 4)
    // the salt column participates in the join: distinct (k, salt) combos
    // on the probe side must exceed the distinct k count
    val probeSalted = df.withColumn("__salt", pmod(xxhash64(col("id")), lit(4)))
      .select("k", "__salt").distinct().count()
    assert(probeSalted == 8) // 2 keys × 4 salts
    assert(salted.count() == df.count())
  }
}
