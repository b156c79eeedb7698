package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the DLT priority-sample claims: the sample is exactly the top-k
  * by (priority, id), the τ row is the (k+1)-th, and the subset-sum
  * estimator lands near the true total on data it has never seen.
  */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 400L)
    .map(i => (i, 10L + (i * 7L) % 500L)).toDF("id", "w")

  test("returns k+1 ranked rows, ranks dense from 1") {
    val out = Corpus.prioritySample(docs, col("id"), col("w"), k = 32).collect()
    assert(out.length == 33)
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 33))
  }

  test("sample = global top-k by (priority desc, id): heap path matches full sort") {
    val viaOp = Corpus.prioritySample(docs, col("id"), col("w"), k = 32)
      .filter(col("rk") <= 32).select("doc_id").as[Long].collect().toSet
    // independent full-sort reference on the same deterministic priority
    val h = conv(substring(md5(concat(col("id").cast("string"),
      lit("#psamp")).cast("binary")), 1, 8), 16, 10).cast("long")
    val ref = docs
      .withColumn("pri",
        (col("w").cast("double") * lit(4294967296.0)) /
          (h + 1L).cast("double"))
      .orderBy(col("pri").desc, col("id"))
      .limit(32).select(col("id")).as[Long].collect().toSet
    assert(viaOp == ref)
  }

  test("per-group sample equals the global sample run on each stratum alone") {
    val grouped = docs.withColumn("g",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val byGroup = Corpus.prioritySampleByGroup(
        grouped, col("g"), col("id"), col("w"), k = 10)
      .collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rk")))
      .toSet
    val perStratum = Seq("even", "odd").flatMap { g =>
      Corpus.prioritySample(grouped.filter(col("g") === g),
          col("id"), col("w"), k = 10)
        .collect()
        .map(r => (g, r.getAs[Long]("doc_id"), r.getAs[Int]("rk")))
    }.toSet
    assert(byGroup == perStratum)
  }

  test("subset-sum estimate is within 25% of the true total at k=64") {
    val top = Corpus.prioritySample(docs, col("id"), col("w"), k = 64)
    val tau = top.filter(col("rk") === 65).select("pri").as[Double].head()
    val est = top.filter(col("rk") <= 64)
      .select(greatest(col("w").cast("double"), lit(tau)).as("t"))
      .agg(sum("t")).as[Double].head()
    val truth = docs.agg(sum("w")).as[Long].head().toDouble
    assert(math.abs(est - truth) / truth < 0.25,
      s"estimate $est too far from $truth")
  }
}
