package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.llm.Corpus

/** Property-based checks for the round-3 operators, in the repo's
  * one-DataFrame-per-property style (a Spark job per forAll sample would
  * take minutes).
  */
class PlansPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: TopK.perGroup equals the ranking window on arbitrary data") {
    val row: Gen[(String, Double)] = for {
      g <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g")
      // few distinct values → plenty of ties; negatives included
      v <- Gen.oneOf(-3.0, -1.0, 0.0, 1.0, 2.0, 2.0, 7.5)
    } yield (g, v)
    val data = samples(row, 400).zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
    val df = data.toDF("g", "id", "v").repartition(7)
    for (k <- Seq(1, 3, 17)) {
      val got = TopK.perGroup(df, Seq("g"), col("v"), col("id"), k)
        .select("g", "id", "rnk").as[(String, Long, Int)].collect().toSet
      val want = df.withColumn("rnk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rnk") <= k)
        .select("g", "id", "rnk").as[(String, Long, Int)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("property: packSequences reconstructs the running sum exactly") {
    val tok: Gen[Int] = Gen.frequency(
      5 -> Gen.chooseNum(0, 50), 2 -> Gen.chooseNum(1000, 5000), 1 -> Gen.const(0))
    val data = samples(tok, 300).zipWithIndex
      .map { case (n, i) => (i.toLong, (i % 4).toString, n) }
    val df = data.toDF("id", "lang", "n")
    val cap = 1024
    val got = Corpus.packSequences(df, col("n"), col("lang"), col("id"), cap)
      .select("id", "lang", "n", "pack_id", "pack_offset")
      .as[(Long, String, Int, Long, Long)].collect()
    // every offset within capacity
    got.foreach { case (id, _, _, _, off) =>
      assert(off >= 0 && off < cap, s"id=$id offset=$off") }
    // per stream: pack_id * cap + offset must equal the running start sum
    got.groupBy(_._2).foreach { case (_, rows) =>
      var runningStart = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, pack, off) =>
        assert(pack * cap + off == runningStart, s"id=$id")
        runningStart += n
      }
    }
  }

  test("property: splitAssign is total and exclusive over arbitrary ids") {
    val ids = samples(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2), 300).distinct
    val labels = ids.toDF("id")
      .select(Corpus.splitAssign(col("id")).as("s"))
      .as[String].collect()
    assert(labels.length == ids.length)
    assert(labels.forall(Set("train", "val", "test").contains))
  }
}
