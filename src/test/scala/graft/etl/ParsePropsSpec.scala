package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks (SURVEY.md §5.2). Samples are generated with
  * ScalaCheck Gens but evaluated in ONE DataFrame per property — running a
  * Spark job per forAll sample would take minutes.
  */
class ParsePropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: digitsToLong recovers any non-negative long from noisy formatting") {
    val noisy: Gen[(String, Long)] = for {
      v <- Gen.chooseNum(0L, 999999999999L)
      sep <- Gen.oneOf("", " ", " ")
      suffix <- Gen.oneOf("", " Kc", " Kč,", ",-")
    } yield {
      val grouped = v.toString.reverse.grouped(3).mkString(sep.reverse).reverse
      (grouped + suffix, v)
    }
    val cases = samples(noisy, 200)
    val df = cases.toDF("s", "expected")
      .select(Parse.digitsToLong(col("s")).as("got"), col("expected"))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("property: lastTwoWords/dropLastTwoWords partition the word list") {
    val word: Gen[String] = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    val addr: Gen[Seq[String]] = Gen.chooseNum(3, 7).flatMap(n => Gen.listOfN(n, word))
    val cases = samples(addr, 100).map(_.mkString(" "))
    val df = cases.toDF("s").select(
      col("s"),
      Parse.lastTwoWords(col("s")).as("tail"),
      Parse.dropLastTwoWords(col("s")).as("head"))
    df.collect().foreach { r =>
      val words = r.getString(0).split("\\s+").toSeq
      assert(r.getString(1) == words.takeRight(2).mkString(" "))
      assert(r.getString(2) == words.dropRight(2).mkString(" "))
    }
  }

  test("property: DigitsOnly matches the [^0-9] regex on noisy unicode strings") {
    val chunk: Gen[String] = Gen.oneOf(
      Gen.numStr.map(_.take(6)), Gen.alphaStr.map(_.take(4)),
      Gen.oneOf("Kč", " ", " ", ",-", "€", "m²", "\t", "žluťoučký"))
    val noisy: Gen[String] = Gen.chooseNum(0, 8)
      .flatMap(n => Gen.listOfN(n, chunk).map(_.mkString))
    val cases = samples(noisy, 200)
    val df = cases.toDF("s").select(
      graft.expr.DigitsOnly(col("s")).as("got"),
      regexp_replace(col("s"), "[^0-9]", "").as("expected"))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("VocabHits matches the higher-order filter formulation") {
    import graft.llm.TextStats
    val texts = Seq("the cat and the dog", "", "  ", "THE The the",
      "der the le el", "punctuation, the; end.",
      "\tthe tab led", "the trailing\n", "\t").toDF("t")
    val viaExpr = texts.select(
      graft.expr.VocabHits(col("t"), TextStats.enStopwords).as("n")).collect().map(_.getInt(0))
    val viaHof = texts.select(
      size(filter(split(lower(trim(col("t"))), "\\s+"),
        w => array_contains(typedlit(TextStats.enStopwords), w))).as("n"))
      .collect().map(_.getInt(0))
    assert(viaExpr.toSeq == viaHof.toSeq)
  }

  test("property: exact dedup is idempotent and keeps one row per key") {
    val row: Gen[(Long, String)] = for {
      id <- Gen.chooseNum(0L, 10000L)
      k <- Gen.oneOf("a", "b", "c", "d", "e")
    } yield (id, k)
    val cases = samples(row, 300).distinctBy(_._1)
    val df = cases.toDF("id", "k")
    val once = graft.llm.Dedup.exactDedupByKey(df, col("k"), "id")
    val twice = graft.llm.Dedup.exactDedupByKey(once, col("k"), "id")
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.count() == cases.map(_._2).distinct.size)
    // keep-first: every kept id is the min id of its key group
    val mins = cases.groupBy(_._2).map { case (_, rs) => rs.map(_._1).min }.toSet
    assert(once.select("id").collect().map(_.getLong(0)).toSet == mins)
  }
}
