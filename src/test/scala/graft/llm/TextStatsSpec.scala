package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def evalOn[T](text: String, f: Column => Column): T =
    Seq(text).toDF("t").select(f(col("t")).as("r")).collect()(0).getAs[T]("r")

  test("tokenCount: empty and blank → 0; words counted on any whitespace") {
    assert(evalOn[Int]("", TextStats.tokenCount) == 0)
    assert(evalOn[Int]("   ", TextStats.tokenCount) == 0)
    assert(evalOn[Int]("a b\tc\nd", TextStats.tokenCount) == 4)
  }

  test("subwordCount: letter runs, digit runs, single punct each count once") {
    // hello | , | world | 42 | !
    assert(evalOn[Int]("hello, world42!", TextStats.subwordCount) == 5)
    assert(evalOn[Int]("", TextStats.subwordCount) == 0)
  }

  test("stopwordRatio and meanWordLength") {
    assert(evalOn[Double]("the cat", TextStats.stopwordRatio) == 0.5)
    assert(evalOn[Double]("", TextStats.stopwordRatio) == 0.0)
    assert(evalOn[Double]("ab cdef", TextStats.meanWordLength) == 3.0)
  }

  test("langId picks the right function-word profile; und for no signal") {
    assert(evalOn[String]("the cat sat on the mat and it was happy", TextStats.langId) == "en")
    assert(evalOn[String]("der hund ist nicht mit der katze", TextStats.langId) == "de")
    assert(evalOn[String]("le chat est dans la maison pour une heure", TextStats.langId) == "fr")
    assert(evalOn[String]("el perro es una mascota en la casa", TextStats.langId) == "es")
    assert(evalOn[String]("xyzzy qwerty", TextStats.langId) == "und")
  }

  test("fingerprint is invariant to case and whitespace collapse") {
    val fp1 = evalOn[String]("Hello   World", TextStats.fingerprint)
    val fp2 = evalOn[String]("  hello world ", TextStats.fingerprint)
    val fp3 = evalOn[String]("hello worlds", TextStats.fingerprint)
    assert(fp1 == fp2 && fp1 != fp3)
  }

  test("qualityScore stays in [0,1] across pathological inputs") {
    val inputs = Seq("", "a", "!!!!!!!!", "1234567890" * 50,
      "the and of to is in that it was for " * 20, "word " * 1000)
    val scores = inputs.toDF("t")
      .select(TextStats.qualityScore(col("t")).as("q")).collect().map(_.getDouble(0))
    scores.foreach(q => assert(q >= 0.0 && q <= 1.0, s"q=$q out of range"))
    // prose with stopwords beats punctuation soup
    assert(scores(4) > scores(2))
  }
}
