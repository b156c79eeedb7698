package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Pins WordShingles to the declarative HOF chain it replaced: identical
  * arrays (values AND first-occurrence order) on hand-picked edges and a
  * randomized corpus.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(Seq[String], Seq[String])] =
    texts.toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("fast"),
        Dedup.shinglesDeclarative(col("text"), 3).as("ref"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1))).toSeq

  test("edge cases match the declarative form exactly") {
    val texts = Seq(
      "", "   ", "one", "one two", "one two three",
      "one two three four five",
      "  Mixed   CASE\t\twith\nweird   spacing  ",
      "a a a a a a",           // duplicate shingles → distinct, first-kept
      "Ünïcode wörds höre ok", // non-ASCII lowering
      "x y z x y z x y z")     // periodic text: heavy dedup
    both(texts).foreach { case (fast, ref) =>
      assert(fast == ref, s"fast=$fast ref=$ref")
    }
  }

  test("randomized corpus matches the declarative form exactly") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector("alpha", "Beta", "GAMMA", "delta", "ε", "z1")
    val texts = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    both(texts).foreach { case (fast, ref) =>
      assert(fast == ref, s"fast=$fast ref=$ref")
    }
  }
}
