package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good solid stuff here"), (2L, "good good quality content"),
    (3L, "bad broken things only"), (4L, "awful bad rotten text"),
    (5L, "good text again"), (6L, "bad rubbish heap"))
    .toDF("doc_id", "text")
  private val labels = docs.select(col("doc_id"),
    when(col("text").contains("good"), 1L).otherwise(-1L).as("y"))

  test("trainPerceptron converges to zero misses on separable labels; pocket keeps it") {
    val feats = Classifier.hashedFeatures(docs, "text", "doc_id", dim = 32)
    val res = Classifier.trainPerceptron(feats, labels, iters = 6)
    assert(res.curve.length == 7) // rounds 0..6 each evaluated
    assert(res.curve.head == 3L) // all-zero start predicts -1: misses the 3 positives
    assert(res.curve.last == 0L, s"did not converge: ${res.curve}")
    assert(res.curve(res.pocketRound) == res.curve.min)
    // pocket weights classify every doc correctly
    val scored = Classifier.score(feats, res.weights).join(labels, "doc_id")
    assert(scored.filter(col("predict") =!= col("y")).count() == 0L)
  }

  test("hashedFeatures carries the bias row for every doc, even empty ones") {
    val withEmpty = docs.union(Seq((7L, "")).toDF("doc_id", "text"))
    val feats = Classifier.hashedFeatures(withEmpty, "text", "doc_id", dim = 32)
    val bias = feats.filter(col("f") === -1L)
    assert(bias.count() == 7L)
    // empty doc has ONLY the bias row, so score() still emits it
    assert(feats.filter(col("doc_id") === 7L).count() == 1L)
    val s = Classifier.score(feats,
      Seq((-1L, -5L)).toDF("f", "w")).filter(col("doc_id") === 7L).collect()
    assert(s.head.getAs[Long]("score") == -5L &&
      s.head.getAs[Long]("predict") == -1L)
  }
}
