package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MaxScore dynamic pruning: exactness against brute-force scoring, and
  * proof the pruning actually skips documents on a fixture built to
  * discriminate (a rare high-impact term vs a ubiquitous low-impact one —
  * the real-corpus shape where MaxScore pays: θ from the rare term's
  * postings exceeds the common term's upper bound, so the common term's
  * posting tail is never scored).
  */
class MaxScoreSpec extends SparkSpec {
  import spark.implicits._

  // 200 docs: 'common' in every doc (tf 1..3), 'rare' in every 20th doc
  // (tf 5..8), plus a per-doc filler token so doc lengths differ
  private lazy val docs: DataFrame = spark.range(0, 200).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      array_repeat(lit("common"), (col("id") % 3 + 1).cast("int")),
      when(col("id") % 20 === 0,
        concat_ws(" ", array_repeat(lit("rare"), (col("id") / 20 % 4 + 5).cast("int"))))
        .otherwise(lit("")),
      concat(lit("filler"), col("id"))).as("text"))

  /** Brute-force reference: score EVERY matching doc with the identical
    * impact arithmetic, take top-k by (score desc, doc_id).
    */
  private def brute(terms: Seq[String], k: Int): DataFrame = {
    val tf = TextStats.tokens(docs).filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.count()
    tf.join(dfc, "tok")
      .select(col("doc_id"),
        expr(s"tf * ((${n}L * 1000000L) DIV df)").as("impact"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("impact")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
  }

  test("maxScoreTopK equals brute-force top-k (order included)") {
    for ((terms, k) <- Seq(
        (Seq("rare", "common"), 3),
        (Seq("rare", "common"), 15), // k > |rare postings|: θ under-filled
        (Seq("common"), 5))) { // single term: no non-essential set
      val got = TextStats.maxScoreTopK(docs, terms, k)
        .select("doc_id", "n_terms", "score_e6").collect().toSeq
      val want = brute(terms, k)
        .select("doc_id", "n_terms", "score_e6").collect().toSeq
      assert(got == want, s"terms=$terms k=$k")
    }
  }

  test("pruning skips the low-impact posting tail") {
    val (res, p1, p2kept) =
      TextStats.maxScoreInternal(docs, Seq("rare", "common"), 3)
    val nMatching = TextStats.tokens(docs)
      .filter(col("tok").isin("rare", "common"))
      .select("doc_id").distinct().count()
    val scored = p1.count() + p2kept.count()
    // phase 1 = the 10 'rare' docs; θ (3rd best rare-doc score) dwarfs
    // UB(common), so phase 2 keeps nothing: 10 of 200 matching docs scored
    assert(p1.count() == 10)
    assert(p2kept.count() == 0)
    assert(scored < nMatching)
    assert(res.count() == 3)
  }
}
