package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Lineage._

/** In-engine linear-classifier training as pure DataFrame aggregations —
  * the quality-classifier stage of a pretraining-data pipeline (the
  * fastText-style filters of CCNet / LLaMA data prep: hashed bag-of-words
  * features, a linear model, corpus-scale scoring), with BOTH training and
  * scoring expressed as joins + aggregations so the whole trajectory runs
  * distributed and replays bit-for-bit in the DuckDB oracle.
  *
  * The trainer is the batch perceptron with two classical hardenings, both
  * integer-exact:
  *
  *  - **normalized updates**: the aggregated error gradient Σ y·x over the
  *    misclassified set is divided by the miss count — sign-aware
  *    truncating division, sign(d)·(|d| div n), which Spark's `DIV` and
  *    DuckDB's `//` compute identically on the positive operand — so one
  *    bad round cannot blow the weights up (the raw batch update cycles
  *    on correlated count features);
  *  - **the pocket** (Gallant, IEEE ToNN 1990): every round's weights are
  *    scored by their miss count and the best round is kept, which is the
  *    standard guarantee when the data is not linearly separable —
  *    training can only end at the best vector it ever visited.
  *
  * All arithmetic is integral (counts, ±1 labels, long weights, truncating
  * division): determinism is structural, not a seed convention.
  *
  * Scale shape per round: one broadcast join of the (≤ dim+1)-row weight
  * vector against the hashed feature table, one groupBy(doc) score
  * aggregation, one groupBy(feature) update aggregation — two shuffles on
  * corpus-sized data, weights always broadcast-sized, plus ONE scalar
  * count action (the per-round miss count the normalization and the
  * pocket both need — the same one-action-per-round discipline as the
  * connected-components convergence probe). The feature table is computed
  * once and localCheckpoint-reused across rounds. The bias trains as
  * feature −1 with constant count 1 per document — no special cases.
  */
object Classifier {

  /** Training result: the pocket (best-round) weights, the miss-count
    * curve for rounds 0..iters (round 0 evaluates the all-zero start),
    * and which round the pocket kept.
    */
  final case class PerceptronResult(weights: DataFrame, curve: Seq[Long],
      pocketRound: Int)

  /** Engine-portable hashed feature id: md5-head32 of the token (salted)
    * mod `dim` — the same trick as every md5-portable operator here.
    */
  def featureHash(tok: Column, dim: Int): Column =
    conv(substring(md5(concat(tok, lit("#feat")).cast("binary")), 1, 8),
      16, 10).cast("long") % dim

  /** Hashed bag-of-words features (doc_id, f, cnt) including the constant
    * bias feature f = −1, cnt = 1 per document. Documents with no tokens
    * still carry the bias row, so they are scored (by bias alone), not
    * silently dropped.
    */
  def hashedFeatures(docs: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextStats.words(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), featureHash(col("tok"), dim).as("f"))
      .groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
    toks.union(docs.select(col(idCol).as("doc_id"),
      lit(-1L).as("f"), lit(1L).as("cnt")))
  }

  /** Per-document scores under a weight vector: (doc_id, s, y). */
  private def scores(fx: DataFrame, y: DataFrame, w: DataFrame): DataFrame =
    fx.join(broadcast(w), Seq("f"), "left")
      .select(col("doc_id"),
        (col("cnt") * coalesce(col("w"), lit(0L))).as("p"))
      .groupBy("doc_id").agg(sum(col("p")).as("s"))
      .join(y, "doc_id")

  /** Misclassified docs: prediction sign(s > 0 ? +1 : −1) ≠ label. */
  private def missOf(scored: DataFrame): DataFrame =
    scored.filter(
      when(col("s") > 0, lit(1L)).otherwise(lit(-1L)) =!= col("y"))
      .select(col("doc_id"), col("y"))

  /** Train `iters` pocket-perceptron rounds. Labels must be ±1. */
  def trainPerceptron(feats: DataFrame, labels: DataFrame,
      iters: Int): PerceptronResult = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fx = feats.select(col("doc_id"), col("f"), col("cnt").cast("long"))
      .truncateLineage()
    val y = labels.select(col("doc_id"), col("y").cast("long"))
      .truncateLineage()
    var w = fx.sparkSession.range(0).select(col("id").as("f"),
      col("id").as("w")) // empty (f, w): round-0 weights are all zero
    var best = w
    var bestMiss = Long.MaxValue
    var bestRound = 0
    val curve = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (r <- 0 to iters) {
      val miss = missOf(scores(fx, y, w)).truncateLineage()
      val n = miss.count() // the one scalar action per round
      curve += n
      if (n < bestMiss) { bestMiss = n; best = w; bestRound = r }
      if (r < iters) {
        // normalized update: sign(d)·(|d| div n); n > 0 whenever any
        // delta row exists, so the max(n, 1) guard never changes a value
        val nd = math.max(n, 1)
        val delta = fx.join(miss, "doc_id")
          .groupBy("f").agg(sum(col("y") * col("cnt")).as("d"))
          .select(col("f"),
            (when(col("d") >= 0, lit(1L)).otherwise(lit(-1L)) *
              expr(s"abs(d) DIV $nd")).as("d"))
        w = w.join(delta, Seq("f"), "full_outer")
          .select(col("f"),
            (coalesce(col("w"), lit(0L)) + coalesce(col("d"), lit(0L))).as("w"))
          .filter(col("w") =!= 0L)
          .truncateLineage()
      }
    }
    PerceptronResult(best, curve.toSeq, bestRound)
  }

  /** Score every document with a weight vector: (doc_id, score, predict).
    * One broadcast join + one aggregation — corpus-scale serving.
    */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("f"), "left")
      .select(col("doc_id"),
        (col("cnt") * coalesce(col("w"), lit(0L))).as("p"))
      .groupBy("doc_id").agg(sum(col("p")).as("score"))
      .select(col("doc_id"), col("score"),
        when(col("score") > 0, lit(1L)).otherwise(lit(-1L)).as("predict"))
}
