package graft.llm

import org.apache.spark.sql.Row

import graft.{Queries, SparkSpec}

/** Pins the label-aware-routing win sim_filtered_prefilter exists to
  * deliver: at a comparable scored-candidate budget, pruning the IVF
  * posting lists by the label BEFORE scoring must recover the recall the
  * post-filter arm (rank unfiltered top-k′, then filter) starves away at
  * k′=20 — the gap sim_filtered_recall measures. Everything here is exact
  * integer arithmetic over deterministic fixtures, so the comparison is a
  * stable fact of the algorithms, not a flaky benchmark.
  */
class FilteredAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prefilter routing beats post-filter k'=20 recall at comparable budget") {
    val pre = Queries.queryMap("sim_filtered_prefilter")(spark, sf).collect()
    val post = Queries.queryMap("sim_filtered_recall")(spark, sf).collect()

    def meanBy(rows: Array[Row], col: String): Double = {
      val vs = rows.map(r => r.getLong(r.fieldIndex(col)).toDouble)
      vs.sum / vs.length
    }
    assert(pre.nonEmpty && post.nonEmpty)
    val preRecall = meanBy(pre, "recall_e6")
    val postK20 = post.filter(r => r.getLong(r.fieldIndex("kprime")) == 20L)
    assert(postK20.nonEmpty)
    val postRecall = meanBy(postK20, "recall_e6")
    assert(preRecall > postRecall,
      s"prefilter mean recall $preRecall must beat post-filter k'=20 $postRecall")

    // equal-budget guard: the prefilter arm's scored-candidate budget must
    // stay in the post-filter arm's k'=20 ballpark — beating recall by
    // silently scoring the whole corpus would prove nothing. 2×k′ bounds
    // the per-cell label skew at every test SF.
    val budget = meanBy(pre, "n_scored")
    assert(budget <= 40.0,
      s"prefilter scored-candidate budget $budget blew past the k'=20 comparison")
  }
}
