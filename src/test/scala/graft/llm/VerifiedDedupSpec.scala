package graft.llm

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-stage verified dedup pipeline: MinHash proposes, exact jaccard
  * disposes, CC makes it transitive, the min id survives. Pins both the
  * semantics and the SCALE-CRITICAL plan shape — the exact stage's input
  * is the candidate set, never the corpus.
  */
class VerifiedDedupSpec extends SparkSpec {
  import spark.implicits._

  // a 3-chain of true near-dups (A~B, B~C strongly overlapping word sets),
  // one decoy with modest overlap (should fail the 0.5 exact confirm), and
  // unrelated docs
  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")
  private val corpus = Seq(
    (1L, base + " alpha"),
    (2L, base + " beta"),
    (3L, base + " gamma delta"),
    (10L, (1 to 12).map(i => s"tok$i").mkString(" ") + " " +
      (1 to 18).map(i => s"other$i").mkString(" ")), // ~ 12/48 overlap: decoy
    (20L, (1 to 30).map(i => s"unrelated$i").mkString(" ")),
    (21L, (1 to 30).map(i => s"disjoint$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("verifyPairsJaccard confirms true pairs, rejects the decoy, and only scores candidates") {
    val cands = Seq((1L, 2L), (2L, 3L), (1L, 10L)).toDF("id_a", "id_b")
    val out = Dedup.verifyPairsJaccard(cands, corpus, "text", "doc_id", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 3L)))
    // pairs NOT proposed are never scored: (1,3) is a true near-dup pair
    // but absent from the candidate input, so absent from the output —
    // the exact stage must not invent corpus pairs
    assert(!out.contains((1L, 3L)))
  }

  test("plan shape: the exact stage is equi-joins on the candidate set, no quadratic block join") {
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val verified = Dedup.verifyPairsJaccard(cands, corpus, "text", "doc_id", 0.5)
    val joins = verified.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 2, s"expected exactly the two candidate equi-joins, got ${joins.size}")
    // a quadratic block join carries an id inequality (x.id < y.id) in its
    // condition; the verify joins must be pure equi-joins on id_a/id_b
    joins.foreach { j =>
      val cond = j.condition.map(_.sql).getOrElse("")
      assert(!cond.contains("<"), s"verify join must be an equi-join, got: $cond")
    }
  }

  test("minhashVerifiedKeep: chain collapses to its min id, decoy and unrelated docs survive") {
    val kept = Dedup.minhashVerifiedKeep(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 20L, 21L))
  }

  test("verified keep is idempotent: rerunning on the kept set keeps everything") {
    val kept = Dedup.minhashVerifiedKeep(corpus, "text", "doc_id")
    val again = Dedup.minhashVerifiedKeep(kept, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept.select("doc_id").as[Long].collect().toSet)
  }
}
