package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-computed merges and counts on a tiny vocabulary") {
    // "aab"×3 + "ab"×2: round-1 pairs (a,a)=3, (a,b)=3+2=5 → merge (a,b).
    // After it, aab=[a,ab], ab=[ab]; round-2 pairs (a,ab)=3 → merge (a,ab).
    val words = Seq(("aab", 3L), ("ab", 2L)).toDF("w", "freq")
    val (merges, fin) = Bpe.learnMerges(words, k = 2)
    val m = merges.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "b", 5L), (2L, "a", "ab", 3L)))
    val seg = Bpe.segmented(fin).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(seg("aab") == ("aab", 1L))
    assert(seg("ab") == ("ab", 1L))
  }

  test("merge replay is greedy left-to-right: 'aaa' keeps a trailing 'a'") {
    val words = Seq(("aaa", 1L)).toDF("w", "freq")
    val (merges, fin) = Bpe.learnMerges(words, k = 1)
    val m = merges.collect().head
    assert((m.getString(1), m.getString(2), m.getLong(3)) == ("a", "a", 2L))
    val seg = Bpe.segmented(fin).collect().head
    assert(seg.getString(1) == "aa|a" && seg.getLong(2) == 2L)
  }

  test("wordFreqs: lowercases, filters to [a-z]{2,12}, applies the floor") {
    val docs = Seq(
      (1L, "Big big BIG x data2 data data verylongwordxx"),
      (2L, "big data")).toDF("doc_id", "text")
    val wf = Bpe.wordFreqs(docs, minFreq = 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "x" (len 1), "data2" (digit), "verylongwordxx" (len 14) all drop;
    // big=4 and data=3 survive the floor
    assert(wf == Map("big" -> 4L, "data" -> 3L))
  }
}
