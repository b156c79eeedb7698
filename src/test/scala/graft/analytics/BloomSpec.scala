package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.SortedSetContainsAll

/** Pins the guarantee Bloom's doc comments claim: the packed/codegen'd
  * [[Bloom.prune]] path and the relational/oracle [[Bloom.membership]]
  * path answer the SAME boolean for every probe — including on forced
  * false positives — and the filter has no false negatives.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  // deliberately tiny filter (m=64, k=2) over 12 members so that a probe
  // sweep of non-members hits false positives — the parity claim must
  // hold exactly where the two paths could plausibly diverge
  private val M = 64
  private val K = 2
  private lazy val members = (0 until 12).map(i => s"member_$i")
  private lazy val memberDf = members.toDF("item")
  private lazy val bitsDf = Bloom.bits(memberDf, col("item"), M, K).cache()
  private lazy val packed = Bloom.packSorted(bitsDf)
  private lazy val probeDf = ((0 until 12).map(i => s"member_$i") ++
    (0 until 500).map(i => s"other_$i")).zipWithIndex
    .map { case (s, i) => (i.toLong, s) }.toDF("id", "item")

  private lazy val pruneKept: Set[Long] =
    Bloom.prune(probeDf, col("item"), packed, M, K)
      .select("id").as[Long].collect().toSet

  private lazy val membershipTrue: Set[Long] =
    Bloom.membership(probeDf, col("id"), col("item"), bitsDf, M, K)
      .filter(col("might_contain")).select("id").as[Long].collect().toSet

  test("prune and membership agree on every probe (parity)") {
    assert(pruneKept === membershipTrue)
  }

  test("no false negatives: every member passes both paths") {
    val memberIds = (0L until 12L).toSet
    assert(memberIds.subsetOf(pruneKept))
    assert(memberIds.subsetOf(membershipTrue))
  }

  test("the sweep forces at least one false positive and parity holds there") {
    val falsePositives = pruneKept -- (0L until 12L).toSet
    assert(falsePositives.nonEmpty,
      "m=64/k=2 over 500 non-member probes must yield a false positive")
    // the FP ids passed BOTH paths (parity test already proves set
    // equality; this pins that the interesting rows exist in it)
    assert(falsePositives.subsetOf(membershipTrue))
  }

  test("prune survives an input that already has a `set` column") {
    val withSet = probeDf.withColumn("set", lit("user-data"))
    val kept = Bloom.prune(withSet, col("item"), packed, M, K)
    assert(kept.columns.contains("set"))
    assert(kept.select("id").as[Long].collect().toSet === pruneKept)
    assert(kept.select("set").distinct().as[String].collect().toSeq === Seq("user-data"))
  }

  test("sorted_set_contains_all three-valued null semantics") {
    val df = Seq(
      (1, Seq[Integer](1, 5, 9), Seq[Integer](1, 9)),         // all present
      (2, Seq[Integer](1, 5, 9), Seq[Integer](1, 4)),         // one absent
      (3, Seq[Integer](1, 5, 9), Seq[Integer](1, null)),      // null probe, rest present
      (4, Seq[Integer](1, 5, 9), Seq[Integer](4, null)),      // null probe + absent
      (5, Seq[Integer](null, 1, 5), Seq[Integer](1, 5))       // null-first set (sort_array shape)
    ).toDF("id", "set", "probes")
    val got = df.select(col("id"),
        SortedSetContainsAll(col("set"), col("probes")).as("r"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getBoolean(1))).toSeq
    assert(got === Seq(Some(true), Some(false), None, Some(false), Some(true)))
    // and it matches the declarative forall+array_contains 3VL exactly
    val declarative = df.select(col("id"),
        forall(col("probes"), p => array_contains(col("set"), p)).as("r"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getBoolean(1))).toSeq
    assert(got === declarative)
  }

  test("non-int arrays are implicitly cast, not misread") {
    // array<bigint> probes: analysis-time implicit cast must make this the
    // same answer as the int form (pre-fix, getInt misread the long slots)
    val df = Seq((Seq(1, 5, 9), Seq(1L, 9L), Seq(1L, 4L))).toDF("set", "p1", "p2")
    val r = df.select(
      SortedSetContainsAll(col("set"), col("p1")).as("a"),
      SortedSetContainsAll(col("set"), col("p2")).as("b")).head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
