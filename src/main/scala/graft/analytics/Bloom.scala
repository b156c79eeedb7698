package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.SortedSetContainsAll

/** Deterministic Bloom filter (Bloom, "Space/time trade-offs in hash
  * coding with allowable errors", CACM 1970) with md5-derived bit
  * positions — the same engine-portable hash construction as
  * [[Sketch.hashPoint32]], so the filter, its membership answers, and
  * even its FALSE POSITIVES are exactly reproducible in any SQL engine
  * and therefore oracle-checkable.
  *
  * Two equivalent representations of the same bits:
  *  - relational ([[bits]]): the distinct set-bit positions as rows.
  *    Mergeable by UNION + DISTINCT (the Bloom OR), probe-able by a
  *    broadcast equi-join — the form an oracle replays.
  *  - packed ([[packSorted]]): ONE row holding the sorted position array,
  *    probed by the codegen'd [[SortedSetContainsAll]] binary search —
  *    the no-shuffle scale path.
  *
  * Scale shape (the reason this exists): a join whose small side fits in
  * a broadcast but whose FACT side is 100 TB pays the full fact shuffle
  * before a selective join can drop rows. Building a ≤ m-bit filter from
  * the small side and pruning the fact scan FIRST turns "shuffle
  * everything, then drop 97%" into "drop 97% inside the scan stage" —
  * the pattern behind Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter.*), made explicit, portable,
  * and verifiable. False positives only ever cost a few extra rows in
  * the exact join that follows; never correctness.
  */
object Bloom {

  private def requireShape(m: Int, k: Int): Unit = {
    require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two >= 64, got $m")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
  }

  /** The k md5-derived bit positions of `item` in an m-bit filter:
    * position_r = hashPoint32("r#" || item) mod m. Duplicates across the
    * k rows are possible and preserved (the probe counts k matches, so
    * both sides must keep them).
    */
  def positions(item: Column, m: Int, k: Int): Column = {
    requireShape(m, k)
    array((0 until k).map { r =>
      pmod(Sketch.hashPoint32(concat(lit(s"$r#"), item.cast("string"))), lit(m.toLong))
        .cast("int")
    }: _*)
  }

  /** Relational form: the DISTINCT set-bit positions of the filter built
    * over `item` (NULLs contribute nothing, like count-distinct). One
    * map-side-combinable distinct-agg, ≤ m rows out regardless of input
    * size.
    */
  def bits(df: DataFrame, item: Column, m: Int, k: Int): DataFrame =
    df.filter(item.isNotNull)
      .select(explode(positions(item, m, k)).as("pos"))
      .distinct()
      // positions are in [0, m), so ≤ m distinct rows exist by pigeonhole
      // — the limit is provably a no-op that makes the bound STRUCTURAL
      // (a GlobalLimit), so plan-scale audits see the filter's build side
      // as the m-bounded artifact it is, however large the input
      .limit(m)

  /** Packed form: one row, `set` = the sorted position array (≤ m ints).
    * sort_array(collect_set) gives [[SortedSetContainsAll]] its sorted
    * null-free input.
    */
  def packSorted(bitsDf: DataFrame): DataFrame =
    bitsDf.agg(sort_array(collect_set(col("pos"))).as("set"))

  /** Scale-path probe: keep the rows of `df` whose `item` might be in the
    * filter. The packed 1-row filter is broadcast (crossJoin with a 1-row
    * broadcast side adds NO exchange to `df`'s lineage), and the
    * membership test runs fused in the scan stage — `df` reaches its next
    * operator already pruned, with no shuffle spent on dropped rows.
    */
  def prune(df: DataFrame, item: Column, packed: DataFrame, m: Int, k: Int): DataFrame = {
    // collision-proof internal alias (ADVICE r4): an input df that already
    // carries a `set` column must neither hit ambiguous resolution in the
    // filter nor lose its own column on the drop
    val packedAliased = packed.toDF("__bloom_set")
    df.crossJoin(broadcast(packedAliased))
      .filter(SortedSetContainsAll(col("__bloom_set"), positions(item, m, k)))
      .drop("__bloom_set")
  }

  /** Oracle-path probe: (id, might_contain) via explode + broadcast join +
    * count == k — the form a SQL oracle replays verbatim. Exactly the
    * same boolean as [[prune]] membership (BloomSpec pins the parity);
    * costs an exchange for the per-id count, which is why [[prune]] is
    * the default.
    */
  def membership(df: DataFrame, id: Column, item: Column,
      bitsDf: DataFrame, m: Int, k: Int): DataFrame = {
    // internal names are __bloom_-prefixed for the same collision-proofing
    // as prune(); `id`/`might_contain` are the documented output contract
    val probes = df.select(id.as("id"),
      explode(positions(item, m, k)).as("__bloom_pos"))
    val marked = bitsDf.select(col("pos").as("__bloom_pos"), lit(1).as("__bloom_in"))
    probes.join(broadcast(marked), Seq("__bloom_pos"), "left")
      .groupBy("id").agg((count(col("__bloom_in")) === k).as("might_contain"))
  }
}
