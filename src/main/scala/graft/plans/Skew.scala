package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the shapes AQE does NOT fix.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) re-splits
  * oversized partitions of a sort-merge join at runtime — joins are mostly
  * covered. What it cannot fix:
  *
  *  - exact `count(DISTINCT v)` per key: Spark rewrites it to a two-stage
  *    aggregate whose first shuffle key is (key, v) — fine — but the
  *    SECOND stage shuffles every distinct v of one key to ONE reducer; a
  *    hot key with 10⁹ distinct values serializes on that reducer.
  *  - joins that AQE can't re-split (the build side of a broadcast probe
  *    is fine by definition; a shuffled-hash join with one mega-key still
  *    lands that key on one task).
  *
  * Both fixes are classic salting, expressed declaratively so Catalyst
  * still fuses everything around the exchanges.
  */
object Skew {

  /** Exact per-key distinct count that never concentrates a hot key on one
    * reducer: distinct values are partitioned by value-hash into `salts`
    * disjoint buckets, counted per (key, bucket), then the per-bucket
    * counts are summed per key. Correct for any salts >= 1 because a given
    * value always hashes to exactly one bucket — the buckets partition the
    * distinct set. Both shuffles spread a hot key over `salts` reducers;
    * the final sum moves only `salts` rows per key.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
      salts: Int = 32): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    df.groupBy(key.as("key"), pmod(xxhash64(value), lit(salts)).as("__salt"))
      .agg(count_distinct(value).as("__partial"))
      .groupBy("key").agg(sum("__partial").as("n_distinct"))
  }

  /** Equi-join with the probe side's hot keys spread over `salts` tasks:
    * the probe gets a deterministic salt from a unique probe column, the
    * build side is replicated `salts` times, and the join key becomes
    * (key, salt). Row-for-row identical to `probe.join(build, keys)` —
    * build replication ×salts is the price, so use it when the build side
    * is too big to broadcast yet small enough to replicate, and AQE's
    * skew split doesn't apply (e.g. shuffled-hash path, or the skew is in
    * a downstream stateful op).
    *
    * @param saltSource any probe column with high cardinality (a unique id
    *                   is ideal) — drives the deterministic salt
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltSource: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    // NULL saltSource must still salt somewhere: a null salt would never
    // equi-match the build side and the row would silently vanish from an
    // otherwise-matching join
    val p = probe.withColumn("__salt",
      coalesce(pmod(xxhash64(saltSource), lit(salts)), lit(0L)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
