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

  /** Per-key approximate quantiles of `value` over a DETERMINISTIC uniform
    * row sample: the k rows whose md5-derived id-hash is smallest (bottom-k
    * in hash order = a fixed-size uniform sample, the KMV idea applied to
    * sampling). Mergeable in the sketch sense — the bottom-k of a union is
    * computable from per-partition bottom-k's, which is exactly what the
    * heap-based TopKPerGroupExec's partial/final split does — so memory is
    * O(k) per group at every stage, where exact percentile shuffles EVERY
    * group value to one reducer (the 100 TB failure mode this twin exists
    * for; `Corpus.tokenQuantiles` documents the exact form's limits).
    *
    * The hash is keyed on the row id, not the value: value-keyed sampling
    * would weight by distinct values, biasing quantiles on skewed data.
    * md5 keying makes the sample — and thus the approximate answer —
    * exactly reproducible in any engine, same as kmvDistinct. Groups with
    * <= k rows come out exact (the sample is the whole group).
    *
    * Returns (key, n_sample, q0..q{m-1}) with type-7 linear interpolation
    * (what both Spark `percentile` and DuckDB `quantile_cont` compute).
    * Sampling error is the standard order-statistic bound: rank error
    * O(1/sqrt(k)) with high probability.
    */
  def kmvQuantiles(df: DataFrame, key: Column, id: Column, value: Column,
      k: Int, fractions: Seq[Double] = Seq(0.25, 0.5, 0.9, 0.99)): DataFrame = {
    require(k >= 2, s"kmvQuantiles needs k >= 2, got $k")
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0, 1]: $fractions")
    val base = df.filter(value.isNotNull)
      .select(key.as("key"), id.as("id"), value.as("v"))
      .withColumn("h", hashPoint32(col("id")))
    // bottom-k by h ascending (heap keeps the k largest of -h); id tiebreak
    // pins the sample even across the ~2^-32 hash-collision flukes
    val sampled = graft.plans.TopK.perGroup(base, Seq("key"), -col("h"), col("id"), k)
    sampled.groupBy("key")
      .agg(count(lit(1)).as("n_sample"),
        percentile(col("v"), array(fractions.map(lit): _*)).as("__qs"))
      .select(Seq(col("key"), col("n_sample")) ++
        fractions.indices.map(i => col("__qs").getItem(i).as(s"q$i")): _*)
  }

  /** Row-r bucket of an item in a width-`w` Count-Min row: md5-derived, so
    * any engine reproduces it (md5 of "r#item").
    */
  def cmsBucket(row: Int, item: Column, w: Int): Column =
    pmod(hashPoint32(concat(lit(s"$row#"), item.cast("string"))), lit(w.toLong))

  /** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) of an item
    * stream: a d×w counter matrix, counter(r, c) = number of items whose
    * row-r hash lands in bucket c. Fixed O(d·w) size regardless of stream
    * length, mergeable by addition, estimate = min over rows (always an
    * overcount, error ≤ 2n/w with prob 1-2^-d).
    *
    * One explode (×d) + one aggregation; the matrix is tiny and the
    * md5-derived buckets make every counter — and thus every estimate —
    * exactly reproducible in SQL, unlike a seeded-RNG sketch.
    *
    * @return (r, bucket, cnt) rows for the non-empty counters
    */
  def cmsMatrix(items: DataFrame, item: Column, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2 (got d=$d, w=$w)")
    val rows = items.select(item.as("__i"))
      .select(col("__i"), explode(array((0 until d).map(lit): _*)).as("r"))
      .select(col("r"), cmsBucket0(col("r"), col("__i"), w).as("bucket"))
    rows.groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** cmsBucket with the row index as a column (internal explode form). */
  private def cmsBucket0(row: Column, item: Column, w: Int): Column =
    pmod(hashPoint32(concat(row.cast("string"), lit("#"), item.cast("string"))),
      lit(w.toLong))

  /** Point-query the sketch for each probe item: est = min over the d rows
    * of the matching counter (0 when a row has no matching bucket — the
    * item never appeared).
    */
  def cmsEstimate(matrix: DataFrame, probes: DataFrame, item: Column,
      d: Int = 4, w: Int = 1024): DataFrame = {
    val p = probes.select(item.as("item"))
      .select(col("item"), explode(array((0 until d).map(lit): _*)).as("r"))
      .select(col("item"), col("r"), cmsBucket0(col("r"), col("item"), w).as("bucket"))
    p.join(matrix, Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
