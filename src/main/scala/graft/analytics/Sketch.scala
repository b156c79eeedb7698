package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Lineage._

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

  /** KMV set algebra: approximate |A ∪ B|, |A ∩ B| and Jaccard from two
    * bottom-k sketches (Beyer et al., "On synopses for distinct-value
    * estimation under multiset operations", SIGMOD'07). The union of two
    * KMV sketches is itself a KMV sketch (bottom-k of the merged point
    * set), which estimates |A ∪ B| exactly like [[kmvDistinct]]; the
    * Jaccard index is estimated by the fraction of those k union points
    * present in BOTH side sketches, and |A ∩ B| ≈ J · |A ∪ B|. This is
    * the sketch identity that makes distinct-count sketches COMPOSABLE —
    * overlap questions ("how many customers bought in both periods?")
    * answered from two O(k) summaries, no re-scan of either population.
    *
    * When the merged sketch holds fewer than k points both populations
    * were captured whole and every answer is EXACT (integer arithmetic);
    * the estimator path spells its double arithmetic in the same
    * operation order as the SQL oracle, so even approximate answers are
    * bit-reproducible cross-engine.
    *
    * Scale shape: each side is one distinct-agg + heap bottom-k (O(k)
    * state at every stage, exactly [[kmvDistinct]]'s plan); everything
    * after operates on ≤ 2k rows. Returns one row
    * (union_e6, intersect_e6, jaccard_e6).
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, valueA: Column, valueB: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def sketch(df: DataFrame, v: Column, side: String): DataFrame = {
      val pts = df.filter(v.isNotNull)
        .select(hashPoint32(v).as("h")).distinct()
        .select(col("h"), lit(1).as("__g"))
      graft.plans.TopK.perGroup(pts, Seq("__g"), -col("h"), col("h"), k)
        .select(col("h"), lit(true).as(side))
    }
    val merged = sketch(a, valueA, "in_a")
      .join(sketch(b, valueB, "in_b"), Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"), lit(1).as("__g"))
    val bottom = graft.plans.TopK.perGroup(merged, Seq("__g"), -col("h"), col("h"), k)
    val c = (k - 1).toDouble * 4294967296.0
    bottom
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("vk"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("m"))
      .select(
        when(col("cnt") < k, col("cnt") * 1000000L)
          .otherwise(floor(lit(c) / greatest(col("vk"), lit(1L)) * 1e6).cast("long"))
          .as("union_e6"),
        when(col("cnt") < k, col("m") * 1000000L)
          .otherwise(floor((lit(c) / greatest(col("vk"), lit(1L))) *
            (col("m").cast("double") / lit(k.toDouble)) * lit(1e6)).cast("long"))
          .as("intersect_e6"),
        when(col("cnt") === 0, lit(0L))
          .when(col("cnt") < k, expr("m * 1000000 DIV cnt"))
          .otherwise(expr(s"m * 1000000 DIV $k"))
          .as("jaccard_e6"))
  }

  /** HLL parameters shared by the Spark form and the SQL oracle so both
    * spell IDENTICAL estimator arithmetic (see [[hllDistinct]]).
    *
    * @param bucketHexChars b: register index = first b md5 hex chars
    *                       (m = 16^b registers)
    * @param tailHexChars   t: rho is computed over the next t hex chars
    *                       (4t bits); rho ∈ [1, 4t+1]
    */
  final case class HllParams(bucketHexChars: Int = 2, tailHexChars: Int = 12) {
    require(bucketHexChars >= 1 && bucketHexChars <= 4,
      s"bucketHexChars must be in [1,4], got $bucketHexChars")
    require(tailHexChars >= 1 && tailHexChars <= 13,
      s"tailHexChars must be in [1,13], got $tailHexChars")
    val m: Int = 1 << (4 * bucketHexChars)
    /** rho upper bound (all-zero tail) — also the fixed-point scale R:
      * Σ 2^-rho is summed as Σ 2^(R-rho), an exact BIGINT.
      */
    val rhoCap: Int = 4 * tailHexChars + 1
    /** Flajolet et al.'s alpha_m bias constant. */
    val alpha: Double = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case mm => 0.7213 / (1.0 + 1.079 / mm)
    }
    /** The full numerator alpha·m²·2^R as ONE double literal: computed once
      * here, embedded verbatim (Double.toString round-trips exactly, and
      * decimal→double parsing is correctly rounded in both the JVM and
      * DuckDB) so both engines divide the same numerator by the same
      * integer-derived denominator.
      */
    val numerator: Double = alpha * m * m * math.pow(2.0, rhoCap)
  }

  /** Per-key HyperLogLog distinct count (Flajolet, Fusy, Gandouet, Meunier,
    * "HyperLogLog: the analysis of a near-optimal cardinality estimation
    * algorithm", AofA 2007) built on md5 registers so the APPROXIMATE
    * answer is exactly reproducible in any SQL engine — the HLL member of
    * the KMV/CMS/Bloom md5-portable sketch family, closing the one
    * rows-only row the builtin approx_count_distinct (whose xxhash64 +
    * engine-private registers no oracle can replay) left on the board.
    *
    * Construction, identical in both engines:
    *  - register index = first b md5 hex chars of the value (m = 16^b);
    *  - rho = 1 + number of leading zero BITS of the next t hex chars
    *    (counted via strip-leading-'0'-chars + a 4-way CASE on the first
    *    nonzero hex digit — pure string ops, no bit intrinsics needed),
    *    capped at 4t+1 on an all-zero tail;
    *  - register value M_j = max rho per (key, register);
    *  - raw estimate E = alpha·m² / Σ_j 2^-M_j with EVERY register
    *    counted — absent registers contribute 2^-0 = 1 via the
    *    (m - nb) term.
    *
    * Determinism: the harmonic sum is computed in INTEGER space —
    * Σ 2^(R-M_j) with R = 4t+1 is a sum of exact BIGINTs (each ≤ 2^(R-1),
    * total < 2^(R+b·4) — fits int64 for every legal param), so it is
    * order-independent where a double sum of 2^-M_j would round
    * differently under Spark's vs DuckDB's reduction order. The only
    * floating-point steps are one int64→double cast, one division by the
    * shared literal numerator, one ×1e6 and a floor — each IEEE-exact
    * deterministic, so the fixed-point result hash-matches cross-engine.
    *
    * The classic small/large-range corrections are deliberately OMITTED
    * (they need ln(), whose last-ulp rounding libms don't agree on); this
    * is the raw estimator, accurate in the n ≳ 2.5m regime the sketch
    * targets — callers needing exactness on small groups use the KMV twin,
    * which degrades to exact there. Scale shape: one (key, bucket)
    * hash-agg (map-side combinable, ≤ m rows per key out) + one tiny
    * final agg; O(m) state per key at every stage; no distinct shuffle of
    * the raw values at all.
    */
  def hllDistinct(df: DataFrame, key: Column, value: Column,
      params: HllParams = HllParams()): DataFrame = {
    val p = params
    val mh = md5(value.cast("string").cast("binary"))
    val tail = substring(mh, p.bucketHexChars + 1, p.tailHexChars)
    // leading zero bits of the tail, via hex-char string surgery: each
    // stripped '0' char is 4 zero bits; the first nonzero hex digit adds
    // 0-3 more (1→3, 2-3→2, 4-7→1, 8-f→0)
    val stripped = regexp_replace(tail, "^0+", "")
    val firstNz = substring(stripped, 1, 1)
    val extra = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(length(stripped) === 0, p.rhoCap)
      .otherwise((lit(p.tailHexChars) - length(stripped)) * 4 + extra + 1)
    val registers = df.filter(value.isNotNull)
      .select(key.as("key"), substring(mh, 1, p.bucketHexChars).as("bucket"),
        rho.as("rho"))
      .groupBy("key", "bucket").agg(max(col("rho")).as("rmax"))
    registers.groupBy("key")
      .agg(count(lit(1)).as("nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${p.rhoCap} - rmax)")).as("si"))
      .select(col("key"),
        floor(lit(p.numerator) /
            (shiftleft(lit(p.m.toLong) - col("nb"), p.rhoCap) + col("si"))
              .cast("double") * 1e6)
          .cast("long").as("n_distinct_e6"))
  }

  /** HLL as a RE-AGGREGABLE sketch table: registers materialized at
    * (coarseKey, fineKey) granularity — e.g. one row per (month, day,
    * bucket), the daily sketch table a 100 TB pipeline persists — then
    * rolled up to coarseKey by register-max and estimated. Because
    * register max is associative, the rolled-up estimate is IDENTICAL to
    * running [[hllDistinct]] directly on the coarse key (pinned in
    * SketchSpec): this is the property that lets distinct-count dashboards
    * answer any coarser window from incrementally-maintained fine sketches
    * without ever re-scanning the raw data. Same register construction and
    * estimator arithmetic as [[hllDistinct]], so the rollup path is
    * oracle-exact too.
    */
  def hllRollup(df: DataFrame, coarseKey: Column, fineKey: Column,
      value: Column, params: HllParams = HllParams()): DataFrame = {
    val p = params
    val mh = md5(value.cast("string").cast("binary"))
    val tail = substring(mh, p.bucketHexChars + 1, p.tailHexChars)
    val stripped = regexp_replace(tail, "^0+", "")
    val firstNz = substring(stripped, 1, 1)
    val extra = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(length(stripped) === 0, p.rhoCap)
      .otherwise((lit(p.tailHexChars) - length(stripped)) * 4 + extra + 1)
    // the materializable fine-grained sketch table: (coarse, fine, bucket)
    val fineRegisters = df.filter(value.isNotNull)
      .select(coarseKey.as("key"), fineKey.as("fine"),
        substring(mh, 1, p.bucketHexChars).as("bucket"), rho.as("rho"))
      .groupBy("key", "fine", "bucket").agg(max(col("rho")).as("rmax"))
    // rollup: register max over the fine axis (associative — both
    // aggregations are map-side combinable on their keys)
    val rolled = fineRegisters.groupBy("key", "bucket")
      .agg(max(col("rmax")).as("rmax"))
    rolled.groupBy("key")
      .agg(count(lit(1)).as("nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${p.rhoCap} - rmax)")).as("si"))
      .select(col("key"),
        floor(lit(p.numerator) /
            (shiftleft(lit(p.m.toLong) - col("nb"), p.rhoCap) + col("si"))
              .cast("double") * 1e6)
          .cast("long").as("n_distinct_e6"))
  }

  /** The DuckDB oracle for [[hllRollup]] — [[hllDistinctSql]]'s CTE chain
    * with the explicit two-level register aggregation spelled out.
    */
  def hllRollupSql(table: String, coarseExpr: String, coarseName: String,
      fineExpr: String, valueExpr: String,
      params: HllParams = HllParams()): String = {
    val p = params
    val b = p.bucketHexChars
    val t = p.tailHexChars
    s"""WITH v AS (SELECT DISTINCT $coarseExpr AS key, $fineExpr AS fine,
       |             md5(CAST($valueExpr AS VARCHAR)) AS mh
       |           FROM $table WHERE $valueExpr IS NOT NULL),
       |r AS (SELECT key, fine, substring(mh, 1, $b) AS bucket,
       |        regexp_replace(substring(mh, ${b + 1}, $t), '^0+', '') AS st
       |      FROM v),
       |q AS (SELECT key, fine, bucket,
       |        CASE WHEN length(st) = 0 THEN ${p.rhoCap}
       |             ELSE 4 * ($t - length(st)) +
       |                  CASE WHEN substring(st, 1, 1) = '1' THEN 3
       |                       WHEN substring(st, 1, 1) IN ('2', '3') THEN 2
       |                       WHEN substring(st, 1, 1) IN ('4', '5', '6', '7') THEN 1
       |                       ELSE 0 END + 1 END AS rho
       |      FROM r),
       |g0 AS (SELECT key, fine, bucket, max(rho) AS rmax FROM q GROUP BY key, fine, bucket),
       |g AS (SELECT key, bucket, max(rmax) AS rmax FROM g0 GROUP BY key, bucket),
       |a AS (SELECT key, count(*) AS nb,
       |        CAST(sum(CAST(1 AS BIGINT) << (${p.rhoCap} - rmax)) AS BIGINT) AS si
       |      FROM g GROUP BY key)
       |SELECT key AS $coarseName,
       |  CAST(floor(${p.numerator} /
       |      CAST((CAST(${p.m} - nb AS BIGINT) << ${p.rhoCap}) + si AS DOUBLE) * 1000000)
       |    AS BIGINT) AS n_distinct_e6
       |FROM a ORDER BY $coarseName""".stripMargin
  }

  /** The DuckDB oracle for [[hllDistinct]] over a (keyExpr, valueExpr)
    * pair — generated HERE, next to the Spark form, so the two can never
    * drift: same b/t/R constants, same CASE table, same integer-space
    * harmonic sum, same literal numerator.
    */
  def hllDistinctSql(table: String, keyExpr: String, keyName: String,
      valueExpr: String, params: HllParams = HllParams()): String = {
    val p = params
    val b = p.bucketHexChars
    val t = p.tailHexChars
    s"""WITH v AS (SELECT DISTINCT $keyExpr AS key, md5(CAST($valueExpr AS VARCHAR)) AS mh
       |           FROM $table WHERE $valueExpr IS NOT NULL),
       |r AS (SELECT key, substring(mh, 1, $b) AS bucket,
       |        regexp_replace(substring(mh, ${b + 1}, $t), '^0+', '') AS st
       |      FROM v),
       |q AS (SELECT key, bucket,
       |        CASE WHEN length(st) = 0 THEN ${p.rhoCap}
       |             ELSE 4 * ($t - length(st)) +
       |                  CASE WHEN substring(st, 1, 1) = '1' THEN 3
       |                       WHEN substring(st, 1, 1) IN ('2', '3') THEN 2
       |                       WHEN substring(st, 1, 1) IN ('4', '5', '6', '7') THEN 1
       |                       ELSE 0 END + 1 END AS rho
       |      FROM r),
       |g AS (SELECT key, bucket, max(rho) AS rmax FROM q GROUP BY key, bucket),
       |a AS (SELECT key, count(*) AS nb,
       |        CAST(sum(CAST(1 AS BIGINT) << (${p.rhoCap} - rmax)) AS BIGINT) AS si
       |      FROM g GROUP BY key)
       |SELECT key AS $keyName,
       |  CAST(floor(${p.numerator} /
       |      CAST((CAST(${p.m} - nb AS BIGINT) << ${p.rhoCap}) + si AS DOUBLE) * 1000000)
       |    AS BIGINT) AS n_distinct_e6
       |FROM a ORDER BY $keyName""".stripMargin
  }

  /** Grouping-sets distinct-count dashboard from ONE fine register table:
    * HLL registers materialized per (k1, k2, bucket), then merged by
    * register max to the (k1,k2) / (k1) / (k2) / grand-total granularities
    * — the full GROUPING SETS face answered without ever re-scanning the
    * raw data (associativity, as [[hllRollup]] pins). Each row also
    * carries its share of the grand-total estimate as an exact e6 ratio
    * (cross-multiplied in DECIMAL(38,0) — no overflow, no double divide).
    * Rolled-up key positions read 'ALL' (never NULL — cross-engine sort
    * order of NULLs differs, 'ALL' sorts identically everywhere).
    *
    * The register table is localCheckpoint'd: the raw data is scanned
    * once; all four merges read the (tiny, m-bounded per group) sketch.
    */
  def hllGroupingSets(df: DataFrame, key1: Column, key2: Column,
      value: Column, params: HllParams = HllParams()): DataFrame = {
    val p = params
    val mh = md5(value.cast("string").cast("binary"))
    val tail = substring(mh, p.bucketHexChars + 1, p.tailHexChars)
    val stripped = regexp_replace(tail, "^0+", "")
    val firstNz = substring(stripped, 1, 1)
    val extra = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(length(stripped) === 0, p.rhoCap)
      .otherwise((lit(p.tailHexChars) - length(stripped)) * 4 + extra + 1)
    // NULL key values coalesce to a sentinel: Spark sorts NULLS FIRST,
    // DuckDB NULLS LAST, so a NULL left in the output would diverge the
    // ordered rows across engines (the 'ALL' sentinel covers only
    // rolled-up positions, not null data values)
    val fine = df.filter(value.isNotNull)
      .select(coalesce(key1.cast("string"), lit("NULL")).as("k1"),
        coalesce(key2.cast("string"), lit("NULL")).as("k2"),
        substring(mh, 1, p.bucketHexChars).as("bucket"), rho.as("rho"))
      .groupBy("k1", "k2", "bucket").agg(max(col("rho")).as("rmax"))
      .truncateLineage(eager = true)
    def est(keys: Seq[String]): DataFrame = {
      val merged = fine.groupBy((keys :+ "bucket").map(col): _*)
        .agg(max(col("rmax")).as("rmax"))
      merged.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("nb"),
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${p.rhoCap} - rmax)")).as("si"))
        .select(keys.map(col) :+
          floor(lit(p.numerator) /
              (shiftleft(lit(p.m.toLong) - col("nb"), p.rhoCap) + col("si"))
                .cast("double") * 1e6)
            .cast("long").as("n_distinct_e6"): _*)
    }
    // the grand total is built ONCE and reused for both the union's
    // 'total' row and the share denominator (identical subtrees, so the
    // exchange-reuse rule runs the aggregation a single time)
    val tot = est(Seq.empty)
    val all = est(Seq("k1", "k2")).withColumn("gset", lit("k1,k2"))
      .unionByName(est(Seq("k1"))
        .withColumn("k2", lit("ALL")).withColumn("gset", lit("k1")))
      .unionByName(est(Seq("k2"))
        .withColumn("k1", lit("ALL")).withColumn("gset", lit("k2")))
      .unionByName(tot
        .withColumn("k1", lit("ALL")).withColumn("k2", lit("ALL"))
        .withColumn("gset", lit("total")))
    all.crossJoin(broadcast(tot.select(col("n_distinct_e6").as("__tot"))))
      .select(col("gset"), col("k1"), col("k2"), col("n_distinct_e6"),
        expr("""CAST(CAST(n_distinct_e6 AS DECIMAL(38,0)) * 1000000
                | DIV CAST(__tot AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
          .as("share_e6"))
      .orderBy("gset", "k1", "k2")
  }

  /** The DuckDB oracle for [[hllGroupingSets]] — the same register chain
    * with every merge/estimate spelled out, generated next to the Spark
    * form so the two can never drift.
    */
  def hllGroupingSetsSql(table: String, k1Expr: String, k2Expr: String,
      valueExpr: String, params: HllParams = HllParams()): String = {
    val p = params
    val b = p.bucketHexChars
    val t = p.tailHexChars
    val estFrom = (src: String, keys: Seq[String]) => {
      val kSel = if (keys.isEmpty) "" else keys.mkString("", ", ", ",")
      val kGrp = if (keys.isEmpty) "" else " GROUP BY " + keys.mkString(", ")
      s"""(SELECT $kSel count(*) AS nb,
         |   CAST(sum(CAST(1 AS BIGINT) << (${p.rhoCap} - rmax)) AS BIGINT) AS si
         | FROM $src$kGrp)""".stripMargin
    }
    val e =
      s"""CAST(floor(${p.numerator} /
         |  CAST((CAST(${p.m} - nb AS BIGINT) << ${p.rhoCap}) + si AS DOUBLE) * 1000000)
         |  AS BIGINT)""".stripMargin
    s"""WITH v AS (SELECT DISTINCT COALESCE(CAST($k1Expr AS VARCHAR), 'NULL') AS k1,
       |             COALESCE(CAST($k2Expr AS VARCHAR), 'NULL') AS k2,
       |             md5(CAST($valueExpr AS VARCHAR)) AS mh
       |           FROM $table WHERE $valueExpr IS NOT NULL),
       |r AS (SELECT k1, k2, substring(mh, 1, $b) AS bucket,
       |        regexp_replace(substring(mh, ${b + 1}, $t), '^0+', '') AS st
       |      FROM v),
       |q AS (SELECT k1, k2, bucket,
       |        CASE WHEN length(st) = 0 THEN ${p.rhoCap}
       |             ELSE 4 * ($t - length(st)) +
       |                  CASE WHEN substring(st, 1, 1) = '1' THEN 3
       |                       WHEN substring(st, 1, 1) IN ('2', '3') THEN 2
       |                       WHEN substring(st, 1, 1) IN ('4', '5', '6', '7') THEN 1
       |                       ELSE 0 END + 1 END AS rho
       |      FROM r),
       |f AS (SELECT k1, k2, bucket, max(rho) AS rmax FROM q GROUP BY 1, 2, 3),
       |m1 AS (SELECT k1, bucket, max(rmax) AS rmax FROM f GROUP BY 1, 2),
       |m2 AS (SELECT k2, bucket, max(rmax) AS rmax FROM f GROUP BY 1, 2),
       |mt AS (SELECT bucket, max(rmax) AS rmax FROM f GROUP BY 1),
       |a12 AS ${estFrom("(SELECT k1, k2, bucket, rmax FROM f)", Seq("k1", "k2"))},
       |a1 AS ${estFrom("m1", Seq("k1"))},
       |a2 AS ${estFrom("m2", Seq("k2"))},
       |at AS ${estFrom("mt", Seq.empty)},
       |u AS (
       |  SELECT 'k1,k2' AS gset, k1, k2, $e AS n_distinct_e6 FROM a12
       |  UNION ALL
       |  SELECT 'k1', k1, 'ALL', $e FROM a1
       |  UNION ALL
       |  SELECT 'k2', 'ALL', k2, $e FROM a2
       |  UNION ALL
       |  SELECT 'total', 'ALL', 'ALL', $e FROM at)
       |SELECT gset, k1, k2, n_distinct_e6,
       |  CAST(CAST(n_distinct_e6 AS HUGEINT) * 1000000
       |    // (SELECT CAST($e AS HUGEINT) FROM at) AS BIGINT) AS share_e6
       |FROM u ORDER BY gset, k1, k2""".stripMargin
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
