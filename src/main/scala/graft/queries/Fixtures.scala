package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Bloom, Dashboard}
import graft.etl.{Parse, Transform}
import graft.expr.Transliterate
import graft.llm.{Corpus, Dedup, Multimodal, Similarity, TextStats}
import graft.schema.PropertySchema
import graft.streaming.Events
import graft.util.Num.{cents, e6}
import graft.queries.Fixtures._
import graft.queries.OracleShared._

/** Shared fixtures of the query registry: table readers, the synthetic
  * raw-property frame (SURVEY.md §1.2) derived deterministically from
  * lineitem, its transform chain, and the SQL fragments every domain
  * registrar's oracle builds on. Split out of the former monolithic
  * Queries.scala (pure move).
  */
private[graft] object Fixtures {

  private[queries] def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** NULL-means-overflow guard for the exact-rational stat queries whose
    * DECIMAL(38,0) cross-products near the 38-digit cap at large scale
    * factors (dash_mann_whitney/dash_fdr_bh/dash_did/dash_kruskal_wallis —
    * exact through ~sf1, headroom documented per query). Under Spark's
    * non-ANSI decimal arithmetic an overflowed product becomes NULL
    * mid-plan while the DuckDB oracle's HUGEINT stays exact — a silent
    * NULL-vs-value hash miss. These stats pin every degenerate denominator
    * with greatest(·, 1), so a NULL in the named column can ONLY be
    * overflow: raise a diagnostic instead of publishing it.
    */
  private[queries] def overflowGuard(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, expr(
      s"""IF($name IS NULL,
         |   CAST(raise_error(concat('$name is NULL: DECIMAL(38,0) ',
         |     'cross-product overflowed — this scale factor exceeds the ',
         |     'query''s documented exact-arithmetic headroom')) AS BIGINT),
         |   $name)""".stripMargin))

  /** Boundary cast of an exact DECIMAL(38,0) *working* column back to BIGINT
    * for the registry's output contract (the driver's comparator canonicalizes
    * BIGINT/DOUBLE/VARCHAR cells; raw decimals were the r12 reds). The guard
    * makes overflow a loud error instead of the silent NULL a non-ANSI
    * decimal→long cast produces: if a future scale factor pushes the value
    * past ±(2⁶³−1), the query raises with the offending value rather than
    * hash-diverging from the oracle's HUGEINT. Use for diagnostic columns
    * whose *working* precision must be 38 digits but whose observed range
    * fits a long at every supported SF. The accepted domain is the
    * SYMMETRIC ±(2⁶³−1): exactly −2⁶³ also raises — conservative by one
    * value at the negative edge, and a loud diagnostic there beats a
    * special case nothing ever hits. A NULL input also raises: the guarded
    * columns are never legitimately NULL, so NULL here can only mean the
    * 38-digit working arithmetic itself overflowed upstream (Spark's
    * non-ANSI decimal ops NULL on overflow), and `abs(NULL) > lit` would
    * otherwise let it glide through the false branch silently.
    */
  private[queries] def decimalBoundaryToLong(name: String): String =
    s"""IF($name IS NULL OR abs($name) > CAST(${Long.MaxValue} AS DECIMAL(38,0)),
       |   CAST(raise_error(concat('$name overflows the BIGINT query boundary: ',
       |                           coalesce(CAST($name AS STRING),
       |                                    'NULL (upstream DECIMAL(38,0) overflow)'))) AS BIGINT),
       |   CAST($name AS BIGINT)) AS $name""".stripMargin

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * only surfaces as a raw long (legacy.parquet.nanosAsLong). Normalize to
    * a micro-precision TimestampType column regardless of how it arrived.
    * (The DuckDB oracle mirrors the truncation with CAST(ts AS TIMESTAMP).)
    */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    // Scoped config flip: the flag only matters while the parquet footer
    // is read to resolve the schema (df creation), so restore the prior
    // value afterwards instead of leaking it into the shared session.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val df =
      try {
        val d = tbl(spark, dir, "events")
        d.schema // force schema resolution under the flag
        d
      } finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    df.schema("ts").dataType.typeName match {
      // `div` (integer division) — a double division of ~1.7e18 ns loses
      // ~256 ns of precision and rounds the microsecond.
      case "long" => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  // ===========================================================================
  // Synthetic raw-property frame (SURVEY.md §1.2) derived deterministically
  // from lineitem — the reference's domain rebuilt from the driver's tables
  // so the full transform chain is oracle-checkable at any scale factor.
  // Pure integer arithmetic + shared string literals keep the Spark and
  // DuckDB forms bit-identical.
  // ===========================================================================

  val purposes: Seq[String] = Seq(
    "Prodej bytu", "Pronájem bytu", "Prodej domu", "Pronájem kanceláře",
    "Prodej pozemku", "Pronájem nebytového prostoru", "Prodej chaty, chalupy",
    "Pronájem chaty, chalupy", "Prodej garáže", "Pronájem domu",
    "Prodej kanceláře", "Pronájem pozemku")

  val addresses: Seq[String] = Seq(
    "Vinohradská 12, Praha",
    "Náměstí Svobody 5, Brno, Jihomoravský kraj",
    "Dlouhá 7, Jihlava, Kraj Vysočina",
    "Hlavní 3, Ostrava, Moravskoslezský kraj",
    "Lazaretní 1, Plzeň, Plzeňský kraj",
    "Nová 9, Bratislava, Bratislavský kraj", // non-Czech region → whitelist drop
    "Krátká 2, Olomouc, Olomoucký kraj",
    "Václavské náměstí 1, Praha")

  val designs: Seq[String] = Seq("1+kk", "2+kk", "2+1", "3+1", "4+kk", "")

  private[queries] val nbsp = " "

  /** Spark form. id = l_orderkey*10 + l_linenumber, made globally unique by
    * a DISTINCT — the synthetic lineitem repeats (orderkey, linenumber)
    * pairs, and downstream keep-first dedup semantics need a unique id.
    * (array(lit…) instead of typedlit: no TypeTag reflection, so it also
    * works under REPL/foreign classloaders.)
    */
  private[queries] def litArray(xs: Seq[String]): Column = array(xs.map(lit): _*)

  def rawProperties(spark: SparkSession, dir: String): DataFrame = {
    val id = col("id")
    val v = pmod(id * 7919L, lit(9000000L)) + 100L
    tbl(spark, dir, "lineitem")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
      // Explicit fan-out UNDER the distinct, pinning the partition count of
      // the one exchange feeding the heavy row build (string literals →
      // transliterate → regex filters downstream): AQE's partition
      // coalescing sizes the distinct's own exchange by BYTES (~2 MB of
      // longs → 2 post-shuffle partitions at the 1 MB minPartitionSize),
      // which serialized the whole per-row string pipeline of every chain
      // query onto 2 cores — a measured 1.9 s single-stage wall inside
      // transform_chain (JobProbe r14: 2 tasks, max task 1939 ms). Bytes
      // are a bad proxy for downstream CPU; a USER-pinned repartition is
      // exempt from AQE coalescing, and placed BELOW the distinct it also
      // satisfies the aggregation's clustering (hash on id), so the plan
      // still has exactly one exchange (a repartition placed above it
      // collapses into the aggregate exchange and gets re-coalesced —
      // measured no-op). Deterministic hash partitioning on id — never
      // round-robin (retry safety, SPARK-38388). At real scale the
      // exchange moves only the thin id column and AQE would not have
      // coalesced anyway; the count tracks spark.sql.shuffle.partitions,
      // i.e. the session's core budget, not a local constant.
      .repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("id"))
      .distinct()
      .select(
        id,
        element_at(litArray(purposes), pmod(id, lit(12)).cast("int") + 1).as("purpose"),
        element_at(litArray(addresses), pmod(id, lit(8)).cast("int") + 1).as("address"),
        when(pmod(id, lit(5)) === 0, lit(""))
          .otherwise(concat((pmod(id, lit(197)) + 1).cast("string"), lit(" m2"))).as("size_m2"),
        element_at(litArray(designs), pmod(id, lit(6)).cast("int") + 1).as("design"),
        when(pmod(id, lit(17)) === 0, concat(v.cast("string"), lit(" EUR")))
          .otherwise(concat(v.cast("string"), lit(nbsp), lit("Kč"))).as("price_czk"),
        concat(lit("/nemovitosti/"), (id - pmod(id, lit(3))).cast("string")).as("link"))
  }

  private[queries] def sqlList(xs: Seq[String]): String =
    xs.map(x => "'" + x.replace("'", "''") + "'").mkString("[", ", ", "]")

  private[queries] def sqlIn(xs: Seq[String]): String =
    xs.map(x => "'" + x.replace("'", "''") + "'").mkString("(", ", ", ")")

  /** DuckDB CTE mirroring [[rawProperties]] — table `raw`. */
  val RAW_SQL: String =
    s"""raw AS (
       |  SELECT id,
       |    list_extract(${sqlList(purposes)}, CAST(id % 12 AS INT) + 1) AS purpose,
       |    list_extract(${sqlList(addresses)}, CAST(id % 8 AS INT) + 1) AS address,
       |    CASE WHEN id % 5 = 0 THEN '' ELSE CAST(id % 197 + 1 AS VARCHAR) || ' m2' END AS size_m2,
       |    list_extract(${sqlList(designs)}, CAST(id % 6 AS INT) + 1) AS design,
       |    CASE WHEN id % 17 = 0 THEN CAST(id * 7919 % 9000000 + 100 AS VARCHAR) || ' EUR'
       |         ELSE CAST(id * 7919 % 9000000 + 100 AS VARCHAR) || chr(160) || 'Kč' END AS price_czk,
       |    '/nemovitosti/' || CAST(id - id % 3 AS VARCHAR) AS link
       |  FROM (SELECT DISTINCT l_orderkey * 10 + l_linenumber AS id FROM lineitem)
       |)""".stripMargin

  /** `t`: every string column transliterated (extract.py:45 runs unidecode
    * at extract time; DuckDB strip_accents is the same NFD-mark-strip for
    * the Czech alphabet).
    */
  val TRANSLIT_SQL: String =
    """t AS (
      |  SELECT id, strip_accents(purpose) AS purpose, strip_accents(address) AS address,
      |         strip_accents(size_m2) AS size_m2, strip_accents(design) AS design,
      |         strip_accents(price_czk) AS price_czk, strip_accents(link) AS link
      |  FROM raw
      |)""".stripMargin

  val rentAlt: String = PropertySchema.rentKeywords.mkString("|")
  val saleAlt: String = PropertySchema.saleKeywords.mkString("|")

  /** The full 13-step transform chain (scripts/transform.py:24-120) in
    * DuckDB SQL, ending in table `final` (10 canonical columns).
    */
  def chainSql(dumpDate: String, fileName: String): String =
    s"""WITH $RAW_SQL, $TRANSLIT_SQL,
       |d AS (  -- dedup by link, keep first (min id) — transform.py:62
       |  SELECT * FROM t QUALIFY row_number() OVER (PARTITION BY link ORDER BY id) = 1
       |),
       |nb AS (  -- NBSP normalize on all string cols — transform.py:63
       |  SELECT id, replace(purpose, chr(160), ' ') AS purpose,
       |         replace(address, chr(160), ' ') AS address,
       |         replace(size_m2, chr(160), ' ') AS size_m2,
       |         replace(design, chr(160), ' ') AS design,
       |         replace(price_czk, chr(160), ' ') AS price_czk,
       |         replace(link, chr(160), ' ') AS link
       |  FROM d
       |),
       |f1 AS (SELECT * FROM nb WHERE NOT contains(price_czk, 'EUR')),
       |p1 AS (SELECT id, purpose, address, size_m2, design,
       |         CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price_czk, link
       |       FROM f1),
       |f2 AS (SELECT * FROM p1 WHERE price_czk >= 500),
       |f3 AS (SELECT * FROM f2 WHERE NOT (regexp_matches(purpose, '$rentAlt') AND price_czk <= 1000)),
       |f4 AS (SELECT * FROM f3 WHERE NOT (regexp_matches(purpose, '$saleAlt') AND price_czk <= 20000)),
       |p2 AS (SELECT id, purpose, address,
       |         COALESCE(TRY_CAST(regexp_replace(replace(size_m2, 'm2', ''), '[^0-9]', '', 'g') AS INTEGER), 0) AS size_m2,
       |         design, price_czk, link
       |       FROM f4),
       |p3 AS (SELECT *, contains(lower(address), 'kraj') AS has_kraj,
       |         regexp_split_to_array(trim(address), '\\s+') AS w
       |       FROM p2),
       |p4 AS (SELECT id, purpose,
       |         -- slice guards: DuckDB reads a negative upper bound as from-the-end
       |         -- (w[1:-1] = whole list), so 1-2 word addresses need greatest()/CASE
       |         -- to reproduce python's words[:-2] = [] / extract_last_two_words ''
       |         CASE WHEN has_kraj THEN rtrim(rtrim(array_to_string(w[1:greatest(len(w)-2, 0)], ' ')), ',')
       |              ELSE address END AS address,
       |         CASE WHEN has_kraj THEN (CASE WHEN len(w) >= 2
       |                THEN rtrim(array_to_string(w[len(w)-1:len(w)], ' '), ',') ELSE '' END)
       |              ELSE 'Praha' END AS region,
       |         size_m2, design, price_czk, link
       |       FROM p3),
       |f5 AS (SELECT * FROM p4 WHERE region IN ${sqlIn(PropertySchema.czechRegions)}),
       |p5 AS (SELECT *, CASE WHEN size_m2 <> 0
       |         THEN CAST(ceil(CAST(price_czk AS DOUBLE) / size_m2) AS INTEGER) END AS price_per_m2
       |       FROM f5),
       |f6 AS (SELECT * FROM p5
       |       WHERE NOT (contains(purpose, 'Prodej pozemku') AND COALESCE(price_per_m2 > 80000, false))),
       |final AS (
       |  SELECT purpose, address, region, size_m2, design, price_czk, price_per_m2, link,
       |         '$dumpDate' AS dump_date, '$fileName' AS file_name
       |  FROM f6
       |)""".stripMargin

  val DUMP_DATE = "2026_08_12_080000"
  val FILE_NAME = "raw_properties_2026_08_12_080000.csv"

  /** Bloom shapes: the join prune sizes for a small dim key set (fill
    * stays ~0.1% at sf0.1, FP ~1e-9 — prune ≈ exact semi-join); the
    * blocklist filter is deliberately small so false positives actually
    * occur at test scale and the oracle proves it reproduces them.
    */
  private[queries] val BLOOM_JOIN_M = 1 << 14
  private[queries] val BLOOM_LIST_M = 2048
  private[queries] val BLOOM_K = 3

  /** Spark form of the full chain (the flagship query). */
  def transformChain(spark: SparkSession, dir: String): DataFrame =
    Transform(rawProperties(spark, dir), DUMP_DATE, Some(FILE_NAME),
      dedupOrder = Some(col("id")))
      .orderBy("link")

  // Shared oracle fragments -------------------------------------------------

  private[queries] def withRaw(body: String): String =
    s"WITH $RAW_SQL, $TRANSLIT_SQL\n$body"

  /** DuckDB `ev`: events with ns → µs truncation mirroring eventsTable. */
  private[queries] val EV_SQL =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"}
