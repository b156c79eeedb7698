package graft

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

/** The driver-checked query registry: one named query per SURVEY.md §2
  * operator (plus the LLM-pipeline operators), each with an equivalent
  * DuckDB oracle where the semantics are ANSI-SQL-expressible.
  *
  * Determinism contract (SURVEY.md §7.5): every compared query ends in an
  * explicit ORDER BY over a unique key; doubles are emitted as fixed-point
  * `*_e6` longs and money as exact cents (see graft.util.Num); timestamps
  * are formatted to strings. Column names are aliased identically in the
  * Spark and SQL forms — the driver sorts columns by name before hashing.
  */
object Queries {

  /** One registry row. `bench=true` marks the headline set Bench runs at
    * sf0.1 (oracle-only O(n²) paths and micro-op queries stay out of it).
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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

  private val nbsp = " "

  /** Spark form. id = l_orderkey*10 + l_linenumber, made globally unique by
    * a DISTINCT — the synthetic lineitem repeats (orderkey, linenumber)
    * pairs, and downstream keep-first dedup semantics need a unique id.
    * (array(lit…) instead of typedlit: no TypeTag reflection, so it also
    * works under REPL/foreign classloaders.)
    */
  private def litArray(xs: Seq[String]): Column = array(xs.map(lit): _*)

  def rawProperties(spark: SparkSession, dir: String): DataFrame = {
    val id = col("id")
    val v = pmod(id * 7919L, lit(9000000L)) + 100L
    tbl(spark, dir, "lineitem")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
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

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => "'" + x.replace("'", "''") + "'").mkString("[", ", ", "]")

  private def sqlIn(xs: Seq[String]): String =
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
  private val BLOOM_JOIN_M = 1 << 14
  private val BLOOM_LIST_M = 2048
  private val BLOOM_K = 3

  /** Spark form of the full chain (the flagship query). */
  def transformChain(spark: SparkSession, dir: String): DataFrame =
    Transform(rawProperties(spark, dir), DUMP_DATE, Some(FILE_NAME),
      dedupOrder = Some(col("id")))
      .orderBy("link")

  // Shared oracle fragments -------------------------------------------------

  private def withRaw(body: String): String =
    s"WITH $RAW_SQL, $TRANSLIT_SQL\n$body"

  /** DuckDB `ev`: events with ns → µs truncation mirroring eventsTable. */
  private val EV_SQL =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  // ===========================================================================
  // The registry
  // ===========================================================================

  val all: Vector[Q] = Vector(

    // ---- §2.7/2.8 scalar & string functions --------------------------------

    Q("etl_digits_parse",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.digitsToLong(col("price_czk")).as("price_czk"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price_czk
          |FROM raw ORDER BY id""".stripMargin))),

    Q("etl_size_parse",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.sizeToInt(col("size_m2")).as("size_m2"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, COALESCE(TRY_CAST(regexp_replace(replace(size_m2, 'm2', ''), '[^0-9]', '', 'g') AS INTEGER), 0) AS size_m2
          |FROM raw ORDER BY id""".stripMargin))),

    Q("etl_transliterate",
      (s, d) => rawProperties(s, d)
        .select(col("id"),
          Transliterate(col("purpose")).as("purpose_ascii"),
          Transliterate(col("address")).as("address_ascii"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, strip_accents(purpose) AS purpose_ascii, strip_accents(address) AS address_ascii
          |FROM raw ORDER BY id""".stripMargin))),

    Q("etl_nbsp_normalize",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.normalizeNbsp(col("price_czk")).as("price_str"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, replace(price_czk, chr(160), ' ') AS price_str
          |FROM raw ORDER BY id""".stripMargin))),

    Q("etl_last_two_words",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.lastTwoWords(Transliterate(col("address"))).as("tail"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, CASE WHEN len(w) >= 2
          |  THEN rtrim(array_to_string(w[len(w)-1:len(w)], ' '), ',') ELSE '' END AS tail
          |FROM (SELECT id, regexp_split_to_array(trim(address), '\s+') AS w FROM t)
          |ORDER BY id""".stripMargin))),

    Q("etl_drop_last_two_words",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.dropLastTwoWords(Transliterate(col("address"))).as("head"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, rtrim(rtrim(array_to_string(w[1:greatest(len(w)-2, 0)], ' ')), ',') AS head
          |FROM (SELECT id, regexp_split_to_array(trim(address), '\s+') AS w FROM t)
          |ORDER BY id""".stripMargin))),

    Q("etl_region_derive",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.regionOf(Transliterate(col("address"))).as("region"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, CASE WHEN contains(lower(address), 'kraj')
          |  THEN (CASE WHEN len(w) >= 2
          |        THEN rtrim(array_to_string(w[len(w)-1:len(w)], ' '), ',') ELSE '' END)
          |  ELSE 'Praha' END AS region
          |FROM (SELECT id, address, regexp_split_to_array(trim(address), '\s+') AS w FROM t)
          |ORDER BY id""".stripMargin))),

    Q("etl_address_rewrite",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.addressWithoutRegion(Transliterate(col("address"))).as("address"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, CASE WHEN contains(lower(address), 'kraj')
          |  THEN rtrim(rtrim(array_to_string(w[1:greatest(len(w)-2, 0)], ' ')), ',') ELSE address END AS address
          |FROM (SELECT id, address, regexp_split_to_array(trim(address), '\s+') AS w FROM t)
          |ORDER BY id""".stripMargin))),

    Q("etl_price_per_m2",
      (s, d) => rawProperties(s, d)
        .select(col("id"),
          Parse.digitsToLong(col("price_czk")).as("p"),
          Parse.sizeToInt(col("size_m2")).as("sz"))
        .select(col("id"), Parse.pricePerM2(col("p"), col("sz")).as("price_per_m2"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, CASE WHEN sz <> 0 THEN CAST(ceil(CAST(p AS DOUBLE) / sz) AS INTEGER) END AS price_per_m2
          |FROM (SELECT id,
          |        CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS p,
          |        COALESCE(TRY_CAST(regexp_replace(replace(size_m2, 'm2', ''), '[^0-9]', '', 'g') AS INTEGER), 0) AS sz
          |      FROM raw)
          |ORDER BY id""".stripMargin))),

    Q("etl_file_key_ops",
      // basename + raw_→processed_ prefix surgery (transform.py:112,123-125)
      (s, d) => rawProperties(s, d)
        .select(col("id"),
          concat(lit("raw_data/to_process/raw_"), col("id").cast("string"), lit(".csv")).as("key"))
        .select(col("id"),
          Parse.baseName(col("key")).as("file_name"),
          concat(lit("processed_"),
            substring_index(Parse.baseName(col("key")), "raw_", -1)).as("archived"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, split_part(key, '/', -1) AS file_name,
          |       'processed_' || regexp_replace(split_part(key, '/', -1), '^raw_', '') AS archived
          |FROM (SELECT id, 'raw_data/to_process/raw_' || CAST(id AS VARCHAR) || '.csv' AS key FROM raw)
          |ORDER BY id""".stripMargin))),

    Q("etl_trim",
      (s, d) => tbl(s, d, "customer")
        .select(col("c_custkey"), trim(concat(lit("  "), col("c_name"), lit("  "))).as("name"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, trim('  ' || c_name || '  ') AS name FROM customer ORDER BY c_custkey")),

    Q("etl_scalar_funcs",
      // strict/coerce casts, null-fill, ternary, ceil, nullif, division (§2.8)
      (s, d) => tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
          coalesce(col("l_returnflag").try_cast("int"), lit(0)).as("coerce0"),
          when(col("l_discount") > 0.05, lit("hi")).otherwise(lit("lo")).as("disc_band"),
          ceil(col("l_extendedprice") / col("l_quantity")).cast("long").as("unit_ceil"),
          nullif(col("l_linenumber"), lit(1)).as("ln_nullif"))
        .orderBy("k", "ln"),
      Some(
        """SELECT l_orderkey AS k, l_linenumber AS ln,
          |  COALESCE(TRY_CAST(l_returnflag AS INTEGER), 0) AS coerce0,
          |  CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
          |  CAST(ceil(l_extendedprice / l_quantity) AS BIGINT) AS unit_ceil,
          |  NULLIF(l_linenumber, 1) AS ln_nullif
          |FROM lineitem ORDER BY k, ln""".stripMargin)),

    Q("etl_dump_date_roundtrip",
      // strftime yyyy_MM_dd_HHmmss + dashboard re-parse (§2.9, README.md:130)
      (s, d) => tbl(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy_MM_dd_HHmmss").as("dump_date"))
        .select(col("o_orderkey"), col("dump_date"),
          to_date(to_timestamp(col("dump_date"), "yyyy_MM_dd_HHmmss")).cast("string").as("day"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey, strftime(o_orderdate, '%Y_%m_%d_%H%M%S') AS dump_date,
          |  CAST(CAST(strptime(strftime(o_orderdate, '%Y_%m_%d_%H%M%S'), '%Y_%m_%d_%H%M%S') AS DATE) AS VARCHAR) AS day
          |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- §2.3 row generation / union ---------------------------------------

    Q("gen_explode_tokens",
      (s, d) => tbl(s, d, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("token"))
        .orderBy("doc_id", "token"),
      Some(
        """SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          |FROM documents ORDER BY doc_id, token""".stripMargin)),

    Q("gen_parse_page",
      // §2.3 DOM→rows generator (extract.py:17-40): synthesize one "page"
      // string per 8 ads (deterministic order), then parse it back into
      // per-ad rows — one-page-to-many-rows via regexp_extract_all+explode,
      // the Catalyst Generator shape SURVEY mapped the scraper to.
      (s, d) => {
        val ads = rawProperties(s, d).select(
          expr("id div 8").as("page"), col("id"),
          concat(lit("<article><h2>"), col("purpose"), lit("</h2><p>"),
            col("address"), lit("</p><span>"), col("price_czk"),
            lit("</span></article>")).as("ad"))
        val pages = ads.groupBy("page").agg(
          array_join(transform(array_sort(collect_list(struct(col("id"), col("ad")))),
            x => x.getField("ad")), "").as("html"))
        pages
          .select(col("page"),
            explode(regexp_extract_all(col("html"),
              lit("<article>(.*?)</article>"), lit(1))).as("block"))
          .select(col("page"),
            regexp_extract(col("block"), "<h2>(.*?)</h2>", 1).as("purpose"),
            regexp_extract(col("block"), "<p>(.*?)</p>", 1).as("address"),
            regexp_extract(col("block"), "<span>(.*?)</span>", 1).as("price_czk"))
          .orderBy("page", "purpose", "address", "price_czk")
      },
      Some(withRaw(
        """, ads AS (
          |  SELECT id // 8 AS page, id,
          |    '<article><h2>' || purpose || '</h2><p>' || address ||
          |      '</p><span>' || price_czk || '</span></article>' AS ad
          |  FROM raw
          |),
          |pages AS (SELECT page, string_agg(ad, '' ORDER BY id) AS html FROM ads GROUP BY page),
          |blocks AS (SELECT page, unnest(regexp_extract_all(html, '<article>(.*?)</article>', 1)) AS block FROM pages)
          |SELECT page,
          |  regexp_extract(block, '<h2>(.*?)</h2>', 1) AS purpose,
          |  regexp_extract(block, '<p>(.*?)</p>', 1) AS address,
          |  regexp_extract(block, '<span>(.*?)</span>', 1) AS price_czk
          |FROM blocks ORDER BY page, purpose, address, price_czk""".stripMargin))),

    Q("gen_field_disambiguation",
      // extract.py:27-34: size_m2 and design arrive in ONE attribute list;
      // classify by "is it an area?" ('m2' containment) — the optional-field
      // disambiguation re-expressed over an array column.
      (s, d) => rawProperties(s, d)
        .select(col("id"), array(col("size_m2"), col("design")).as("attrs"))
        .select(col("id"),
          element_at(concat(filter(col("attrs"), a => a.contains("m2")), array(lit(null))), 1)
            .as("size_pick"),
          element_at(concat(filter(col("attrs"), a => !a.contains("m2") && length(a) > 0),
            array(lit(null))), 1).as("design_pick"))
        .orderBy("id"),
      Some(withRaw(
        """SELECT id,
          |  list_extract(list_concat(list_filter(attrs, a -> contains(a, 'm2')), [NULL]), 1) AS size_pick,
          |  list_extract(list_concat(list_filter(attrs, a -> NOT contains(a, 'm2') AND length(a) > 0), [NULL]), 1) AS design_pick
          |FROM (SELECT id, [size_m2, design] AS attrs FROM raw)
          |ORDER BY id""".stripMargin))),

    Q("gen_rows_to_df",
      // extract.py:44: impose a schema on positional rows —
      // spark.createDataFrame(rows, schema); oracle = VALUES.
      (s, d) => {
        import scala.jdk.CollectionConverters._
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("purpose",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("price",
            org.apache.spark.sql.types.LongType)))
        val rows = Seq(
          org.apache.spark.sql.Row("Prodej bytu", 5000000L),
          org.apache.spark.sql.Row("Pronajem bytu", 900L)).asJava
        s.createDataFrame(rows, schema).orderBy("price")
      },
      Some(
        """SELECT * FROM (VALUES ('Prodej bytu', CAST(5000000 AS BIGINT)),
          |  ('Pronajem bytu', CAST(900 AS BIGINT))) t(purpose, price)
          |ORDER BY price""".stripMargin)),

    Q("etl_union_pages",
      // per-page union (extract.py:63): two disjoint "pages" unioned back
      (s, d) => {
        val r = rawProperties(s, d)
        r.filter(pmod(col("id"), lit(3)) === 0).select("id", "link")
          .union(r.filter(pmod(col("id"), lit(3)) === 1).select("id", "link"))
          .orderBy("id")
      },
      Some(withRaw(
        """SELECT id, link FROM raw WHERE id % 3 = 0
          |UNION ALL SELECT id, link FROM raw WHERE id % 3 = 1
          |ORDER BY id""".stripMargin))),

    // ---- §2.5 filters -------------------------------------------------------

    Q("flt_eur",
      (s, d) => rawProperties(s, d)
        .filter(!col("price_czk").contains("EUR"))
        .select("id", "price_czk").orderBy("id"),
      Some(withRaw(
        "SELECT id, price_czk FROM raw WHERE NOT contains(price_czk, 'EUR') ORDER BY id"))),

    Q("flt_min_price",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.digitsToLong(col("price_czk")).as("price"))
        .filter(col("price") >= 500)
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, price FROM
          |  (SELECT id, CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price FROM raw)
          |WHERE price >= 500 ORDER BY id""".stripMargin))),

    Q("flt_rent_sane",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Transliterate(col("purpose")).as("purpose"),
          Parse.digitsToLong(col("price_czk")).as("price"))
        .filter(Parse.keepRentSane(col("purpose"), col("price")))
        .orderBy("id"),
      Some(withRaw(
        s"""SELECT id, purpose, price FROM
           |  (SELECT id, purpose, CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price FROM t)
           |WHERE NOT (regexp_matches(purpose, '$rentAlt') AND price <= 1000) ORDER BY id""".stripMargin))),

    Q("flt_sale_sane",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Transliterate(col("purpose")).as("purpose"),
          Parse.digitsToLong(col("price_czk")).as("price"))
        .filter(Parse.keepSaleSane(col("purpose"), col("price")))
        .orderBy("id"),
      Some(withRaw(
        s"""SELECT id, purpose, price FROM
           |  (SELECT id, purpose, CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price FROM t)
           |WHERE NOT (regexp_matches(purpose, '$saleAlt') AND price <= 20000) ORDER BY id""".stripMargin))),

    Q("flt_region_whitelist",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Parse.regionOf(Transliterate(col("address"))).as("region"))
        .filter(col("region").isin(PropertySchema.czechRegions: _*))
        .orderBy("id"),
      Some(withRaw(
        s"""SELECT id, region FROM
           |  (SELECT id, CASE WHEN contains(lower(address), 'kraj')
           |     THEN (CASE WHEN len(w) >= 2
           |           THEN rtrim(array_to_string(w[len(w)-1:len(w)], ' '), ',') ELSE '' END)
           |     ELSE 'Praha' END AS region
           |   FROM (SELECT id, address, regexp_split_to_array(trim(address), '\\s+') AS w FROM t))
           |WHERE region IN ${sqlIn(PropertySchema.czechRegions)} ORDER BY id""".stripMargin))),

    Q("flt_land_cap",
      (s, d) => rawProperties(s, d)
        .select(col("id"), Transliterate(col("purpose")).as("purpose"),
          Parse.digitsToLong(col("price_czk")).as("p"),
          Parse.sizeToInt(col("size_m2")).as("sz"))
        .withColumn("ppm2", Parse.pricePerM2(col("p"), col("sz")))
        .filter(Parse.keepLandCap(col("purpose"), col("ppm2")))
        .select("id", "purpose", "ppm2")
        .orderBy("id"),
      Some(withRaw(
        """SELECT id, purpose, ppm2 FROM
          |  (SELECT id, purpose, CASE WHEN sz <> 0 THEN CAST(ceil(CAST(p AS DOUBLE) / sz) AS INTEGER) END AS ppm2
          |   FROM (SELECT id, purpose,
          |           CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS p,
          |           COALESCE(TRY_CAST(regexp_replace(replace(size_m2, 'm2', ''), '[^0-9]', '', 'g') AS INTEGER), 0) AS sz
          |         FROM t))
          |WHERE NOT (contains(purpose, 'Prodej pozemku') AND COALESCE(ppm2 > 80000, false))
          |ORDER BY id""".stripMargin))),

    // ---- §2.6 dedup ---------------------------------------------------------

    Q("dedup_link_keep_first",
      (s, d) => Dedup.exactDedupByKey(
          rawProperties(s, d).select(col("id"), col("link")), col("link"), "id")
        .orderBy("id"),
      Some(withRaw(
        """SELECT min(id) AS id, link FROM raw GROUP BY link ORDER BY id""".stripMargin)),
      bench = true),

    // ---- the flagship: full transform chain (§3.2) --------------------------

    Q("transform_chain",
      (s, d) => transformChain(s, d),
      Some(chainSql(DUMP_DATE, FILE_NAME) + "\nSELECT * FROM final ORDER BY link"),
      bench = true),

    // ---- §2.11 dashboard analytics over the transformed table ---------------

    Q("dash_share_by_purpose",
      (s, d) => Dashboard.shareByDim(transformChain(s, d), "purpose")
        .select(col("purpose"), col("n"), e6(col("pct")).as("pct_e6"))
        .orderBy("purpose"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |, c AS (SELECT purpose, count(*) AS n FROM final GROUP BY purpose),
          |tot AS (SELECT count(*) AS total FROM final)
          |SELECT purpose, n, CAST(floor(CAST(n AS DOUBLE) * CAST(100.0 AS DOUBLE) / total * 1000000) AS BIGINT) AS pct_e6
          |FROM c, tot ORDER BY purpose""".stripMargin),
      bench = true),

    Q("dash_share_by_region",
      (s, d) => Dashboard.shareByDim(transformChain(s, d), "region")
        .select(col("region"), col("n"), e6(col("pct")).as("pct_e6"))
        .orderBy("region"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |, c AS (SELECT region, count(*) AS n FROM final GROUP BY region),
          |tot AS (SELECT count(*) AS total FROM final)
          |SELECT region, n, CAST(floor(CAST(n AS DOUBLE) * CAST(100.0 AS DOUBLE) / total * 1000000) AS BIGINT) AS pct_e6
          |FROM c, tot ORDER BY region""".stripMargin)),

    Q("dash_count_by_region",
      (s, d) => Dashboard.countByDim(transformChain(s, d), "region"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        "\nSELECT region, count(*) AS n FROM final GROUP BY region ORDER BY region")),

    Q("dash_avg_ppm2_by_region",
      (s, d) => Dashboard.avgByDim(transformChain(s, d), "region", "price_per_m2")
        .select(col("region"), e6(col("avg_measure")).as("avg_ppm2_e6"), col("n"))
        .orderBy(desc("avg_ppm2_e6"), col("region")),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region,
          |  CAST(floor(CAST(sum(CAST(price_per_m2 AS DECIMAL(18,2))) AS DOUBLE) / count(price_per_m2) * 1000000) AS BIGINT) AS avg_ppm2_e6,
          |  count(*) AS n
          |FROM final GROUP BY region ORDER BY avg_ppm2_e6 DESC, region""".stripMargin),
      bench = true),

    Q("dash_daily_avg_orders",
      (s, d) => Dashboard.dailyAvg(tbl(s, d, "orders"), "o_orderdate", "o_totalprice")
        .select(col("day").cast("string").as("day"),
          e6(col("avg_measure")).as("avg_price_e6"), col("n")),
      Some(
        """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
          |  CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) * 1000000) AS BIGINT) AS avg_price_e6,
          |  count(*) AS n
          |FROM orders GROUP BY 1 ORDER BY day""".stripMargin),
      bench = true),

    Q("dash_daily_avg_dump_date",
      // the reference's actual dashboard shape: avg over the dump_date STRING
      (s, d) => Dashboard.dailyAvg(transformChain(s, d), "dump_date", "price_per_m2",
          tsFormat = Some("yyyy_MM_dd_HHmmss"))
        .select(col("day").cast("string").as("day"),
          e6(col("avg_measure")).as("avg_ppm2_e6"), col("n")),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT CAST(CAST(strptime(dump_date, '%Y_%m_%d_%H%M%S') AS DATE) AS VARCHAR) AS day,
          |  CAST(floor(CAST(sum(CAST(price_per_m2 AS DECIMAL(18,2))) AS DOUBLE) / count(price_per_m2) * 1000000) AS BIGINT) AS avg_ppm2_e6,
          |  count(*) AS n
          |FROM final GROUP BY 1 ORDER BY day""".stripMargin)),

    Q("dash_dod_delta",
      // analytic (non-ranking) window breadth: lag() day-over-day revenue
      // delta plus percent_rank() of each day's revenue within its month.
      // Both windows partition by month — bounded frames that shuffle once
      // on the month key, never a global single-partition sort.
      (s, d) => {
        val daily = tbl(s, d, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
          .withColumn("mon", date_format(col("day"), "yyyy-MM"))
        val byDay = Window.partitionBy(col("mon")).orderBy(col("day"))
        val byRev = Window.partitionBy(col("mon")).orderBy(col("rev"))
        daily
          .withColumn("prev_rev", lag(col("rev"), 1).over(byDay))
          .withColumn("pr", percent_rank().over(byRev))
          .select(col("day").cast("string").as("day"),
            (col("rev") * 100).cast("long").as("rev_c"),
            ((col("rev") - col("prev_rev")) * 100).cast("long").as("delta_c"),
            e6(col("pr")).as("pr_e6"))
          .orderBy("day")
      },
      Some(
        """WITH daily AS (
          |  SELECT CAST(o_orderdate AS DATE) AS day,
          |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          |  FROM orders GROUP BY 1),
          |w AS (
          |  SELECT day, rev,
          |    lag(rev) OVER (PARTITION BY strftime(day, '%Y-%m') ORDER BY day) AS prev_rev,
          |    percent_rank() OVER (PARTITION BY strftime(day, '%Y-%m') ORDER BY rev) AS pr
          |  FROM daily)
          |SELECT CAST(day AS VARCHAR) AS day,
          |  CAST(rev * 100 AS BIGINT) AS rev_c,
          |  CAST((rev - prev_rev) * 100 AS BIGINT) AS delta_c,
          |  CAST(floor(pr * 1000000) AS BIGINT) AS pr_e6
          |FROM w ORDER BY day""".stripMargin)),

    Q("dash_ntile_quartiles",
      // ntile(): equal-height revenue quartile per day within its month —
      // the dashboard's heat-coloring bucket. (rev, day) ordering pins the
      // tie-break; the same month-bounded window shape as dash_dod_delta.
      (s, d) => {
        val daily = tbl(s, d, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
          .withColumn("mon", date_format(col("day"), "yyyy-MM"))
        daily
          .withColumn("quartile", ntile(4).over(
            Window.partitionBy(col("mon")).orderBy(col("rev"), col("day"))))
          .select(col("day").cast("string").as("day"),
            (col("rev") * 100).cast("long").as("rev_c"),
            col("quartile"))
          .orderBy("day")
      },
      Some(
        """WITH daily AS (
          |  SELECT CAST(o_orderdate AS DATE) AS day,
          |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          |  FROM orders GROUP BY 1)
          |SELECT CAST(day AS VARCHAR) AS day,
          |  CAST(rev * 100 AS BIGINT) AS rev_c,
          |  CAST(ntile(4) OVER (PARTITION BY strftime(day, '%Y-%m')
          |                      ORDER BY rev, day) AS INT) AS quartile
          |FROM daily ORDER BY day""".stripMargin)),

    Q("dash_filtered_avg",
      // §2.11 "dimension dropdown filters": the daily-avg line re-scoped by
      // purpose + region predicates (the dashboard's parameterized view).
      (s, d) => Dashboard.avgByDim(
          transformChain(s, d)
            .filter(col("purpose").startsWith("Prodej") &&
              col("region") =!= "Praha"),
          "region", "price_per_m2")
        .select(col("region"), e6(col("avg_measure")).as("avg_ppm2_e6"), col("n"))
        .orderBy(desc("avg_ppm2_e6"), col("region")),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region,
          |  CAST(floor(CAST(sum(CAST(price_per_m2 AS DECIMAL(18,2))) AS DOUBLE) / count(price_per_m2) * 1000000) AS BIGINT) AS avg_ppm2_e6,
          |  count(*) AS n
          |FROM final WHERE purpose LIKE 'Prodej%' AND region <> 'Praha'
          |GROUP BY region ORDER BY avg_ppm2_e6 DESC, region""".stripMargin)),

    Q("dash_topk_per_group",
      (s, d) => Dashboard.topKPerGroup(
          tbl(s, d, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          "l_returnflag", col("l_extendedprice"),
          col("l_orderkey") * 10 + col("l_linenumber"), 5)
        .select(col("l_returnflag"), col("rnk").cast("long").as("rnk"),
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c")),
      Some(
        """SELECT l_returnflag, rnk, l_orderkey, l_linenumber,
          |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
          |        ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rnk
          |      FROM lineitem)
          |WHERE rnk <= 5 ORDER BY l_returnflag, rnk""".stripMargin),
      bench = true),

    Q("dash_topk_agg",
      // same result contract as dash_topk_per_group, computed by the typed
      // TopKAggregator (bounded k-entry partial buffers instead of a
      // ranking window) — both hash-match the one window-based oracle.
      (s, d) => graft.analytics.TopKAggregator.topLineitems(tbl(s, d, "lineitem"), 5),
      Some(
        """SELECT l_returnflag, rnk, l_orderkey, l_linenumber,
          |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
          |        ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rnk
          |      FROM lineitem)
          |WHERE rnk <= 5 ORDER BY l_returnflag, rnk""".stripMargin),
      bench = true),

    Q("dash_topk_physical",
      // third computation of the same contract: the custom physical
      // operator (TopKPerGroupNode → partial/final TopKPerGroupExec around
      // one group-key exchange; heap-bounded, no Window, no full sort) —
      // hash-matches the same window-based oracle as the other two.
      (s, d) => graft.plans.TopK.perGroup(
          tbl(s, d, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey") * 10 + col("l_linenumber"), 5)
        .select(col("l_returnflag"), col("rnk").cast("long").as("rnk"),
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
        .orderBy("l_returnflag", "rnk"),
      Some(
        """SELECT l_returnflag, rnk, l_orderkey, l_linenumber,
          |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
          |        ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rnk
          |      FROM lineitem)
          |WHERE rnk <= 5 ORDER BY l_returnflag, rnk""".stripMargin),
      bench = true),

    // ---- joins (north-star breadth: broadcast + shuffle joins) --------------

    Q("join_orders_customer",
      (s, d) => tbl(s, d, "orders")
        .join(broadcast(tbl(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), cents(col("o_totalprice")).as("sum_price_c"))
        .orderBy("c_mktsegment"),
      Some(
        """SELECT c_mktsegment, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_c
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    Q("join_revenue_by_brand",
      (s, d) => tbl(s, d, "lineitem")
        .join(broadcast(tbl(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)").multiply(10000).cast("long").as("revenue_e4"))
        .orderBy("p_brand"),
      Some(
        """SELECT p_brand, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      bench = true),

    Q("join_semi_anti",
      // explicit LEFT SEMI + LEFT ANTI (§2.12): every customer flagged by
      // order existence — semi and anti partition the table, so their
      // union is exactly the EXISTS() truth. Both plan as one broadcast/
      // hash join that ships only the key column, never duplicating
      // customer rows on multi-order matches.
      (s, d) => {
        val c = tbl(s, d, "customer").select(col("c_custkey"))
        val o = tbl(s, d, "orders").select(col("o_custkey"))
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .withColumn("has_orders", lit(true))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .withColumn("has_orders", lit(false))
        semi.union(anti).orderBy("c_custkey")
      },
      Some(
        """SELECT c_custkey,
          |  EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
          |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("join_full_outer",
      // FULL OUTER (§2.12): negative-balance customer vs supplier counts
      // per nation — either side can be absent, zero-filled after the
      // coalesced key. One shuffle per pre-aggregated (tiny) side.
      (s, d) => {
        val c = tbl(s, d, "customer").filter(col("c_acctbal") < 0)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val su = tbl(s, d, "supplier").filter(col("s_acctbal") < 0)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some(
        """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
          |           FROM customer WHERE c_acctbal < 0 GROUP BY 1),
          |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
          |      FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
          |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
          |  COALESCE(c.n_cust, 0) AS n_cust,
          |  COALESCE(s.n_supp, 0) AS n_supp
          |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
          |ORDER BY nationkey""".stripMargin)),

    Q("agg_collect_purposes",
      // array-function breadth (§2.12): per-region distinct purpose list
      // via collect_set → sort_array → array_join. The deterministic
      // sorted-joined string is what makes a set-valued aggregate
      // oracle-comparable; collect_set itself is a hash-agg buffer whose
      // size is bounded by the dimension's cardinality, not the row count.
      (s, d) => transformChain(s, d)
        .groupBy("region")
        .agg(array_join(sort_array(collect_set(col("purpose"))), ",").as("purposes"),
          count_distinct(col("purpose")).as("n_purposes"))
        .orderBy("region"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region,
          |  string_agg(DISTINCT purpose, ',' ORDER BY purpose) AS purposes,
          |  count(DISTINCT purpose) AS n_purposes
          |FROM final GROUP BY region ORDER BY region""".stripMargin)),

    Q("agg_map_roundtrip",
      // map-function breadth (§2.12): per-purpose region→count MAP built
      // with map_from_entries over a sorted entry array, then exploded
      // back to rows. The map is engine-internal plumbing under test
      // (MapType agg buffers, map explode iteration order); the oracle
      // checks the relational result it must round-trip to.
      (s, d) => transformChain(s, d)
        .groupBy("purpose", "region").agg(count(lit(1)).as("n"))
        .groupBy("purpose")
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("region"), col("n"))))).as("m"))
        .select(col("purpose"), explode(col("m")).as(Seq("region", "n")))
        .orderBy("purpose", "region"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT purpose, region, count(*) AS n
          |FROM final GROUP BY purpose, region ORDER BY purpose, region""".stripMargin)),

    Q("dash_pivot_kind",
      // pivot (§2.12): per-region counts of sale vs rent listings as
      // columns — Spark pivot() with explicit values; the oracle uses
      // FILTER aggregation (the engine-portable pivot form).
      (s, d) => transformChain(s, d)
        .withColumn("kind",
          when(col("purpose").startsWith("Prodej"), lit("sale"))
            .otherwise(lit("rent")))
        .groupBy("region")
        .pivot("kind", Seq("sale", "rent"))
        .count()
        .na.fill(0L, Seq("sale", "rent"))
        .orderBy("region"),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region,
          |  count(*) FILTER (WHERE purpose LIKE 'Prodej%') AS sale,
          |  count(*) FILTER (WHERE purpose NOT LIKE 'Prodej%') AS rent
          |FROM final GROUP BY region ORDER BY region""".stripMargin)),

    Q("etl_hash_sample",
      // deterministic sampling (§2.12): md5-bucket sample — md5 is md5 in
      // every engine, so the sample is reproducible AND oracle-checkable
      // (unlike Bernoulli sample(), whose RNG is engine-specific).
      // First hex digit in {0,1} → exact 1/8 expected rate.
      (s, d) => tbl(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 1)
          .isin("0", "1"))
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey, o_custkey FROM orders
          |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
          |ORDER BY o_orderkey""".stripMargin)),

    Q("dash_rollup",
      // grouping-sets breadth: region x purpose rollup with subtotal rows,
      // grouping_id disambiguates NULL-as-subtotal from NULL data.
      (s, d) => transformChain(s, d)
        .rollup(col("region"), col("purpose"))
        .agg(count(lit(1)).as("n"), sum(col("price_czk")).as("sum_price"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("region").asc_nulls_first,
          col("purpose").asc_nulls_first),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region, purpose, count(*) AS n,
          |  CAST(sum(price_czk) AS BIGINT) AS sum_price,
          |  CAST(GROUPING(region) * 2 + GROUPING(purpose) AS INT) AS gid
          |FROM final GROUP BY ROLLUP(region, purpose)
          |ORDER BY gid, region ASC NULLS FIRST, purpose ASC NULLS FIRST""".stripMargin)),

    Q("dash_cube",
      // cube(): all four grouping sets (detail, per-region, per-purpose,
      // grand total) — the rollup's full-lattice sibling; gid orders the
      // sets and disambiguates subtotal NULLs from data NULLs.
      (s, d) => transformChain(s, d)
        .cube(col("region"), col("purpose"))
        .agg(count(lit(1)).as("n"), sum(col("price_czk")).as("sum_price"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("region").asc_nulls_first,
          col("purpose").asc_nulls_first),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region, purpose, count(*) AS n,
          |  CAST(sum(price_czk) AS BIGINT) AS sum_price,
          |  CAST(GROUPING(region) * 2 + GROUPING(purpose) AS INT) AS gid
          |FROM final GROUP BY CUBE(region, purpose)
          |ORDER BY gid, region ASC NULLS FIRST, purpose ASC NULLS FIRST""".stripMargin)),

    Q("join_asof",
      // as-of join (§2.12, no Spark native op): each click matched to the
      // user's latest view at-or-before it — union-tag + per-key ordered
      // window carry-forward, oracled by DuckDB's native ASOF LEFT JOIN.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        // unique (user, ts) on the right so the as-of pick is deterministic
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("__r"))
          .select(col("user_id"), col("ts"),
            col("__r.event_id").as("view_id"), col("__r.value").as("view_value"))
        graft.plans.AsOf.asofJoin(clicks, views, "user_id", "ts",
            Seq("view_id", "view_value"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("asof_view_id"),
            (col("asof_view_value").cast("decimal(18,2)") * 100).cast("long")
              .as("view_value_c"))
          .orderBy("event_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
           |views AS (
           |  SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
           |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           |    FROM ev WHERE event_type = 'view') WHERE rn = 1
           |)
           |SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |  v.view_id AS asof_view_id,
           |  CAST(CAST(v.view_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS view_value_c
           |FROM clicks c ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
           |ORDER BY event_id""".stripMargin),
      bench = true),

    Q("join_range_events",
      // band join (§2.12): click-purchase pairs of the same user within
      // 5 minutes — interval-bucketed equi-join, never a nested loop.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            unix_micros(col("ts")).as("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("t"))
        graft.plans.RangeJoin.bandPairs(clicks, purchases, "user_id", "t",
            width = 300000000L)
          .select(col("l.click_id").as("click_id"),
            col("r.purchase_id").as("purchase_id"),
            (col("r.t") - col("l.t")).as("delta_us"))
          .orderBy("click_id", "purchase_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS t FROM ev WHERE event_type = 'click'),
           |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t FROM ev WHERE event_type = 'purchase')
           |SELECT c.click_id, p.purchase_id, p.t - c.t AS delta_us
           |FROM c JOIN p ON c.user_id = p.user_id AND abs(c.t - p.t) <= 300000000
           |ORDER BY click_id, purchase_id""".stripMargin),
      bench = true),

    // ---- §2.10 events / time windows (batch forms) ---------------------------

    Q("ev_hourly_rollup",
      (s, d) => Events.hourlyRollup(eventsTable(s, d))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value_c"), col("avg_value_e6"))
        .orderBy("hour", "event_type"),
      Some(
        s"""WITH $EV_SQL
           |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           |  count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c,
           |  CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) * 1000000) AS BIGINT) AS avg_value_e6
           |FROM ev GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      bench = true),

    Q("ev_session_summary",
      (s, d) => Events.sessionSummary(eventsTable(s, d), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"), col("sum_value_c"))
        .orderBy("user_id", "session_seq"),
      Some(
        s"""WITH $EV_SQL,
           |lagged AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev
           |),
           |flagged AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           |    THEN 1 ELSE 0 END AS is_new
           |  FROM lagged
           |),
           |sess AS (
           |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           |  FROM flagged
           |)
           |SELECT user_id, session_seq,
           |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           |  count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
           |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin),
      bench = true),

    Q("ev_sliding_counts",
      // sliding windows: every event lands in 4 overlapping 1h/15m windows.
      (s, d) => Events.slidingCounts(eventsTable(s, d)),
      Some(
        s"""WITH $EV_SQL,
           |slid AS (
           |  SELECT to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900) AS win_start,
           |         event_type
           |  FROM ev, (SELECT unnest([0, 1, 2, 3]) AS k)
           |)
           |SELECT strftime(win_start AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS win_start,
           |       event_type, count(*) AS n
           |FROM slid GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin),
      bench = true),

    Q("agg_approx_distinct",
      // md5-register HyperLogLog: the same raw estimator as the builtin
      // approx_count_distinct, but with engine-portable registers (bucket =
      // md5 head, rho = leading zeros of the tail) and integer-space
      // harmonic sum, so the APPROXIMATE answer itself is oracle-exact —
      // closing r4's one rows-only row. The builtin (xxhash64 + private
      // registers, unreplayable by any oracle) stays as the unit-compared
      // twin in SketchSpec.
      (s, d) => graft.analytics.Sketch.hllDistinct(
          tbl(s, d, "lineitem"), col("l_returnflag"), col("l_partkey"))
        .select(col("key").as("l_returnflag"), col("n_distinct_e6"))
        .orderBy("l_returnflag"),
      Some(graft.analytics.Sketch.hllDistinctSql(
        "lineitem", "l_returnflag", "l_returnflag", "l_partkey"))),

    Q("agg_kmv_distinct",
      // KMV/bottom-k distinct sketch: approximate like HLL, but built on
      // md5-derived hash points and the heap-based TopKPerGroupExec — so
      // the APPROXIMATE answer itself is exactly oracle-checkable (the
      // oracle recomputes the same k minima and the same estimator
      // arithmetic). Groups with < k distinct values come out exact.
      (s, d) => graft.analytics.Sketch.kmvDistinct(
          tbl(s, d, "lineitem"), col("l_returnflag"), col("l_partkey"), k = 256)
        .select(col("key").as("l_returnflag"), col("n_distinct_e6"))
        .orderBy("l_returnflag"),
      Some(KMV_SQL)),

    Q("agg_kmv_quantiles",
      // the sketch family's percentile member: per-lang token-count
      // quantiles over a deterministic bottom-64-by-md5(doc_id) row
      // sample — O(k) state per group at every stage (exact percentile
      // ships EVERY group value to one reducer; see text_token_quantiles).
      // md5 keying makes the approximate answer itself oracle-exact:
      // DuckDB re-derives the identical sample, then the identical type-7
      // interpolation.
      (s, d) => graft.analytics.Sketch.kmvQuantiles(
          tbl(s, d, "documents")
            .withColumn("n_tokens", Corpus.tokenCount(col("text"))),
          col("lang"), col("doc_id"), col("n_tokens"), k = 64)
        .select(col("key").as("lang"), col("n_sample"),
          e6(col("q0")).as("q25_e6"), e6(col("q1")).as("q50_e6"),
          e6(col("q2")).as("q90_e6"), e6(col("q3")).as("q99_e6"))
        .orderBy("lang"),
      Some(KMV_QUANTILES_SQL)),

    Q("agg_salted_distinct",
      // skew-safe exact distinct count (value-hash salting spreads a hot
      // key's distinct set over many reducers) — same result as the plain
      // count(DISTINCT), which is exactly what the oracle computes
      (s, d) => graft.plans.Skew.saltedDistinctCount(
          tbl(s, d, "lineitem"), col("l_returnflag"), col("l_partkey"), salts = 8)
        .select(col("key").as("l_returnflag"), col("n_distinct"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("ev_props_json",
      (s, d) => eventsTable(s, d)
        .select(col("event_id"), Events.propsK(col("props")).as("k"))
        .orderBy("event_id"),
      Some(
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          |FROM events ORDER BY event_id""".stripMargin)),

    // ---- LLM ops: text analysis ----------------------------------------------

    Q("text_stats",
      (s, d) => TextStats.documentStats(tbl(s, d, "documents")).orderBy("doc_id"),
      Some(TEXT_STATS_SQL),
      bench = true),

    Q("text_exact_dedup",
      (s, d) => Dedup.exactDedupByKey(
          tbl(s, d, "documents")
            .withColumn("fp", TextStats.fingerprint(col("text"))),
          col("fp"), "doc_id")
        .select("doc_id", "fp")
        .orderBy("doc_id"),
      Some(
        """SELECT min(doc_id) AS doc_id, fp FROM
          |  (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents)
          |GROUP BY fp ORDER BY doc_id""".stripMargin),
      bench = true),

    Q("text_split_assign",
      // deterministic salted-md5 train/val/test assignment — stable under
      // corpus growth, reproducible in any engine with md5()
      (s, d) => tbl(s, d, "documents")
        .select(col("doc_id"), Corpus.splitAssign(col("doc_id")).as("split"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
          |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
          |       ELSE 'test' END AS split
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- set operations beyond union (§2.12) ---------------------------------

    Q("setop_except",
      // EXCEPT: the duplicate doc_ids the exact-dedup pass drops = all ids
      // minus the kept ones. Spark `except` == SQL EXCEPT (distinct
      // semantics), planned as a hash left-anti aggregation — one shuffle
      // on the id, broadcastable when the kept side is small.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val kept = Dedup.exactDedupByKey(
            docs.withColumn("fp", TextStats.fingerprint(col("text"))),
            col("fp"), "doc_id")
          .select("doc_id")
        docs.select("doc_id").except(kept).orderBy("doc_id")
      },
      Some(
        """SELECT doc_id FROM documents
          |EXCEPT
          |SELECT min(doc_id) AS doc_id FROM
          |  (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents)
          |GROUP BY fp
          |ORDER BY doc_id""".stripMargin)),

    Q("setop_intersect",
      // INTERSECT: doc_ids landing in 'train' under two independent split
      // salts — the reproducible-split analogue of a holdout-overlap audit.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        def train(salt: String) = docs
          .select(col("doc_id"),
            Corpus.splitAssign(col("doc_id"), salt = salt).as("split"))
          .filter(col("split") === "train")
          .select("doc_id")
        train("graft").intersect(train("alt")).orderBy("doc_id")
      },
      Some(
        """SELECT doc_id FROM documents
          |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666'
          |INTERSECT
          |SELECT doc_id FROM documents
          |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#alt'), 1, 8) < 'e6666666'
          |ORDER BY doc_id""".stripMargin)),

    Q("setop_intersect_all",
      // INTERSECT ALL: multiset intersection (per-value count minimum) of
      // the two lang streams — the counted twin of setop_except_all.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        docs.filter(col("doc_id") % 2 === 0).select("lang")
          .intersectAll(docs.filter(col("doc_id") % 3 === 0).select("lang"))
          .orderBy("lang")
      },
      Some(
        """SELECT lang FROM documents WHERE doc_id % 2 = 0
          |INTERSECT ALL
          |SELECT lang FROM documents WHERE doc_id % 3 = 0
          |ORDER BY lang""".stripMargin)),

    Q("setop_except_all",
      // EXCEPT ALL: multiset difference (per-value count subtraction) of
      // two lang streams — the bag semantics `except` silently collapses.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        docs.filter(col("doc_id") % 2 === 0).select("lang")
          .exceptAll(docs.filter(col("doc_id") % 3 === 0).select("lang"))
          .orderBy("lang")
      },
      Some(
        """SELECT lang FROM documents WHERE doc_id % 2 = 0
          |EXCEPT ALL
          |SELECT lang FROM documents WHERE doc_id % 3 = 0
          |ORDER BY lang""".stripMargin)),

    Q("text_pack_sequences",
      // GPT-style capacity packing: per-lang running token sum, each doc
      // assigned the 2048-token chunk its first token lands in
      (s, d) => Corpus.packSequences(
          tbl(s, d, "documents").select("doc_id", "lang", "text")
            .withColumn("n_tokens", Corpus.tokenCount(col("text"))),
          col("n_tokens"), col("lang"), col("doc_id"), capacity = 2048)
        .select("doc_id", "lang", "n_tokens", "pack_id", "pack_offset")
        .orderBy("doc_id"),
      Some(
        """WITH b AS (
          |  SELECT doc_id, lang,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |    ROWS UNBOUNDED PRECEDING) - n_tokens AS st
          |  FROM b)
          |SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
          |  CAST(floor(CAST(st AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
          |  CAST(st % 2048 AS BIGINT) AS pack_offset
          |FROM c ORDER BY doc_id""".stripMargin)),

    Q("text_token_quantiles",
      // per-lang exact token-count percentiles (type-7 interpolation in
      // both engines); distribution report for corpus quality monitoring
      (s, d) => Corpus.tokenQuantiles(tbl(s, d, "documents"), col("text"), col("lang"))
        .select(col("grp").as("lang"), col("n_docs"),
          e6(col("q0")).as("q25_e6"), e6(col("q1")).as("q50_e6"),
          e6(col("q2")).as("q90_e6"), e6(col("q3")).as("q99_e6"))
        .orderBy("lang"),
      Some(
        """WITH b AS (
          |  SELECT lang,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          |  FROM documents)
          |SELECT lang, count(*) AS n_docs,
          |  CAST(floor(quantile_cont(n_tokens, 0.25) * 1000000) AS BIGINT) AS q25_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.5)  * 1000000) AS BIGINT) AS q50_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.9)  * 1000000) AS BIGINT) AS q90_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.99) * 1000000) AS BIGINT) AS q99_e6
          |FROM b GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("text_curation_chain",
      // The LLM flagship: lang filter → quality floor → exact dedup →
      // simhash near-dup drop → split assignment, end to end — the
      // training-corpus analogue of transform_chain, fully oracled by
      // composing the stats and simhash CTEs.
      (s, d) => Corpus.curate(tbl(s, d, "documents"),
          keepLangs = Seq("en"), minQualityE6 = 650000L)
        .orderBy("doc_id"),
      Some(CURATION_SQL),
      bench = true),

    Q("text_tfidf",
      // TF-IDF salience with an exact rational idf (tf × (N·1e6 div df),
      // all-integer — a log idf would hang the cross-engine compare on
      // ln()'s last ulp). Vocabulary-sized df table broadcast back onto
      // the tf aggregation; corpus count rides a broadcast 1-row total.
      (s, d) => TextStats.tfIdf(tbl(s, d, "documents"))
        .orderBy("doc_id", "tok"),
      Some(TFIDF_SQL)),

    Q("text_cms_counts",
      // Count-Min frequency sketch over the corpus token stream, probed
      // with the English stopword vocabulary: d=4 md5-derived hash rows ×
      // w=1024 buckets, estimate = min over rows. Like the KMV sketch,
      // the md5 buckets make the APPROXIMATE counters exactly
      // reproducible in SQL.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val m = graft.analytics.Sketch.cmsMatrix(toks, col("tok"))
        val probes = s.createDataset(TextStats.enStopwords)(
          org.apache.spark.sql.Encoders.STRING).toDF("w")
        graft.analytics.Sketch.cmsEstimate(m, probes, col("w"))
          .select(col("item"), col("est_count").cast("long").as("est_count"))
          .orderBy("item")
      },
      Some(CMS_SQL)),

    Q("text_cms_heavy_hitters",
      // Batch heavy-hitters on top of the Count-Min matrix: probe with the
      // DISTINCT token set and keep items whose estimate clears φ = 1/32
      // of the stream length. CMS never undercounts, so every true heavy
      // hitter survives (perfect recall); the md5 buckets make each
      // boundary decision identical in both engines. The support threshold
      // rides a broadcast 1-row total — no driver-side collect.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val m = graft.analytics.Sketch.cmsMatrix(toks, col("tok"))
        val est = graft.analytics.Sketch.cmsEstimate(m, toks.distinct(), col("tok"))
        val total = toks.agg(count(lit(1)).as("__n"))
        est.crossJoin(broadcast(total))
          .filter(col("est_count") >= col("__n") / 32.0)
          .select(col("item"), col("est_count").cast("long").as("est_count"))
          .orderBy("item")
      },
      Some(CMS_HH_SQL)),

    Q("text_winnow_fp",
      // Winnowing fingerprints (SIGMOD'03). With the default k=5 the
      // base-31 polynomial values stay under 2^27 — the "wrap-around"
      // arithmetic never wraps — so DuckDB can recompute every k-gram
      // hash directly (unicode(char) * 31^t sums) and replay the
      // rightmost-min window selection. fp emitted as a joined string:
      // engine-portable, unlike array columns in the value compare.
      (s, d) => tbl(s, d, "documents")
        .select(col("doc_id"), graft.expr.WinnowSig(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_hashes"),
          array_join(transform(col("fp"), h => h.cast("string")), ",").as("fp_str"))
        .orderBy("doc_id"),
      Some(s"""WITH $WINNOW_CTES,
              |agg AS (SELECT id, count(*) AS n_hashes,
              |        string_agg(h, ',' ORDER BY h) AS fp_str FROM fp GROUP BY id)
              |SELECT d.doc_id, CAST(COALESCE(a.n_hashes, 0) AS INT) AS n_hashes,
              |       COALESCE(a.fp_str, '') AS fp_str
              |FROM documents d LEFT JOIN agg a ON a.id = d.doc_id
              |ORDER BY doc_id""".stripMargin)),

    Q("dedup_winnow_pairs",
      // containment mining over the winnow signatures: hashes appearing in
      // many documents are template/boilerplate grams — dropping them
      // (df > 10) both removes noise pairs AND caps the join's bucket
      // sizes (the winnowing analogue of the MinHash maxBucketSize cap:
      // without it the hot grams make the self-join quasi-quadratic).
      // Then explode → (hash, id), self-equi-join on the hash, keep pairs
      // sharing >= 3 rare hashes. Oracle replays the same pipeline over
      // the SQL-recomputed fingerprint sets.
      (s, d) => Dedup.winnowContainmentPairs(
          tbl(s, d, "documents"), "text", "doc_id")
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $WINNOW_CTES,
              |rare AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 10),
              |kept AS (SELECT fp.id, fp.h FROM fp JOIN rare USING (h))
              |SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
              |FROM kept x JOIN kept y ON x.h = y.h AND x.id < y.id
              |GROUP BY x.id, y.id HAVING count(*) >= 3
              |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    // ---- LLM ops: dedup -------------------------------------------------------

    Q("dedup_jaccard_pairs",
      (s, d) => Dedup.jaccardNearDupPairs(tbl(s, d, "documents"),
          "text", "doc_id", "lang", minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), e6(col("jaccard")).as("jaccard_e6"))
        .orderBy("id_a", "id_b"),
      Some(JACCARD_SQL),
      bench = true),

    Q("dedup_minhash_pairs",
      // md5-head base hash + exact slice band keys make every stage of the
      // LSH pair search SQL-reproducible: shingle → 32-bit base hash (first
      // 8 md5 hex chars) → 64 affine perms mod 2^31-1 (same coefficient
      // table as MinHashSig) → 16×4-row band equi-join → signature-
      // agreement estimate. est = eq/64 and eq*15625 are double-exact, so
      // the e6 fixed-point compare is bit-deterministic.
      (s, d) => Dedup.minhashNearDupPairs(tbl(s, d, "documents"),
          "text", "doc_id", minJaccard = 0.3, md5Base = true)
        .select(col("id_a"), col("id_b"), e6(col("est_jaccard")).as("est_jaccard_e6"))
        .orderBy("id_a", "id_b"),
      Some(MINHASH_PAIRS_SQL),
      bench = true),

    Q("dedup_minhash_verified",
      // The standard two-stage scale dedup as ONE verified query: LSH
      // proposes candidates (capped banded equi-join), exact word-set
      // jaccard confirms them with work bounded by the CANDIDATE count —
      // the labeled exact path used the way its label says — then CC makes
      // confirmation transitive and the min-id canonical survives.
      // VerifiedDedupSpec pins the plan shape: the exact stage joins the
      // candidate set, never self-joins the corpus.
      (s, d) => Dedup.minhashVerifiedKeep(
          tbl(s, d, "documents").select("doc_id", "lang", "text"),
          "text", "doc_id", md5Base = true)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(MINHASH_VERIFIED_SQL),
      bench = true),

    Q("dedup_simhash",
      // md5-bit signature variant: per-token bits from the md5 hex digest
      // instead of xxhash64, so the ±1-sum/sign aggregation is exactly
      // reproducible in DuckDB (same machinery as the fast path — see
      // Dedup.simhashFromBits). Output as hex: DuckDB can't build a
      // bit-63 BIGINT without overflow, digit arithmetic is safe.
      (s, d) => Dedup.simhashMd5(tbl(s, d, "documents"), "text", "doc_id")
        .select(col("id"), Dedup.simhashHex(col("simhash")).as("sig"))
        .orderBy("id"),
      Some(s"WITH $SIMHASH_CTES\nSELECT id, sig FROM sigs ORDER BY id"),
      bench = true),

    Q("dedup_simhash_pairs",
      // Banded Hamming-ball pairs over the md5-bit signatures. With
      // maxHamming=3 the band join uses 4 disjoint 16-bit bands, and by
      // pigeonhole ANY pair within Hamming 3 shares a clean band — the
      // banding is lossless, so the O(n²) hamming-filter oracle computes
      // the exact same pair set the bucketed join does.
      (s, d) => Dedup.simhashNearDupPairsFromSigs(
          Dedup.simhashMd5(tbl(s, d, "documents"), "text", "doc_id"),
          maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b"),
      Some(SIMHASH_PAIRS_SQL)),

    Q("dedup_cc_labels",
      // Transitive near-dup clusters: simhash pairs → connected components
      // by min-label propagation (the correct canonical assignment — the
      // greater-id-drop rule over-drops chains). Oracle computes the same
      // components with a recursive transitive-closure CTE.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
          .orderBy("id")
      },
      Some(CC_SQL),
      bench = true),

    Q("dedup_cc_keep",
      // cluster-level dedup, the actionable form of the CC labels: one
      // surviving doc (the min id) per transitive near-dup cluster, via a
      // semi-join against the canonical-id set. The greater-id-drop rule
      // this corrects over-drops chains.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        val labels = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        Dedup.keepClusterCanonical(docs.select("doc_id", "lang"), "doc_id", labels)
          .orderBy("doc_id")
      },
      Some(CC_KEEP_SQL)),

    Q("dedup_cc_labels_altstar",
      // Same component contract computed by the alternating large-star/
      // small-star algorithm — O(log² n) rounds regardless of diameter,
      // the variant that survives chain-shaped duplicate graphs at scale.
      // Oracled against the identical recursive-CTE truth as
      // dedup_cc_labels (the two engines' outputs must agree exactly).
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        Dedup.connectedComponentsAltStar(docs.select(col("doc_id").as("id")), pairs)
          .orderBy("id")
      },
      Some(CC_SQL)),

    // ---- LLM ops: similarity search -------------------------------------------

    Q("sim_cosine_topk",
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(pmod(col("vec_id"), lit(50)) === 0), k = 5)
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |           FROM embeddings WHERE vec_id % 50 = 0),
          |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM c, q WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
          |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
          |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    Q("sim_exact_neardup_pairs",
      // threshold 0.3: the synthetic embeddings top out at cos ≈ 0.46, so a
      // "real" near-dup threshold matches a 0-row oracle — vacuously. 0.3
      // keeps ~42 pairs at sf0.01 so the value compare actually compares.
      (s, d) => Similarity.exactNearDupPairs(
          tbl(s, d, "embeddings").filter(pmod(col("vec_id"), lit(5)) === 0), minCosine = 0.3)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings WHERE vec_id % 5 = 0)
          |SELECT a.id AS id_a, b.id AS id_b,
          |  CAST(floor(list_inner_product(a.e, b.e) /
          |    (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) * 1000000) AS BIGINT) AS cos_e6
          |FROM v a JOIN v b ON a.id < b.id
          |WHERE CAST(floor(list_inner_product(a.e, b.e) /
          |    (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) * 1000000) AS BIGINT) >= 300000
          |ORDER BY id_a, id_b""".stripMargin)),

    Q("sim_lsh_topk",
      // The hyperplanes are deterministic constants (±1 by murmur3 parity
      // of (seed, bit, dim)), so the oracle embeds the 12×64 sign matrix
      // as literals and replays the projection with the same sequential
      // double fold (list_reduce) — bit-identical signs, buckets, probes,
      // and rerank. Fully oracle-checked, multi-probe included.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.lshTopK(emb, emb.filter(pmod(col("vec_id"), lit(50)) === 0), k = 5)
      },
      Some(LSH_TOPK_SQL),
      bench = true),

    Q("sim_ivf_topk",
      // IVF coarse quantization with deterministic centroids (vec_id % 100
      // = 0) — fully oracle-checkable, unlike trained-kmeans IVF.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(pmod(col("vec_id"), lit(50)) === 0),
          k = 5, centStep = 100, nProbe = 2)
      },
      Some(
        """WITH c AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
          |           FROM embeddings WHERE vec_id % 100 = 0),
          |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |vc AS (
          |  SELECT id, e, cent_id, row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT v.id, v.e, c.cent_id,
          |          CAST(floor(list_inner_product(v.e, c.cv) /
          |            (sqrt(list_inner_product(v.e, v.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM v, c)
          |),
          |cells AS (SELECT id AS neighbor_id, e AS cv, cent_id FROM vc WHERE rn = 1),
          |probes AS (SELECT id AS query_id, e AS qv, cent_id FROM vc WHERE rn <= 2 AND id % 50 = 0),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM cells JOIN probes USING (cent_id) WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
          |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
          |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    Q("sim_embedding_neardup_lsh",
      // 0.3 (see sim_exact_neardup_pairs) so the bucketed variant emits a
      // nonzero candidate set (23 pairs at sf0.01); recall vs the exact
      // pairs is unit-tested. Oracle replays the 8-bit bucket blocking
      // with the literal sign matrix (see sim_lsh_topk).
      (s, d) => Similarity.embeddingNearDupPairs(tbl(s, d, "embeddings"), minCosine = 0.3)
        .orderBy("id_a", "id_b"),
      Some(EMB_NEARDUP_LSH_SQL)),

    // ---- LLM ops: multimodal ---------------------------------------------------

    Q("mm_asset_metadata",
      (s, d) => Multimodal.assetMetadata(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"))
        .orderBy("asset_id"),
      Some(
        """SELECT doc_id AS asset_id,
          |  list_extract(['image/png', 'image/jpeg', 'audio/wav', 'video/mp4'], CAST(doc_id % 4 AS INT) + 1) AS mime,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS checksum,
          |  substring(md5(text), 1, 8) AS shard_key,
          |  octet_length(encode(text)) > 1048576 AS is_large
          |FROM documents ORDER BY asset_id""".stripMargin),
      bench = true),

    Q("mm_decode_features",
      // The decode kernel is the declared deterministic stub, but it is a
      // PURE function of the payload bytes — so the whole decode path
      // (binary plumbing, dims, frame counts, per-slot feature sums) is
      // oracle-checkable: DuckDB re-derives every byte from hex(payload).
      // feats(j) = sum(bytes at i≡j mod 8) / 255 / n with one double
      // division, so round(f * 255 * n) recovers the integer sum exactly.
      (s, d) => {
        val feats = Multimodal.decodeFeatures(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text")).toDF()
        val sumCols = (0 until Multimodal.FakeDecoder.featureDim).map(j =>
          round(element_at(col("features"), j + 1).cast("double") * 255.0 *
            greatest(col("n_bytes"), lit(1L))).cast("long").as(s"f${j}_sum"))
        feats.select(Seq(col("asset_id"), col("mime"), col("n_bytes"),
            col("width"), col("height"), col("n_frames")) ++ sumCols: _*)
          .orderBy("asset_id")
      },
      Some(MM_DECODE_SQL)),

    Q("mm_resize",
      // Resize stub is likewise byte-deterministic: dims scale to fit
      // 32x32, the payload is truncated/zero-padded to area-proportional
      // length — all reproducible from hex(payload) in DuckDB, with
      // md5-of-hex as the content checksum (DuckDB cannot slice blobs,
      // but slicing the hex string is byte-equivalent).
      (s, d) => Multimodal.resizeAssets(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"),
          maxW = 32, maxH = 32)
        .toDF().select(col("asset_id"), col("mime"), col("width"), col("height"),
          octet_length(col("payload")).cast("long").as("out_len"),
          md5(hex(col("payload")).cast("binary")).as("hex_md5"))
        .orderBy("asset_id"),
      Some(MM_RESIZE_SQL)),

    Q("mm_frame_sample",
      // frame fan-out: every stride-th frame of a video asset, one row per
      // (asset, frame) — n_frames is byte-deterministic, so the generator
      // shape is exactly reproducible with range() in DuckDB.
      (s, d) => Multimodal.sampleFrames(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"),
          stride = 10)
        .toDF().select("asset_id", "frame_idx")
        .orderBy("asset_id", "frame_idx"),
      Some(
        """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
          |f AS (SELECT doc_id, CASE WHEN doc_id % 4 = 3 THEN 1 + n % 30 ELSE 1 END AS nf FROM b)
          |SELECT doc_id AS asset_id, CAST(unnest(range(0, nf, 10)) AS INT) AS frame_idx
          |FROM f ORDER BY asset_id, frame_idx""".stripMargin)),

    // ---- Bloom-filter pruning, stratified sampling, robust quality gates,
    //      edit-distance dedup, grouping-sets / union-by-name breadth ------

    Q("join_bloom_prune",
      // Bloom-pruned fact-dim join: the dim side (European suppliers)
      // builds an md5-deterministic Bloom filter (analytics/Bloom.scala);
      // the fact scan is pruned by the codegen'd SortedSetContainsAll
      // binary search BEFORE any exchange — the explicit, engine-portable
      // form of Spark's runtime row-level filtering. False positives are
      // swallowed by the exact broadcast join that follows, so the oracle
      // is the PLAIN join SQL: the bloom may only ever change the plan,
      // never the answer.
      (s, d) => {
        val dim = tbl(s, d, "supplier")
          .join(broadcast(tbl(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(tbl(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("n_name"))
        val packed = Bloom.packSorted(
          Bloom.bits(dim, col("s_suppkey"), BLOOM_JOIN_M, BLOOM_K))
        val pruned = Bloom.prune(
          tbl(s, d, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount"),
          col("l_suppkey"), packed, BLOOM_JOIN_M, BLOOM_K)
        pruned.join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(28,4)").multiply(10000).cast("long").as("revenue_e4"))
          .orderBy("n_name")
      },
      Some(
        """SELECT n_name, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'EUROPE'
          |GROUP BY n_name ORDER BY n_name""".stripMargin),
      bench = true),

    Q("text_bloom_blocklist",
      // Blocklist filtering through the bloom, false positives VISIBLE:
      // per-doc (bloom_hit, exact_hit) against a fingerprint blocklist.
      // The md5-derived bit positions make the filter itself — including
      // any false positive — bit-reproducible in DuckDB, so this oracle
      // checks the bloom's exact semantics, not just the rescued answer.
      (s, d) => {
        val fp = tbl(s, d, "documents").select(col("doc_id"), col("source"),
          TextStats.fingerprint(col("text")).as("fp"))
        val block = fp.filter(col("source").isin("src0", "src1"))
          .select("fp").distinct()
        val bbits = Bloom.bits(block, col("fp"), BLOOM_LIST_M, BLOOM_K)
        val mem = Bloom.membership(fp, col("doc_id"), col("fp"),
            bbits, BLOOM_LIST_M, BLOOM_K)
          .select(col("id").as("doc_id"), col("might_contain").as("bloom_hit"))
        val exact = fp.join(broadcast(block.withColumn("__b", lit(1))), Seq("fp"), "left")
          .select(col("doc_id"), col("__b").isNotNull.as("exact_hit"))
        mem.join(exact, Seq("doc_id")).orderBy("doc_id")
      },
      Some(BLOOM_BLOCKLIST_SQL)),

    Q("text_stratified_sample",
      // deterministic per-language quota rebalancing: bottom-40 docs per
      // lang in md5(doc_id)-hash order via the heap-based top-k exec —
      // exact stratum sizes, no RNG, oracle re-derives the identical set
      (s, d) => Corpus.stratifiedSample(
          tbl(s, d, "documents"), col("lang"), col("doc_id"), quota = 40)
        .select(col("stratum").as("lang"), col("id").as("doc_id"))
        .orderBy("lang", "doc_id"),
      Some(STRATIFIED_SAMPLE_SQL)),

    Q("text_robust_outliers",
      // median/MAD length-anomaly gate per language — the robust quality
      // filter (mean/stddev breaks down on the exact blobs it should
      // catch); every intermediate is an exact x.0/x.5 double on integer
      // token counts, so even the boolean flag is oracle-exact
      (s, d) => TextStats.robustOutliers(
          tbl(s, d, "documents").withColumn("n_tokens", Corpus.tokenCount(col("text"))),
          col("lang"), col("doc_id"), col("n_tokens"), cutoff = 2.0)
        .select(col("grp").as("lang"), col("id").as("doc_id"),
          col("v").cast("long").as("n_tokens"),
          e6(col("med")).as("med_e6"), e6(col("mad")).as("mad_e6"),
          col("is_outlier"))
        .orderBy("doc_id"),
      Some(ROBUST_OUTLIERS_SQL)),

    Q("dedup_edit_distance_pairs",
      // character-level near-dup complement to the word-set measures:
      // banded levenshtein(l, r, threshold) inside (lang, length-bucket)
      // blocks with the |len diff| <= maxDist necessary-condition pushed
      // into the join predicate. Exact/oracle path (quasi-quadratic in a
      // block) — MinHash/SimHash banding stays the scale path.
      (s, d) => Dedup.editDistancePairs(
          tbl(s, d, "documents"), "text", "doc_id", "lang", maxDist = 64)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH b AS (SELECT doc_id, text, lang, length(text) AS len,
          |            CAST(floor(length(text) / 64) AS BIGINT) AS lb FROM documents),
          |p AS (SELECT doc_id, text, lang, len, unnest([lb, lb + 1]) AS lb FROM b)
          |SELECT least(x.doc_id, y.doc_id) AS id_a, greatest(x.doc_id, y.doc_id) AS id_b,
          |  CAST(min(levenshtein(x.text, y.text)) AS INT) AS dist
          |FROM b x JOIN p y ON x.lang = y.lang AND x.lb = y.lb
          |  AND x.doc_id <> y.doc_id AND abs(x.len - y.len) <= 64
          |GROUP BY 1, 2 HAVING min(levenshtein(x.text, y.text)) <= 64
          |ORDER BY id_a, id_b""".stripMargin)),

    Q("dash_grouping_sets",
      // explicit GROUPING SETS beyond rollup/cube: the two one-dimension
      // summaries in ONE pass over the chain (no detail level, no grand
      // total — a set cube() cannot express without post-filtering)
      (s, d) => transformChain(s, d)
        .groupingSets(Seq(Seq(col("region")), Seq(col("purpose"))),
          col("region"), col("purpose"))
        .agg(count(lit(1)).as("n"), sum(col("price_czk")).as("sum_price"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("region").asc_nulls_first,
          col("purpose").asc_nulls_first),
      Some(chainSql(DUMP_DATE, FILE_NAME) +
        """
          |SELECT region, purpose, count(*) AS n,
          |  CAST(sum(price_czk) AS BIGINT) AS sum_price,
          |  CAST(GROUPING(region) * 2 + GROUPING(purpose) AS INT) AS gid
          |FROM final GROUP BY GROUPING SETS ((region), (purpose))
          |ORDER BY gid, region ASC NULLS FIRST, purpose ASC NULLS FIRST""".stripMargin)),

    Q("setop_union_by_name",
      // schema-evolution union: two projections with different column
      // sets aligned BY NAME, absent columns null-filled — the set-op
      // the positional UNION family can't express
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val a = docs.filter(col("lang") === "en")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val b = docs.filter(col("lang") === "de")
          .select(col("doc_id"), col("source"), col("lang"))
        a.unionByName(b, allowMissingColumns = true).orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
          |UNION ALL BY NAME
          |SELECT doc_id, source, lang FROM documents WHERE lang = 'de'
          |ORDER BY doc_id""".stripMargin))
  )

  // def, not val: the strict `all` vector forces the lazy MM_*_SQL strings
  // during object init, before a val defined down here would be assigned.
  private def MM_MIME_SQL: String =
    "list_extract(['image/png', 'image/jpeg', 'audio/wav', 'video/mp4'], CAST(doc_id % 4 AS INT) + 1)"

  /** Oracle for mm_decode_features: every byte re-derived from hex(payload)
    * (two hex chars → one byte), per-slot integer sums, dims from n.
    */
  private lazy val MM_DECODE_SQL: String = {
    val sumSelects = (0 until Multimodal.FakeDecoder.featureDim).map(j =>
      s"CAST(COALESCE(sum(byte) FILTER (WHERE i % 8 = $j), 0) AS BIGINT) AS f${j}_sum").mkString(",\n        ")
    val sumCols = (0 until Multimodal.FakeDecoder.featureDim).map(j =>
      s"CAST(COALESCE(s.f${j}_sum, 0) AS BIGINT) AS f${j}_sum").mkString(",\n      ")
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       |by AS (SELECT doc_id, i,
       |         (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
       |         + strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1 AS byte
       |       FROM (SELECT doc_id, hx, unnest(range(n)) AS i FROM b)),
       |s AS (SELECT doc_id,
       |        $sumSelects
       |      FROM by GROUP BY doc_id)
       |SELECT b.doc_id AS asset_id, $MM_MIME_SQL AS mime,
       |      CAST(b.n AS BIGINT) AS n_bytes,
       |      CAST(16 + b.n % 64 AS INT) AS width,
       |      CAST(16 + (b.n // 64) % 64 AS INT) AS height,
       |      CAST(CASE WHEN b.doc_id % 4 = 3 THEN 1 + b.n % 30 ELSE 1 END AS INT) AS n_frames,
       |      $sumCols
       |FROM b LEFT JOIN s USING (doc_id) ORDER BY asset_id""".stripMargin
  }

  /** Oracle for mm_resize: scale/truncate arithmetic mirrored op-for-op
    * (same IEEE double ops, trunc-toward-zero), zero-byte padding as '0'
    * hex chars via rpad.
    */
  private lazy val MM_RESIZE_SQL: String =
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       |g AS (SELECT doc_id, hx, n, 16 + n % 64 AS w0, 16 + (n // 64) % 64 AS h0 FROM b),
       |sc AS (SELECT *, least(CAST(1.0 AS DOUBLE),
       |         least(CAST(32.0 AS DOUBLE) / w0, CAST(32.0 AS DOUBLE) / h0)) AS scale FROM g),
       |r AS (SELECT doc_id, hx, n,
       |        CAST(greatest(1, trunc(w0 * scale)) AS INT) AS width,
       |        CAST(greatest(1, trunc(h0 * scale)) AS INT) AS height,
       |        greatest(1, CAST(trunc((n * scale) * scale) AS BIGINT)) AS out_len
       |      FROM sc)
       |SELECT doc_id AS asset_id, $MM_MIME_SQL AS mime, width, height, out_len,
       |  md5(rpad(substr(hx, 1, CAST(2 * least(out_len, n) AS INT)),
       |           CAST(2 * out_len AS INT), '0')) AS hex_md5
       |FROM r ORDER BY asset_id""".stripMargin

  /** The hyperplane-LSH bucket signature as a DuckDB expression over a
    * DOUBLE[] column `e`: per bit, the ±1 sign matrix is precomputed here
    * with the same murmur3 chain HyperplaneSig uses
    * (hashInt(d, hashInt(b, hashInt(seed, 42)))) and embedded as literals;
    * the projection is the same left-to-right double fold (list_reduce
    * seeds with the first element — IEEE-identical to Spark's 0.0-seeded
    * fold), so every sign bit matches exactly.
    */
  private def hyperplaneSigSql(bits: Int, dim: Int, seed: Int = 42): String = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    (0 until bits).map { b =>
      val hb = Murmur3_x86_32.hashInt(b, Murmur3_x86_32.hashInt(seed, 42))
      val signs = (0 until dim).map { dIdx =>
        val h = Murmur3_x86_32.hashInt(dIdx, hb)
        if (((h % 2) + 2) % 2 == 0) "1.0" else "-1.0"
      }.mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
         |      d -> e[d] * (CAST($signs AS DOUBLE[]))[d]), (x, y) -> x + y) > 0
         |    THEN ${1L << b} ELSE 0 END)""".stripMargin
    }.mkString("\n   + ")
  }

  private def COS_E6(a: String, b: String): String =
    s"""CAST(floor(list_inner_product($a, $b) /
       |    (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))) * 1000000) AS BIGINT)""".stripMargin

  /** Oracle for sim_lsh_topk: signatures + multi-probe (all 1-bit flips)
    * + exact rerank, all replayed in SQL.
    */
  private lazy val LSH_TOPK_SQL: String = {
    val masks = Similarity.probeMasks(12, 1).mkString("[", ", ", "]")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (SELECT id, e,
       |   ${hyperplaneSigSql(12, 64)} AS sig
       |   FROM v),
       |probes AS (SELECT id AS query_id, e AS qv, xor(sig, m) AS bucket
       |           FROM s, (SELECT unnest($masks) AS m) WHERE id % 50 = 0),
       |sc AS (SELECT p.query_id, c.id AS neighbor_id,
       |         ${COS_E6("p.qv", "c.e")} AS sim_e6
       |       FROM probes p JOIN s c ON c.sig = p.bucket AND c.id <> p.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Oracle for sim_embedding_neardup_lsh: 8-bit exact-bucket blocking,
    * then the cosine threshold.
    */
  private lazy val EMB_NEARDUP_LSH_SQL: String =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (SELECT id, e,
       |   ${hyperplaneSigSql(8, 64)} AS sig
       |   FROM v)
       |SELECT a.id AS id_a, b.id AS id_b, ${COS_E6("a.e", "b.e")} AS cos_e6
       |FROM s a JOIN s b ON a.sig = b.sig AND a.id < b.id
       |WHERE ${COS_E6("a.e", "b.e")} >= 300000
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared CTEs for the winnowing oracles (k=5, w=4), ending in
    * `fp(id, h)` — the distinct selected hash set per document. Gram
    * hashes are the exact base-31 polynomial values WinnowSig computes
    * (no wrap under 2^27 for k=5); windows replay the rightmost-min rule
    * via (h ASC, pos DESC) ranking.
    */
  private lazy val WINNOW_CTES: String = {
    val powers = Seq(923521L, 29791L, 961L, 31L, 1L)
    val gramHash = powers.zipWithIndex.map { case (p, t) =>
      if (p == 1L) s"unicode(substr(nrm, pos + $t, 1))"
      else s"unicode(substr(nrm, pos + $t, 1)) * $p"
    }.mkString(" + ")
    s"""nd AS (SELECT doc_id AS id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nrm
       |       FROM documents),
       |nn AS (SELECT id, nrm, length(nrm) - 4 AS m FROM nd WHERE length(nrm) >= 5),
       |grams AS (SELECT id, m, pos, $gramHash AS h
       |          FROM (SELECT id, nrm, m, unnest(range(1, m + 1)) AS pos FROM nn)),
       |wins AS (SELECT id, h, pos,
       |           unnest(range(greatest(pos - 3, 1), least(pos, greatest(m - 3, 1)) + 1)) AS win
       |         FROM grams),
       |sel AS (SELECT id, win, h FROM (
       |          SELECT id, win, h,
       |            row_number() OVER (PARTITION BY id, win ORDER BY h ASC, pos DESC) AS rn
       |          FROM wins) WHERE rn = 1),
       |fp AS (SELECT DISTINCT id, h FROM sel)""".stripMargin
  }

  /** Oracle for dedup_minhash_pairs — the full MinHash-LSH pipeline in
    * DuckDB: word 3-shingles, md5-head base hashes, the same 64 (a,b)
    * coefficients (generated from the one shared
    * MinHashSig.coefficients(64, 42) table), per-permutation minima,
    * 16 bands × 4 rows joined on the exact band values, then the
    * signature-agreement fraction ≥ 0.3.
    */
  /** First 8 hex chars of a VARCHAR column `mh` (an md5 digest) parsed as
    * a base-16 BIGINT — the SQL mirror of MinHashSig.md5Head32 /
    * Sketch.hashPoint32.
    */
  private def hexHead32Sql: String = (0 until 8).map { c =>
    val mult = 1L << (4 * (7 - c))
    s"(strpos('0123456789abcdef', substr(mh, ${c + 1}, 1)) - 1) * $mult"
  }.mkString(" + ")

  /** UNION ALL of the k per-row Bloom positions of column `fp` from table
    * `src` — the SQL mirror of Bloom.positions (md5("r#" || fp) head-32
    * mod m), with `extra` columns carried through.
    */
  private def bloomPosSql(src: String, m: Int, extra: String = ""): String = {
    val ex = if (extra.isEmpty) "" else s"$extra, "
    (0 until BLOOM_K).map { r =>
      s"""SELECT $ex($hexHead32Sql) % $m AS pos
         |  FROM (SELECT ${ex}md5('$r#' || fp) AS mh FROM $src)""".stripMargin
    }.mkString("\n  UNION ALL\n")
  }

  /** Oracle for text_bloom_blocklist: the filter's set bits, every probe's
    * k positions, and the all-k-present test re-derived bit-for-bit —
    * false positives and all.
    */
  private def BLOOM_BLOCKLIST_SQL: String =
    s"""WITH fp AS (SELECT doc_id, source,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents),
       |block AS (SELECT DISTINCT fp FROM fp WHERE source IN ('src0', 'src1')),
       |bpos AS (SELECT DISTINCT pos FROM (
       |  ${bloomPosSql("block", BLOOM_LIST_M)}
       |)),
       |ppos AS (
       |  ${bloomPosSql("fp", BLOOM_LIST_M, extra = "doc_id")}
       |),
       |bh AS (SELECT p.doc_id, count(b.pos) = $BLOOM_K AS bloom_hit
       |       FROM ppos p LEFT JOIN bpos b USING (pos) GROUP BY p.doc_id),
       |eh AS (SELECT doc_id, fp IN (SELECT fp FROM block) AS exact_hit FROM fp)
       |SELECT doc_id, bloom_hit, exact_hit FROM bh JOIN eh USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Oracle for text_stratified_sample: identical md5 hash points, bottom
    * 40 per language with the same doc_id tiebreak.
    */
  private def STRATIFIED_SAMPLE_SQL: String =
    s"""WITH h AS (SELECT lang, doc_id, ($hexHead32Sql) AS h
       |  FROM (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents)),
       |r AS (SELECT lang, doc_id,
       |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM h)
       |SELECT lang, doc_id FROM r WHERE rn <= 40 ORDER BY lang, doc_id""".stripMargin

  /** Oracle for text_robust_outliers: DuckDB median() is the same type-7
    * interpolation as Spark percentile(0.5); on integer token counts the
    * med/mad/flag arithmetic is exact in both engines.
    */
  private def ROBUST_OUTLIERS_SQL: String =
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n FROM documents),
      |m AS (SELECT lang, median(n) AS med FROM t GROUP BY lang),
      |d AS (SELECT t.doc_id, t.lang, t.n, m.med, abs(n - med) AS ad FROM t JOIN m USING (lang)),
      |md AS (SELECT lang, median(ad) AS mad FROM d GROUP BY lang)
      |SELECT d.lang, d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
      |  CAST(floor(med * 1000000) AS BIGINT) AS med_e6,
      |  CAST(floor(mad * 1000000) AS BIGINT) AS mad_e6,
      |  ad > 2.0 * mad AS is_outlier
      |FROM d JOIN md USING (lang) ORDER BY doc_id""".stripMargin

  /** Oracle for agg_kmv_distinct: same hash points, same k minima, same
    * estimator arithmetic (double-exact constant, one division).
    */
  private lazy val KMV_SQL: String = {
    val k = 256
    val c = (k - 1).toDouble * 4294967296.0
    s"""WITH p AS (SELECT DISTINCT key, $hexHead32Sql AS h FROM
       |       (SELECT l_returnflag AS key, md5(CAST(l_partkey AS VARCHAR)) AS mh
       |        FROM lineitem WHERE l_partkey IS NOT NULL)),
       |r AS (SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS rn FROM p),
       |b AS (SELECT key, count(*) AS cnt, max(h) AS vk FROM r WHERE rn <= $k GROUP BY key)
       |SELECT key AS l_returnflag,
       |  CASE WHEN cnt < $k THEN CAST(cnt AS BIGINT) * 1000000
       |       ELSE CAST(floor(CAST($c AS DOUBLE) / greatest(vk, 1) * 1000000) AS BIGINT) END
       |    AS n_distinct_e6
       |FROM b ORDER BY l_returnflag""".stripMargin
  }

  /** Oracle for agg_kmv_quantiles: identical bottom-64 sample (same md5
    * hash points, id tiebreak), identical type-7 interpolation.
    */
  private lazy val KMV_QUANTILES_SQL: String = {
    val k = 64
    s"""WITH b AS (
       |  SELECT lang, doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       |    $hexHead32Sql AS h
       |  FROM (SELECT lang, doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents)),
       |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM b)
       |SELECT lang, count(*) AS n_sample,
       |  CAST(floor(quantile_cont(n_tokens, 0.25) * 1000000) AS BIGINT) AS q25_e6,
       |  CAST(floor(quantile_cont(n_tokens, 0.5)  * 1000000) AS BIGINT) AS q50_e6,
       |  CAST(floor(quantile_cont(n_tokens, 0.9)  * 1000000) AS BIGINT) AS q90_e6,
       |  CAST(floor(quantile_cont(n_tokens, 0.99) * 1000000) AS BIGINT) AS q99_e6
       |FROM r WHERE rn <= $k GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Shared CTEs of the MinHash-LSH oracle: word 3-shingles → md5-head
    * base hashes → the 64 shared affine perms → 16×4 band candidates →
    * signature agreement `m(id_a, id_b, eq)`. Reused by the verified
    * two-stage pipeline's oracle.
    */
  private lazy val MINHASH_CTES: String = {
    val perms = graft.expr.MinHashSig.coefficients(64, 42).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val hexParse = hexHead32Sql
    s"""w AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |sh AS (SELECT id, unnest(list_distinct(list_filter(
       |    list_transform(range(0, greatest(len(ws) - 3, 0) + 1),
       |      i -> array_to_string(ws[i + 1:i + 3], ' ')),
       |    x -> x <> ''))) AS s FROM w),
       |hv AS (SELECT id, $hexParse AS h FROM (SELECT id, md5(s) AS mh FROM sh)),
       |perms(pk, a, b) AS (VALUES $perms),
       |sig AS (SELECT id, pk, min((h * a + b) % 2147483647) AS v
       |        FROM hv CROSS JOIN perms GROUP BY id, pk),
       |bands AS (SELECT id, pk // 4 AS band, string_agg(v, ',' ORDER BY pk) AS bkey
       |          FROM sig GROUP BY id, pk // 4),
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
       |m AS (SELECT c.id_a, c.id_b, count(*) FILTER (WHERE sa.v = sb.v) AS eq
       |      FROM cand c
       |      JOIN sig sa ON sa.id = c.id_a
       |      JOIN sig sb ON sb.id = c.id_b AND sb.pk = sa.pk
       |      GROUP BY c.id_a, c.id_b)""".stripMargin
  }

  private lazy val MINHASH_PAIRS_SQL: String =
    s"""WITH $MINHASH_CTES
       |SELECT id_a, id_b,
       |  CAST(floor(CAST(eq AS DOUBLE) / 64 * 1000000) AS BIGINT) AS est_jaccard_e6
       |FROM m WHERE CAST(eq AS DOUBLE) / 64 >= 0.3
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle for dedup_minhash_verified — the full two-stage pipeline:
    * LSH candidates (MINHASH_CTES), exact word-set jaccard confirm
    * restricted to the candidate pairs, recursive-CTE transitive closure
    * over the CONFIRMED pairs, min-id canonical keep.
    */
  private lazy val MINHASH_VERIFIED_SQL: String =
    s"""WITH RECURSIVE $MINHASH_CTES,
       |mcand AS (SELECT id_a, id_b FROM m WHERE CAST(eq AS DOUBLE) / 64 >= 0.3),
       |vws AS (SELECT doc_id AS id,
       |          list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws
       |        FROM documents),
       |vp AS (SELECT c.id_a, c.id_b
       |       FROM mcand c JOIN vws a ON a.id = c.id_a JOIN vws b ON b.id = c.id_b
       |       WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
       |             (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.5),
       |vedges AS (SELECT id_a AS a, id_b AS b FROM vp UNION SELECT id_b, id_a FROM vp),
       |vreach(a, b) AS (
       |  SELECT a, b FROM vedges
       |  UNION
       |  SELECT r.a, e.b FROM vreach r JOIN vedges e ON r.b = e.a
       |),
       |vlbl AS (SELECT a AS id, least(a, min(b)) AS component FROM vreach GROUP BY a)
       |SELECT d.doc_id, d.lang
       |FROM documents d LEFT JOIN vlbl l ON l.id = d.doc_id
       |WHERE COALESCE(l.component, d.doc_id) = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Shared CTEs for the md5-bit simhash oracle: tokenize → md5 hex digits
    * (d0..d15, 4 bits each) → 64 ±1 sums → sign digits (dg0..dg15) →
    * `sigs(id, sig)` hex string. Mirrors Dedup.simhashMd5 bit for bit.
    */
  private lazy val SIMHASH_CTES: String = {
    val digitCols = (0 until 16).map(c =>
      s"strpos('0123456789abcdef', substr(mh, ${c + 1}, 1)) - 1 AS d$c").mkString(",\n       ")
    val sumCols = (0 until 64).map { j =>
      s"sum(CASE WHEN (d${j / 4} >> ${j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n       ")
    val digitRecon = (0 until 16).map { c =>
      val terms = (0 until 4).map(k =>
        s"(CASE WHEN b${4 * c + k} > 0 THEN ${1 << k} ELSE 0 END)").mkString(" + ")
      s"$terms AS dg$c"
    }.mkString(",\n       ")
    val hexConcat = (0 until 16).map(c =>
      s"substr('0123456789abcdef', dg$c + 1, 1)").mkString(" || ")
    s"""toks AS (
       |  SELECT id, w FROM (
       |    SELECT doc_id AS id,
       |      unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS w
       |    FROM documents) WHERE w <> ''
       |),
       |hh AS (SELECT id, md5(w) AS mh FROM toks),
       |dd AS (SELECT id,
       |       $digitCols
       |       FROM hh),
       |ss AS (SELECT id,
       |       $sumCols
       |       FROM dd GROUP BY id),
       |sigd AS (SELECT id,
       |       $digitRecon
       |       FROM ss),
       |sigs AS (SELECT id, $hexConcat AS sig FROM sigd)""".stripMargin
  }

  /** Oracle for dedup_simhash_pairs: exact O(n²) Hamming filter over the
    * sign digits — equal to the banded join because 4 disjoint bands make
    * Hamming ≤ 3 pigeonhole-lossless.
    */
  /** Hamming distance between two sign-digit rows aliased a and b. */
  private def simhashHamSql: String =
    (0 until 16).map(c => s"bit_count(xor(a.dg$c, b.dg$c))").mkString(" + ")

  private lazy val SIMHASH_PAIRS_SQL: String = {
    val ham = simhashHamSql
    s"""WITH $SIMHASH_CTES
       |SELECT a.id AS id_a, b.id AS id_b, CAST($ham AS BIGINT) AS hamming
       |FROM sigd a JOIN sigd b ON a.id < b.id
       |WHERE $ham <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for text_cms_counts: the same d×w counter matrix from the
    * same md5-derived buckets, min over rows per probe.
    */
  private lazy val CMS_SQL: String = {
    val stop = sqlList(TextStats.enStopwords)
    s"""WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |              FROM documents),
       |tr AS (SELECT tok, unnest([0, 1, 2, 3]) AS r FROM toks WHERE tok <> ''),
       |tb AS (SELECT r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT r, md5(CAST(r AS VARCHAR) || '#' || tok) AS mh FROM tr)),
       |m AS (SELECT r, bucket, count(*) AS cnt FROM tb GROUP BY r, bucket),
       |pr AS (SELECT item, unnest([0, 1, 2, 3]) AS r
       |       FROM (SELECT unnest($stop) AS item)),
       |pb AS (SELECT item, r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT item, r, md5(CAST(r AS VARCHAR) || '#' || item) AS mh FROM pr))
       |SELECT item, CAST(min(COALESCE(m.cnt, 0)) AS BIGINT) AS est_count
       |FROM pb LEFT JOIN m USING (r, bucket)
       |GROUP BY item ORDER BY item""".stripMargin
  }

  /** Oracle for text_tfidf: identical tf/df counts and the same exact
    * integer-division idf.
    */
  private lazy val TFIDF_SQL: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |              FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT t.doc_id, t.tok, t.tf, d.df,
      |  t.tf * ((n.n * 1000000) // d.df) AS score_e6
      |FROM tf t JOIN df d USING (tok) CROSS JOIN n
      |ORDER BY doc_id, tok""".stripMargin

  /** Oracle for text_cms_heavy_hitters: same matrix as CMS_SQL, probes =
    * the distinct token set, same min-over-rows estimate, φ = 1/32 of the
    * stream length as the support threshold.
    */
  private lazy val CMS_HH_SQL: String =
    s"""WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |              FROM documents),
       |tk AS (SELECT tok FROM toks WHERE tok <> ''),
       |tr AS (SELECT tok, unnest([0, 1, 2, 3]) AS r FROM tk),
       |tb AS (SELECT r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT r, md5(CAST(r AS VARCHAR) || '#' || tok) AS mh FROM tr)),
       |m AS (SELECT r, bucket, count(*) AS cnt FROM tb GROUP BY r, bucket),
       |pe AS (SELECT item, unnest([0, 1, 2, 3]) AS r
       |       FROM (SELECT DISTINCT tok AS item FROM tk)),
       |pb AS (SELECT item, r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT item, r, md5(CAST(r AS VARCHAR) || '#' || item) AS mh FROM pe)),
       |est AS (SELECT item, CAST(min(COALESCE(m.cnt, 0)) AS BIGINT) AS est_count
       |        FROM pb LEFT JOIN m USING (r, bucket) GROUP BY item)
       |SELECT item, est_count FROM est
       |WHERE est_count >= (SELECT count(*) FROM tk) / 32.0
       |ORDER BY item""".stripMargin

  /** Oracle for dedup_cc_labels: the same simhash pair set, components via
    * a recursive transitive-closure CTE, label = least(self, min reachable),
    * isolated docs labeled with themselves.
    */
  /** Shared recursive-CTE prelude: simhash pairs → transitive closure →
    * per-node min-label `lbl(id, component)`.
    */
  private lazy val CC_CTES: String =
    s"""WITH RECURSIVE $SIMHASH_CTES,
       |prs AS (SELECT a.id AS id_a, b.id AS id_b
       |        FROM sigd a JOIN sigd b ON a.id < b.id
       |        WHERE $simhashHamSql <= 3),
       |edges AS (SELECT id_a AS a, id_b AS b FROM prs
       |          UNION SELECT id_b, id_a FROM prs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)""".stripMargin

  private lazy val CC_SQL: String =
    s"""$CC_CTES
       |SELECT d.doc_id AS id, COALESCE(l.component, d.doc_id) AS component
       |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
       |ORDER BY id""".stripMargin

  /** Oracle for dedup_cc_keep: the docs whose id IS their component's
    * minimum label — exactly one survivor per transitive cluster.
    */
  private lazy val CC_KEEP_SQL: String =
    s"""$CC_CTES
       |SELECT d.doc_id, d.lang
       |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
       |WHERE COALESCE(l.component, d.doc_id) = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Oracle for text_stats — mirrors TextStats.documentStats op-for-op. */
  private lazy val TEXT_STATS_SQL: String =
    s"WITH $TEXT_STATS_CTES\nSELECT * FROM stats ORDER BY doc_id"

  /** Oracle for text_curation_chain: stats CTEs + simhash CTEs composed —
    * language/quality filter, min-id dedup on the content fingerprint,
    * near-dup drop of every pair's greater id (restricted to surviving
    * docs on both sides; per-doc signatures are corpus-independent so
    * computing them over all documents and restricting the pairs is
    * equivalent), then the salted-md5 split.
    */
  private lazy val CURATION_SQL: String =
    s"""WITH $TEXT_STATS_CTES,
       |$SIMHASH_CTES,
       |fl AS (SELECT doc_id, lang_guess, quality_e6, fp FROM stats
       |       WHERE lang_guess IN ('en') AND quality_e6 >= 650000),
       |kp AS (SELECT min(doc_id) AS doc_id FROM fl GROUP BY fp),
       |surv AS (SELECT fl.* FROM fl JOIN kp USING (doc_id)),
       |prs AS (SELECT b.id AS id_b
       |        FROM sigd a JOIN sigd b ON a.id < b.id
       |        JOIN surv sa ON sa.doc_id = a.id
       |        JOIN surv sb ON sb.doc_id = b.id
       |        WHERE $simhashHamSql <= 3),
       |fin AS (SELECT s.doc_id, s.lang_guess, s.quality_e6 FROM surv s
       |        LEFT JOIN (SELECT DISTINCT id_b FROM prs) p ON p.id_b = s.doc_id
       |        WHERE p.id_b IS NULL)
       |SELECT doc_id, lang_guess, quality_e6,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM fin ORDER BY doc_id""".stripMargin

  /** The documentStats computation as reusable CTEs ending in
    * `stats(doc_id, …, quality_e6, lang_guess, fp)` — shared by the
    * text_stats oracle and the curation chain.
    */
  private lazy val TEXT_STATS_CTES: String = {
    val stop = sqlList(TextStats.enStopwords)
    val en = sqlList(TextStats.langVocab("en"))
    val de = sqlList(TextStats.langVocab("de"))
    val fr = sqlList(TextStats.langVocab("fr"))
    val es = sqlList(TextStats.langVocab("es"))
    s"""base AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
       |    length(text) AS n_chars_computed,
       |    length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS words
       |  FROM documents
       |),
       |ratios AS (
       |  SELECT *,
       |    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(len(list_filter(words, w -> list_contains($stop, w))) AS DOUBLE) / n_tokens END AS stopword_ratio,
       |    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_tokens END AS mean_word_len,
       |    len(list_filter(words, w -> list_contains($en, w))) AS h_en,
       |    len(list_filter(words, w -> list_contains($de, w))) AS h_de,
       |    len(list_filter(words, w -> list_contains($es, w))) AS h_es,
       |    len(list_filter(words, w -> list_contains($fr, w))) AS h_fr
       |  FROM base
       |),
       |scored AS (
       |  SELECT *,
       |    least(CAST(n_chars_computed AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
       |    + least(stopword_ratio * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
       |    + (CASE WHEN mean_word_len >= CAST(3.0 AS DOUBLE) AND mean_word_len <= CAST(10.0 AS DOUBLE)
       |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * CAST(0.2 AS DOUBLE)
       |    + greatest(CAST(0.0 AS DOUBLE),
       |        CAST(0.2 AS DOUBLE)
       |        - (CASE WHEN n_chars_computed = 0 THEN CAST(0.0 AS DOUBLE)
       |                ELSE CAST(n_punct AS DOUBLE) / n_chars_computed END)
       |        - (CASE WHEN n_chars_computed = 0 THEN CAST(0.0 AS DOUBLE)
       |                ELSE CAST(n_digits AS DOUBLE) / n_chars_computed END)) AS quality,
       |    greatest(h_en, h_de, h_es, h_fr) AS h_max
       |  FROM ratios
       |),
       |stats AS (
       |  SELECT doc_id, n_tokens, n_subwords, n_chars_computed, n_punct, n_digits,
       |    CAST(floor(stopword_ratio * 1000000) AS BIGINT) AS stopword_ratio_e6,
       |    CAST(floor(mean_word_len * 1000000) AS BIGINT) AS mean_word_len_e6,
       |    CAST(floor(quality * 1000000) AS BIGINT) AS quality_e6,
       |    CASE WHEN h_max = 0 THEN 'und'
       |         WHEN h_en = h_max THEN 'en'
       |         WHEN h_de = h_max THEN 'de'
       |         WHEN h_es = h_max THEN 'es'
       |         ELSE 'fr' END AS lang_guess,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM scored
       |)""".stripMargin
  }

  /** Oracle for dedup_jaccard_pairs — replicates the symmetric
    * (lang, length-bucket ±1) blocking exactly.
    */
  private lazy val JACCARD_SQL: String =
    """WITH b AS (
      |  SELECT doc_id AS id, text AS t, lang,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 64) AS BIGINT) AS lb,
      |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS ws
      |  FROM documents
      |),
      |p AS (SELECT id, lang, ws, unnest([lb, lb + 1]) AS lb FROM b),
      |pairs AS (
      |  SELECT least(x.id, y.id) AS id_a, greatest(x.id, y.id) AS id_b,
      |    CAST(len(list_intersect(x.ws, y.ws)) AS DOUBLE)
      |      / (len(x.ws) + len(y.ws) - len(list_intersect(x.ws, y.ws))) AS j
      |  FROM b x JOIN p y ON x.lang = y.lang AND x.lb = y.lb AND x.id <> y.id
      |),
      |agg AS (SELECT id_a, id_b, max(j) AS j FROM pairs GROUP BY id_a, id_b)
      |SELECT id_a, id_b, CAST(floor(j * 1000000) AS BIGINT) AS jaccard_e6
      |FROM agg WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** name → query fn, for SparkEntry. */
  lazy val queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** name → oracle SQL (only SQL-expressible entries). */
  lazy val oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** headline queries for Bench. */
  lazy val benchSet: Vector[Q] = all.filter(_.bench)
}
