package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.schema.PropertySchema

/** Pure `Column` functions for every scalar/string operation in the
  * reference's transform stage (SURVEY.md §2.7–2.9). All of these compile to
  * built-in Catalyst expressions (whole-stage-codegen'd); none are UDFs.
  */
object Parse {

  /** Normalize non-breaking spaces to plain spaces
    * (reference: scripts/transform.py:63).
    */
  def normalizeNbsp(c: Column): Column = translate(c, " ", " ")

  /** "12 500 Kc" → 12500: strip every non-digit, cast to long. Mirrors the
    * digits-only parse at scripts/transform.py:68 but in one codegen'd
    * expression; LongType guards against overflow on pathological inputs
    * (SURVEY.md §7.5). `try_cast` (not `cast`) so an empty-after-strip
    * string yields NULL under Spark 4's default ANSI mode instead of
    * raising CAST_INVALID_INPUT.
    */
  def digitsToLong(c: Column): Column =
    graft.expr.DigitsOnly(c).try_cast("long")

  /** "75 m2" → 75, missing/garbage → 0. Mirrors
    * scripts/transform.py:76-78 (strip 'm2', to_numeric(coerce), fillna(0)).
    * ANSI-safe: try_cast coerces malformed input to NULL like pandas
    * to_numeric(errors='coerce'), then fillna(0).
    */
  def sizeToInt(c: Column): Column =
    coalesce(graft.expr.DigitsOnly(replace(c, lit("m2"), lit("")))
      .try_cast("int"), lit(0))

  /** Last two whitespace-separated words, trailing comma stripped; ''
    * when there are fewer than two words (reference closure
    * `extract_last_two_words`, scripts/transform.py:81-87, which returns
    * '' in its `else` branch). The start index is computed as
    * max(n-1, 1) rather than a negative slice because `slice(arr, -2, 2)`
    * returns [] for 1-element arrays; the <2-word case is handled by a
    * slice length of 0.
    */
  def lastTwoWords(c: Column): Column = {
    val words = split(trim(c), "\\s+")
    val len = when(size(words) >= 2, lit(2)).otherwise(lit(0))
    rtrim(array_join(
      slice(words, greatest(size(words) - 1, lit(1)), len), " "), ",")
  }

  /** Everything except the last two words, trailing comma/space stripped —
    * the address rewrite when a region tail is present
    * (scripts/transform.py:91).
    */
  def dropLastTwoWords(c: Column): Column = {
    val words = split(trim(c), "\\s+")
    val keep = greatest(size(words) - 2, lit(0))
    rtrim(rtrim(array_join(slice(words, lit(1), keep), " ")), ",")
  }

  /** Region derivation (scripts/transform.py:90): if the address mentions
    * "kraj" (case-insensitive), the region is its last two words; otherwise
    * the listing is in Praha.
    */
  def regionOf(address: Column): Column =
    when(lower(address).contains("kraj"), lastTwoWords(address))
      .otherwise(lit("Praha"))

  /** Address rewrite (scripts/transform.py:91): strip the region tail when
    * present.
    */
  def addressWithoutRegion(address: Column): Column =
    when(lower(address).contains("kraj"), dropLastTwoWords(address))
      .otherwise(address)

  /** ceil(price/size) as nullable int, NULL when size = 0 — collapses the
    * reference's four-step nan/fillna/ceil/replace dance
    * (scripts/transform.py:96-102) into one `when` without `otherwise`.
    */
  def pricePerM2(price: Column, size: Column): Column =
    when(size =!= 0, ceil(price.cast("double") / size).try_cast("int"))

  /** Regex alternation over a keyword list — pandas
    * `str.contains('|'.join(kws))` (scripts/transform.py:72-73). The
    * reference keywords contain no regex metacharacters (SURVEY.md §7.5),
    * but quote defensively anyway.
    */
  def containsAny(c: Column, keywords: Seq[String]): Column =
    c.rlike(keywords.map(java.util.regex.Pattern.quote).mkString("|"))

  /** Rent-sanity drop predicate (keep-form), scripts/transform.py:72. */
  def keepRentSane(purpose: Column, price: Column): Column =
    !(containsAny(purpose, PropertySchema.rentKeywords) && price <= 1000)

  /** Sale-sanity drop predicate (keep-form), scripts/transform.py:73. */
  def keepSaleSane(purpose: Column, price: Column): Column =
    !(containsAny(purpose, PropertySchema.saleKeywords) && price <= 20000)

  /** Land price-per-m2 cap (keep-form), scripts/transform.py:103. NULL
    * price_per_m2 must be kept: in pandas `None > 80000` is False so the
    * row survives; in SQL the comparison is NULL → wrap with coalesce.
    */
  def keepLandCap(purpose: Column, ppm2: Column): Column =
    !(purpose.contains("Prodej pozemku") && coalesce(ppm2 > 80000, lit(false)))

  /** Filename from an object key: "a/b/c.csv" → "c.csv"
    * (scripts/transform.py:112).
    */
  def baseName(c: Column): Column = substring_index(c, "/", -1)

  /** Canonical URL form for crawl dedup — the link-dedup key the
    * reference's keep-first rule (scripts/transform.py:62) SHOULD use once
    * links come from more than one crawl session: the same listing fetched
    * as `HTTP://WWW.Example.com/x/?utm_source=feed#top` and
    * `https://example.com/x` must collapse to one key.
    *
    * Steps (each a codegen'd builtin; every regex is RE2-safe — no
    * lookaround — so any engine replays it):
    *  1. drop the fragment (`#...`);
    *  2. lowercase the scheme+host head and strip a leading `www.`
    *     (path/query case is preserved — it is significant);
    *  3. split at the FIRST `?` and drop tracking params (`utm_*`,
    *     `gclid`, `fbclid`) from the query side only — a literal `&`
    *     in a query-less path survives untouched, and the path/query
    *     boundary never moves (a literal `?` inside a query value is
    *     still not survived: the first `?` wins);
    *  4. drop trailing slashes on the path and any empty leftover query.
    *
    * Scheme-less inputs (relative links) pass through steps 1, 3, 4
    * unchanged by step 2 (the head extract matches nothing). Narrow,
    * shuffle-free; feed the result to exactDedupByKey / min_by for the
    * actual dedup.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val head = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = substring(noFrag, length(head) + 1, lit(Int.MaxValue))
    val hostNorm = concat(
      regexp_replace(lower(head), "://www\\.", "://"), rest)
    // split at the FIRST '?' — positional, so a literal '&' in a
    // query-less path is never rewritten and the path/query boundary
    // never shifts ('/a&b' stays '/a&b'; '/a&b?q=1' keeps its '?')
    val qpos = instr(hostNorm, "?")
    val path = when(qpos > 0, substring(hostNorm, lit(1), qpos - 1))
      .otherwise(hostNorm)
    val rawQuery = substring(hostNorm, qpos + 1, lit(Int.MaxValue))
    // separator-anchored tracking strip: a '&' sentinel prefix makes every
    // param '&'-led, so one RE2-safe pattern drops a param at any position
    val stripped = regexp_replace(concat(lit("&"), rawQuery),
      "&(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*", "")
    val cleanQuery = regexp_replace(stripped, "^&", "")
    val restored = when(qpos > 0 && length(cleanQuery) > 0,
      concat(path, lit("?"), cleanQuery)).otherwise(path)
    regexp_replace(
      regexp_replace(regexp_replace(restored, "/+\\?", "?"), "/+$", ""),
      "[?&]+$", "")
  }
}
