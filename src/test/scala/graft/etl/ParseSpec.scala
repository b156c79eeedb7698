package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for every scalar op in the transform chain (SURVEY.md §2.7-2.8).
  * Golden values trace to /root/reference/scripts/transform.py semantics.
  */
class ParseSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  private def evalStr(in: String, f: Column => Column): String =
    Seq(in).toDF("s").select(f(col("s")).as("r")).collect()(0).getAs[String]("r")

  test("digitsToLong parses noisy price strings (transform.py:67-68)") {
    val df = Seq("12 500 Kc", "5 000 000 Kc", "", "abc", "900")
      .toDF("s").select(Parse.digitsToLong(col("s")).as("r"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(12500L), Some(5000000L), None, None, Some(900L)))
  }

  test("sizeToInt strips m2, coerces, 0-fills (transform.py:76-78)") {
    val df = Seq("75 m2", "", "garbage", "120m2")
      .toDF("s").select(Parse.sizeToInt(col("s")).as("r"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(75, 0, 0, 120))
  }

  test("lastTwoWords + rstrip ',' (transform.py:81-87)") {
    assert(evalStr("Namesti Svobody 5, Brno, Jihomoravsky kraj", Parse.lastTwoWords)
      == "Jihomoravsky kraj")
    assert(evalStr("a b,", Parse.lastTwoWords) == "a b")
    // <2 words: the reference's extract_last_two_words else-branch returns ''
    assert(evalStr("word", Parse.lastTwoWords) == "")
    assert(evalStr("  word  ", Parse.lastTwoWords) == "")
  }

  test("dropLastTwoWords strips region tail + trailing comma (transform.py:91)") {
    assert(evalStr("Namesti Svobody 5, Brno, Jihomoravsky kraj", Parse.dropLastTwoWords)
      == "Namesti Svobody 5, Brno")
    assert(evalStr("a b", Parse.dropLastTwoWords) == "")
  }

  test("regionOf: kraj tail → last two words, else Praha (transform.py:90)") {
    assert(evalStr("Dlouha 7, Jihlava, Kraj Vysocina", Parse.regionOf) == "Kraj Vysocina")
    assert(evalStr("Vinohradska 12, Praha", Parse.regionOf) == "Praha")
    // case-insensitive 'kraj' test
    assert(evalStr("X, Y, Moravskoslezsky KRAJ", Parse.regionOf) == "Moravskoslezsky KRAJ")
    // 1-word kraj address: extract_last_two_words returns '' (whitelist
    // later drops it either way, but the intermediate must match exactly)
    assert(evalStr("Stredoceskykraj", Parse.regionOf) == "")
  }

  test("pricePerM2: ceil(price/size), NULL when size=0 (transform.py:96-102)") {
    val df = Seq((5000000L, 80), (900L, 200), (1000L, 0))
      .toDF("p", "s").select(Parse.pricePerM2(col("p"), col("s")).as("r"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(62500), Some(5), None))
  }

  test("rent-sanity keyword list matches the reference exactly (transform.py:69)") {
    val kept = Seq(
      ("Pronajem domu", 900L),            // in ref list, cheap → DROP
      ("Pronajem chaty, chalupy", 900L),  // in ref list, cheap → DROP
      ("Pronajem garaze", 900L),          // NOT in ref list → KEEP (r1 bug)
      ("Pronajem garazoveho stani", 900L),// NOT in ref list → KEEP (r1 bug)
      ("Pronajem domu", 1001L),           // above threshold → KEEP
      ("Pronajem kancelare", 1000L)       // at threshold → DROP (<= 1000)
    ).toDF("purpose", "price")
      .filter(Parse.keepRentSane(col("purpose"), col("price")))
      .collect().map(_.getString(0)).toSeq
    assert(kept == Seq("Pronajem garaze", "Pronajem garazoveho stani", "Pronajem domu"))
  }

  test("sale-sanity keyword list matches the reference exactly (transform.py:70)") {
    val kept = Seq(
      ("Prodej chaty, chalupy", 15000L),   // in ref list, cheap → DROP
      ("Prodej garazoveho stani", 15000L), // NOT in ref list → KEEP (r1 bug)
      ("Prodej bytu", 20000L),             // at threshold → DROP (<= 20000)
      ("Prodej bytu", 20001L)              // above → KEEP
    ).toDF("purpose", "price")
      .filter(Parse.keepSaleSane(col("purpose"), col("price")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(kept == Seq(("Prodej garazoveho stani", 15000L), ("Prodej bytu", 20001L)))
  }

  test("land cap keeps NULL price_per_m2 rows (pandas None>80000 ≡ False)") {
    val kept = Seq(
      ("Prodej pozemku", Some(90000)), // over cap → DROP
      ("Prodej pozemku", Some(80000)), // at cap (not >) → KEEP
      ("Prodej pozemku", None),        // NULL ppm2 → KEEP
      ("Prodej bytu", Some(90000))     // not pozemek → KEEP
    ).toDF("purpose", "ppm2")
      .filter(Parse.keepLandCap(col("purpose"), col("ppm2")))
      .count()
    assert(kept == 3)
  }

  test("AddressParts matches regionOf + addressWithoutRegion") {
    val addrs = Seq(
      "Vinohradská 12, Praha",
      "Náměstí Svobody 5, Brno, Jihomoravský kraj",
      "Dlouhá 7, Jihlava, Kraj Vysočina",
      "X, Y, Moravskoslezsky KRAJ",
      "a b, kraj",
      "kraj word",
      "Stredoceskykraj", // single word containing kraj — reference yields ''
      "  spaced , Olomoucky kraj  ").toDF("a")
    val both = addrs.select(
        graft.expr.AddressParts(col("a")).as("__ap"),
        Parse.regionOf(col("a")).as("ref_region"),
        Parse.addressWithoutRegion(col("a")).as("ref_address"))
      .select(col("__ap.region"), col("__ap.address"),
        col("ref_region"), col("ref_address"))
      .collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"region: $r")
      assert(r.getString(1) == r.getString(3), s"address: $r")
    }
  }

  test("baseName: substring after last '/' (transform.py:112)") {
    assert(evalStr("raw_data/to_process/raw_x.csv", Parse.baseName) == "raw_x.csv")
    assert(evalStr("no_slash.csv", Parse.baseName) == "no_slash.csv")
  }

  test("normalizeNbsp replaces U+00A0 with a plain space (transform.py:63)") {
    assert(evalStr("5 000", Parse.normalizeNbsp) == "5 000")
  }

  test("normalizeUrl collapses crawl noise to one canonical key") {
    def n(u: String): String = evalStr(u, Parse.normalizeUrl)
    // the motivating pair: every kind of noise at once vs the clean form
    assert(n("HTTP://WWW.Example.com/x/?utm_source=feed#top") == "http://example.com/x")
    assert(n("https://example.com/x") == "https://example.com/x")
    // scheme+host lowercased, path case preserved
    assert(n("HTTPS://Example.COM/Path/File") == "https://example.com/Path/File")
    // real params survive in order; tracking params vanish anywhere
    assert(n("https://a.com/p?page=2&utm_medium=email") == "https://a.com/p?page=2")
    assert(n("https://a.com/p?utm_a=1&q=2&fbclid=x&r=3") == "https://a.com/p?q=2&r=3")
    // all-tracking query disappears entirely, with its trailing slash
    assert(n("https://a.com/p/?utm_a=1&gclid=2") == "https://a.com/p")
    // fragment-only and root-slash cases
    assert(n("https://a.com/#frag") == "https://a.com")
    // scheme-less relative links: path rules still apply, no case change
    assert(n("/Nemovitosti/123/?utm_x=1") == "/Nemovitosti/123")
    // www in the PATH is not stripped; www host without scheme untouched
    assert(n("https://a.com/www.b/") == "https://a.com/www.b")
  }

  test("normalizeUrl never rewrites a literal '&' in the path (r5 ADVICE)") {
    def n(u: String): String = evalStr(u, Parse.normalizeUrl)
    // query-less path with '&': untouched — NOT collapsed onto '?' forms
    assert(n("https://a.com/x&y") == "https://a.com/x&y")
    assert(n("https://a.com/x&y") != n("https://a.com/x?y"))
    // path '&' plus a real query: the boundary stays at the first '?'
    assert(n("https://a.com/a&b?q=1") == "https://a.com/a&b?q=1")
    // path '&' plus an all-tracking query: query vanishes, path intact
    assert(n("https://a.com/a&b?utm_a=1&gclid=2") == "https://a.com/a&b")
    // tracking strip still works in any position after the boundary
    assert(n("https://a.com/a&b?utm_a=1&q=2") == "https://a.com/a&b?q=2")
  }
}
