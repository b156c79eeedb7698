package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom Catalyst expression standing in for python unidecode
  * (reference: scripts/extract.py:45).
  */
class TransliterateSpec extends SparkSpec {
  import spark.implicits._

  test("strips the full Czech diacritic alphabet, both cases") {
    assert(Transliterate.strip("áčďéěíňóřšťúůýž") == "acdeeinorstuuyz")
    assert(Transliterate.strip("ÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ") == "ACDEEINORSTUUYZ")
  }

  test("reference example: listing header") {
    assert(Transliterate.strip("Pronájem bytu, Hlavní město Praha")
      == "Pronajem bytu, Hlavni mesto Praha")
  }

  test("ASCII passes through unchanged; empty stays empty") {
    assert(Transliterate.strip("Prodej bytu, 2+kk") == "Prodej bytu, 2+kk")
    assert(Transliterate.strip("") == "")
  }

  test("column form: codegen path, null-safe") {
    val out = Seq(Some("Plzeňský kraj"), None).toDF("s")
      .select(Transliterate(col("s")).as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("Plzensky kraj"), None))
  }

  test("matches DuckDB strip_accents semantics on NBSP (kept, not stripped)") {
    // U+00A0 is not a combining mark — both engines must keep it.
    assert(Transliterate.strip("5 000") == "5 000")
  }
}
