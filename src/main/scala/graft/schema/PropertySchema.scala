package graft.schema

import org.apache.spark.sql.types._

/** Domain schema of the reference engine's single table.
  *
  * Raw (as-scraped) stage: six string columns (reference:
  * scripts/extract.py:24-44 builds them positionally). Transformed stage:
  * ten columns in a fixed order (scripts/transform.py:115-116), with types
  * as declared for the DB sink (scripts/load_db.py:35-46) — except we make
  * `price_per_m2` a first-class nullable INT instead of the reference's
  * object-dtype hack, and we do NOT replicate the `price_for_m2` typo bug
  * (scripts/load_db.py:42).
  */
object PropertySchema {

  /** Pre-transform schema: everything a string, exactly as scraped. */
  val raw: StructType = StructType(Seq(
    StructField("purpose", StringType),
    StructField("address", StringType),
    StructField("size_m2", StringType),
    StructField("design", StringType),
    StructField("price_czk", StringType),
    StructField("link", StringType)
  ))

  /** Post-transform schema, canonical 10-column order
    * (scripts/transform.py:115-116).
    */
  val transformed: StructType = StructType(Seq(
    StructField("purpose", StringType),
    StructField("address", StringType),
    StructField("region", StringType),
    StructField("size_m2", IntegerType, nullable = false),
    StructField("design", StringType),
    StructField("price_czk", LongType, nullable = false),
    StructField("price_per_m2", IntegerType, nullable = true),
    StructField("link", StringType),
    StructField("dump_date", StringType),
    StructField("file_name", StringType)
  ))

  /** The 14-region whitelist (scripts/transform.py:26-41), post-unidecode
    * spelling (the reference transliterates at extract time,
    * scripts/extract.py:45, so the whitelist is already ASCII).
    */
  val czechRegions: Seq[String] = Seq(
    "Praha",
    "Stredocesky kraj",
    "Jihocesky kraj",
    "Plzensky kraj",
    "Karlovarsky kraj",
    "Ustecky kraj",
    "Liberecky kraj",
    "Kralovehradecky kraj",
    "Pardubicky kraj",
    "Kraj Vysocina",
    "Jihomoravsky kraj",
    "Olomoucky kraj",
    "Zlinsky kraj",
    "Moravskoslezsky kraj"
  )

  /** Rent-sanity keyword list (scripts/transform.py:44-50; duplicated at
    * transform.py:69). Matched as regex alternation by pandas str.contains.
    */
  val rentKeywords: Seq[String] = Seq(
    "Pronajem kancelare",
    "Pronajem nebytoveho prostoru",
    "Pronajem chaty, chalupy",
    "Pronajem domu",
    "Pronajem pozemku"
  )

  /** Sale-sanity keyword list (scripts/transform.py:52-60; duplicated at
    * transform.py:70).
    */
  val saleKeywords: Seq[String] = Seq(
    "Prodej bytu",
    "Prodej domu",
    "Prodej nebytoveho prostoru",
    "Prodej pozemku",
    "Prodej chaty, chalupy",
    "Prodej garaze",
    "Prodej kancelare"
  )
}

/** Typed row for the transformed stage — used in typed Dataset tests. */
final case class Property(
    purpose: String,
    address: String,
    region: String,
    size_m2: Int,
    design: String,
    price_czk: Long,
    price_per_m2: Option[Int],
    link: String,
    dump_date: String,
    file_name: String
)
