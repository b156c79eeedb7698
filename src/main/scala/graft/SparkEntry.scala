package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's full 13-step
    * transform chain (scripts/transform.py:24-120) over a deterministic
    * raw-property frame derived from lineitem — exercises transliteration,
    * dedup, every filter, every derivation, and the canonical projection.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.transformChain(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ LLM ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (hash-
    * dependent LSH/simhash signatures, the stubbed media decode) — the
    * driver records a weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] = Queries.oracleMap
}
