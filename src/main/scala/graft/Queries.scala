package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DashQueries, DedupQueries, EtlQueries, EventQueries,
  Fixtures, GraphQueries, JoinQueries, SimQueries, TextQueries}

/** The driver-checked query registry: one named query per SURVEY.md §2
  * operator (plus the LLM-pipeline operators), each with an equivalent
  * DuckDB oracle where the semantics are ANSI-SQL-expressible.
  *
  * Rows live in the per-domain registrars under [[graft.queries]]
  * (etl / dash+agg+setop / join / event / text / dedup / sim+mm); this
  * hub concatenates them and exposes the driver-facing maps.
  *
  * Determinism contract (SURVEY.md §7.5): every compared query ends in an
  * explicit ORDER BY over a unique key; doubles are emitted as fixed-point
  * `*_e6` longs and money as exact cents (see graft.util.Num); timestamps
  * are formatted to strings. Column names are aliased identically in the
  * Spark and SQL forms — the driver sorts columns by name before hashing.
  */
object Queries {

  /** Alias of [[graft.queries.Q]] — the pre-split external surface. */
  type Q = graft.queries.Q
  val Q = graft.queries.Q

  /** See [[graft.queries.Fixtures.eventsTable]]. */
  def eventsTable(spark: SparkSession, dir: String): DataFrame =
    Fixtures.eventsTable(spark, dir)

  /** Spark form of the full chain (the flagship query). */
  def transformChain(spark: SparkSession, dir: String): DataFrame =
    Fixtures.transformChain(spark, dir)

  val all: Vector[Q] =
    EtlQueries.qs ++ DashQueries.qs ++ JoinQueries.qs ++ EventQueries.qs ++
      TextQueries.qs ++ DedupQueries.qs ++ SimQueries.qs ++ GraphQueries.qs

  lazy val queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val benchSet: Vector[Q] = all.filter(_.bench)
}
