package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One query-registry row. `bench=true` marks the headline set Bench runs
  * at sf0.1 (oracle-only O(n²) paths and micro-op queries stay out of it).
  * Top-level (not nested in Queries) so the domain registrars can build
  * rows without touching the hub object; `Queries.Q` aliases it for the
  * external surface.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
