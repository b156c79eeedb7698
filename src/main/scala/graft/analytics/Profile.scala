package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-format column profiling — the data-quality summary every ingest
  * pipeline runs before trusting a batch (the `df.describe()` surface of
  * the reference's pandas world, re-expressed as an engine operator with
  * exact answers): one output row per profiled column with row count,
  * null count, exact distinct count, and min/max rendered as strings.
  *
  * (The reference eyeballs frames ad hoc between transform steps —
  * scripts/transform.py:141-154 keeps no systematic per-column stats;
  * this operator is that missing audit artifact.)
  *
  * Scale shape: one aggregation PER COLUMN, each over a projection of
  * only that column — columnar parquet scans read just the profiled
  * column per branch, every branch is map-side partially aggregated
  * (including the exact distinct, which Spark expands to a two-stage
  * partial-distinct aggregate), and the tiny 1-row results union on the
  * driver-free side. No branch ever carries the full row width, so the
  * profile costs O(profiled columns) narrow scans, not O(1) wide one —
  * the right trade at 100 TB where a wide scan decompresses every column.
  * Callers pre-project non-portable types (doubles to fixed-point,
  * timestamps through date_format) so the string rendering of min/max is
  * engine-exact.
  */
object Profile {

  /** Profile `cols` of `df` (all must exist). Output columns:
    * col_name, n, n_null, n_distinct (exact, nulls excluded), min_s,
    * max_s (CAST to string; null when the column is all-null).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_s"),
          max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.unionAll(_))
  }

  /** Order-independent per-group table fingerprint — the anti-entropy
    * digest for comparing two copies of a table (a replica, a migrated
    * load, yesterday's snapshot) WITHOUT sorting either side: each row is
    * rendered canonically, hashed (md5 head-32, the engine-portable hash
    * the sketch family uses), and the hashes are SUMMED per group — in two
    * 16-bit lanes (hi/lo halves of the 32-bit hash summed separately), so
    * each accumulator provably fits a long for any group under 2^47 rows
    * (~1.4e14; a 32-bit single-lane sum would wrap silently past ~2^31
    * rows — exactly the scale the digest exists to serve). Sum and count
    * are commutative, so the digest is independent of row order and
    * partitioning, map-side combinable, and two tables agree iff every
    * (group, n_rows, hash_sum_hi, hash_sum_lo) row matches — one narrow
    * scan per side, no shuffle of the data itself, no sort at any scale.
    *
    * Canonical rendering: each column CAST to string, NULL replaced by the
    * \u0002 sentinel, columns joined by \u0001 — positional, so
    * (a, NULL) never collides with (NULL, a). Callers pre-project
    * non-portable types (doubles to fixed-point, timestamps through
    * date_format), same contract as [[profile]]. The separators are
    * control characters no sane text column contains; a column that CAN
    * contain them needs its own escaping before the call.
    */
  def fingerprint(df: DataFrame, group: Column, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val parts = cols.map(c => coalesce(c.cast("string"), lit("\u0002")))
    val canonical = concat(
      parts.flatMap(p => Seq(p, lit("\u0001"))).dropRight(1): _*)
    val h = Sketch.hashPoint32(canonical)
    df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(shiftright(h, 16)).as("hash_sum_hi"),
        sum(h.bitwiseAND(lit(0xFFFFL))).as("hash_sum_lo"))
  }
}
