package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial operators. */
object Spatial {

  /** Spatial radius self-join via grid bucketing — the classic
    * cell-partitioned spatial join: cell side = radius, the LEFT side
    * exploded to its 3×3 neighbor cells and equi-joined on the cell key,
    * then the exact squared-distance filter. Each unordered pair survives
    * exactly once (b's cell is hit once by a's expansion; a_id < b_id
    * keeps one orientation).
    *
    * The scale story: candidate pairs are O(n · local density), an
    * EQUI-join on cell keys the planner can shuffle-partition — vs the
    * brute-force O(n²) all-pairs DEFINITION the oracles hash-check
    * against. At 100 TB the cell key partitions the world; a hot cell
    * (dense city, clustered corpus) is ordinary AQE skew-join territory —
    * a claim MEASURED by AqeSkewSpec on this exact operator, not assumed.
    *
    * @param pts      (id, x, y) integer points
    * @param radius   search radius; also the grid cell side
    * @param pinMerge pin the cell join to sort-merge — used where the
    *                 skew behavior itself is under test at small SF
    *                 (auto-broadcast of the small side would erase the
    *                 shuffle whose skew is being measured, exactly the
    *                 join_skew_stress convention)
    * @return (a_id, b_id, dist2) for every pair with dist² ≤ radius²
    */
  def gridRadiusJoin(pts: DataFrame, radius: Long,
      pinMerge: Boolean = false): DataFrame = {
    // Cell key is FLOOR division, not DIV: DIV truncates toward zero, so
    // with signed coordinates the two cells adjacent to the origin would
    // fuse into one 2·radius−1-wide cell — still correct (every cell
    // ≥ radius wide keeps the 3×3 expansion exhaustive) but it breaks the
    // uniform-cell density/skew properties the fixtures and AqeSkewSpec
    // reason about. (x − pmod(x, r)) DIV r is exact integer floor-div
    // with no branch: pmod ∈ [0, r) makes the numerator a multiple of r.
    val p = pts.select(col("id").cast("long"),
        col("x").cast("long"), col("y").cast("long"))
      .withColumn("cx", expr(s"(x - pmod(x, $radius)) DIV $radius"))
      .withColumn("cy", expr(s"(y - pmod(y, $radius)) DIV $radius"))
    val offs = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val a = p.select(col("id").as("a_id"), col("x").as("ax"),
        col("y").as("ay"), col("cx"), col("cy"))
      .withColumn("o", explode(offs))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("jx"),
        (col("cy") + col("o.dy")).as("jy"))
    val b0 = p.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("byy"), col("cx").as("jx"), col("cy").as("jy"))
    val b = if (pinMerge) b0.hint("merge") else b0
    a.join(b, Seq("jx", "jy"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx"))
          + (col("ay") - col("byy")) * (col("ay") - col("byy")))
      .filter(col("dist2") <= radius * radius)
      .select("a_id", "b_id", "dist2")
  }
}
