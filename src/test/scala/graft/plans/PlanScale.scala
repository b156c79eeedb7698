package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Shared scale-classification helpers for the plan-shape tests — ONE
  * definition of "bounded independent of the scale factor", used by both
  * the targeted pins (PlanShapeSpec) and the registry-wide lint
  * (RegistryPlanLintSpec), so the two can never drift apart in semantics.
  */
object PlanScale {

  /** Parquet tables that grow with the scale factor. */
  val factPaths: Seq[String] = Seq("/customer.parquet", "/part.parquet",
    "/orders.parquet", "/lineitem.parquet", "/events.parquet",
    "/documents.parquet", "/embeddings.parquet")

  /** Is this subtree's row count bounded independent of the scale factor?
    * STRICT: only a no-grouping Aggregate (1 row), a Limit, a Sample, or
    * a local/range relation qualifies — a KEYED aggregate's cardinality
    * grows with its key's cardinality and is NOT bounded (neither is a
    * top-k-per-group, whose row count is k × #groups).
    */
  def bounded(p: LogicalPlan): Boolean = p.collectFirst {
    case a: Aggregate if a.groupingExpressions.isEmpty => ()
    case _: GlobalLimit => ()
    case _: Sample => ()
    case _: LocalRelation => ()
    case _: OneRowRelation => ()
    case _: Range => ()
  }.isDefined

  /** Unbounded fact data: the subtree scans a table that grows with the
    * scale factor and nothing above the scan bounds its row count. Small
    * derived artifacts (codebooks, centroid tables, LUTs) read from
    * non-fact parquet paths are bounded by construction.
    */
  def factUnbounded(p: LogicalPlan): Boolean =
    factPaths.exists(p.toString.contains) && !bounded(p)

  /** Subtrees under an explicit broadcast/join hint whose data is
    * unbounded fact data — the hint that auto-broadcasts fine at test SF
    * but forces a multi-GB build side at 100 TB. Empty = clean.
    */
  def factHintedSubtrees(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if factUnbounded(h.child) => h.child.toString
    }
}
