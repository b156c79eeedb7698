package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._

/** Registry-wide plan lint: every registered query's plan is checked
  * against the global scale invariants, so a future query cannot land with
  * a scale-killer shape (the hand-picked pins in PlanShapeSpec guard
  * specific queries; this guards the whole board).
  *
  * Invariants:
  *   1. No unbounded product join — a CartesianProduct /
  *      BroadcastNestedLoopJoin is only acceptable when one side is
  *      structurally bounded independent of the scale factor (a
  *      no-grouping Aggregate, a Limit, a Sample, a LocalRelation/Range)
  *      or the query is an explicitly documented exception (theta joins,
  *      brute-force ANN oracle baselines).
  *   2. No explicit broadcast hint whose subtree scans a fact-sized table
  *      unbounded — the hint that auto-broadcasts fine at test SF but
  *      OOMs at 100 TB (VERDICT r7 wrong #1's class).
  *   3. No global (empty-partition) window and no repartition(1) — the
  *      parallelism-1 shapes; a single-partition exchange is only allowed
  *      when the plan contains a global reduce or limit that explains it.
  */
class RegistryPlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Documented product-join exceptions (each must carry a comment at its
    * registration site saying why the product is bounded or intended). */
  private val productWhitelist: Set[String] = Set(
    // the documented O(n²) exact-cosine baseline that certifies the LSH /
    // IVF scale paths' recall (llm/Similarity.scala) — oracle-only shape
    "sim_exact_neardup_pairs")

  /** Documented global-window / single-partition exceptions. */
  private val singlePartitionWhitelist: Set[String] = Set(
    // RANGE window over the per-DAY aggregate: rows are bounded by the
    // calendar (~2.5k days), not the scale factor
    "dash_range_frame")

  /** Documented fact-broadcast exceptions. */
  private val factHintWhitelist: Set[String] = Set(
    // recall HARNESS: ground truth is by definition the exact top-k for
    // EVERY node, so the truth side is the whole corpus fanned out
    // against itself (same class as sim_exact_neardup_pairs' product
    // whitelist entry) — a measurement-only query, never a serving path;
    // the measured path under test (knnGraph) carries no fact hint
    "sim_knn_graph_recall",
    // the hinted subtree is the per-query token-bag table: distinct tokens
    // of the ≤ 64 qb()-capped query documents, selected by a semi-join on
    // doc_id — doc_id is UNIQUE in documents, so the bag is ≤ 64 docs of
    // row-local tokens at any SF. Key uniqueness is invisible to the plan
    // analysis (a semi-join against a bounded side bounds nothing for a
    // non-unique key), hence a documented exemption rather than a rule
    "sim_hybrid_rrf")

  /** Documented low-cardinality-window exceptions (input bounded by the
    * calendar or a prior reduce, not the scale factor). */
  private val lowCardWindowWhitelist: Set[String] = Set(
    // per-source cumulative banding over the FILE LISTING — metadata-
    // sized by contract (one row per file, not per record; EtlQueries
    // registration comment documents the bound)
    "etl_compaction_plan")

  // ONE shared definition of bounded/fact-unbounded (PlanScale) keeps
  // this lint and PlanShapeSpec's pins from drifting apart in semantics.
  private def bounded(p: LogicalPlan): Boolean = PlanScale.bounded(p)
  private def factUnbounded(p: LogicalPlan): Boolean = PlanScale.factUnbounded(p)

  /** Boundedness for the GLOBAL-WINDOW check only: a top-k-per-group heap
    * output also qualifies — its k × #groups row count is unbounded in
    * general (so it does NOT qualify as a broadcast/product build side),
    * but the registered global windows over it run on single-group heaps
    * (k rows), and a window is merely low-parallelism, not O(n²), if that
    * assumption ever breaks.
    */
  private def windowBounded(p: LogicalPlan): Boolean =
    bounded(p) || p.collectFirst { case t: plans.TopKPerGroupNode => () }.isDefined

  /** Does the join carry at least one equi-predicate across its sides?
    * (Then it plans as a hash/merge join, never a product.) */
  private def isEqui(j: Join): Boolean = j.condition.exists(_.exists {
    case EqualTo(l, r) =>
      (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet)) ||
      (l.references.subsetOf(j.right.outputSet) &&
        r.references.subsetOf(j.left.outputSet))
    case EqualNullSafe(l, r) =>
      (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet)) ||
      (l.references.subsetOf(j.right.outputSet) &&
        r.references.subsetOf(j.left.outputSet))
    case _ => false
  })

  private def lint(name: String, df: DataFrame): Seq[String] = {
    val bad = Seq.newBuilder[String]
    val opt = df.queryExecution.optimizedPlan
    val analyzed = df.queryExecution.analyzed

    // 1. unbounded product joins (logical — survives AQE wrapping): only a
    // product where BOTH sides are unbounded fact data is the O(n²) killer;
    // fact × bounded-build (1-row aggregates, codebooks, query batches) is
    // the intended streaming-probe shape
    if (!productWhitelist.contains(name)) {
      // semi/anti joins get no exemption: a NON-equi semi join between two
      // unbounded fact sides plans as a nested-loop product all the same
      opt.foreach {
        case j: Join if !isEqui(j) &&
            factUnbounded(j.left) && factUnbounded(j.right) =>
          bad += s"$name: unbounded product join (${j.joinType}, " +
            s"cond=${j.condition.map(_.sql).getOrElse("none")})"
        case _ => ()
      }
    }

    // 2. fact-sized BROADCAST hints (analyzed — hints are erased later).
    // Scan paths are resolved STRUCTURALLY (HadoopFsRelation.location /
    // FileTable.fileIndex): LogicalPlan.toString never prints V1 parquet
    // paths, which made the r8 version of this check a no-op. Only the
    // broadcast strategy fires: merge/shuffle_hash hints over fact data
    // PIN the scale-correct shuffle path at test SF (the skew-stress
    // rows) and are the opposite of this violation.
    if (!factHintWhitelist.contains(name)) {
      analyzed.foreach {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
            factUnbounded(h.child) =>
          bad += s"$name: broadcast hint over unbounded fact scan " +
            s"(${PlanScale.scanPaths(h.child).mkString(",")})"
        case _ => ()
      }
    }

    // 4. windows partitioned ONLY by low-cardinality columns over
    // fact-sized input — parallelism capped at the key cardinality, one
    // task sorts 1/k of all data at any scale (the r7 weighted-median
    // shape, reintroduced twice in r8 before this check existed)
    if (!lowCardWindowWhitelist.contains(name))
      PlanScale.lowCardFactWindows(opt).foreach(v => bad += s"$name: $v")

    // 3. parallelism-1 shapes
    if (!singlePartitionWhitelist.contains(name)) {
      opt.foreach {
        // a global window over a bounded frame (top-k heap output, a
        // limited sample) is k rows regardless of SF — fine; over anything
        // else it is the one-task-sorts-everything shape
        case w: Window if w.partitionSpec.isEmpty && !windowBounded(w.child) =>
          bad += s"$name: global window (no PARTITION BY) over unbounded input"
        case r: Repartition if r.numPartitions == 1 =>
          bad += s"$name: repartition(1)"
        case _ => ()
      }
      val phys = df.queryExecution.executedPlan.toString
      // a global reduce/limit explains a single-partition exchange — also
      // look inside scalar subqueries (their global max/avg plans its own
      // SinglePartition exchange, e.g. the TPC-H Q15 threshold)
      val explained = opt.collectWithSubqueries {
        case a: Aggregate if a.groupingExpressions.isEmpty => ()
        case _: GlobalLimit => ()
      }.nonEmpty
      if (phys.contains("Exchange SinglePartition") && !explained)
        bad += s"$name: Exchange SinglePartition without a global reduce/limit"
    }
    bad.result()
  }

  test("every registered query passes the global plan lint") {
    val violations = Queries.all.flatMap { q =>
      try lint(q.name, q.fn(spark, sf))
      catch {
        case scala.util.control.NonFatal(e) =>
          Seq(s"${q.name}: plan build failed: ${e.toString.take(200)}")
      }
    }
    assert(violations.isEmpty,
      s"${violations.size} plan-lint violations:\n${violations.mkString("\n")}")
  }
}
