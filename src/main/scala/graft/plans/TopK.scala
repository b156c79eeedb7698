package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, AttributeSet, CurrentRow, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, JoinedRow,
  LessThan, LessThanOrEqual, PredicateHelper, RowFrame, RowNumber,
  RowOrdering, SortOrder, SpecifiedWindowFrame, UnboundedPreceding,
  UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan: per-group top-k without sorting anything but
  * the k survivors (SURVEY §2.11 "top listings per region" shape; the
  * reference computes ranked views in its BI layer, Looker over Postgres —
  * README.md:27-29 — which this operator replaces at engine level).
  *
  * Spark's built-in evaluation of `row_number() OVER (PARTITION BY g ORDER
  * BY o) <= k` needs every partition fully sorted by (g, o) — at 100 TB
  * that is a massive sort (and spill) of rows that are then thrown away.
  * Spark 3.5+ inserts WindowGroupLimit to pre-filter, but the sort remains.
  * This operator instead keeps a bounded k-entry heap PER GROUP:
  *
  *   partial TopKPerGroupExec        (any distribution, heaps per group)
  *     → exchange on groupExprs      (inserted by EnsureRequirements;
  *                                    ≤ k·|groups per partition| rows move)
  *       → final TopKPerGroupExec    (heaps again, emit rank 1..k)
  *
  * O(n log k) comparisons, no sort buffers, map-side reduction like a
  * partial aggregate. Memory is k rows × groups-per-partition (same
  * shape as hash aggregation; a group-cardinality explosion should use the
  * window path instead).
  *
  * The full extension stack is exercised: logical node ([[TopKPerGroupNode]]),
  * optimizer rule ([[RewriteWindowTopK]] — rewrites the row_number-window +
  * rank-filter pattern automatically), planner strategy ([[TopKStrategy]]),
  * physical operator ([[TopKPerGroupExec]]), injected via
  * [[graft.GraftExtensions]] or [[TopK.install]].
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical per-group bounded top-k. Runs twice per query: a partial pass
  * on whatever distribution the child has (map-side reduction to ≤ k rows
  * per (partition, group)), then a final pass that requires clustering on
  * the group keys and emits the rank column. `rankAttr = None` marks the
  * partial stage.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  private def isFinal = rankAttr.isDefined

  override def output: Seq[Attribute] =
    if (isFinal) child.output :+ rankAttr.get else child.output

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (!isFinal) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val inputAttrs = child.output
    val outputAttrs = output
    val fin = isFinal
    val rank = rankAttr
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")

    child.execute().mapPartitions { iter =>
      // codegen'd projections/orderings are built per partition on the
      // executor (they are not serializable)
      val keyProj = UnsafeProjection.create(groupLocal, inputAttrs)
      val ordering = RowOrdering.create(orderLocal, inputAttrs)
      // max-heap by sort order: head = worst retained row, evicted first
      val reversed = ordering.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kLocal + 1, reversed)
          heaps.put(key.copy(), q)
        }
        if (q.size < kLocal) q.add(row.copy())
        else if (ordering.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }

      import scala.jdk.CollectionConverters._
      numGroups += heaps.size()
      if (!fin) {
        // partial: emit survivors unranked, unsorted
        heaps.values.iterator.asScala.flatMap(_.iterator.asScala)
          .map { r => numOutputRows += 1; r }
      } else {
        val outProj = UnsafeProjection.create(outputAttrs, inputAttrs :+ rank.get)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.values.iterator.asScala.flatMap { q =>
          val rows = q.iterator.asScala.toArray.sorted(ordering)
          rows.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            numOutputRows += 1
            outProj(joined(row, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as partial-exec → (exchange) → final-exec;
  * EnsureRequirements inserts the group-key exchange between the stages
  * from the final stage's required distribution.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groups, order, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(groups, order, k, None, planLater(child))
      TopKPerGroupExec(groups, order, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rnk <= k, [Project] Window(row_number() AS rnk, g, o))`
  * into [[TopKPerGroupNode]], eliminating the Window (and the full sort it
  * requires) entirely. Runs in the user-provided optimizer batch, i.e.
  * AFTER InferWindowGroupLimit has possibly inserted a WindowGroupLimit
  * below the Window — that node is subsumed and stripped.
  *
  * Fires only on the exact safe pattern: a single row_number window
  * expression with the default ROWS UNBOUNDED PRECEDING..CURRENT ROW frame
  * and a non-empty ORDER BY, under a rank-bounding conjunct (rnk <= k,
  * rnk < k, rnk = 1 or the flipped forms). Other conjuncts stay in a
  * residual Filter above the rewritten node.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private object RowNumberWindow {
    /** (rankAttr, partitionSpec, orderSpec, windowChild) */
    def unapply(p: LogicalPlan): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      p match {
        case Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, ord,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, child, _) if ord.nonEmpty =>
          // InferWindowGroupLimit (threshold default 1000) may already have
          // inserted its pre-filter; the heap operator subsumes it.
          val realChild = child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          Some((alias.toAttribute, part, ord, realChild))
        case _ => None
      }
  }

  /** The inclusive bound k from a rank predicate over `rank`. */
  private def rankBound(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, IntegerLiteral(n)) if r.semanticEquals(rank) => Some(n)
    case LessThan(r: Attribute, IntegerLiteral(n)) if r.semanticEquals(rank) => Some(n - 1)
    case GreaterThanOrEqual(IntegerLiteral(n), r: Attribute) if r.semanticEquals(rank) => Some(n)
    case GreaterThan(IntegerLiteral(n), r: Attribute) if r.semanticEquals(rank) => Some(n - 1)
    case EqualTo(r: Attribute, IntegerLiteral(1)) if r.semanticEquals(rank) => Some(1)
    case EqualTo(IntegerLiteral(1), r: Attribute) if r.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private def rewrite(cond: Expression, win: LogicalPlan,
      wrap: LogicalPlan => LogicalPlan, orig: LogicalPlan): LogicalPlan =
    win match {
      case RowNumberWindow(rank, part, ord, child) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val (bounds, rest) = conjuncts.partition(c => rankBound(c, rank).isDefined)
        val ks = bounds.flatMap(c => rankBound(c, rank))
        if (ks.isEmpty) orig
        else {
          val k = ks.min
          if (k <= 0) orig // rnk <= 0 is empty; leave it to the normal path
          else {
            val node = wrap(TopKPerGroupNode(part, ord, k, rank, child))
            rest.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
              .map(Filter(_, node)).getOrElse(node)
          }
        }
      case _ => orig
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity, f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        // pass-through projection only (CollapseProject normally removes
        // it; attribute-only lists are safe to hoist above the rewrite)
        if projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, w, node => Project(projList, node), f)
  }
}

/** Column-level API + per-session installation of the strategy and rule. */
object TopK {

  /** Idempotently register just the planner strategy (what [[perGroup]]
    * needs). Kept separate from the rewrite rule so that explicitly
    * window-based queries in the same session keep planning as windows —
    * the two paths stay independently measurable.
    */
  def installStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  /** Idempotently register the strategy + rewrite rule on a session built
    * WITHOUT `spark.sql.extensions=graft.GraftExtensions`. (Sessions built
    * with the extensions get both injected at build time.)
    */
  def install(spark: SparkSession): Unit = {
    installStrategy(spark)
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RewriteWindowTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteWindowTopK
  }

  /** Top k rows per group by `orderCol` DESC, ties broken by `tieCol` ASC —
    * the same contract as Dashboard.topKPerGroup's ranking window, with an
    * appended `rnk` (1-based) column, computed by the heap operator.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      tieCol: Column, k: Int, rankName: String = "rnk"): DataFrame = {
    require(!df.columns.contains(rankName),
      s"input already has a '$rankName' column; pass a different rankName")
    // the appended sort-key aliases resolve BY NAME below — a pre-existing
    // column of the same name would silently bind instead of the alias
    Seq("__tk_ord", "__tk_tie").foreach { n =>
      require(!df.columns.contains(n),
        s"input already has a reserved '$n' column; rename it first")
    }
    val spark = df.sparkSession
    installStrategy(spark)
    // alias the sort keys so the logical node only ever references
    // resolved attributes of an analyzed child plan
    val keyed = df.select(
      (df.columns.map(col).toSeq :+ orderCol.as("__tk_ord")) :+ tieCol.as("__tk_tie"): _*)
    val child = keyed.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${child.output.map(_.name)}"))
    val order = Seq(
      SortOrder(attr("__tk_ord"), org.apache.spark.sql.catalyst.expressions.Descending),
      SortOrder(attr("__tk_tie"), org.apache.spark.sql.catalyst.expressions.Ascending))
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    val node = TopKPerGroupNode(groupCols.map(attr), order, k, rankAttr, child)
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
      .drop("__tk_ord", "__tk_tie")
  }
}
