package graft

import java.util.IdentityHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}

/** Shared scale-classification helpers for the plan-shape tests — ONE
  * definition of "bounded independent of the scale factor", used by both
  * the targeted pins (PlanShapeSpec) and the registry-wide lint
  * (RegistryPlanLintSpec), so the two can never drift apart in semantics.
  *
  * Boundedness is decided by a small abstract interpretation over the
  * logical plan: a node is bounded-ROWS if its output row count is fixed
  * by the model/query configuration however large the data (a 1-row
  * aggregate, a limit, an aggregate grouped only by bounded-CARDINALITY
  * keys); an attribute is bounded-cardinality if its distinct-value count
  * is so fixed (an enumerated label, `pmod(x, k)`, a key equality-joined
  * against a bounded-rows side, a key filtered by a literal IN-list).
  */
object PlanScale {

  /** Parquet tables that grow with the scale factor. Supplier IS here:
    * it grows 10×/SF step in the driver's tables (10 → 100 → 1000 rows
    * across sf0.001/0.01/0.1 — ~1 B rows at the 100 TB design point),
    * unlike nation/region whose cardinality is fixed by geography.
    */
  val factPaths: Seq[String] = Seq("/customer.parquet", "/part.parquet",
    "/supplier.parquet", "/orders.parquet", "/lineitem.parquet",
    "/events.parquet", "/documents.parquet", "/embeddings.parquet")

  /** Every file path scanned anywhere in the subtree, resolved
    * STRUCTURALLY from the scan relations. `LogicalPlan.toString` is NOT
    * usable for this: a V1 parquet `LogicalRelation` prints as
    * `Relation[cols] parquet` with no path (verified live — the r8 lint
    * matched paths against toString and could never fire). V1 scans carry
    * the path in `HadoopFsRelation.location.rootPaths`; DSv2 file scans
    * in `FileTable.fileIndex.rootPaths`.
    */
  def scanPaths(p: LogicalPlan): Seq[String] = p.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case _ => Seq.empty[String]
    }
    case r: DataSourceV2Relation => r.table match {
      case ft: FileTable => ft.fileIndex.rootPaths.map(_.toString)
      case _ => Seq.empty[String]
    }
  }.flatten

  /** Columns whose distinct-value count is fixed by the data model, not
    * the scale factor: geography (14 CZ regions / 25 nations / 5
    * regions), enumerated priorities/flags/segments, language codes,
    * listing purposes. A Window partitioned ONLY by these over fact-sized
    * input caps parallelism at the key cardinality — one task sorts 1/k
    * of ALL data at any scale (the shape dash_weighted_median was
    * rewritten to avoid in r7, then reappeared twice in r8).
    */
  val lowCardCols: Set[String] = Set(
    "region", "purpose", "lang", "language", "pri", "priority",
    "o_orderpriority", "o_orderstatus", "l_returnflag", "l_linestatus",
    "l_shipinstruct", "l_shipmode", "c_mktsegment", "segment", "seg",
    "n_nationkey", "n_name", "r_regionkey", "r_name", "c_nationkey",
    "s_nationkey", "n_regionkey", "nation", "event_type", "source",
    "split", "p_mfgr", "p_brand", "p_container",
    // p_type's domain is fixed by the TPC-H spec (6×5×5 = 150 phrases),
    // independent of SF — needed so Q67-style rollups over (brand, type,
    // calendar) classify as bounded reduces
    "p_type")

  /** Grouping keys whose distinct-value count is fixed by the MODEL
    * configuration, not the data volume: vector dimension index (64),
    * PQ subspace (numSub), k-means / IVF cell and centroid ids (k),
    * LSH band index (nBands). An aggregate keyed only by these is
    * bounded however large the corpus. Deliberately absent: "bucket"
    * (LSH hash buckets scale with the corpus), any document/vector id.
    */
  val boundedKeyCols: Set[String] = Set("dim", "sub", "cell", "cent_id", "band")

  // ---- memoized analysis ---------------------------------------------------
  // bounded()/boundedAttrs() are mutually recursive (a join key is bounded
  // when the other side is bounded-rows); identity-memoization keeps the
  // walk linear in plan nodes instead of exponential on nested joins.

  private final class Memo {
    val rows = new IdentityHashMap[LogicalPlan, java.lang.Boolean]()
    val attrs = new IdentityHashMap[LogicalPlan, AttributeSet]()
  }

  /** Do all of the expression's column inputs carry calendar (date/
    * timestamp) or already-bounded values? Guards the calendar rules
    * below against LAUNDERING: `date_add('1970-01-01', id)` is DateType
    * but takes one distinct value per id — date-TYPE alone proves
    * nothing; date-typed PROVENANCE (every input a real time value)
    * does.
    */
  private def calendarRefs(e: Expression, ba: AttributeSet): Boolean =
    e.references.forall { r =>
      ba.contains(r) ||
        r.dataType == org.apache.spark.sql.types.DateType ||
        r.dataType == org.apache.spark.sql.types.TimestampType ||
        r.dataType == org.apache.spark.sql.types.TimestampNTZType
    }

  /** Value-cardinality of an expression, given the child's bounded attrs. */
  private def exprBounded(e: Expression, ba: AttributeSet): Boolean = e match {
    case _: Literal => true
    // calendar-bounded: day-granularity values (and their weekday/month/
    // hour/year extractions) grow with the CALENDAR, not the data volume —
    // a per-day aggregate is the canonical scale-safe dashboard reduce
    // (the r8 verdict's "whitelist calendar-bounded inputs" category, as
    // an analysis rule instead of per-query exemptions). Timestamps are
    // NOT blessed as values (microsecond granularity is effectively
    // row-unique), but they are legitimate calendar INPUTS. Attributes
    // are deliberately excluded here: a DateType column is bounded only
    // via `ba` provenance (its defining alias passed these rules), so a
    // laundered date cannot re-enter by type at a later plan node.
    case d if d.dataType == org.apache.spark.sql.types.DateType &&
      !d.isInstanceOf[Attribute] && calendarRefs(d, ba) => true
    case x @ (_: WeekDay | _: DayOfWeek | _: WeekOfYear | _: Month |
        _: Quarter | _: Year | _: Hour | _: Minute | _: Second |
        _: DayOfMonth | _: DayOfYear) if calendarRefs(x, ba) => true
    case a: Attribute => ba.contains(a) ||
      boundedKeyCols.contains(a.name.toLowerCase) ||
      lowCardCols.contains(a.name.toLowerCase)
    case al: Alias => exprBounded(al.child, ba)
    case c: Cast => exprBounded(c.child, ba)
    case p: Pmod => p.right.foldable
    case r: Remainder => r.right.foldable
    // a CASE whose every output value is a literal has ≤ #branches values
    case cw: CaseWhen =>
      cw.branches.forall(_._2.foldable) && cw.elseValue.forall(_.foldable)
    case _ => false
  }

  /** Output attributes with model/query-bounded distinct-value counts. */
  private def boundedAttrsM(p: LogicalPlan, m: Memo): AttributeSet = {
    val hit = m.attrs.get(p)
    if (hit != null) return hit
    m.attrs.put(p, AttributeSet.empty) // cycle guard (plans are DAG-safe)
    val out: AttributeSet = p match {
      case f: Filter =>
        val fromPred = f.condition.collect {
          case In(a: Attribute, vs) if vs.forall(_.foldable) => a
          case InSet(a: Attribute, _) => a
          case EqualTo(a: Attribute, v) if v.foldable => a
          case EqualTo(v, a: Attribute) if v.foldable => a
        }
        boundedAttrsM(f.child, m) ++ AttributeSet(fromPred)
      case j: Join =>
        val fromChildren =
          boundedAttrsM(j.left, m) ++ boundedAttrsM(j.right, m)
        // Key-boundedness transfers across an equality only for rows that
        // actually MATCHED. An outer/anti join retains non-matching rows
        // whose key keeps its full (scale-growing) value domain, so each
        // side may only GAIN boundedness when the join type restricts that
        // side's output to matched rows.
        val leftMatched = j.joinType match {
          case Inner | Cross | LeftSemi | RightOuter => true
          case _ => false
        }
        val rightMatched = j.joinType match {
          case Inner | Cross | LeftOuter => true
          case _ => false
        }
        val keyB = j.condition.toSeq.flatMap(_.collect {
          case EqualTo(x: Attribute, y: Attribute) =>
            val ext = Seq.newBuilder[Attribute]
            def gain(a: Attribute): Unit =
              if (j.left.outputSet.contains(a)) { if (leftMatched) ext += a }
              else if (rightMatched) ext += a
            // a key equality-joined against a bounded-ROWS side takes at
            // most that side's row count of distinct values (matched rows)
            if (boundedM(j.right, m) && j.left.outputSet.contains(x)) gain(x)
            if (boundedM(j.right, m) && j.left.outputSet.contains(y)) gain(y)
            if (boundedM(j.left, m) && j.right.outputSet.contains(x)) gain(x)
            if (boundedM(j.left, m) && j.right.outputSet.contains(y)) gain(y)
            // and equality propagates boundedness across the pair
            if (fromChildren.contains(x)) gain(y)
            if (fromChildren.contains(y)) gain(x)
            ext.result()
        }.flatten)
        fromChildren ++ AttributeSet(keyB)
      case a: Aggregate =>
        val cb = boundedAttrsM(a.child, m)
        AttributeSet(a.aggregateExpressions.collect {
          case al: Alias if exprBounded(al.child, cb) => al.toAttribute
          case at: Attribute if exprBounded(at, cb) => at
        })
      case pr: Project =>
        val cb = boundedAttrsM(pr.child, m)
        AttributeSet(pr.projectList.collect {
          case al: Alias if exprBounded(al.child, cb) => al.toAttribute
          case at: Attribute if exprBounded(at, cb) => at
        })
      case _ =>
        p.children.foldLeft(AttributeSet.empty)(
          (s, c) => s ++ boundedAttrsM(c, m))
    }
    m.attrs.put(p, out)
    out
  }

  /** Is this subtree's row count bounded independent of the scale factor?
    * STRICT on keyed aggregates: a keyed aggregate's cardinality grows
    * with its key's cardinality, so it is NOT bounded (neither is a
    * top-k-per-group, whose row count is k × #groups) — UNLESS every
    * grouping key has bounded cardinality under the attribute analysis
    * (a per-dimension reduce over embeddings is ≤ 64 rows at any corpus
    * size; a df table over tokens filtered to a literal IN-list is ≤ the
    * list's length).
    */
  private def boundedM(p: LogicalPlan, m: Memo): Boolean = {
    val hit = m.rows.get(p)
    if (hit != null) return hit.booleanValue()
    m.rows.put(p, java.lang.Boolean.FALSE) // cycle guard
    // Structural top-down recursion, NOT a subtree scan: a bounding node
    // must bound the ROOT's row count. `collectFirst` here would let a
    // limit buried in one branch of a join bless the whole subtree —
    // broadcast(lineitem ⋈ supplier.limit(100)) must stay UNbounded.
    val out: Boolean = p match {
      // nodes that bound their own output, whatever the input size
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case a: Aggregate if a.groupingExpressions.forall(
        e => exprBounded(e, boundedAttrsM(a.child, m))) => true
      case d: Distinct if d.output.forall(
        e => exprBounded(e, boundedAttrsM(d.child, m))) => true
      case d: Deduplicate if d.keys.forall(
        e => exprBounded(e, boundedAttrsM(d.child, m))) => true
      case _: GlobalLimit => true
      // a fraction-sample's output SCALES with its input — it bounds
      // nothing by itself. A sampler under a GlobalLimit never reaches
      // this case (the limit answers first), so any Sample seen here is
      // uncapped and must inherit its child's verdict: sample-of-bounded
      // is bounded, sample-of-fact is a fact.
      case s: Sample => boundedM(s.child, m)
      case _: LocalRelation | _: OneRowRelation | _: Range => true
      // a per-group heap whose group keys are all bounded-cardinality is
      // ≤ k × #groups rows (e.g. a per-language stratum sample)
      case t: plans.TopKPerGroupNode if t.groupExprs.forall(
        e => exprBounded(e, boundedAttrsM(t.child, m))) => true
      // scans: bounded only when the path RESOLVES and is not a
      // scale-growing table. A relation with no resolvable path (JDBC,
      // in-memory) must stay conservative — defaulting it to bounded
      // would let boundedAttrsM's join rule launder boundedness from a
      // scan the blacklist cannot even see.
      case lr: LogicalRelation =>
        val sp = scanPaths(lr)
        sp.nonEmpty && !sp.exists(p => factPaths.exists(p.contains))
      case r: DataSourceV2Relation =>
        val sp = scanPaths(r)
        sp.nonEmpty && !sp.exists(p => factPaths.exists(p.contains))
      // semi/anti joins emit ≤ |left| rows; every other join type can
      // emit up to |L|·|R|, so BOTH inputs must be bounded — a bounding
      // node in one branch says nothing about the other
      case j: Join => j.joinType match {
        case LeftSemi | LeftAnti => boundedM(j.left, m)
        case _ => boundedM(j.left, m) && boundedM(j.right, m)
      }
      // any other leaf (LogicalRDD from a localCheckpoint, external RDDs)
      // has no visible bound — stay conservative
      case leaf if leaf.children.isEmpty => false
      // every other node (Project/Filter/Sort/Window/Expand/Union/...)
      // multiplies rows by at most a plan constant. Known caveat:
      // Generate (explode) multiplies by ARRAY LENGTH, which is
      // row-local data — explode(collect_list(fact)) over a 1-row
      // aggregate would re-expand to fact size and still read bounded
      // here; no registered plan builds a fact-sized array (that shape
      // is itself an OOM at scale), so the conservative complication is
      // not bought
      case other => other.children.forall(c => boundedM(c, m))
    }
    m.rows.put(p, java.lang.Boolean.valueOf(out))
    out
  }

  def bounded(p: LogicalPlan): Boolean = boundedM(p, new Memo)

  /** Unbounded fact data: the subtree scans a table that grows with the
    * scale factor and nothing above the scan bounds its row count. Small
    * derived artifacts (codebooks, centroid tables, LUTs) read from
    * non-fact parquet paths are bounded by construction. Caveat: a
    * localCheckpoint()ed subtree becomes a LogicalRDD and loses its scan
    * paths — checkpointed fact data is invisible here (the checkpoint
    * sites are individually documented at their registration sites).
    */
  def factUnbounded(p: LogicalPlan): Boolean =
    scanPaths(p).exists(sp => factPaths.exists(sp.contains)) && !bounded(p)

  /** Subtrees under an explicit BROADCAST hint whose data is unbounded
    * fact data — the hint that auto-broadcasts fine at test SF but forces
    * a multi-GB build side at 100 TB. Empty = clean. Only the broadcast
    * strategy is flagged: a merge/shuffle_hash hint over fact data is the
    * OPPOSITE discipline (it pins the scale-correct shuffle path at test
    * SF, e.g. the skew-stress rows), and must not fire here.
    */
  def factHintedSubtrees(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
          factUnbounded(h.child) =>
        s"${h.hints} over scans ${scanPaths(h.child).mkString(",")}"
    }

  private def exprCols(e: Expression): Seq[String] =
    e.references.toSeq.map(_.name.toLowerCase)

  /** Windows whose partition keys are ALL drawn from the low-cardinality
    * set while the window's input is unbounded fact data. Empty = clean.
    * (A window keyed by at least one scale-growing column — user_id,
    * doc id, orderkey — partitions fine and is not flagged. A window
    * whose child already passed a WindowGroupLimit partial pushdown sorts
    * only the ≤ k×groups surviving rows and is fine too.)
    */
  def lowCardFactWindows(p: LogicalPlan): Seq[String] = p.collect {
    case w: Window if w.partitionSpec.nonEmpty &&
        w.partitionSpec.flatMap(exprCols).forall(lowCardCols.contains) &&
        w.child.collectFirst { case _: WindowGroupLimit => () }.isEmpty &&
        factUnbounded(w.child) =>
      s"window partitioned only by low-cardinality " +
        s"[${w.partitionSpec.flatMap(exprCols).distinct.mkString(",")}] " +
        s"over fact scans ${scanPaths(w.child).mkString(",")}"
  }
}
