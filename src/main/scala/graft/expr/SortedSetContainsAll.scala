package graft.expr

import org.apache.spark.sql.{Column, GraftBridge, GraftIntArrayArrayArgs}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** True iff EVERY element of `right` (a small int array, e.g. a row's k
  * Bloom bit positions) is present in `left` (a SORTED distinct int array,
  * e.g. the broadcast set-bit positions of a Bloom filter) — one binary
  * search per probe element, O(k log m), inside whole-stage codegen.
  *
  * The Column formulation (`forall(ps, p => array_contains(set, p))`)
  * pays two interpreted CodegenFallback higher-order functions plus an
  * O(m) linear scan per probe element; on a fact-table prune that is the
  * hot path. This expression keeps the probe fused into the scan stage so
  * a Bloom-pruned join filters BEFORE its exchange with no extra shuffle
  * (the same plan shape Spark's runtime row-level filtering produces).
  *
  * Input types are declared (array<int> on both sides) so a non-int array
  * is cast or rejected at analysis instead of silently misread by getInt
  * (ADVICE r4). Null semantics match `forall(ps, p => array_contains(set,
  * p))` three-valued logic: a top-level null on either side → null; a
  * null PROBE element → false if some other probe element is absent, else
  * null. `left` MUST be sorted ascending (the builder —
  * [[graft.analytics.Bloom.packSorted]] — produces exactly that via
  * sort_array(collect_set(...)), which also sorts any null first; leading
  * nulls in the set are skipped, not misread).
  */
case class SortedSetContainsAll(left: Expression, right: Expression)
    extends BinaryExpression with GraftIntArrayArrayArgs {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_set_contains_all"
  // nullable even when children are not: a null probe ELEMENT yields null
  override def nullable: Boolean = true

  override def nullSafeEval(set: Any, probes: Any): Any =
    compute(set.asInstanceOf[ArrayData], probes.asInstanceOf[ArrayData])

  /** java.lang.Boolean so the three-valued null result survives the
    * boundary into generated code.
    */
  def compute(set: ArrayData, probes: ArrayData): java.lang.Boolean = {
    val n = probes.numElements()
    var i = 0
    var sawNull = false
    while (i < n) {
      if (probes.isNullAt(i)) sawNull = true
      else if (!found(set, probes.getInt(i))) return java.lang.Boolean.FALSE
      i += 1
    }
    if (sawNull) null else java.lang.Boolean.TRUE
  }

  private def found(set: ArrayData, p: Int): Boolean = {
    // sort_array places nulls FIRST ascending; skip them so the binary
    // search below only ever reads real ints (getInt on a null slot
    // returns garbage, not null).
    val n = set.numElements()
    var lo = 0
    while (lo < n && set.isNullAt(lo)) lo += 1
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = set.getInt(mid)
      if (v == p) return true
      else if (v < p) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSetContainsAll", this,
      classOf[SortedSetContainsAll].getName)
    val res = ctx.freshName("sscaRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Boolean $res = $ref.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a, (org.apache.spark.sql.catalyst.util.ArrayData) $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.booleanValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetContainsAll =
    copy(left = newLeft, right = newRight)
}

object SortedSetContainsAll {
  def apply(set: Column, probes: Column): Column =
    GraftBridge.column(
      SortedSetContainsAll(GraftBridge.expression(set), GraftBridge.expression(probes)))
}
