package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
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
  * `left` MUST be sorted ascending and null-free (the builder —
  * [[graft.analytics.Bloom.packSorted]] — produces exactly that via
  * sort_array(collect_set(...))). Nulls propagate: either side null →
  * null, matching forall/array_contains on null inputs.
  */
case class SortedSetContainsAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_set_contains_all"

  override def nullSafeEval(set: Any, probes: Any): Any =
    compute(set.asInstanceOf[ArrayData], probes.asInstanceOf[ArrayData])

  def compute(set: ArrayData, probes: ArrayData): Boolean = {
    val n = probes.numElements()
    var i = 0
    while (i < n) {
      if (!found(set, probes.getInt(i))) return false
      i += 1
    }
    true
  }

  private def found(set: ArrayData, p: Int): Boolean = {
    var lo = 0
    var hi = set.numElements() - 1
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
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
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
