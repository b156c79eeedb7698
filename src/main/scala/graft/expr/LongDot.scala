package graft.expr

import org.apache.spark.sql.{Column, GraftBridge, GraftLongArrayArrayArgs}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product Σ a(i)·b(i) of two `array<long>` columns in
  * one primitive loop — the kernel of every fixed-point vector operator
  * (PQ codebook assignment via |a−b|² = a·a + b·b − 2·a·b, ADC lookup
  * scores, quantized norms). All arithmetic is long: for e6-quantized
  * unit-scale embeddings the products are ≤ ~4e12 and a 64-dim sum stays
  * ~2.6e14, far inside both the long range and (for the DuckDB oracle,
  * which mirrors this with `list_inner_product` over doubles) the 2^53
  * double-exact range — so the value replays bit-for-bit in any engine.
  *
  * The Column formulation (`aggregate(zip_with(a, b, _ * _), ...)`) is two
  * interpreted CodegenFallback higher-order traversals per pair; this is
  * the same single-loop escape [[CosineSimE6]] provides for doubles.
  *
  * Input types are DECLARED (array<long> both sides, ADVICE r4's
  * SortedSetContainsAll lesson) so other integer widths are cast or
  * rejected at analysis. NULL semantics: null input or null ELEMENT in
  * the overlapped prefix → null (a null element would otherwise read as
  * garbage, not 0). Arrays of different lengths traverse the common
  * prefix, same convention as CosineSimE6.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with GraftLongArrayArrayArgs {

  override def dataType: DataType = LongType
  // nullable even when children are not: a null ELEMENT yields null
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Boxed so codegen and interpreted eval share the null-element NULL. */
  def compute(xs: ArrayData, ys: ArrayData): java.lang.Long = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longDot", this, classOf[LongDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}Boxed = $ref.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a, (org.apache.spark.sql.catalyst.util.ArrayData) $b);
      if (${ev.value}Boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Boxed.longValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
