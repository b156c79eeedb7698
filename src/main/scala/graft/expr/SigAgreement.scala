package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of positions where two long-array signatures agree, in ONE
  * primitive pass — the MinHash estimate's kernel (est_jaccard =
  * agreement / numHashes).
  *
  * The Column formulation (`size(filter(zip_with(a, b, _ === _), x => x))`)
  * runs on two interpreted CodegenFallback higher-order functions and
  * allocates an intermediate boolean array per pair; after LSH banding
  * every candidate pair pays that 64-element interpreted loop twice. This
  * expression does the same comparison in a single fused primitive loop,
  * inside whole-stage codegen.
  *
  * Compares the min(length) prefix, mirroring zip_with-then-filter on
  * equal-length signatures (the only shape the dedup path produces;
  * unequal lengths cannot over-count).
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agreement"

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(xs: ArrayData, ys: ArrayData): Int = {
    val n = math.min(xs.numElements(), ys.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (xs.getLong(i) == ys.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigAgreement", this, classOf[SigAgreement].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a, (org.apache.spark.sql.catalyst.util.ArrayData) $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SigAgreement(GraftBridge.expression(a), GraftBridge.expression(b)))
}
