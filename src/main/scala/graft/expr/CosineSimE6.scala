package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fixed-point cosine similarity floor(cos(a,b) * 1e6) of two numeric-array
  * columns (array&lt;float&gt; or array&lt;double&gt;, independently per
  * side) in ONE primitive pass.
  *
  * The Column formulation (aggregate-fold dot product + two norm folds) is
  * three interpreted higher-order traversals per pair — the hot kernel of
  * every similarity operator (brute-force scoring, LSH/IVF rerank,
  * near-dup thresholding, trained-centroid assignment) pays it once per
  * candidate pair. This expression does the same arithmetic — floats
  * widened to double, accumulated in index order, identical IEEE result —
  * in a single loop. The per-side element type is resolved ONCE at
  * analysis (not per element), so the mixed float-vector × double-centroid
  * case of [[graft.llm.Similarity.kMeansCentroidsE6]] stays primitive.
  *
  * Returns NULL when either norm is zero (the Column form would overflow
  * an ANSI long cast on the resulting Infinity).
  */
case class CosineSimE6(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // NULL on zero-norm input even when both children are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_e6"

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float> or array<double>, got $other")
  }
  @transient private lazy val leftFloat = isFloatArray(left)
  @transient private lazy val rightFloat = isFloatArray(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Boxed so codegen and interpreted eval share the zero-norm NULL. */
  def compute(xs: ArrayData, ys: ArrayData): java.lang.Long = {
    val n = math.min(xs.numElements(), ys.numElements())
    val lf = leftFloat
    val rf = rightFloat
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null
    else java.lang.Long.valueOf(math.floor(dot / denom * 1e6).toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSimE6", this, classOf[CosineSimE6].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}Boxed = $ref.compute((org.apache.spark.sql.catalyst.util.ArrayData) $a, (org.apache.spark.sql.catalyst.util.ArrayData) $b);
      if (${ev.value}Boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Boxed.longValue();
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimE6 =
    copy(left = newLeft, right = newRight)
}

object CosineSimE6 {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimE6(GraftBridge.expression(a), GraftBridge.expression(b)))
}
