package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Random-hyperplane LSH signature of a float vector in one primitive pass.
  *
  * Replicates Similarity.hyperplaneSignature bit-for-bit: hyperplane
  * component (b, i) is ±1 by the parity of Spark's
  * `hash(lit(seed), lit(b), i)` — murmur3 folded left-to-right from the
  * default seed 42 (`hashInt(i, hashInt(b, hashInt(seed, 42)))`) — and bit
  * b of the result is set when the projection is strictly positive.
  * The Column form walks the vector once per bit through interpreted
  * higher-order folds; this walks it once total, with the per-(b,i) sign
  * computed inline (two integer hashes — cheaper than the fold's per-
  * element expression-tree eval).
  */
case class HyperplaneSig(child: Expression, bits: Int, seed: Int = 42)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(v: ArrayData): Long = {
    val n = v.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      val hb = Murmur3_x86_32.hashInt(b, Murmur3_x86_32.hashInt(seed, 42))
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = Murmur3_x86_32.hashInt(i, hb)
        val sign = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
        proj += v.getFloat(i).toDouble * sign
        i += 1
      }
      if (proj > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.sql.catalyst.util.ArrayData) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(vec: Column, bits: Int): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(vec), bits))
}
