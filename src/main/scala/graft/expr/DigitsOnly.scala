package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keep only ASCII digits — the hot digit-strip of the price/size parse
  * (reference: scripts/transform.py:68, `[^0-9]` removal).
  *
  * Equivalent to `regexp_replace(c, "[^0-9]", "")` but a single byte scan
  * instead of a regex engine pass; participates in whole-stage codegen via
  * a static call, so the flagship chain's three digit-strips stay cheap at
  * any scale. ASCII-digit semantics match the DuckDB oracle's `[^0-9]`.
  */
case class DigitsOnly(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "digits_only"

  override def nullSafeEval(input: Any): Any =
    DigitsOnly.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DigitsOnly.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.strip((org.apache.spark.unsafe.types.UTF8String) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DigitsOnly =
    copy(child = newChild)
}

object DigitsOnly {

  /** UTF-8 bytes ≥ 0x80 are continuation/lead bytes of non-ASCII chars —
    * never ASCII digits — so a raw byte scan is correct.
    */
  def strip(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var m = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') { out(m) = b; m += 1 }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, m))
  }

  def apply(c: Column): Column =
    GraftBridge.column(DigitsOnly(GraftBridge.expression(c)))
}
