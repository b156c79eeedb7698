package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Region derivation + address rewrite in ONE pass
  * (reference: scripts/transform.py:81-91).
  *
  * The Column forms (Parse.regionOf / Parse.addressWithoutRegion) each
  * split the address twice — four regex splits per row in the transform
  * chain's hot path. This expression lowercases once, splits once, and
  * returns struct(region, address) with semantics identical to the Column
  * forms (parity-tested in ParseSpec):
  *  - no "kraj" in the lowercased address → (Praha, address unchanged)
  *  - else region = last two whitespace words, trailing commas stripped;
  *    address = the rest, trailing spaces then commas stripped.
  */
case class AddressParts(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = AddressParts.schema
  override def prettyName: String = "address_parts"

  private def rstrip(s: String, c: Char): String = {
    var to = s.length
    while (to > 0 && s.charAt(to - 1) == c) to -= 1
    if (to == s.length) s else s.substring(0, to)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    if (!StrUtil.lowerRoot(s).contains("kraj")) {
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("Praha"), input))
    } else {
      val words = StrUtil.splitWs(StrUtil.sparkTrim(s))
      val n = words.length
      // reference extract_last_two_words returns '' for <2-word addresses
      val tail = if (n >= 2) words.slice(n - 2, n).mkString(" ") else ""
      val head = words.slice(0, math.max(n - 2, 0)).mkString(" ")
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(rstrip(tail, ',')),
        UTF8String.fromString(rstrip(rstrip(head, ' '), ','))))
    }
  }

  // real codegen: the transform chain evaluates this once per row — as a
  // CodegenFallback it would force boxed row-at-a-time eval inside the
  // fused stage. The child slot is cast explicitly: when the child is
  // NullType (e.g. an untyped NULL literal column) its codegen java type
  // is Object, and janino has no implicit downcast — an uncast call fails
  // to compile and the stage silently falls back to interpreted eval
  // (CodegenCompileSpec pins this).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("addressParts", this, classOf[AddressParts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AddressParts =
    copy(child = newChild)
}

object AddressParts {
  val schema: StructType = StructType(Seq(
    StructField("region", StringType, nullable = false),
    StructField("address", StringType, nullable = false)))

  def apply(c: Column): Column =
    GraftBridge.column(AddressParts(GraftBridge.expression(c)))
}
