package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode → ASCII transliteration as a native Catalyst expression.
  *
  * The reference applies python `unidecode` to every string cell
  * (reference: scripts/extract.py:45). For the Czech alphabet the effect is
  * exactly "strip combining diacritical marks": NFD-normalize, drop
  * `\p{M}`. We implement that with `java.text.Normalizer` and participate
  * in whole-stage codegen (`doGenCode` emits a static call) so the hot path
  * stays inside Tungsten-generated code rather than falling back to
  * interpreted eval.
  */
case class Transliterate(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "transliterate"

  override def nullSafeEval(input: Any): Any =
    Transliterate.stripU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Transliterate.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.stripU8((org.apache.spark.unsafe.types.UTF8String) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Transliterate =
    copy(child = newChild)
}

object Transliterate {

  /** UTF8String form invoked from generated code: pure-ASCII inputs (the
    * majority of cells — links, prices, sizes) are detected with one byte
    * scan and returned as-is with ZERO allocation; only cells with
    * multi-byte chars pay the String materialization + NFD pass.
    */
  def stripU8(u: UTF8String): UTF8String = {
    // getByte, not getBytes: the latter copies unless the backing array is
    // exactly aligned, which would defeat the zero-alloc fast path
    val n = u.numBytes
    var i = 0
    while (i < n && u.getByte(i) >= 0) i += 1
    if (i == n) u
    else UTF8String.fromString(strip(u.toString))
  }

  /** NFD-normalize then remove all combining marks. Pure + thread-safe;
    * invoked from generated code, so it must stay a static public method.
    *
    * Hot path: the transform chain calls this once per string cell (6 cols
    * × every row), so (a) pure-ASCII inputs — links, prices, sizes — return
    * without normalizing at all, and (b) mark-stripping is a char loop over
    * the three \p{M} character types instead of a regex Matcher allocation
    * per call.
    */
  def strip(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i) < 0x80) i += 1
    if (i == n) return s
    val norm = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(norm.length)
    var j = 0
    while (j < norm.length) {
      val c = norm.charAt(j)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
      j += 1
    }
    sb.toString
  }

  /** Column-function form: `Transliterate(col)` as a usable Column. */
  def apply(c: Column): Column =
    GraftBridge.column(Transliterate(GraftBridge.expression(c)))
}
