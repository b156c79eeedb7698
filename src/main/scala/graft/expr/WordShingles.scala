package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word k-shingles of normalized text in ONE pass — the fused
  * form of the declarative chain `array_distinct(filter(transform(
  * sequence(...), i -> array_join(slice(ws, i+1, k), " ")), ...))`,
  * which evaluates as interpreted higher-order functions and was the
  * dominant cost of the prefix-filtered similarity join (7.8 s of its
  * ~10 s at sf0.1 went to shingle construction alone).
  *
  * Semantics are IDENTICAL to the declarative form (parity-tested in
  * WordShinglesSpec): lowercase, trim, whitespace split, k-word windows
  * from every position, a document shorter than k yields its whole
  * token list as one shingle, empty/whitespace-only text yields an
  * empty array, and distinctness keeps first-occurrence order.
  *
  * Same StrUtil tokenization as the NgramHashes/NgramHashSeq gram
  * family, so every shingle view of a document agrees.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val words = StrUtil.splitWs(StrUtil.lowerRoot(StrUtil.sparkTrim(input.toString)))
    val len = words.length
    if (len == 0 || (len == 1 && words(0).isEmpty))
      return new GenericArrayData(Array.empty[Any])
    val nSh = math.max(len - k, 0) + 1
    val seen = new java.util.LinkedHashSet[String](nSh * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, len)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = UTF8String.fromString(it.next()); x += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), k))
}
