package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word-n-gram md5-head32 hashes: element i is the hash of the
  * gram starting at token i (0-based), duplicates kept, order preserved —
  * the positional sibling of [[NgramHashes]] (which dedupes by hash and
  * drops order) for operators that need to know WHERE a gram sits:
  * cross-document shared-span extraction chains matches whose positions
  * are consecutive, so the array index IS the coordinate.
  *
  * Same tokenization and hashing as NgramHashes (lowercase, whitespace
  * split, md5-head32 per gram, whole word list when shorter than n) so
  * the two gram views of a document always agree. Empty/whitespace-only
  * text → empty array; non-empty text yields exactly
  * `max(len - n, 0) + 1` hashes with no gaps (interior tokens of a
  * whitespace split are never empty).
  */
case class NgramHashSeq(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash_seq"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val words = StrUtil.splitWs(StrUtil.lowerRoot(StrUtil.sparkTrim(input.toString)))
    val len = words.length
    if (len == 0 || (len == 1 && words(0).isEmpty))
      return new GenericArrayData(Array.emptyLongArray)
    val nGrams = math.max(len - n, 0) + 1
    val out = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out(i) = MinHashSig.md5Head32(UTF8String.fromString(sb.toString).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashSeq", this, classOf[NgramHashSeq].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashSeq =
    copy(child = newChild)
}

object NgramHashSeq {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(NgramHashSeq(GraftBridge.expression(text), n))
}
