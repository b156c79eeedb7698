package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram md5-head32 hashes of a text as ONE tight primitive
  * loop — the shingle front half of [[MinHashSig]] without the permutation
  * pass, for operators that consume the gram-hash SET itself
  * (decontamination overlap, containment checks) rather than a signature.
  *
  * The pure-Column formulation (split → transform(slice/array_join) →
  * array_distinct → transform(md5)) is semantically identical but runs on
  * interpreted higher-order functions; measured at sf0.1 it costs ~3 s per
  * pass over 5k docs where this loop is ~0.1 s — and the corpus gram scan
  * is the dominant narrow stage of decontamination at any scale.
  *
  * Semantics: lowercase, whitespace-split (StrUtil replicates Spark's
  * trim/split edge cases), n-word grams (the whole word list when shorter
  * than n), then md5-head32 per gram with DISTINCT-BY-HASH (first
  * occurrence order). Deduping by hash, not by gram string, is what the
  * SQL oracle mirrors (`list_distinct` AFTER hashing) so an md5-head32
  * collision can never split the engines. Empty text → empty array.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): ArrayData = {
    val words = StrUtil.splitWs(StrUtil.lowerRoot(StrUtil.sparkTrim(input.toString)))
    val len = words.length
    val nGrams = math.max(len - n, 0) + 1
    val seen = new java.util.HashSet[Long](nGrams * 2)
    val out = new Array[Long](nGrams)
    var m = 0
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
      if (sb.length > 0) {
        val h = MinHashSig.md5Head32(UTF8String.fromString(sb.toString).getBytes)
        if (seen.add(h)) { out(m) = h; m += 1 }
      }
      i += 1
    }
    if (m == 0) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashes", this, classOf[NgramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(NgramHashes(GraftBridge.expression(text), n))
}
