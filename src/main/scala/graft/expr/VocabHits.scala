package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace-separated words (lowercased) that appear in a fixed
  * vocabulary — the language-ID / stopword primitive of TextStats.
  *
  * Equivalent to `size(filter(split(lower(trim(text)), "\\s+"),
  * w => array_contains(vocab, w)))`, but the higher-order `filter` is
  * CodegenFallback (interpreted per element); this is one scan with a
  * hash-set probe per word. Counts OCCURRENCES (not distinct matches),
  * matching the Column form and the DuckDB list_filter oracle.
  */
case class VocabHits(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vocab_hits"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): Int = {
    // StrUtil = Spark trim/split semantics (0x20-only trim, trailing
    // empties kept) — String defaults differ on both.
    val words = StrUtil.splitWs(StrUtil.lowerRoot(
      StrUtil.sparkTrim(input.toString)))
    var n = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) n += 1
      i += 1
    }
    n
  }

  // real codegen (not CodegenFallback): one virtual call into compute(),
  // no per-row boxed eval, and the surrounding stage stays fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabHits", this, classOf[VocabHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
}

object VocabHits {
  def apply(text: Column, vocab: Seq[String]): Column =
    GraftBridge.column(VocabHits(GraftBridge.expression(text), vocab))
}
