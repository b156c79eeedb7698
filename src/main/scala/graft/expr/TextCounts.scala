package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All integer counts of the TextStats profile in ONE pass over the text:
  * whitespace tokens, subword runs, non-whitespace chars, punctuation,
  * digits, stopword hits, and per-language function-word hits.
  *
  * The Column formulation evaluates ~10 independent expressions per doc —
  * several regex passes plus five vocab scans — and the interpreted ones
  * are not covered by codegen subexpression elimination. Each count here
  * replicates its Column source exactly:
  *  - tokens = `size(split(trim(text), "\\s+"))` with the blank guard
  *    (trim strips SPACES only, like Spark's trim; Java split keeps a
  *    leading empty token after non-space whitespace, drops trailing)
  *  - subwords = matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (ASCII runs,
  *    single other non-ws chars; `\s` is Java ASCII whitespace)
  *  - nonws = `length(regexp_replace(trim(text), "\\s+", ""))`
  *  - punct/digits = chars of `[.,;:!?]` / `[0-9]` over the full text
  *  - vocab hits count OCCURRENCES among lowercased whitespace words
  */
case class TextCounts(child: Expression, stopwords: Seq[String],
    vocabEn: Seq[String], vocabDe: Seq[String], vocabEs: Seq[String],
    vocabFr: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TextCounts.schema
  override def prettyName: String = "text_counts"

  @transient private lazy val stopSet = TextCounts.toSet(stopwords)
  @transient private lazy val enSet = TextCounts.toSet(vocabEn)
  @transient private lazy val deSet = TextCounts.toSet(vocabDe)
  @transient private lazy val esSet = TextCounts.toSet(vocabEs)
  @transient private lazy val frSet = TextCounts.toSet(vocabFr)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString

    // one char pass: punct, digits, nonws, subword runs
    var punct = 0
    var digits = 0
    var nonws = 0
    var subwords = 0
    var run = 0 // 0 none, 1 letters, 2 digits
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // Spark length()/regex classes are code-POINT based: a surrogate
      // pair is one char to them, so consume both units as one.
      val cpLen =
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
      if (c >= '0' && c <= '9') digits += 1
      if (isWs(c)) {
        run = 0
      } else {
        nonws += 1
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
          if (run != 1) { subwords += 1; run = 1 }
        } else if (c >= '0' && c <= '9') {
          if (run != 2) { subwords += 1; run = 2 }
        } else {
          subwords += 1; run = 0
        }
      }
      i += cpLen
    }

    val trimmed = StrUtil.sparkTrim(s)

    // StrUtil.splitWs keeps trailing empty tokens like Spark's split —
    // "abc\n" is 2 tokens to Spark and the DuckDB oracle.
    val tokens = if (trimmed.isEmpty) 0 else StrUtil.splitWs(trimmed).length

    var stop = 0; var en = 0; var de = 0; var es = 0; var fr = 0
    if (trimmed.nonEmpty) {
      val words = StrUtil.splitWs(StrUtil.lowerRoot(trimmed))
      var w = 0
      while (w < words.length) {
        val word = words(w)
        if (stopSet.contains(word)) stop += 1
        if (enSet.contains(word)) en += 1
        if (deSet.contains(word)) de += 1
        if (esSet.contains(word)) es += 1
        if (frSet.contains(word)) fr += 1
        w += 1
      }
    }

    new GenericInternalRow(Array[Any](tokens, subwords, nonws, punct, digits,
      stop, en, de, es, fr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textCounts", this, classOf[TextCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((org.apache.spark.unsafe.types.UTF8String) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextCounts =
    copy(child = newChild)
}

object TextCounts {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("h_en", IntegerType, nullable = false),
    StructField("h_de", IntegerType, nullable = false),
    StructField("h_es", IntegerType, nullable = false),
    StructField("h_fr", IntegerType, nullable = false)))

  private def toSet(xs: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](xs.size * 2)
    xs.foreach(s.add)
    s
  }

  def apply(text: Column, stopwords: Seq[String], vocabEn: Seq[String],
      vocabDe: Seq[String], vocabEs: Seq[String], vocabFr: Seq[String]): Column =
    GraftBridge.column(TextCounts(GraftBridge.expression(text), stopwords,
      vocabEn, vocabDe, vocabEs, vocabFr))
}
