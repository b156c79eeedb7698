package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

import graft.expr._
import graft.llm.TextStats

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("SELECT transliterate(address) ...")` works exactly like the
  * Column API (SURVEY §3.5: both entries converge at the analyzed plan).
  *
  * Two ways in:
  *  - [[GraftFunctions.register]] on an existing session;
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) at session build time.
  */
object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, es: Seq[Expression], min: Int, max: Int): Unit =
    if (es.length < min || es.length > max)
      throw new IllegalArgumentException(
        s"$name takes ${if (min == max) s"$min" else s"$min to $max"} " +
          s"argument(s), got ${es.length}")

  /** (name, builder) for every SQL-exposed custom function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "transliterate" -> (es => { arity("transliterate", es, 1, 1)
      Transliterate(es.head) }),
    "digits_only" -> (es => { arity("digits_only", es, 1, 1)
      DigitsOnly(es.head) }),
    "cosine_sim_e6" -> (es => { arity("cosine_sim_e6", es, 2, 2)
      CosineSimE6(es(0), es(1)) }),
    "sig_agreement" -> (es => { arity("sig_agreement", es, 2, 2)
      SigAgreement(es(0), es(1)) }),
    "sorted_set_contains_all" -> (es => { arity("sorted_set_contains_all", es, 2, 2)
      SortedSetContainsAll(es(0), es(1)) }),
    "minhash_sig" -> (es => { arity("minhash_sig", es, 1, 3)
      MinHashSig(es.head,
        if (es.length > 1) litInt(es(1), "shingleK") else 3,
        if (es.length > 2) litInt(es(2), "numHashes") else 64) }),
    "hyperplane_sig" -> (es => { arity("hyperplane_sig", es, 1, 2)
      HyperplaneSig(es.head,
        if (es.length > 1) litInt(es(1), "bits") else 12) }),
    "address_parts" -> (es => { arity("address_parts", es, 1, 1)
      AddressParts(es.head) }),
    "long_dot" -> (es => { arity("long_dot", es, 2, 2)
      LongDot(es(0), es(1)) }),
    "winnow_sig" -> (es => { arity("winnow_sig", es, 1, 3)
      WinnowSig(es.head,
        if (es.length > 1) litInt(es(1), "k") else 5,
        if (es.length > 2) litInt(es(2), "w") else 4) }),
    "ngram_hashes" -> (es => { arity("ngram_hashes", es, 1, 2)
      NgramHashes(es.head,
        if (es.length > 1) litInt(es(1), "n") else 3) }),
    "text_counts" -> (es => { arity("text_counts", es, 1, 1)
      TextCounts(es.head, TextStats.enStopwords,
        TextStats.langVocab("en"), TextStats.langVocab("de"),
        TextStats.langVocab("es"), TextStats.langVocab("fr")) }),
    // simhash_bits(text[, md5_base]) — md5_base=true for the md5-portable
    // bit source (see Dedup.simhashMd5), default the fast xxhash64
    "simhash_bits" -> (es => { arity("simhash_bits", es, 1, 2)
      SimHashBits(es.head,
        es.length > 1 && {
          // foldable guard first: eval() on a non-literal (e.g. a column
          // reference) throws an unbound-attribute internal error instead
          // of this function's intended argument message
          if (!es(1).foldable) throw new IllegalArgumentException(
            s"md5_base must be a boolean literal, got ${es(1).sql}")
          es(1).eval() match {
            case b: Boolean => b
            case other => throw new IllegalArgumentException(
              s"md5_base must be a boolean literal, got $other")
          }
        }) })
  )

  /** Register every function on an existing session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** Session-extensions injector: the registration path for sessions built
  * with `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
    // whole-operator extension: per-group top-k heap operator + the rule
    // that rewrites row_number-window + rank-filter plans into it
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
