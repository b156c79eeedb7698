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

  /** (name, builder) for every SQL-exposed custom function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "transliterate" -> (es => Transliterate(es.head)),
    "digits_only" -> (es => DigitsOnly(es.head)),
    "cosine_sim_e6" -> (es => CosineSimE6(es(0), es(1))),
    "minhash_sig" -> (es => MinHashSig(es.head,
      if (es.length > 1) litInt(es(1), "shingleK") else 3,
      if (es.length > 2) litInt(es(2), "numHashes") else 64)),
    "hyperplane_sig" -> (es => HyperplaneSig(es.head,
      if (es.length > 1) litInt(es(1), "bits") else 12)),
    "address_parts" -> (es => AddressParts(es.head)),
    "text_counts" -> (es => TextCounts(es.head, TextStats.enStopwords,
      TextStats.langVocab("en"), TextStats.langVocab("de"),
      TextStats.langVocab("es"), TextStats.langVocab("fr")))
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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
}
