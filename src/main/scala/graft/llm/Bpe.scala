package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Lineage._

/** Byte-pair-encoding merge learning (Sennrich et al., ACL'16) — the
  * tokenizer-training step of an LLM data pipeline, run where it belongs
  * at scale: ONE corpus pass builds the word-frequency table, and every
  * merge iteration after that touches only the vocabulary (|V| rows, not
  * |corpus|), exactly how production BPE trainers bound their cost. All
  * arithmetic is integer pair-counting with a deterministic total-order
  * tiebreak (count desc, then lexicographic), so an oracle can replay the
  * recurrence bit-for-bit.
  *
  * Symbol representation: each symbol is individually wrapped in U+001F
  * unit separators ("ab" for [a, b]). A merge of
  * (l, r) is then a LITERAL left-to-right non-overlapping string replace
  * of "␟l␟␟r␟" with "␟lr␟" — which is precisely BPE's greedy scan order
  * (for "a a a" the first two merge, the third survives), and, because
  * every symbol carries its own delimiters, consecutive occurrences
  * ("a b a b") all fire in one pass. Both Spark `replace` and DuckDB
  * `replace` share these semantics, so the merge step needs no UDF and
  * stays inside codegen.
  *
  * Reference scope: the reference pipeline (transform.py) normalizes and
  * tokenizes listing text but ships no tokenizer training; this extends
  * the engine's text family with the standard published algorithm.
  */
object Bpe {

  val Sep = "\u001f"

  /** Word-frequency table: lowercase whitespace tokens, [a-z]{2,12} only
    * (caps the alphabet and drops punctuation noise), with an absolute
    * document-frequency floor. The ONLY corpus-sized pass in the trainer.
    */
  def wordFreqs(docs: DataFrame, minFreq: Long): DataFrame =
    docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")).between(2, 12))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)

  /** Initial symbol string: every character wrapped in its own separators. */
  def charSyms(w: Column): Column =
    regexp_replace(w, "(.)", Sep + "$1" + Sep)

  /** Clean symbol array from the wrapped representation. */
  private def symbolArr(sym: Column): Column =
    split(trim(sym, Sep), Sep + Sep)

  /** Learn `k` merges over (w, freq) words. Each iteration: one
    * explode+sum over the vocabulary for pair counts, a 1-row
    * TakeOrdered argmax, and a broadcast rewrite — no driver-side state,
    * no corpus re-scan. Returns (merge table (step, left, right,
    * pair_count), final words (w, sym, freq)).
    */
  def learnMerges(words0: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    var words = words0
      .select(col("w"), charSyms(col("w")).as("sym"), col("freq"))
      .truncateLineage()
    var merges: DataFrame = null
    for (step <- 1 to k) {
      val counts = words
        .select(col("freq"), symbolArr(col("sym")).as("parts"))
        .filter(size(col("parts")) >= 2) // fully-merged words have no pairs
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("parts")) - 1),
            i => struct(element_at(col("parts"), i).as("l"),
              element_at(col("parts"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val top = counts
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .truncateLineage()
      val stepRow = top.select(lit(step).cast("long").as("step"),
        col("l").as("left_sym"), col("r").as("right_sym"), col("cnt").as("pair_count"))
      merges = if (merges == null) stepRow else merges.union(stepRow)
      words = words
        .crossJoin(broadcast(top.select(col("l").as("_ml"), col("r").as("_mr"))))
        .select(col("w"),
          replace(col("sym"),
            concat(lit(Sep), col("_ml"), lit(Sep), lit(Sep), col("_mr"), lit(Sep)),
            concat(lit(Sep), col("_ml"), col("_mr"), lit(Sep))).as("sym"),
          col("freq"))
        .truncateLineage()
    }
    (merges, words)
  }

  /** Segmentation view of the trained vocabulary: (w, seg, n_sym, freq)
    * with symbols joined by '|'. */
  def segmented(words: DataFrame): DataFrame =
    words.select(col("w"),
      array_join(symbolArr(col("sym")), "|").as("seg"),
      size(symbolArr(col("sym"))).cast("long").as("n_sym"),
      col("freq"))
}
