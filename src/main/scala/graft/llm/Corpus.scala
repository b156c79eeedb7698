package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Lineage._

/** Corpus-preparation operators for training-data pipelines: deterministic
  * split assignment, capacity-based sequence packing, and distribution
  * statistics. All pure Column/window compositions — codegen'd, one shuffle
  * each, linear at any corpus size.
  *
  * (No counterpart in the reference, which stops at a cleaned table —
  * scripts/transform.py:115-116; these are the downstream steps a corpus
  * consumer runs before training.)
  */
object Corpus {

  /** Deterministic train/val/test assignment from a salted md5 of the id —
    * stable across runs, machines, and partitionings; adding documents
    * never reassigns existing ones (the property random splits lack).
    *
    * The first 8 md5 hex digits are a uniform u32 rendered in hex; split
    * thresholds are the fraction boundaries as 8-digit hex strings, so the
    * whole decision is ONE string compare — no bigint parsing, and
    * trivially reproducible in any engine with md5().
    *
    * @param fractions (name, fraction) in order; fractions must sum to ≤ 1,
    *                  the last bucket absorbs the remainder.
    */
  def splitAssign(idCol: Column, fractions: Seq[(String, Double)] =
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05),
      salt: String = "graft"): Column = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions must sum to <= 1: $fractions")
    val h8 = substring(md5(concat(idCol.cast("string"), lit("#" + salt))), 1, 8)
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cases = fractions.map(_._1).zip(bounds).dropRight(1)
    cases.foldRight(lit(fractions.last._1): Column) { case ((name, hi), rest) =>
      // clamp to 0xffffffff: a non-final cumulative bound that reaches 1.0
      // (trailing zero-fraction buckets) would otherwise format as the
      // 9-char "100000000", breaking the 8-hex-char lexicographic compare
      val t = math.min(math.floor(hi * 4294967296.0).toLong, 0xFFFFFFFFL)
      when(h8 < lit(f"$t%08x"), lit(name)).otherwise(rest)
    }
  }

  /** Whitespace token count with the engine's standard semantics (empty
    * after trim → 0; Spark split keeps interior empties — bit-identical to
    * TextCounts.n_tokens and the DuckDB oracle's expression).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Temperature-scaled multilingual/domain mixture plan (Conneau et al.,
    * ACL'20 "Unsupervised Cross-lingual Representation Learning at Scale"
    * §3.1; the α-exponentiated sampling every multilingual pretraining
    * corpus uses): target share of source i ∝ tokens_i^α with α = 1/2, so
    * low-resource sources are up-weighted relative to their raw size
    * without letting any single source dominate.
    *
    * Integer-exact cross-engine: the only non-integral op is
    * floor(sqrt(tokens)) — IEEE-754 sqrt is correctly rounded in both
    * JVM and DuckDB, and for tokens < 2^52 the floor is bit-identical
    * (document corpora measured in tokens-per-source stay far below).
    * From the weights everything is integral e6 arithmetic:
    *
    *   share_e6(i)  = w_i·1e6 DIV Σw     (w_i = floor(sqrt(tokens_i)))
    *   repeat_e6(i) = share_e6(i)·T DIV tokens_i    (T = Σ tokens)
    *
    * repeat_e6 is the epochs-over-this-source factor needed to hit its
    * target share of a token budget equal to the whole corpus — > 1e6
    * means the source is seen more than once per budget (up-sampled),
    * < 1e6 down-sampled. One groupBy over the corpus plus a broadcast
    * 1-row totals join; nothing corpus-sized is shuffled twice.
    */
  def mixturePlan(docs: DataFrame, textCol: Column, groupCol: Column): DataFrame = {
    val base = docs
      .groupBy(groupCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(textCol).cast("long")).as("tokens"))
      // a source whose docs are ALL empty (tokens = 0, so w = 0) can never
      // take a share of the token budget; dropping it here keeps repeat_e6
      // total (its DIV tokens would be a null/divide-by-zero that
      // mixtureCopies/mixtureApply would silently propagate)
      .filter(col("tokens") > 0)
      .select(col("source"), col("n_docs"), col("tokens"),
        floor(sqrt(col("tokens").cast("double"))).cast("long").as("w"))
    val totals = base.agg(sum(col("tokens")).as("tot_tokens"),
      sum(col("w")).as("tot_w"))
    base.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        expr("(w * 1000000L) DIV tot_w").as("share_e6"),
        expr("(((w * 1000000L) DIV tot_w) * tot_tokens) DIV tokens").as("repeat_e6"))
  }

  /** Realize a [[mixturePlan]]: deterministic per-document copy counts
    * that hit each source's temperature-scaled target share in
    * expectation, plus the realized per-source totals next to the
    * targets so the sampling error is measurable.
    *
    * Every document gets floor(repeat_e6 / 1e6) whole copies; the
    * fractional remainder becomes a Bernoulli trial decided by the
    * document's salted md5-head32 mod 1e6 — the same engine-independent
    * coin as [[splitAssign]], so the realized corpus is identical on any
    * engine and stable under reruns (no RNG state, no shuffle-order
    * dependence). Scale shape: the plan is a per-source handful of rows
    * (broadcast); the apply is one narrow pass over the corpus plus one
    * per-source aggregation.
    *
    * @return per source: (source, n_docs, realized_docs, realized_tokens,
    *         target_share_e6, realized_share_e6)
    */
  /** Per-document realized copy counts under the [[mixturePlan]]:
    * (source, doc_id, toks, share_e6, n_copies) — floor(repeat_e6/1e6)
    * whole copies plus the md5-coin Bernoulli remainder. The building
    * block [[mixtureApply]] aggregates and the training-mix layout
    * explodes.
    */
  def mixtureCopies(docs: DataFrame, textCol: Column, groupCol: Column,
      idCol: Column): DataFrame = {
    val plan = mixturePlan(docs, textCol, groupCol)
    val h = conv(substring(md5(
      concat(idCol.cast("string"), lit("#mix")).cast("binary")), 1, 8),
      16, 10).cast("long")
    docs
      .select(groupCol.as("source"), idCol.as("doc_id"),
        tokenCount(textCol).cast("long").as("toks"),
        (h % 1000000L).as("__frac"))
      .join(broadcast(plan.select("source", "share_e6", "repeat_e6")), "source")
      .withColumn("n_copies",
        expr("repeat_e6 DIV 1000000") +
          when(col("__frac") < expr("repeat_e6 % 1000000"), lit(1L))
            .otherwise(lit(0L)))
      .select(col("source"), col("doc_id"), col("toks"), col("share_e6"),
        col("n_copies"))
  }

  def mixtureApply(docs: DataFrame, textCol: Column, groupCol: Column,
      idCol: Column): DataFrame = {
    val perDoc = mixtureCopies(docs, textCol, groupCol, idCol)
    val real = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_copies")).as("realized_docs"),
      sum(col("n_copies") * col("toks")).as("realized_tokens"),
      max(col("share_e6")).as("target_share_e6"))
    val tot = real.agg(sum(col("realized_tokens")).as("tot_real"))
    real.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("realized_docs"),
        col("realized_tokens"), col("target_share_e6"),
        expr("(realized_tokens * 1000000L) DIV tot_real").as("realized_share_e6"))
  }

  /** Capacity-based sequence packing: documents are laid out in a
    * deterministic order (orderCol) per stream (partitionCol, e.g.
    * language), concatenated conceptually, and cut into fixed token-budget
    * chunks. Each doc is assigned the chunk its FIRST token lands in
    * (GPT-style packing with document straddling). Emits
    * (pack_id, pack_offset) per document.
    *
    * The running sum does NOT run in a per-stream window — partitionCol
    * is typically a LOW-cardinality key (language, source), so
    * `sum(tokens) OVER (PARTITION BY stream ORDER BY …)` would serialize
    * each stream into one task that sorts the stream's whole corpus at
    * any scale. It rides [[graft.etl.Ids.groupedRunningSum]]'s two-pass
    * offset scheme instead (range-partition by (stream, order), tiny
    * per-(partition, stream) offset map on the driver) — parallelism
    * stays partition-bound however few streams there are. Deterministic
    * whenever (partitionCol, orderCol) is a total order.
    */
  def packSequences(docs: DataFrame, tokensCol: Column, partitionCol: Column,
      orderCol: Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val prepped = docs
      .withColumn("__pack_g", partitionCol)
      .withColumn("__pack_w", tokensCol.cast("long"))
    val ranked = graft.etl.Ids.groupedRunningSum(prepped, Seq("__pack_g"),
      Seq(orderCol), "__pack_w", "__pack_cum", "__pack_tot")
    val start = col("__pack_cum") - col("__pack_w")
    ranked
      .withColumn("pack_id", floor(start / capacity))
      .withColumn("pack_offset", (start % capacity).cast("long"))
      .drop("__pack_g", "__pack_w", "__pack_cum", "__pack_tot")
  }

  /** Per-group exact token-count quantiles (linear interpolation — the
    * standard type-7 estimator both Spark `percentile` and DuckDB
    * `quantile_cont` implement). Exact percentile shuffles each group's
    * values to one reducer — right for distribution reports over grouped
    * corpora; at extreme group sizes use approx_percentile (sketch,
    * mergeable) and give up oracle-exactness.
    */
  def tokenQuantiles(docs: DataFrame, textCol: Column, groupCol: Column,
      fractions: Seq[Double] = Seq(0.25, 0.5, 0.9, 0.99)): DataFrame = {
    val qs = percentile(tokenCount(textCol),
      array(fractions.map(lit): _*)).as("qs")
    docs.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_docs"), qs)
      .select(Seq(col("grp"), col("n_docs")) ++
        fractions.indices.map(i => col("qs").getItem(i).as(s"q$i")): _*)
  }

  /** End-to-end corpus curation — the LLM-pipeline analogue of the
    * reference's 13-step property transform chain: language filter →
    * quality floor → exact dedup (content fingerprint, keep min doc_id) →
    * near-duplicate removal → deterministic split assignment. Operates on
    * a `documents`-shaped table (doc_id + textCol).
    *
    * Near-dup rule: a document is dropped when it is the GREATER id of any
    * near-dup pair (md5-bit simhash within `maxHamming`) among the
    * filtered+deduped survivors. Each cluster's min-id member can never be
    * a pair's greater element, so it always survives — deterministic, one
    * anti-join, the standard cheap alternative to connected components
    * (chain-transitive members are over-dropped by design).
    *
    * Plan shape: one narrow stats pass (a single TextCounts eval per doc)
    * → fp-key aggregation + semi-join → simhash aggregation over the
    * survivors only → banded Hamming pair join → anti-join → split
    * column. Every stage is a bucketed equi-join or map-side-combinable
    * aggregation — linear at corpus scale, no all-pairs work anywhere.
    */
  /** @param persistIntermediate cache the post-dedup survivor frame, which
    *        the DAG consumes twice (simhash side and final anti-join side)
    *        — without it the stats pass runs twice. Off by default (the
    *        operator then holds no storage); turn on for large corpora
    *        where recomputing the stats scan costs more than caching the
    *        (already filtered and deduped) survivors.
    */
  def curate(docs: DataFrame, keepLangs: Seq[String], minQualityE6: Long,
      textCol: String = "text", maxHamming: Int = 3,
      persistIntermediate: Boolean = false): DataFrame = {
    val stats = TextStats.documentStats(docs, textCol)
    val filtered = stats.filter(col("lang_guess").isin(keepLangs: _*) &&
      col("quality_e6") >= minQualityE6)
    // Dedup as ONE min_by aggregation, not exactDedupByKey's agg+semi-join:
    // the semi-join form evaluates its input subtree twice, and here that
    // subtree is the TextCounts stats pass — the most expensive narrow
    // stage of the chain. min_by carries the needed columns through the
    // one fp shuffle instead (still map-side partial-aggregated).
    val deduped0 = filtered
      .groupBy(col("fp"))
      .agg(min_by(struct(col("doc_id"), col("lang_guess"), col("quality_e6")),
        col("doc_id")).as("__r"))
      .select(col("__r.doc_id").as("doc_id"), col("__r.lang_guess").as("lang_guess"),
        col("__r.quality_e6").as("quality_e6"))
    val deduped = if (persistIntermediate) deduped0.persist() else deduped0
    val survivorText = docs.select(col("doc_id"), col(textCol))
      .join(deduped.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val pairs = Dedup.simhashNearDupPairsFromSigs(
      Dedup.simhashMd5(survivorText, textCol, "doc_id"), maxHamming)
    val canonical = deduped.join(
      pairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    canonical.select(col("doc_id"), col("lang_guess"), col("quality_e6"),
      splitAssign(col("doc_id")).as("split"))
  }

  /** Benchmark decontamination report: for every corpus document, how many
    * of its word n-gram hashes also occur in an evaluation set. Training
    * corpora must be scrubbed of eval-set text or downstream benchmark
    * numbers are meaningless; the standard check (13-grams at web scale,
    * n is a knob) is exactly this overlap count plus a threshold flag.
    *
    * Returns (id, n_grams, n_hits, contam_ppm, contaminated): n_grams =
    * distinct n-grams in the doc, n_hits = how many of them appear in the
    * eval set, contam_ppm = the integer-exact ratio in parts-per-million,
    * contaminated = n_hits ≥ flagPct% of n_grams. All arithmetic is
    * integer (`div`, cross-multiplied compare) and the gram hash is the
    * engine-portable md5-head32, so the whole report — flags included — is
    * reproducible bit-for-bit in any engine with md5().
    *
    * Scale shape: eval sets are tiny next to a training corpus (O(10^5)
    * grams vs O(10^11)), so the eval gram set is BROADCAST and the overlap
    * is a map-side semi-join — the corpus is never shuffled before the
    * per-doc hit count, and that aggregation is map-side combinable. One
    * small exchange total, no corpus-sized state anywhere.
    */
  def contaminationReport(corpus: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String, n: Int = 3, flagPct: Int = 10): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(flagPct >= 1 && flagPct <= 100, s"flagPct must be in [1,100], got $flagPct")
    // one-pass primitive gram hashing (NgramHashes: split → n-grams →
    // md5-head32, distinct BY HASH) — the interpreted-HOF Column form of
    // the same pipeline measured ~3 s/pass at sf0.1 and this query needs
    // the corpus scanned once, not thrice (parity pinned in CorpusSpec)
    val corpusGrams = corpus.select(col(idCol).as("id"),
      graft.expr.NgramHashes(col(textCol), n).as("hs"))
    val evalGrams = evalDocs
      .select(explode(graft.expr.NgramHashes(col(textCol), n)).as("h"))
      .distinct()
    // explode_outer keeps gram-less docs; the left join's hit marker and
    // the carried n_grams reduce in ONE aggregation on id
    corpusGrams
      .select(col("id"), size(col("hs")).cast("long").as("n_grams"),
        explode_outer(col("hs")).as("h"))
      .join(broadcast(evalGrams.select(col("h"), lit(1).as("__hit"))), Seq("h"), "left")
      .groupBy("id")
      .agg(min(col("n_grams")).as("n_grams"), count(col("__hit")).as("n_hits"))
      .select(col("id"), col("n_grams"), col("n_hits"),
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("n_hits * 1000000 DIV n_grams")).as("contam_ppm"),
        (col("n_grams") > 0 && col("n_hits") * 100 >= col("n_grams") * flagPct)
          .as("contaminated"))
  }

  /** Gram-level split-redundancy audit: for each doc, the fraction of its
    * word-n-gram hashes NOT present in a reference corpus — how much of
    * the val split a model could simply memorize from train shows up as
    * LOW novelty here even when doc-level dedup is clean (shared
    * boilerplate, quotes, recombined passages). Same one-pass NgramHashes
    * gram pipeline as [[contaminationReport]], with the opposite scale
    * shape: the reference side is CORPUS-SIZED (the train split), so the
    * hit join is a shuffle semi-join on the gram hash — never a
    * broadcast. Linear in total grams at any corpus size.
    *
    * @return (id, n_grams, n_hits, novel_ppm); gram-less docs report
    *         novel_ppm = 0 (no grams, no evidence either way).
    */
  def noveltyReport(docs: DataFrame, refDocs: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val docGrams = docs.select(col(idCol).as("id"),
      graft.expr.NgramHashes(col(textCol), n).as("hs"))
    val refGrams = refDocs
      .select(explode(graft.expr.NgramHashes(col(textCol), n)).as("h"))
      .distinct()
    docGrams
      .select(col("id"), size(col("hs")).cast("long").as("n_grams"),
        explode_outer(col("hs")).as("h"))
      .join(refGrams.select(col("h"), lit(1).as("__hit")), Seq("h"), "left")
      .groupBy("id")
      .agg(min(col("n_grams")).as("n_grams"), count(col("__hit")).as("n_hits"))
      .select(col("id"), col("n_grams"), col("n_hits"),
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("(n_grams - n_hits) * 1000000 DIV n_grams"))
          .as("novel_ppm"))
  }

  /** Fixed-window document chunking with overlap — the retrieval/RAG
    * preprocessing step: each document's whitespace tokens are cut into
    * windows of `width` tokens whose starts advance by `width - overlap`,
    * so consecutive chunks share `overlap` tokens and every token lands in
    * at least one chunk. Emits (doc_id, chunk_id, n_chunk_tokens,
    * chunk_text); empty/whitespace-only documents emit no chunks.
    *
    * Tokenization is the engine's standard whitespace split (same
    * semantics as [[tokenCount]]), so chunk boundaries agree with every
    * other token-count operator. The chunk count is the closed form
    * `1 + ceil(max(0, n - width) / step)` computed in ALL-INTEGER
    * arithmetic (`DIV` over non-negative operands — no float ceil), so the
    * layout replays bit-for-bit in any engine.
    *
    * Scale shape: a narrow per-row explode — output is a bounded
    * ~`n/step` multiple of the input and chunking needs NO shuffle at any
    * corpus size; the window slice is positional on the already-split
    * token array (no re-scan of the text per chunk).
    */
  def chunkDocuments(docs: DataFrame, textCol: String, idCol: String,
      width: Int, overlap: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(overlap >= 0 && overlap < width,
      s"overlap must be in [0, width), got $overlap")
    val step = width - overlap
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
      // nc = 1 + ceil(max(0, n - width) / step), kept non-negative so
      // integer DIV (truncation) IS the ceil and engines can't disagree
      // on negative-operand rounding
      .withColumn("__nc", expr(
        s"1 + (greatest(size(__toks) - $width, 0) + ${step - 1}) DIV $step"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * step + 1).cast("int"),
          lit(width)).as("__c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Deterministic stratified quota sample: the `quota` rows of each
    * stratum (e.g. language) whose md5-derived id-hash is smallest — the
    * bottom-k-in-hash-order idea of [[graft.analytics.Sketch.kmvQuantiles]]
    * applied to corpus REBALANCING. A language-skewed crawl (90% en) comes
    * out with ≤ quota docs per language, uniformly sampled within each.
    *
    * Properties a `sampleBy`-style Bernoulli sample lacks:
    *  - exact output size per stratum (min(quota, |stratum|), never ±√n);
    *  - determinism: same corpus → same sample on any engine or
    *    partitioning (md5, no seeded RNG), and a grown corpus only ever
    *    SWAPS sample members whose hash displaces a larger one — so the
    *    selection is engine-portable and oracle-checkable.
    *
    * Scale shape: hash is narrow; the bottom-k per group runs on the
    * heap-based TopKPerGroupExec (partial heaps before the exchange), so
    * state is O(quota) per stratum at every stage — no per-group sort, no
    * global sample table.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val base = df.select(stratum.as("stratum"), id.as("id"),
      graft.analytics.Sketch.hashPoint32(id).as("__h"))
    // bottom-quota by hash ascending (heap keeps the quota largest of -h);
    // id tiebreak pins the sample across ~2^-32 hash-collision flukes
    graft.plans.TopK.perGroup(base, Seq("stratum"), -col("__h"), col("id"), quota)
      .select(col("stratum"), col("id"))
  }

  /** Weighted priority sample (Duffield, Lund & Thorup, "Priority
    * sampling for estimation of arbitrary subset sums", JACM'07): each
    * row draws a deterministic uniform u from its id's md5, gets priority
    * p = w / u, and the k highest-priority rows form the sample. The
    * (k+1)-th priority τ is the estimation threshold: Σ max(w_i, τ) over
    * the sample is an unbiased estimator of the TOTAL weight — the
    * published optimal way to cut a 100 TB corpus to a fixed-size subset
    * that still answers weighted aggregate questions.
    *
    * Determinism: u is md5-head32 (engine-portable, no seeded RNG) and p
    * is ONE long→double division — IEEE 754 division is correctly
    * rounded in every engine, so priorities are bit-identical in the
    * DuckDB oracle and ties (broken by id) cannot reorder.
    *
    * Scale shape: the signature is narrow (one md5 per row); top-(k+1)
    * by (p, id) plans as TakeOrderedAndProject — an O(k) heap per
    * partition, then a single k-row merge on the driver side of the
    * exchange. No global sort, no full shuffle. The k+1-row result is
    * broadcast-sized by construction.
    *
    * @return top-(k+1) rows as (doc_id, w, pri, rk); rk ∈ [1, k+1] —
    *         rk ≤ k is the sample, rk = k+1 carries τ. Requires the
    *         input to have more than k rows (else τ is undefined).
    */
  def prioritySample(docs: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // u = (h+1)/2^32 ∈ (0, 1]; computed as p = w·2^32 / (h+1) — one IEEE
    // multiply + one divide, both correctly rounded, both engines.
    // w·2^32 stays exactly representable while w < 2^21 (~2M per-row
    // weight; token/char counts are far under it).
    val h = conv(substring(md5(
      concat(id.cast("string"), lit("#psamp")).cast("binary")), 1, 8),
      16, 10).cast("long")
    val ranked = docs
      .select(id.cast("long").as("doc_id"), weight.cast("long").as("w"),
        h.as("__h"))
      .withColumn("pri", (col("w").cast("double") * lit(4294967296.0)) /
        (col("__h") + 1L).cast("double"))
      .drop("__h")
      .orderBy(col("pri").desc, col("doc_id")) // TakeOrderedAndProject heap
      .limit(k + 1)
    // rank the k+1 survivors; the window runs on a broadcast-sized frame
    ranked.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("pri").desc, col("doc_id"))))
  }

  /** Per-stratum [[prioritySample]]: an independent DLT priority sample
    * of size `k` (+ the τ row) inside EVERY group, in one pass — the
    * heap-based TopKPerGroupExec keeps O(k) state per stratum before the
    * exchange, so sampling 10k language×domain strata of a 100 TB corpus
    * is one aggregation, not 10k jobs. Each stratum's Σ max(w, τ) then
    * estimates that stratum's total weight unbiasedly (subset sums are
    * exactly what DLT priorities exist for).
    *
    * @return (stratum, doc_id, w, pri, rnk) with rnk ∈ [1, k+1] per
    *         stratum; rnk ≤ k is the sample, rnk = k+1 carries τ.
    *         Strata with ≤ k rows have no τ row (their "sample" is the
    *         whole stratum — estimation is exact there by definition).
    */
  def prioritySampleByGroup(docs: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(md5(
      concat(id.cast("string"), lit("#psamp")).cast("binary")), 1, 8),
      16, 10).cast("long")
    val base = docs.select(stratum.as("stratum"), id.cast("long").as("doc_id"),
      weight.cast("long").as("w"), h.as("__h"))
      .withColumn("pri", (col("w").cast("double") * lit(4294967296.0)) /
        (col("__h") + 1L).cast("double"))
      .drop("__h")
    graft.plans.TopK.perGroup(base, Seq("stratum"), col("pri"),
      col("doc_id"), k + 1, rankName = "rk")
  }

  /** DSIR-shaped importance scoring for domain-matched data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): score every raw document by how much
    * its hashed-n-gram profile looks like the TARGET domain rather than
    * the raw pool, then keep the highest-scoring docs. The feature space
    * is `buckets` md5-hashed unigram buckets (the repo's reproducible
    * md5-bucket convention — Sketch.cmsMatrix uses the same head-32
    * parse), and the per-bucket log-likelihood ratio is computed at
    * WHOLE-BIT resolution with zero transcendentals, the
    * [[graft.llm.TextStats.lmSurprisal]] trick:
    *
    *   lam(b) = ⌊log2((tgt_c+1)·(raw_tot+B))⌋ − ⌊log2((raw_c+1)·(tgt_tot+B))⌋
    *   where ⌊log2 x⌋ = length(bin(x)) − 1 for x ≥ 1 (exact in Spark and
    *   DuckDB alike), i.e. the add-one-smoothed log p_tgt(b) − log p_raw(b).
    *
    *   score(doc) = Σ_b tf_doc(b) · lam(b)   (the paper's Σ log-ratio)
    *
    * Plan shape: ONE corpus tokenize feeds both the bucket-count
    * aggregation and the per-doc tf aggregation; the bucket table is at
    * most `buckets` rows → broadcast, so the per-doc scoring join is
    * map-side. Linear in corpus size, constant-size model state — at
    * 100 TB the only caveat is the documented overflow bound
    * (tgt_c+1)·(raw_tot+B) < 2^63; past ~10^18 token-pairs split the
    * floor-log into ⌊log2 a⌋+⌊log2 b⌋ (±1 bit).
    *
    * @param isTarget boolean Column marking target-domain rows.
    * @return (doc_id, n_toks, dsir_bits) one row per doc with ≥1 token.
    */
  def dsirScores(docs: DataFrame, isTarget: Column, buckets: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_tgt"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("b", pmod(
        conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(buckets.toLong)))
      .truncateLineage() // one tokenize pass feeds counts AND tf
    val cnt = toks.groupBy("b").agg(
      count(lit(1)).as("raw_c"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_c"))
    val tot = cnt.agg(sum("raw_c").as("raw_tot"), sum("tgt_c").as("tgt_tot"))
    val lam = cnt.crossJoin(broadcast(tot)) // 1-row totals
      .withColumn("lam", expr(
        s"""(length(bin((tgt_c + 1) * (raw_tot + $buckets))) - 1)
           | - (length(bin((raw_c + 1) * (tgt_tot + $buckets))) - 1)"""
          .stripMargin.replace("\n", "")))
      .select("b", "lam")
    toks.groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
      .join(broadcast(lam), Seq("b")) // ≤ buckets rows: map-side join
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"),
        sum(col("tf") * col("lam")).as("dsir_bits"))
  }
}
