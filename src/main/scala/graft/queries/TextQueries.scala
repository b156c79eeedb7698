package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Bloom, Dashboard}
import graft.etl.{Ids, Parse, Transform}
import graft.expr.Transliterate
import graft.llm.{Bpe, Classifier, Corpus, Dedup, Multimodal, Similarity, TextStats}
import graft.schema.PropertySchema
import graft.streaming.Events
import graft.util.Num.{cents, e6}
import graft.queries.Fixtures._
import graft.queries.OracleShared._
import graft.util.Lineage._

/** Text-analysis family: stats/quality/lang-id, TF-IDF, CMS, packing,
  * splits, quantiles, winnow fingerprints, bloom blocklist, stratified
  * sample, robust outliers, curation chain. Pure move.
  */
private[graft] object TextQueries {

  val qs: Vector[Q] = Vector(
    Q("text_stats",
      (s, d) => TextStats.documentStats(tbl(s, d, "documents")).orderBy("doc_id"),
      Some(TEXT_STATS_SQL),
      bench = true),

    Q("text_lang_confusion",
      // in-engine model evaluation: the lang-ID classifier's confusion
      // matrix against the corpus's ground-truth lang column — per
      // (truth, guess) doc counts, the table precision/recall read off
      // of. One narrow projection + one thin aggregation; the zh column
      // (outside the classifier's vocab) lands on 'und' by design, which
      // the matrix makes visible.
      (s, d) => tbl(s, d, "documents")
        .select(col("lang"), TextStats.langId(col("text")).as("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "lang_guess"),
      Some(
        s"""WITH $TEXT_STATS_CTES
           |SELECT d.lang, s.lang_guess, count(*) AS n_docs
           |FROM documents d JOIN stats s ON s.doc_id = d.doc_id
           |GROUP BY d.lang, s.lang_guess
           |ORDER BY d.lang, s.lang_guess""".stripMargin)),

    Q("text_exact_dedup",
      (s, d) => Dedup.exactDedupByKey(
          tbl(s, d, "documents")
            .withColumn("fp", TextStats.fingerprint(col("text"))),
          col("fp"), "doc_id")
        .select("doc_id", "fp")
        .orderBy("doc_id"),
      Some(
        """SELECT min(doc_id) AS doc_id, fp FROM
          |  (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents)
          |GROUP BY fp ORDER BY doc_id""".stripMargin),
      bench = true),

    Q("text_split_assign",
      // deterministic salted-md5 train/val/test assignment — stable under
      // corpus growth, reproducible in any engine with md5()
      (s, d) => tbl(s, d, "documents")
        .select(col("doc_id"), Corpus.splitAssign(col("doc_id")).as("split"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
          |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
          |       ELSE 'test' END AS split
          |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_split_drift",
      // split-health diagnostic: per-token occurrence-rate gap between the
      // train and val splits, top-20 most-divergent tokens — the check
      // that catches split leakage or distribution shift before a model
      // trains on it. Exact integer rates (count * 1e6 DIV total), so the
      // ranking is engine-stable; two narrow shuffles (token counts,
      // split totals) at any scale.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(Corpus.splitAssign(col("doc_id")).as("split"), col("text"))
          .filter(col("split").isin("train", "val"))
          .select(col("split"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val counts = toks.groupBy("split", "tok").agg(count(lit(1)).as("n"))
        val totals = toks.groupBy("split").agg(count(lit(1)).as("tot"))
        val rates = counts.join(broadcast(totals), Seq("split"))
          .select(col("tok"), col("split"), expr("n * 1000000 DIV tot").as("rate"))
        val tr = rates.filter(col("split") === "train")
          .select(col("tok"), col("rate").as("train_rate_e6"))
        val vl = rates.filter(col("split") === "val")
          .select(col("tok"), col("rate").as("val_rate_e6"))
        tr.join(vl, Seq("tok"), "full_outer")
          .select(col("tok"),
            coalesce(col("train_rate_e6"), lit(0L)).as("train_rate_e6"),
            coalesce(col("val_rate_e6"), lit(0L)).as("val_rate_e6"))
          .withColumn("gap_e6", abs(col("train_rate_e6") - col("val_rate_e6")))
          .orderBy(desc("gap_e6"), col("tok"))
          .limit(20)
      },
      Some(
        """WITH d AS (SELECT doc_id,
          |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
          |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
          |         ELSE 'test' END AS split, text
          |  FROM documents),
          |tk AS (SELECT split, tok FROM (
          |    SELECT split, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |    FROM d WHERE split IN ('train', 'val')) WHERE tok <> ''),
          |c AS (SELECT split, tok, count(*) AS n FROM tk GROUP BY 1, 2),
          |tt AS (SELECT split, count(*) AS tot FROM tk GROUP BY 1),
          |r AS (SELECT tok, split, n * 1000000 // tot AS rate FROM c JOIN tt USING (split)),
          |a AS (SELECT tok, rate AS tr FROM r WHERE split = 'train'),
          |b AS (SELECT tok, rate AS vr FROM r WHERE split = 'val'),
          |j AS (SELECT COALESCE(a.tok, b.tok) AS tok,
          |        CAST(COALESCE(tr, 0) AS BIGINT) AS train_rate_e6,
          |        CAST(COALESCE(vr, 0) AS BIGINT) AS val_rate_e6
          |      FROM a FULL OUTER JOIN b ON a.tok = b.tok)
          |SELECT tok, train_rate_e6, val_rate_e6,
          |  abs(train_rate_e6 - val_rate_e6) AS gap_e6
          |FROM j ORDER BY gap_e6 DESC, tok LIMIT 20""".stripMargin)),

    // ---- set operations beyond union (§2.12) ---------------------------------

    Q("text_pack_sequences",
      // GPT-style capacity packing: per-lang running token sum, each doc
      // assigned the 2048-token chunk its first token lands in
      (s, d) => Corpus.packSequences(
          tbl(s, d, "documents").select("doc_id", "lang", "text")
            .withColumn("n_tokens", Corpus.tokenCount(col("text"))),
          col("n_tokens"), col("lang"), col("doc_id"), capacity = 2048)
        .select("doc_id", "lang", "n_tokens", "pack_id", "pack_offset")
        .orderBy("doc_id"),
      Some(
        """WITH b AS (
          |  SELECT doc_id, lang,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |    ROWS UNBOUNDED PRECEDING) - n_tokens AS st
          |  FROM b)
          |SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
          |  CAST(floor(CAST(st AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
          |  CAST(st % 2048 AS BIGINT) AS pack_offset
          |FROM c ORDER BY doc_id""".stripMargin)),

    Q("text_mixture_plan",
      // temperature-scaled (α = 1/2) training-mixture plan per language —
      // the XLM-R sampling recipe: target share ∝ sqrt(tokens), repeat
      // factor = how many epochs of the source fill its share of a
      // whole-corpus token budget. floor(sqrt) is IEEE-correctly-rounded
      // in both engines; everything after it is integral e6 arithmetic.
      (s, d) => Corpus.mixturePlan(tbl(s, d, "documents"),
          col("text"), col("lang"))
        .orderBy("source"),
      Some(
        s"""WITH $MIXTURE_CTES
           |SELECT source, n_docs, tokens,
           |  CAST((w * 1000000) // tot_w AS BIGINT) AS share_e6,
           |  CAST((((w * 1000000) // tot_w) * tot_tokens) // tokens AS BIGINT) AS repeat_e6
           |FROM w CROSS JOIN t ORDER BY source""".stripMargin)),

    Q("text_mixture_apply",
      // the mixture plan REALIZED: md5-coin per-doc copy counts (whole
      // copies + Bernoulli remainder, the splitAssign coin) and the
      // realized per-source token shares landing next to the targets —
      // the up/down-sampling step that actually builds the training mix,
      // deterministic on any engine
      (s, d) => Corpus.mixtureApply(tbl(s, d, "documents"),
          col("text"), col("lang"), col("doc_id"))
        .orderBy("source"),
      Some(
        s"""WITH $MIXTURE_PD_CTES,
           |r AS (SELECT source, count(*) AS n_docs,
           |    CAST(sum(n_copies) AS BIGINT) AS realized_docs,
           |    CAST(sum(n_copies * toks) AS BIGINT) AS realized_tokens
           |  FROM pd GROUP BY source),
           |tt AS (SELECT CAST(sum(realized_tokens) AS BIGINT) AS tot_real FROM r)
           |SELECT r.source, r.n_docs, r.realized_docs, r.realized_tokens,
           |  p.share_e6 AS target_share_e6,
           |  CAST((realized_tokens * 1000000) // tot_real AS BIGINT) AS realized_share_e6
           |FROM r JOIN p USING (source) CROSS JOIN tt ORDER BY source""".stripMargin)),

    Q("text_training_mix",
      // the mixture REALIZED AS A LAYOUT: copy counts explode into
      // (doc, epoch) rows — epoch-major, each epoch one pass over the
      // up-sampled corpus — then GPT-style 2048-token packing per source
      // assigns every row its pack and offset. mixture plan → coin →
      // explode → pack, all exact and engine-replayable: the last step
      // before a tokenizer ever sees the data.
      (s, d) => {
        val copies = Corpus.mixtureCopies(tbl(s, d, "documents"),
          col("text"), col("lang"), col("doc_id"))
        val expanded = copies.filter(col("n_copies") > 0)
          .select(col("source"), col("doc_id"), col("toks"),
            explode(sequence(lit(1L), col("n_copies"))).as("epoch"))
        Corpus.packSequences(expanded, col("toks"), col("source"),
            struct(col("epoch"), col("doc_id")), capacity = 2048)
          .select(col("source"), col("doc_id"), col("epoch"),
            col("toks").as("n_tokens"), col("pack_id"), col("pack_offset"))
          .orderBy("source", "epoch", "doc_id")
      },
      Some(
        s"""WITH $MIXTURE_PD_CTES,
           |ex AS (SELECT source, doc_id, toks,
           |    unnest(generate_series(1, n_copies)) AS epoch
           |  FROM pd WHERE n_copies > 0),
           |c AS (SELECT *, sum(toks) OVER (PARTITION BY source
           |    ORDER BY epoch, doc_id ROWS UNBOUNDED PRECEDING) - toks AS st
           |  FROM ex)
           |SELECT source, doc_id, CAST(epoch AS BIGINT) AS epoch,
           |  CAST(toks AS BIGINT) AS n_tokens,
           |  CAST(floor(CAST(st AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
           |  CAST(st % 2048 AS BIGINT) AS pack_offset
           |FROM c ORDER BY source, epoch, doc_id""".stripMargin)),

    Q("text_perceptron",
      // in-engine quality-classifier training: 8 pocket-perceptron rounds
      // (normalized integer updates, best-round-kept) over md5-hashed
      // bag-of-words features, weak-supervision label y = ±1 on "≥ 2
      // 'spark' tokens". Output: the per-round miss-count training curve
      // + which round the pocket kept — at sf0.01 it converges to a
      // stable fixed point (83% train accuracy vs a 53% majority
      // baseline), the whole trajectory replayed by the oracle's eight
      // unrolled rounds.
      (s, d) => {
        import s.implicits._
        val docs = tbl(s, d, "documents")
        val feats = Classifier.hashedFeatures(docs, "text", "doc_id", dim = 256)
        val labels = docs.select(col("doc_id"),
          when(size(filter(TextStats.words(col("text")),
            t => t === "spark")) >= 2, 1L).otherwise(-1L).as("y"))
        val res = Classifier.trainPerceptron(feats, labels, iters = 8)
        val curveDf = res.curve.zipWithIndex
          .map { case (m, r) => (r.toLong, m, r == res.pocketRound) }
          .toDF("round", "n_miss", "is_pocket")
        curveDf
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
          .orderBy("round")
      },
      Some(PERCEPTRON_SQL),
      bench = true),

    Q("text_perceptron_score",
      // the trained classifier SERVED: pocket weights published once via
      // the model store (train-once/serve-many, same artifact machinery
      // as the ANN centroids/codebooks), corpus scored by one broadcast
      // join + one aggregation, quality report per source. The oracle
      // replays training and picks the pocket round's weights by scalar
      // subquery.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val feats = Classifier.hashedFeatures(docs, "text", "doc_id", dim = 256)
        val labels = docs.select(col("doc_id"),
          when(size(filter(TextStats.words(col("text")),
            t => t === "spark")) >= 2, 1L).otherwise(-1L).as("y"))
        val key = "perceptron_d256_i8_v1_" + d.replaceAll("[^A-Za-z0-9]+", "_")
        val w = graft.llm.ModelStore.getOrTrain(s, key)(
          Classifier.trainPerceptron(feats, labels, iters = 8).weights)
        Classifier.score(feats, w)
          .join(labels, "doc_id")
          .join(docs.select("doc_id", "source"), "doc_id")
          .groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            count(when(col("predict") === 1L, 1)).as("n_pred_pos"),
            count(when(col("y") === 1L, 1)).as("n_label_pos"),
            count(when(col("predict") === col("y"), 1)).as("n_correct"))
          .orderBy("source")
      },
      Some(PERCEPTRON_SCORE_SQL)),

    Q("text_curation_chain_v3",
      // the curation pipeline in production order: QUALITY GATE first
      // (served pocket-perceptron weights, predict == +1 survives — the
      // model-score filter every real pipeline applies before paying for
      // dedup), then span SCRUB over the gated corpus, then md5 exact
      // dedup of the cleaned text. The published classifier artifact is
      // exercised INSIDE a composition, not just in its own query; the
      // oracle replays training, picks the pocket weights, gates, and
      // reruns the span chain against the gated relation.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val feats = Classifier.hashedFeatures(docs, "text", "doc_id", dim = 256)
        val labels = docs.select(col("doc_id"),
          when(size(filter(TextStats.words(col("text")),
            t => t === "spark")) >= 2, 1L).otherwise(-1L).as("y"))
        val key = "perceptron_d256_i8_v1_" + d.replaceAll("[^A-Za-z0-9]+", "_")
        val w = graft.llm.ModelStore.getOrTrain(s, key)(
          Classifier.trainPerceptron(feats, labels, iters = 8).weights)
        val gated = Classifier.score(feats, w)
          .filter(col("predict") === 1L).select("doc_id")
        val gdocs = docs.join(gated, "doc_id")
        val cleaned = Dedup.removeSharedSpans(gdocs,
            n = 8, minTokens = 16, maxDf = 20)
          .filter(length(col("clean_text")) > 0)
          .select(col("doc_id"), col("clean_text"),
            (col("n_tokens") - col("n_removed_tokens")).as("n_clean_tokens"))
        cleaned.groupBy(md5(col("clean_text")).as("__fp"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"),
            min(col("n_clean_tokens")).as("n_clean_tokens"))
          .select(col("doc_id"), col("n_clean_tokens"), col("n_copies"))
          .orderBy("doc_id")
      },
      Some(CURATION_V3_SQL),
      bench = true),

    Q("text_prf_search",
      // pseudo-relevance feedback (Rocchio-style): per-query BM25 top-5
      // as implicit feedback, the 3 highest Σtf·idf NEW tokens join the
      // query bag, one re-scoring round — recall-lifting query expansion
      // with every weight an exact integer and both rounds oracle-mirrored
      (s, d) => {
        val docs = tbl(s, d, "documents")
        // query bags tokenize ONLY the sampled query docs — the corpus
        // explode happens once, inside prfExpandedSearch's shared frame
        val qt0 = TextStats.tokens(docs.filter(pmod(col("doc_id"), lit(50)) === 0))
          .select(col("doc_id").as("query_id"), col("tok")).distinct()
        TextStats.prfExpandedSearch(docs, qt0, k = 10, fb = 5, m = 3)
          .orderBy("query_id", "rnk")
      },
      Some(PRF_SQL),
      bench = true),

    Q("text_curriculum",
      // curriculum construction: per-doc bigram-LM mean surprisal as the
      // difficulty signal, contiguous-rank quartile phases (easy → hard,
      // the pareto-decile arithmetic — no single-partition ntile window),
      // per-phase census with difficulty bounds
      (s, d) => {
        val diff = TextStats.lmSurprisal(tbl(s, d, "documents"))
          .select(col("doc_id"), col("mean_bits_e6").as("diff_e6"))
        graft.etl.Ids.contiguousIds(diff,
            Seq(col("diff_e6"), col("doc_id")), "rank")
          .crossJoin(broadcast(diff.agg(count(lit(1)).as("n_tot"))))
          .select(expr("CAST(rank * 4 DIV n_tot AS INT)").as("phase"),
            col("diff_e6"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"),
            min(col("diff_e6")).as("min_diff_e6"),
            max(col("diff_e6")).as("max_diff_e6"))
          .orderBy("phase")
      },
      Some(CURRICULUM_SQL)),

    Q("text_token_quantiles",
      // per-lang exact token-count percentiles (type-7 interpolation in
      // both engines); distribution report for corpus quality monitoring
      (s, d) => Corpus.tokenQuantiles(tbl(s, d, "documents"), col("text"), col("lang"))
        .select(col("grp").as("lang"), col("n_docs"),
          e6(col("q0")).as("q25_e6"), e6(col("q1")).as("q50_e6"),
          e6(col("q2")).as("q90_e6"), e6(col("q3")).as("q99_e6"))
        .orderBy("lang"),
      Some(
        """WITH b AS (
          |  SELECT lang,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
          |  FROM documents)
          |SELECT lang, count(*) AS n_docs,
          |  CAST(floor(quantile_cont(n_tokens, 0.25) * 1000000) AS BIGINT) AS q25_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.5)  * 1000000) AS BIGINT) AS q50_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.9)  * 1000000) AS BIGINT) AS q90_e6,
          |  CAST(floor(quantile_cont(n_tokens, 0.99) * 1000000) AS BIGINT) AS q99_e6
          |FROM b GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("text_curation_chain",
      // The LLM flagship: lang filter → quality floor → exact dedup →
      // simhash near-dup drop → split assignment, end to end — the
      // training-corpus analogue of transform_chain, fully oracled by
      // composing the stats and simhash CTEs.
      (s, d) => Corpus.curate(tbl(s, d, "documents"),
          keepLangs = Seq("en"), minQualityE6 = 650000L)
        .orderBy("doc_id"),
      Some(CURATION_SQL),
      bench = true),

    Q("text_tfidf",
      // TF-IDF salience with an exact rational idf (tf × (N·1e6 div df),
      // all-integer — a log idf would hang the cross-engine compare on
      // ln()'s last ulp). Vocabulary-sized df table broadcast back onto
      // the tf aggregation; corpus count rides a broadcast 1-row total.
      (s, d) => TextStats.tfIdf(tbl(s, d, "documents"))
        .orderBy("doc_id", "tok"),
      Some(TFIDF_SQL)),

    Q("text_lm_surprisal",
      // bigram-LM quality scoring with INTEGER log2 surprisal — the
      // perplexity-filter semantics without a single transcendental:
      // ⌊log2(den/num)⌋ = length(bin(den DIV num)) − 1, exact in both
      // engines, so even this "statistical" score hash-matches
      (s, d) => TextStats.lmSurprisal(tbl(s, d, "documents"))
        .orderBy("doc_id"),
      Some(LM_SURPRISAL_SQL),
      bench = true),

    Q("text_dsir_weights",
      // DSIR importance weighting (Xie et al., NeurIPS 2023): score every
      // doc by Σ tf(b)·(log p_target(b) − log p_raw(b)) over 1024
      // md5-hashed unigram buckets, target = the English slice — the
      // data-SELECTION op that ranks a raw crawl by similarity to a
      // high-quality domain before training. Log-ratios at whole-bit
      // resolution via the bin()-length trick (zero transcendentals), so
      // even this "statistical" weight hash-matches the oracle. One
      // tokenize pass, bucket model ≤ 1024 rows → broadcast scoring join.
      (s, d) => Corpus.dsirScores(tbl(s, d, "documents"),
          col("lang") === "en", buckets = 1024)
        .orderBy("doc_id"),
      Some(DSIR_SQL),
      bench = true),

    Q("text_cms_counts",
      // Count-Min frequency sketch over the corpus token stream, probed
      // with the English stopword vocabulary: d=4 md5-derived hash rows ×
      // w=1024 buckets, estimate = min over rows. Like the KMV sketch,
      // the md5 buckets make the APPROXIMATE counters exactly
      // reproducible in SQL.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val m = graft.analytics.Sketch.cmsMatrix(toks, col("tok"))
        val probes = s.createDataset(TextStats.enStopwords)(
          org.apache.spark.sql.Encoders.STRING).toDF("w")
        graft.analytics.Sketch.cmsEstimate(m, probes, col("w"))
          .select(col("item"), col("est_count").cast("long").as("est_count"))
          .orderBy("item")
      },
      Some(CMS_SQL)),

    Q("text_cms_error",
      // the Count-Min accuracy harness — the measure-don't-guess row the
      // d=4 × w=1024 config decision cites: per probed stopword, estimate
      // vs exact count and the relative OVERcount (CMS never
      // undercounts, so every value is ≥ 0; absent probes report -1).
      // The sketch's error bound (≤ 2n/w with prob 1−2^-d) becomes a
      // measured quantity instead of a trusted formula (measured at
      // sf0.01: zero overcount on every present stopword — the 1024
      // buckets comfortably separate this vocabulary).
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val m = graft.analytics.Sketch.cmsMatrix(toks, col("tok"))
        val probes = s.createDataset(TextStats.enStopwords)(
          org.apache.spark.sql.Encoders.STRING).toDF("w")
        val est = graft.analytics.Sketch.cmsEstimate(m, probes, col("w"))
        val ex = toks.groupBy(col("tok").as("__item"))
          .agg(count(lit(1)).as("__exact"))
        est.join(ex, col("item") === col("__item"), "left")
          .select(col("item"), col("est_count").cast("long").as("est_count"),
            coalesce(col("__exact"), lit(0L)).as("exact_count"))
          .withColumn("overcount_e6",
            when(col("exact_count") === 0, lit(-1L))
              .otherwise(expr("(est_count - exact_count) * 1000000 DIV exact_count")))
          .orderBy("item")
      },
      Some(CMS_ERROR_SQL)),

    Q("text_cms_heavy_hitters",
      // Batch heavy-hitters on top of the Count-Min matrix: probe with the
      // DISTINCT token set and keep items whose estimate clears φ = 1/32
      // of the stream length. CMS never undercounts, so every true heavy
      // hitter survives (perfect recall); the md5 buckets make each
      // boundary decision identical in both engines. The support threshold
      // rides a broadcast 1-row total — no driver-side collect.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
        val m = graft.analytics.Sketch.cmsMatrix(toks, col("tok"))
        val est = graft.analytics.Sketch.cmsEstimate(m, toks.distinct(), col("tok"))
        val total = toks.agg(count(lit(1)).as("__n"))
        est.crossJoin(broadcast(total))
          .filter(col("est_count") >= col("__n") / 32.0)
          .select(col("item"), col("est_count").cast("long").as("est_count"))
          .orderBy("item")
      },
      Some(CMS_HH_SQL)),

    Q("text_winnow_fp",
      // Winnowing fingerprints (SIGMOD'03). With the default k=5 the
      // base-31 polynomial values stay under 2^27 — the "wrap-around"
      // arithmetic never wraps — so DuckDB can recompute every k-gram
      // hash directly (unicode(char) * 31^t sums) and replay the
      // rightmost-min window selection. fp emitted as a joined string:
      // engine-portable, unlike array columns in the value compare.
      (s, d) => tbl(s, d, "documents")
        .select(col("doc_id"), graft.expr.WinnowSig(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_hashes"),
          array_join(transform(col("fp"), h => h.cast("string")), ",").as("fp_str"))
        .orderBy("doc_id"),
      Some(s"""WITH $WINNOW_CTES,
              |agg AS (SELECT id, count(*) AS n_hashes,
              |        string_agg(h, ',' ORDER BY h) AS fp_str FROM fp GROUP BY id)
              |SELECT d.doc_id, CAST(COALESCE(a.n_hashes, 0) AS INT) AS n_hashes,
              |       COALESCE(a.fp_str, '') AS fp_str
              |FROM documents d LEFT JOIN agg a ON a.id = d.doc_id
              |ORDER BY doc_id""".stripMargin)),

    Q("text_bloom_blocklist",
      // Blocklist filtering through the bloom, false positives VISIBLE:
      // per-doc (bloom_hit, exact_hit) against a fingerprint blocklist.
      // The md5-derived bit positions make the filter itself — including
      // any false positive — bit-reproducible in DuckDB, so this oracle
      // checks the bloom's exact semantics, not just the rescued answer.
      (s, d) => {
        val fp = tbl(s, d, "documents").select(col("doc_id"), col("source"),
          TextStats.fingerprint(col("text")).as("fp"))
        val block = fp.filter(col("source").isin("src0", "src1"))
          .select("fp").distinct()
        val bbits = Bloom.bits(block, col("fp"), BLOOM_LIST_M, BLOOM_K)
        val mem = Bloom.membership(fp, col("doc_id"), col("fp"),
            bbits, BLOOM_LIST_M, BLOOM_K)
          .select(col("id").as("doc_id"), col("might_contain").as("bloom_hit"))
        // block is a corpus-derived fingerprint set (2 of 5 sources) —
        // fact-sized at scale, so the exact probe's strategy is left to
        // the planner; the BLOOM side is the bounded-bits scale path
        val exact = fp.join(block.withColumn("__b", lit(1)), Seq("fp"), "left")
          .select(col("doc_id"), col("__b").isNotNull.as("exact_hit"))
        mem.join(exact, Seq("doc_id")).orderBy("doc_id")
      },
      Some(BLOOM_BLOCKLIST_SQL)),

    Q("text_stratified_sample",
      // deterministic per-language quota rebalancing: bottom-40 docs per
      // lang in md5(doc_id)-hash order via the heap-based top-k exec —
      // exact stratum sizes, no RNG, oracle re-derives the identical set
      (s, d) => Corpus.stratifiedSample(
          tbl(s, d, "documents"), col("lang"), col("doc_id"), quota = 40)
        .select(col("stratum").as("lang"), col("id").as("doc_id"))
        .orderBy("lang", "doc_id"),
      Some(STRATIFIED_SAMPLE_SQL)),

    Q("text_priority_sample",
      // Duffield–Lund–Thorup priority sampling (JACM'07): 64-doc sample
      // weighted by char count, τ = 65th priority, and the unbiased
      // subset-sum estimate Σ max(w, τ) reported AGAINST the true total —
      // the measure-don't-guess row for weighted corpus subsampling.
      // Priorities are one IEEE multiply+divide on an md5 draw, so the
      // oracle replays them bit-exactly; terms are floored to e6 longs
      // BEFORE summing so the estimate is order-independent.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val w = length(col("text")).cast("long") + 1L
        val top = Corpus.prioritySample(docs, col("doc_id"), w, k = 64)
        val tau = top.filter(col("rk") === 65).select(col("pri").as("tau"))
        val tot = docs.agg(sum(length(col("text")).cast("long") + 1L)
          .as("true_total"))
        top.filter(col("rk") <= 64)
          .crossJoin(broadcast(tau)) // 1-row τ, broadcast-hinted
          .select(floor(greatest(col("w").cast("double"), col("tau")) * 1e6)
            .cast("long").as("term_e6"), col("tau"))
          .agg(floor(max(col("tau")) * 1e6).cast("long").as("tau_e6"),
            sum(col("term_e6")).as("est_total_e6"))
          .withColumn("k", lit(64))
          .crossJoin(broadcast(tot)) // 1-row total, broadcast-hinted
      },
      Some(
        s"""WITH wt AS (SELECT doc_id, CAST(length(text) + 1 AS BIGINT) AS w,
           |    md5(CAST(doc_id AS VARCHAR) || '#psamp') AS mh FROM documents),
           |pr AS (SELECT doc_id, w,
           |    (CAST(w AS DOUBLE) * 4294967296.0) / CAST(($hexHead32Sql) + 1 AS DOUBLE) AS pri
           |  FROM wt),
           |top AS (SELECT doc_id, w, pri,
           |    ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS rk FROM pr),
           |tau AS (SELECT pri AS tau FROM top WHERE rk = 65),
           |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS true_total FROM wt)
           |SELECT CAST(floor((SELECT tau FROM tau) * 1e6) AS BIGINT) AS tau_e6,
           |  CAST(SUM(CAST(floor(GREATEST(CAST(w AS DOUBLE), (SELECT tau FROM tau)) * 1e6) AS BIGINT)) AS BIGINT) AS est_total_e6,
           |  64 AS k, (SELECT true_total FROM tot) AS true_total
           |FROM top WHERE rk <= 64""".stripMargin)),

    Q("text_priority_sample_by_lang",
      // per-stratum DLT: an independent 16-doc weighted sample + τ + the
      // unbiased per-language total-weight estimate, all strata in ONE
      // heap-exec pass (O(k) state per stratum) — how a 100 TB corpus
      // gets a fixed-budget sample per language×domain cell without 10k
      // separate jobs. Estimates land next to each stratum's true total.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val w = length(col("text")).cast("long") + 1L
        val top = Corpus.prioritySampleByGroup(
          docs, col("lang"), col("doc_id"), w, k = 16)
        val tau = top.filter(col("rk") === 17)
          .select(col("stratum"), col("pri").as("tau"))
        val tot = docs.groupBy(col("lang").as("stratum"))
          .agg(sum(length(col("text")).cast("long") + 1L).as("true_total"))
        top.filter(col("rk") <= 16)
          .join(broadcast(tau), Seq("stratum")) // one τ row per stratum
          .select(col("stratum"), col("tau"),
            floor(greatest(col("w").cast("double"), col("tau")) * 1e6)
              .cast("long").as("term_e6"))
          .groupBy("stratum")
          .agg(floor(max(col("tau")) * 1e6).cast("long").as("tau_e6"),
            sum(col("term_e6")).as("est_total_e6"))
          .withColumn("k", lit(16))
          .join(broadcast(tot), Seq("stratum"))
          .select(col("stratum").as("lang"), col("tau_e6"),
            col("est_total_e6"), col("k"), col("true_total"))
          .orderBy("lang")
      },
      Some(
        s"""WITH wt AS (SELECT lang AS stratum, doc_id,
           |    CAST(length(text) + 1 AS BIGINT) AS w,
           |    md5(CAST(doc_id AS VARCHAR) || '#psamp') AS mh FROM documents),
           |pr AS (SELECT stratum, doc_id, w,
           |    (CAST(w AS DOUBLE) * 4294967296.0) / CAST(($hexHead32Sql) + 1 AS DOUBLE) AS pri
           |  FROM wt),
           |rnk AS (SELECT *, row_number() OVER (PARTITION BY stratum
           |          ORDER BY pri DESC, doc_id) AS rk FROM pr),
           |tau AS (SELECT stratum, pri AS tau FROM rnk WHERE rk = 17),
           |tot AS (SELECT stratum, CAST(SUM(w) AS BIGINT) AS true_total
           |        FROM wt GROUP BY 1),
           |g AS (SELECT r.stratum,
           |        CAST(floor(MAX(t.tau) * 1e6) AS BIGINT) AS tau_e6,
           |        CAST(SUM(CAST(floor(GREATEST(CAST(r.w AS DOUBLE), t.tau) * 1e6) AS BIGINT)) AS BIGINT) AS est_total_e6
           |      FROM rnk r JOIN tau t ON r.stratum = t.stratum
           |      WHERE r.rk <= 16 GROUP BY r.stratum)
           |SELECT g.stratum AS lang, g.tau_e6, g.est_total_e6, 16 AS k,
           |  tot.true_total
           |FROM g JOIN tot ON g.stratum = tot.stratum ORDER BY lang""".stripMargin)),

    Q("text_robust_outliers",
      // median/MAD length-anomaly gate per language — the robust quality
      // filter (mean/stddev breaks down on the exact blobs it should
      // catch); every intermediate is an exact x.0/x.5 double on integer
      // token counts, so even the boolean flag is oracle-exact
      (s, d) => TextStats.robustOutliers(
          tbl(s, d, "documents").withColumn("n_tokens", Corpus.tokenCount(col("text"))),
          col("lang"), col("doc_id"), col("n_tokens"), cutoff = 2.0)
        .select(col("grp").as("lang"), col("id").as("doc_id"),
          col("v").cast("long").as("n_tokens"),
          e6(col("med")).as("med_e6"), e6(col("mad")).as("mad_e6"),
          col("is_outlier"))
        .orderBy("doc_id"),
      Some(ROBUST_OUTLIERS_SQL)),

    Q("text_repetition",
      // Gopher-style repetition filters (duplicate-token share + top-2-gram
      // character share): exact integer-ratio arithmetic and a
      // deterministic max-struct tie-break make even the filter FLAG
      // oracle-exact. The duplicate side is a narrow projection; only the
      // bigram argmax shuffles (map-side combinable).
      (s, d) => TextStats.repetitionStats(tbl(s, d, "documents"))
        .orderBy("doc_id"),
      Some(REPETITION_SQL),
      bench = true),

    Q("text_redact",
      // PII redaction over deterministically PII-spiked text (the corpus
      // has no natural emails/URLs, so the query plants one of each plus a
      // long id per doc — both engines build the identical spike). The
      // RE2-safe pattern chain and the staged counts replay verbatim in
      // DuckDB, so the redacted STRING itself is hash-compared.
      (s, d) => {
        val spiked = tbl(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or https://ex.example/d/"),
            col("doc_id").cast("string"), lit("?ref=abc id "),
            ((col("doc_id") + 1) * 1234567L).cast("string")).as("text"))
        val (nUrls, nEmails, nNums) = TextStats.redactionCounts(col("text"))
        spiked.select(col("doc_id"),
            TextStats.redactPii(col("text")).as("redacted"),
            nUrls.as("n_urls"), nEmails.as("n_emails"), nNums.as("n_nums"))
          .orderBy("doc_id")
      },
      Some(REDACT_SQL)),

    Q("text_decontaminate",
      // benchmark decontamination: word-3-gram md5 hashes of every corpus
      // doc vs the gram set of a held-out "eval" slice (doc_id % 50 = 0 as
      // the stand-in benchmark). The eval gram set is BROADCAST — a map-
      // side semi-join, no corpus shuffle before the per-doc hit count —
      // and the ppm ratio + flag are integer arithmetic, so the whole
      // report replays bit-for-bit in DuckDB.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        // the eval slice is capped at 1024 docs: a benchmark is fixed-
        // size by nature (the %50 slice is only its deterministic stand-
        // in), and the cap is what keeps the broadcast gram set bounded
        // at 100 TB — a provable no-op at every test SF (≤ 100 eval
        // docs), mirrored in the oracle as ORDER BY id LIMIT 1024
        Corpus.contaminationReport(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0)
              .orderBy("doc_id").limit(1024),
            "text", "doc_id")
          .select(col("id").as("doc_id"), col("n_grams"), col("n_hits"),
            col("contam_ppm"), col("contaminated"))
          .orderBy("doc_id")
      },
      Some(DECONTAMINATE_SQL),
      bench = true),

    Q("text_split_novelty",
      // gram-level split-redundancy audit: per VAL doc, the share of its
      // word-3-gram hashes absent from the TRAIN split — memorizable
      // content doc-level dedup can't see (boilerplate, quotes,
      // recombined passages) surfaces as low novelty. The train gram set
      // is corpus-sized, so the hit join shuffles on the gram hash —
      // deliberately NOT the broadcast shape of text_decontaminate.
      (s, d) => {
        val docs = tbl(s, d, "documents")
          .withColumn("split", Corpus.splitAssign(col("doc_id")))
        Corpus.noveltyReport(
            docs.filter(col("split") === "val"),
            docs.filter(col("split") === "train"),
            "text", "doc_id")
          .select(col("id").as("doc_id"), col("n_grams"), col("n_hits"),
            col("novel_ppm"))
          .orderBy("doc_id")
      },
      Some(SPLIT_NOVELTY_SQL)),

    Q("text_bm25",
      // Okapi BM25 top-20 retrieval for the query {hash, join, spark}:
      // postings pruned to query tokens BEFORE the tf shuffle, df + corpus
      // totals broadcast, heap-based top-k — and the k1=1.2/b=0.75 scoring
      // cleared to all-long rational arithmetic (x10L), so the ranking
      // replays digit-for-digit in DuckDB
      (s, d) => TextStats.bm25(tbl(s, d, "documents"),
        Seq("hash", "join", "spark"), k = 20),
      Some(BM25_SQL),
      bench = true),

    Q("text_inverted_index",
      // inverted index with capped posting lists (first 50 doc_ids per
      // token via the heap exec) and EXACT df beyond the cap — the
      // candidate-generation artifact BM25 serves from at scale. The
      // posting list is rendered as a comma-joined string at the query
      // boundary: the harness comparator hashes scalar cells, and the
      // sorted-list semantics are already pinned before the join.
      (s, d) => TextStats.invertedIndex(tbl(s, d, "documents"), cap = 50)
        .select(col("tok"), col("df"),
          array_join(col("postings").cast("array<string>"), ",").as("postings"))
        .orderBy("tok"),
      Some(
        """WITH tk AS (SELECT DISTINCT doc_id, tok FROM (
          |    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |    FROM documents) WHERE tok <> ''),
          |d AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1),
          |r AS (SELECT tok, doc_id,
          |        row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn FROM tk),
          |p AS (SELECT tok, list_sort(list(doc_id)) AS postings
          |      FROM r WHERE rn <= 50 GROUP BY tok)
          |SELECT p.tok, d.df,
          |  array_to_string(list_transform(p.postings, x -> CAST(x AS VARCHAR)), ',') AS postings
          |FROM p JOIN d USING (tok)
          |ORDER BY tok""".stripMargin),
      bench = true),

    Q("text_bm25_indexed",
      // BM25 served from the PUBLISHED inverted-index artifact (train-
      // once/serve-many via ModelStore, like the ANN codebooks): the
      // query tokens' capped posting lists generate the candidate set, df
      // is the index's exact value, tf is recounted only inside candidate
      // docs. A term scores a doc only within its posting cap — the
      // impact-ordered truncation the oracle mirrors with rn <= 50.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val key = "invidx_cap50_v1_" + d.replaceAll("[^A-Za-z0-9]+", "_")
        val idx = graft.llm.ModelStore.getOrTrain(s, key)(
          TextStats.invertedIndex(docs, cap = 50))
        TextStats.bm25ViaIndex(docs, idx, Seq("hash", "join", "spark"), k = 20)
      },
      Some(
        """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |              FROM documents),
          |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
          |tkd AS (SELECT DISTINCT doc_id, tok FROM tk),
          |d AS (SELECT tok, count(*) AS df FROM tkd GROUP BY 1),
          |cap AS (SELECT tok, doc_id FROM (
          |    SELECT tok, doc_id, row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
          |    FROM tkd) WHERE rn <= 50),
          |cand AS (SELECT c.tok, c.doc_id, d.df FROM cap c JOIN d USING (tok)
          |         WHERE c.tok IN ('hash', 'join', 'spark')),
          |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
          |       WHERE tok IN ('hash', 'join', 'spark') GROUP BY 1, 2),
          |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
          |n AS (SELECT count(*) AS n FROM documents),
          |l AS (SELECT sum(len) AS l FROM lens),
          |sc AS (SELECT c.doc_id,
          |         (((n.n * 1000000) // c.df) * 22 * t.tf * l.l) //
          |           (10 * t.tf * l.l + 3 * l.l + 9 * le.len * n.n) AS part
          |       FROM cand c JOIN tf t ON t.doc_id = c.doc_id AND t.tok = c.tok
          |       JOIN lens le ON le.doc_id = c.doc_id
          |       CROSS JOIN n CROSS JOIN l),
          |agg AS (SELECT doc_id, count(*) AS n_terms, sum(part) AS score_e6
          |        FROM sc GROUP BY 1)
          |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, CAST(score_e6 AS BIGINT) AS score_e6
          |FROM (SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rn FROM agg)
          |WHERE rn <= 20 ORDER BY score_e6 DESC, doc_id""".stripMargin),
      bench = true),

    Q("text_maxscore_topk",
      // MaxScore dynamic pruning (Turtle & Flood 1995) for the disjunctive
      // query {hash, join, a}: docs without the highest-upper-bound term
      // are scored only if their per-term upper-bound sum reaches the
      // phase-1 top-k floor θ — the skipped tail is the bulk of the
      // low-idf term's postings at scale. The oracle is BRUTE-FORCE
      // scoring of every matching doc: hash-equality IS the proof that
      // pruning loses nothing (MaxScoreSpec additionally pins that the
      // pruned phases really do skip documents on a discriminating
      // fixture).
      (s, d) => TextStats.maxScoreTopK(tbl(s, d, "documents"),
        Seq("hash", "join", "a"), k = 10),
      Some(
        """WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
          |            FROM documents),
          |t AS (SELECT doc_id, tok, count(*) AS tf FROM tk
          |      WHERE tok IN ('hash', 'join', 'a') GROUP BY 1, 2),
          |d AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
          |n AS (SELECT count(*) AS n FROM documents),
          |sc AS (SELECT doc_id, count(*) AS n_terms,
          |         sum(tf * ((n.n * 1000000) // d.df)) AS score_e6
          |       FROM t JOIN d USING (tok) CROSS JOIN n GROUP BY doc_id)
          |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, CAST(score_e6 AS BIGINT) AS score_e6
          |FROM (SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rn FROM sc)
          |WHERE rn <= 10 ORDER BY score_e6 DESC, doc_id""".stripMargin),
      bench = true),

    Q("text_phrase_search",
      // positional phrase search — the retrieval face a bag-of-words index
      // (text_inverted_index / BM25) cannot serve: the EXACT adjacent
      // bigram "hash join", matched by equi-joining the two terms'
      // positional postings on (doc_id, pos + 1). The scale shape: the
      // posting relation is filtered to the phrase's terms BEFORE any
      // shuffle (predicate on tok), so the join moves two terms' postings
      // — O(df) rows — never the corpus; both sides hash-partition on
      // doc_id, the natural positional-index layout.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
        val a = toks.filter(col("tok") === "hash").select(col("doc_id"), col("pos"))
        val b = toks.filter(col("tok") === "join")
          .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
        a.join(b, col("doc_b") === col("doc_id") && col("pos_b") === col("pos") + 1)
          .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
          .orderBy("doc_id")
      },
      Some(
        """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS arr
          |           FROM documents),
          |p AS (SELECT doc_id, unnest(arr) AS tok,
          |        generate_subscripts(arr, 1) - 1 AS pos FROM t),
          |a AS (SELECT doc_id, pos FROM p WHERE tok = 'hash'),
          |b AS (SELECT doc_id, pos FROM p WHERE tok = 'join')
          |SELECT a.doc_id, count(*) AS n_occurrences
          |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin),
      bench = true),

    Q("text_chunk_windows",
      // RAG-style overlapping chunking: 64-token windows advancing by 48
      // (16 shared tokens between neighbors), all-integer chunk-count
      // closed form, no shuffle — the oracle replays the identical layout
      // via the same non-negative DIV arithmetic
      (s, d) => Corpus.chunkDocuments(
          tbl(s, d, "documents"), "text", "doc_id", width = 64, overlap = 16)
        .orderBy("doc_id", "chunk_id"),
      Some(
        """WITH t AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          |  FROM documents WHERE length(trim(text)) > 0),
          |n AS (
          |  SELECT doc_id, toks,
          |    1 + (GREATEST(len(toks) - 64, 0) + 47) // 48 AS nc
          |  FROM t),
          |e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)
          |SELECT doc_id, chunk_id,
          |  CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT) AS n_chunk_tokens,
          |  array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text
          |FROM e ORDER BY doc_id, chunk_id""".stripMargin),
      bench = true),

    Q("text_pmi_pairs",
      // collocation extraction — the phrase-mining step a tokenizer/
      // phrase-vocab pipeline runs: adjacent-bigram PMI at whole-bit
      // resolution, PMI(a,b) = ⌊log2(c_ab·P)⌋ − ⌊log2(c_left·c_right)⌋
      // via the bin()-length trick (zero transcendentals), min support
      // 5, top-20 by (pmi, count). High-PMI pairs are phrases whose
      // parts rarely appear apart — merge candidates for the vocab.
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(split(lower(trim(col("text"))), "\\s+").as("ws0"))
          .select(expr("filter(ws0, w -> w <> '')").as("ws"))
          .filter(size(col("ws")) >= 2)
        val pairs = toks.select(explode(expr(
            """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
              |  (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
        val c2 = pairs.groupBy("w2").agg(count(lit(1)).as("c2"))
        val tot = pairs.agg(count(lit(1)).as("p"))
        c12.filter(col("c12") >= 5)
          .join(c1, "w1").join(c2, "w2")
          .crossJoin(broadcast(tot)) // 1-row total
          .select(col("w1"), col("w2"), col("c12"),
            expr("CAST((length(bin(c12 * p)) - 1) - (length(bin(c1 * c2)) - 1) AS BIGINT)")
              .as("pmi_bits"))
          .orderBy(col("pmi_bits").desc, col("c12").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some(
        """WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ws0
          |              FROM documents),
          |tk AS (SELECT list_filter(ws0, w -> w <> '') AS ws FROM toks),
          |tk2 AS (SELECT ws FROM tk WHERE len(ws) >= 2),
          |pairs AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
          |          FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM tk2)),
          |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
          |c2 AS (SELECT w2, count(*) AS c2 FROM pairs GROUP BY 1),
          |p AS (SELECT count(*) AS p FROM pairs),
          |sel AS (SELECT w1, w2, c12,
          |          (length(bin(c12 * p)) - 1) - (length(bin(c1 * c2)) - 1) AS pmi_bits
          |        FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN p
          |        WHERE c12 >= 5)
          |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(pmi_bits AS BIGINT) AS pmi_bits
          |FROM sel ORDER BY pmi_bits DESC, c12 DESC, w1, w2 LIMIT 20""".stripMargin)),

    Q("text_retrieval_rr",
      // retrieval evaluation in-engine: BM25 ranks by summed term
      // scores, so a document matching TWO rare terms can outrank one
      // matching all three — this harness quantifies that: reciprocal
      // rank of the first FULL-conjunction doc in the top-10 (n_terms =
      // 3 ⇔ all query terms present, since the tf table keeps only
      // query tokens) plus precision@10 of full matches. Exact e6
      // rationals; rr_e6 = 0 when no full match is retrieved.
      (s, d) => {
        // the unpartitioned window runs over the 10-row heap OUTPUT —
        // k rows regardless of corpus size, never the corpus itself
        val topk = TextStats.bm25(tbl(s, d, "documents"),
            Seq("hash", "join", "spark"), k = 10)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score_e6").desc, col("doc_id"))))
        topk.agg(
          coalesce(min(when(col("n_terms") === 3, col("rnk"))), lit(0L))
            .as("first_full_rank"),
          coalesce(expr("1000000 DIV min(CASE WHEN n_terms = 3 THEN rnk END)"),
            lit(0L)).as("rr_e6"),
          sum(when(col("n_terms") === 3, 1L).otherwise(0L)).as("hits_at_10"),
          expr("sum(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) * 1000000 DIV 10")
            .as("p_at_10_e6"))
      },
      Some(RETRIEVAL_RR_SQL)),

    Q("text_rag_chain",
      // max-passage retrieval — the RAG composition end to end: overlap-
      // chunk the corpus (64/16, the text_chunk_windows layout), BM25-
      // score the CHUNKS against the query bag, reduce to each doc's best
      // passage, rank docs by it. Passage-level scoring finds docs whose
      // relevant span is diluted by length — exactly why RAG pipelines
      // retrieve chunks, not documents. The chunk shortlist (heap top-50)
      // provably contains the exact top-10 docs here: ≤ 2 chunks per doc
      // (100-token max docs), so 50 chunks span ≥ 25 distinct docs.
      (s, d) => {
        val chunks = Corpus.chunkDocuments(
            tbl(s, d, "documents"), "text", "doc_id", width = 64, overlap = 16)
          .select((col("doc_id") * 4096L + col("chunk_id")).as("ck"),
            col("chunk_text"))
        val perChunk = TextStats.bm25(chunks, Seq("hash", "join", "spark"),
            k = 50, textCol = "chunk_text", idCol = "ck")
          .withColumnRenamed("doc_id", "ck")
        val best = perChunk
          .select(expr("ck DIV 4096").as("doc"),
            expr("ck % 4096").as("chunk_id"), col("score_e6"))
          .groupBy("doc")
          .agg(max_by(struct(col("chunk_id"), col("score_e6")),
            struct(col("score_e6"), (-col("chunk_id")).as("__nc"))).as("__b"))
          .select(col("doc").as("doc_id"), col("__b.chunk_id").as("chunk_id"),
            col("__b.score_e6").as("score_e6"), lit(1).as("__g"))
        graft.plans.TopK.perGroup(best, Seq("__g"), col("score_e6"),
            col("doc_id"), 10)
          .select(col("doc_id"), col("chunk_id"), col("score_e6"))
          .orderBy(col("score_e6").desc, col("doc_id"))
      },
      Some(RAG_CHAIN_SQL),
      bench = true),

    Q("text_bpe_train",
      // BPE tokenizer training (Sennrich ACL'16): one corpus pass for
      // word freqs, then 3 merge rounds each touching only the
      // vocabulary. Integer pair counts, deterministic (cnt desc, l, r)
      // argmax, literal-replace rewrite — the oracle unrolls the same 3
      // rounds and matches bit-for-bit.
      (s, d) => {
        val (merges, _) = Bpe.learnMerges(
          Bpe.wordFreqs(tbl(s, d, "documents"), minFreq = 5L), k = 3)
        merges.orderBy("step")
      },
      Some(s"""${bpeCtes(3)}
        |SELECT step, left_sym, right_sym, pair_count FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, l AS left_sym, r AS right_sym, cnt AS pair_count FROM t1
        |  UNION ALL SELECT CAST(2 AS BIGINT), l, r, cnt FROM t2
        |  UNION ALL SELECT CAST(3 AS BIGINT), l, r, cnt FROM t3)
        |ORDER BY step""".stripMargin),
      bench = true),

    Q("text_bpe_fertility",
      // tokenizer-quality evaluation: corpus fertility (tokens per word)
      // and compression (chars per token) of the trained BPE vocabulary,
      // frequency-weighted over actual occurrences — the metric that
      // decides whether a merge table is worth shipping. The unmerged
      // baseline is chars-per-token = 1 by construction, so
      // tokens_per_word_e6 < chars_per_word_e6 iff the merges compress.
      // Exact e6 integer division in both engines.
      (s, d) => {
        val (_, words) = Bpe.learnMerges(
          Bpe.wordFreqs(tbl(s, d, "documents"), minFreq = 5L), k = 3)
        Bpe.segmented(words)
          .agg(count(lit(1)).as("n_words"),
            sum(col("freq")).as("occurrences"),
            expr("sum(freq * n_sym) * 1000000 DIV sum(freq)").as("tokens_per_word_e6"),
            expr("sum(freq * length(w)) * 1000000 DIV sum(freq)").as("chars_per_word_e6"),
            expr("sum(freq * length(w)) * 1000000 DIV sum(freq * n_sym)").as("chars_per_token_e6"))
      },
      Some(s"""${bpeCtes(3)},
        |seg AS (SELECT w, CAST(len(string_split(trim(sym, chr(31)), chr(31)||chr(31))) AS BIGINT) AS n_sym,
        |               freq
        |        FROM w3)
        |SELECT CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(freq) AS BIGINT) AS occurrences,
        |  CAST(sum(freq * n_sym) * 1000000 // sum(freq) AS BIGINT) AS tokens_per_word_e6,
        |  CAST(sum(freq * length(w)) * 1000000 // sum(freq) AS BIGINT) AS chars_per_word_e6,
        |  CAST(sum(freq * length(w)) * 1000000 // sum(freq * n_sym) AS BIGINT) AS chars_per_token_e6
        |FROM seg ORDER BY n_words""".stripMargin)),

    Q("text_bpe_segment",
      // the trained vocabulary applied: top-30 words by frequency with
      // their post-merge segmentations — the artifact a tokenizer ships
      (s, d) => {
        val (_, words) = Bpe.learnMerges(
          Bpe.wordFreqs(tbl(s, d, "documents"), minFreq = 5L), k = 3)
        Bpe.segmented(words)
          .orderBy(col("freq").desc, col("w"))
          .limit(30)
      },
      Some(s"""${bpeCtes(3)}
        |SELECT w,
        |  array_to_string(string_split(trim(sym, chr(31)), chr(31)||chr(31)), '|') AS seg,
        |  CAST(len(string_split(trim(sym, chr(31)), chr(31)||chr(31))) AS BIGINT) AS n_sym,
        |  freq
        |FROM w3 ORDER BY freq DESC, w LIMIT 30""".stripMargin)),

    Q("text_freq_spectrum",
      // Zipf/Heaps corpus profile without floats: per-term corpus
      // frequencies bucketed by power-of-two band, band = bit-length − 1
      // (= floor(log2 f) via base-2 string length — exact integer, no
      // log() boundary misrounds). Band 0 = hapax legomena; the band
      // row counts are the rank-frequency curve a data-mixture designer
      // reads vocabulary health off of. One explode + two thin
      // aggregations, fully map-side-combinable.
      (s, d) => tbl(s, d, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("f"))
        .select(col("f"), (length(conv(col("f"), 10, 2)) - 1).cast("long").as("band"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_terms"), sum(col("f")).as("n_occurrences"))
        .orderBy("band"),
      Some(
        """WITH toks AS (
          |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
          |  FROM documents),
          |tf AS (SELECT w, count(*) AS f FROM toks WHERE w <> '' GROUP BY w)
          |SELECT CAST(length(to_base(f, 2)) - 1 AS BIGINT) AS band,
          |  count(*) AS n_terms, CAST(sum(f) AS BIGINT) AS n_occurrences
          |FROM tf GROUP BY 1 ORDER BY band""".stripMargin)),

    Q("text_heaps_law",
      // Heaps/Herdan vocabulary-growth curve beside text_freq_spectrum's
      // Zipf profile: split the corpus into 10 doc-id deciles, and for
      // each prefix report cumulative token count n and cumulative
      // vocabulary V(n) — the curve a curator reads to see whether more
      // data still buys new vocabulary. V(n) without re-scanning any
      // prefix: a word's FIRST-occurrence bucket (one min-aggregate)
      // attributes it to exactly one decile, so the cumulative vocab is
      // a running sum of first-occurrence counts — and with a CONSTANT
      // 10-bucket domain the running sum is a bounded explode (each
      // bucket contributes to sequence(b, 9) — ≤ 10 rows, the
      // graph_hier_rollup closed-form-ancestors trick) + one groupBy,
      // not a global window, not a triangle θ-join (the registry lint
      // rightly rejects inequality products), and not the
      // range-partitioned rank machinery (which exists for data-sized
      // rank domains; this domain is fixed at 10 forever).
      (s, d) => {
        val docs = tbl(s, d, "documents")
          .select(col("doc_id"), lower(trim(col("text"))).as("t"))
        val mx = docs.agg(max("doc_id").as("mx"))
        // ONE corpus scan: the (bucket, word) count table feeds both the
        // token totals and the first-occurrence counts — without it the
        // tokenize+explode subtree runs once per aggregate (two full
        // corpus scans at 100 TB; the r12 plan audit caught exactly that)
        val bw = docs.crossJoin(broadcast(mx))
          .select(expr("doc_id * 10 DIV (mx + 1)").as("b"),
            explode(split(col("t"), "\\s+")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("b", "w").agg(count(lit(1)).as("c"))
          .truncateLineage()
        val perB = bw.groupBy("b").agg(sum(col("c")).as("ntok"))
        val firstB = bw.groupBy("w").agg(min("b").as("b"))
          .groupBy("b").agg(count(lit(1)).as("nnew"))
        val j = perB.join(firstB, Seq("b"), "left")
          .select(col("b"), col("ntok"),
            coalesce(col("nnew"), lit(0L)).as("nnew"))
        val cum = j
          .select(explode(sequence(col("b").cast("int"), lit(9))).as("b"),
            col("ntok").as("t2"), col("nnew").as("n2"))
          .groupBy("b")
          .agg(sum(col("t2")).as("tokens_cum"), sum(col("n2")).as("vocab_cum"))
        j.join(cum, j("b") === cum("b"))
          .select(j("b"), col("ntok"), col("nnew"),
            col("tokens_cum"), col("vocab_cum"))
          .orderBy(j("b"))
      },
      Some(
        """WITH hd AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
          |hmx AS (SELECT max(doc_id) AS mx FROM hd),
          |ht AS (SELECT * FROM (
          |  SELECT doc_id * 10 // (mx + 1) AS b,
          |    unnest(regexp_split_to_array(t, '\s+')) AS w
          |  FROM hd CROSS JOIN hmx) WHERE w <> ''),
          |hpb AS (SELECT b, count(*) AS ntok FROM ht GROUP BY 1),
          |hfb AS (SELECT b, count(*) AS nnew FROM (
          |  SELECT w, min(b) AS b FROM ht GROUP BY w) GROUP BY 1),
          |hj AS (SELECT hpb.b, ntok, coalesce(nnew, 0) AS nnew
          |  FROM hpb LEFT JOIN hfb ON hpb.b = hfb.b),
          |hc AS (SELECT b2 AS b, CAST(sum(ntok) AS BIGINT) AS tokens_cum,
          |    CAST(sum(nnew) AS BIGINT) AS vocab_cum
          |  FROM (SELECT unnest(range(b, 10)) AS b2, ntok, nnew FROM hj)
          |  GROUP BY 1)
          |SELECT hj.b, CAST(hj.ntok AS BIGINT) AS ntok,
          |  CAST(hj.nnew AS BIGINT) AS nnew, hc.tokens_cum, hc.vocab_cum
          |FROM hj JOIN hc ON hj.b = hc.b ORDER BY hj.b""".stripMargin)),

    Q("text_distinct_ngrams",
      // n-gram diversity (distinct-n) per source — the repetitiveness /
      // mode-collapse dial corpus curators read before mixing: for n =
      // 1, 2, 3, the share of positional n-grams that are DISTINCT
      // (distinct-1 = type-token ratio). Grams ride the one-pass
      // NgramHashSeq expression (md5-head32 per gram — collisions are
      // deterministic and replayed by the oracle, so the approximate
      // number is exactly checkable); one explode + one thin aggregation
      // per n, all map-side-combinable.
      (s, d) => Seq(1, 2, 3).map { n =>
        tbl(s, d, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("source"),
            explode(graft.expr.NgramHashSeq(col("text"), n)).as("h"))
          .groupBy("source")
          .agg(count(lit(1)).as("total_grams"),
            countDistinct(col("h")).as("distinct_grams"))
          .withColumn("n", lit(n).cast("long"))
      }.reduce(_.unionByName(_))
        .select(col("source"), col("n"), col("total_grams"), col("distinct_grams"),
          expr("distinct_grams * 1000000 DIV total_grams").as("distinct_ratio_e6"))
        .orderBy("source", "n"),
      Some {
        def gramsCte(n: Int): String =
          s"""SELECT source, CAST($n AS BIGINT) AS n, count(*) AS total_grams,
             |  count(DISTINCT h) AS distinct_grams
             |FROM (
             |  SELECT source, ($hexHead32Sql) AS h FROM (
             |    SELECT source, md5(array_to_string(ws[i + 1: i + $n], ' ')) AS mh
             |    FROM (SELECT source,
             |            regexp_split_to_array(lower(trim(text)), '\\s+') AS ws,
             |            unnest(range(0, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - $n, 0) + 1)) AS i
             |          FROM documents WHERE length(trim(text)) > 0)))
             |GROUP BY source""".stripMargin
        s"""SELECT source, n, total_grams, distinct_grams,
           |  distinct_grams * 1000000 // total_grams AS distinct_ratio_e6
           |FROM (${gramsCte(1)}
           |UNION ALL
           |${gramsCte(2)}
           |UNION ALL
           |${gramsCte(3)})
           |ORDER BY source, n""".stripMargin
      }),

    Q("text_kn_bigram",
      // interpolated Kneser-Ney bigram LM in exact fixed point: D = 3/4
      // as quarters, continuation probability from left-context TYPE
      // counts, λ from right-context type counts — the smoothing that
      // makes "San Francisco" not inflate p(Francisco | <anything>).
      // Top-30 bigrams by count with their smoothed p(w2|w1); every
      // division integer, so the statistical model hash-matches.
      (s, d) => TextStats.knBigramTop(tbl(s, d, "documents"), k = 30),
      Some(
        s"""WITH $LM_CTES,
           |n1r AS (SELECT w1, count(*) AS n1r FROM c12 GROUP BY 1),
           |n1l AS (SELECT w2, count(*) AS n1l FROM c12 GROUP BY 1),
           |bt AS (SELECT count(*) AS b FROM c12)
           |SELECT c12.w1, c12.w2, CAST(c12.c12 AS BIGINT) AS c12,
           |  CAST((greatest(4 * c12.c12 - 3, 0) * 1000000) // (4 * c1.c1)
           |    + ((3 * n1r.n1r * 1000000) // (4 * c1.c1))
           |      * ((n1l.n1l * 1000000) // bt.b) // 1000000 AS BIGINT) AS pkn_e6
           |FROM c12 JOIN c1 ON c12.w1 = c1.w1
           |JOIN n1r ON n1r.w1 = c12.w1
           |JOIN n1l ON n1l.w2 = c12.w2
           |CROSS JOIN bt
           |ORDER BY CAST(c12.c12 AS BIGINT) DESC, c12.w1, c12.w2
           |LIMIT 30""".stripMargin)),

    Q("text_kn_generate",
      // greedy autoregressive DECODING from the trained KN bigram model,
      // served as pure dataflow — the generate face of the in-engine LM
      // (text_kn_bigram trains it, text_lm_surprisal scores with it, this
      // samples from it). Seed = most frequent context word; each of the
      // 8 steps is argmax p_kn(w | prev) as one broadcast-probe of the
      // model table plus a heap top-1, chained without any driver-side
      // collect — the model frame is lineage-truncated and materializes
      // once under the single terminal action. Ties resolve
      // lexicographically and every probability is an exact e6 integer,
      // so the generated sequence hash-matches DuckDB's replay of the
      // identical 8-step argmax chain.
      (s, d) => TextStats.knGreedyDecode(tbl(s, d, "documents"), steps = 8)
        .orderBy("step"),
      Some {
        val gs = (1 to 8).map { i =>
          val prev = if (i == 1) "s0" else s"g${i - 1}"
          s"""g$i AS (SELECT kn.w2 AS word, kn.pkn_e6 AS pkn_e6 FROM kn
             |  JOIN $prev ON kn.w1 = $prev.word
             |  ORDER BY kn.pkn_e6 DESC, kn.w2 LIMIT 1)""".stripMargin
        }.mkString(",\n")
        val sel = (1 to 8).map { i =>
          s"UNION ALL SELECT $i, word, CAST(pkn_e6 AS BIGINT) FROM g$i"
        }.mkString("\n")
        s"""WITH $LM_CTES,
           |n1r AS (SELECT w1, count(*) AS n1r FROM c12 GROUP BY 1),
           |n1l AS (SELECT w2, count(*) AS n1l FROM c12 GROUP BY 1),
           |bt AS (SELECT count(*) AS b FROM c12),
           |kn AS MATERIALIZED (SELECT c12.w1, c12.w2,
           |    (greatest(4 * c12.c12 - 3, 0) * 1000000) // (4 * c1.c1)
           |      + ((3 * n1r.n1r * 1000000) // (4 * c1.c1))
           |        * ((n1l.n1l * 1000000) // bt.b) // 1000000 AS pkn_e6
           |  FROM c12 JOIN c1 ON c12.w1 = c1.w1
           |  JOIN n1r ON n1r.w1 = c12.w1
           |  JOIN n1l ON n1l.w2 = c12.w2
           |  CROSS JOIN bt),
           |s0 AS (SELECT w1 AS word FROM c1 ORDER BY c1 DESC, w1 LIMIT 1),
           |$gs
           |SELECT * FROM (
           |  SELECT CAST(0 AS BIGINT) AS step, word, CAST(NULL AS BIGINT) AS pkn_e6 FROM s0
           |  $sel
           |) ORDER BY step""".stripMargin
      }),

    Q("text_kappa_agreement",
      // Cohen's kappa between two quality annotators — the
      // inter-annotator-agreement statistic every labeling/curation
      // pipeline reports before trusting its gates (raw agreement
      // flatters imbalanced labels; kappa subtracts the chance floor).
      // Annotator A = the char-length gate, annotator B = the
      // token-count gate; po and the chance term pe are exact e6
      // rationals (DECIMAL(38,0)/HUGEINT for the a_pos·b_pos products so
      // corpus-scale counts never overflow), kappa = (po−pe)/(1−pe) at
      // identical truncation points — negative numerators divide
      // identically since both engines truncate toward zero. The
      // Landis-Koch strength label rides the same exact integer. Scale
      // shape: one scan, one 1-row aggregate.
      (s, d) => {
        val ann = tbl(s, d, "documents").select(
          (col("n_chars") >= 200).cast("int").as("a"),
          (size(filter(TextStats.words(col("text")), w => w =!= lit(""))) >= 40)
            .cast("int").as("b"))
        ann.agg(count(lit(1)).as("n"),
            sum(col("a")).as("a_pos"), sum(col("b")).as("b_pos"),
            count(when(col("a") === col("b"), 1)).as("n_agree"))
          .selectExpr("n", "a_pos", "b_pos", "n_agree",
            "n_agree * 1000000 DIV n AS po_e6",
            """(CAST(a_pos AS DECIMAL(38,0)) * b_pos
              |  + (CAST(n AS DECIMAL(38,0)) - a_pos) * (n - b_pos))
              | * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n) AS pe_e6""".stripMargin)
          .selectExpr("n", "a_pos", "b_pos", "n_agree", "po_e6",
            "CAST(pe_e6 AS BIGINT) AS pe_e6",
            """CAST((po_e6 - pe_e6) * 1000000
              | DIV greatest(1000000 - pe_e6, CAST(1 AS DECIMAL(38,0)))
              | AS BIGINT) AS kappa_e6""".stripMargin)
          .withColumn("strength", expr(
            """CASE WHEN kappa_e6 < 0 THEN 'poor'
              | WHEN kappa_e6 < 200000 THEN 'slight'
              | WHEN kappa_e6 < 400000 THEN 'fair'
              | WHEN kappa_e6 < 600000 THEN 'moderate'
              | WHEN kappa_e6 < 800000 THEN 'substantial'
              | ELSE 'almost_perfect' END""".stripMargin))
          .orderBy("n")
      },
      Some(
        """WITH ab AS (SELECT
          |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
          |    CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)),
          |      '\s+'), w -> w <> '')) >= 40 THEN 1 ELSE 0 END AS b
          |  FROM documents),
          |c AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          |    CAST(sum(a) AS HUGEINT) AS a_pos, CAST(sum(b) AS HUGEINT) AS b_pos,
          |    CAST(count(*) FILTER (WHERE a = b) AS HUGEINT) AS n_agree
          |  FROM ab),
          |k AS (SELECT n, a_pos, b_pos, n_agree,
          |    n_agree * 1000000 // n AS po_e6,
          |    (a_pos * b_pos + (n - a_pos) * (n - b_pos)) * 1000000
          |      // (n * n) AS pe_e6
          |  FROM c),
          |kk AS (SELECT n, a_pos, b_pos, n_agree, po_e6, pe_e6,
          |    (po_e6 - pe_e6) * 1000000 // greatest(1000000 - pe_e6, 1) AS kappa_e6
          |  FROM k)
          |SELECT CAST(n AS BIGINT) AS n, CAST(a_pos AS BIGINT) AS a_pos,
          |  CAST(b_pos AS BIGINT) AS b_pos, CAST(n_agree AS BIGINT) AS n_agree,
          |  CAST(po_e6 AS BIGINT) AS po_e6, CAST(pe_e6 AS BIGINT) AS pe_e6,
          |  CAST(kappa_e6 AS BIGINT) AS kappa_e6,
          |  CASE WHEN kappa_e6 < 0 THEN 'poor'
          |    WHEN kappa_e6 < 200000 THEN 'slight'
          |    WHEN kappa_e6 < 400000 THEN 'fair'
          |    WHEN kappa_e6 < 600000 THEN 'moderate'
          |    WHEN kappa_e6 < 800000 THEN 'substantial'
          |    ELSE 'almost_perfect' END AS strength
          |FROM kk ORDER BY n""".stripMargin)),

    Q("text_pipeline_funnel",
      // the data-diet funnel: doc and token counts after EACH curation
      // stage — input → quality gate (served perceptron) → span scrub →
      // exact dedup — the per-stage census a pipeline owner watches to
      // see where the corpus actually shrinks. Same stage frames as
      // text_curation_chain_v3, aggregated per stage instead of
      // materialized; the oracle replays the full trajectory and
      // aggregates the same four relations.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val withTok = docs.select(col("doc_id"),
          Corpus.tokenCount(col("text")).as("n_toks"))
        val feats = Classifier.hashedFeatures(docs, "text", "doc_id", dim = 256)
        val labels = docs.select(col("doc_id"),
          when(size(filter(TextStats.words(col("text")),
            t => t === "spark")) >= 2, 1L).otherwise(-1L).as("y"))
        val key = "perceptron_d256_i8_v1_" + d.replaceAll("[^A-Za-z0-9]+", "_")
        val w = graft.llm.ModelStore.getOrTrain(s, key)(
          Classifier.trainPerceptron(feats, labels, iters = 8).weights)
        val gated = Classifier.score(feats, w)
          .filter(col("predict") === 1L).select("doc_id")
        val gdocs = docs.join(gated, "doc_id").select("doc_id", "text")
        val cleaned = graft.llm.Dedup.removeSharedSpans(gdocs,
            n = 8, minTokens = 16, maxDf = 20)
          .filter(length(col("clean_text")) > 0)
          .select(col("doc_id"), col("clean_text"),
            (col("n_tokens") - col("n_removed_tokens")).as("ct"))
        val deduped = cleaned.groupBy(md5(col("clean_text")).as("__fp"))
          .agg(min(col("ct")).as("ct"))
        def stage(name: String, df: DataFrame, tok: Column): DataFrame =
          df.agg(count(lit(1)).as("n_docs"),
              sum(tok).cast("long").as("n_tokens"))
            .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
        stage("0_input", withTok, col("n_toks"))
          .unionAll(stage("1_quality_gated",
            withTok.join(gated, "doc_id"), col("n_toks")))
          .unionAll(stage("2_span_scrubbed", cleaned, col("ct")))
          .unionAll(stage("3_exact_deduped", deduped, col("ct")))
          .orderBy("stage")
      },
      Some {
        val branches = (0 to 8)
          .map(r => s"SELECT f, w FROM w$r WHERE $r = (SELECT pr FROM pk)")
          .mkString("\n  UNION ALL ")
        s"""WITH $PERCEPTRON_CTES,
           |pw AS MATERIALIZED ($branches),
           |ssc AS (SELECT fx.doc_id, sum(fx.cnt * COALESCE(pw.w, 0)) AS s
           |        FROM fx LEFT JOIN pw USING (f) GROUP BY 1),
           |gdocs AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
           |        JOIN ssc ON ssc.doc_id = d.doc_id WHERE ssc.s > 0),
           |${DedupQueries.cleanTextCtes("gdocs")},
           |tcf AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
           |  FROM documents),
           |r AS (
           |  SELECT '0_input' AS stage, count(*) AS n_docs,
           |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM tcf
           |  UNION ALL
           |  SELECT '1_quality_gated', count(*), CAST(sum(tcf.nt) AS BIGINT)
           |  FROM gdocs JOIN tcf USING (doc_id)
           |  UNION ALL
           |  SELECT '2_span_scrubbed', count(*),
           |    CAST(sum(n_tokens - n_removed_tokens) AS BIGINT)
           |  FROM cleaned WHERE length(clean_text) > 0
           |  UNION ALL
           |  SELECT '3_exact_deduped', count(*), CAST(sum(ct) AS BIGINT) FROM (
           |    SELECT min(n_tokens - n_removed_tokens) AS ct FROM cleaned
           |    WHERE length(clean_text) > 0 GROUP BY md5(clean_text)))
           |SELECT stage, n_docs, n_tokens FROM r ORDER BY stage""".stripMargin
      },
      bench = true),

    Q("text_batch_padding",
      // dynamic-batching efficiency MEASURED: per lang, batch docs 8 at a
      // time under two orders — length-sorted vs arrival (doc_id) — and
      // report the padding waste (Σ batch_max·8 − Σ len over each batch,
      // as ppm of the padded total). Length-sorting is the standard
      // trick for transformer batch efficiency; this is its measured
      // justification. The per-lang rank does NOT run in a window — lang
      // is a handful of values, so row_number() OVER (PARTITION BY lang)
      // would make one task sort each language's whole corpus at any
      // scale; weight-1 Ids.groupedRunningSum gives the same rank with
      // partition-bound parallelism (both orders end in doc_id → total
      // order → deterministic ranks).
      (s, d) => {
        val docs = tbl(s, d, "documents").select(col("doc_id"), col("lang"),
          Corpus.tokenCount(col("text")).as("len"), lit(1L).as("one"))
        def plan(name: String, order: Seq[Column]): DataFrame = {
          Ids.groupedRunningSum(docs, Seq("lang"), order, "one", "rk", "ntot")
            .withColumn("batch", expr("(rk - 1) DIV 8"))
            .groupBy("lang", "batch")
            .agg(count(lit(1)).as("nd"), max(col("len")).as("mx"),
              sum(col("len")).as("sm"))
            .groupBy("lang")
            .agg(count(lit(1)).as("n_batches"),
              sum(col("mx") * col("nd") - col("sm")).as("pad_tokens"),
              sum(col("mx") * col("nd")).as("padded_tokens"))
            .select(lit(name).as("strategy"), col("lang"), col("n_batches"),
              col("pad_tokens"), col("padded_tokens"),
              expr("pad_tokens * 1000000L DIV padded_tokens").as("waste_ppm"))
        }
        plan("arrival_order", Seq(col("doc_id")))
          .unionAll(plan("length_sorted", Seq(col("len"), col("doc_id"))))
          .orderBy("strategy", "lang")
      },
      Some(
        """WITH d AS (SELECT doc_id, lang,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS len
          |  FROM documents),
          |ar AS (SELECT lang, (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) // 8 AS batch,
          |         len FROM d),
          |ls AS (SELECT lang, (row_number() OVER (PARTITION BY lang ORDER BY len, doc_id) - 1) // 8 AS batch,
          |         len FROM d),
          |ab AS (SELECT lang, batch, count(*) AS nd, max(len) AS mx, sum(len) AS sm
          |       FROM ar GROUP BY 1, 2),
          |lb AS (SELECT lang, batch, count(*) AS nd, max(len) AS mx, sum(len) AS sm
          |       FROM ls GROUP BY 1, 2),
          |r AS (
          |  SELECT 'arrival_order' AS strategy, lang, count(*) AS n_batches,
          |    CAST(sum(mx * nd - sm) AS BIGINT) AS pad_tokens,
          |    CAST(sum(mx * nd) AS BIGINT) AS padded_tokens
          |  FROM ab GROUP BY 2
          |  UNION ALL
          |  SELECT 'length_sorted', lang, count(*),
          |    CAST(sum(mx * nd - sm) AS BIGINT), CAST(sum(mx * nd) AS BIGINT)
          |  FROM lb GROUP BY 2)
          |SELECT strategy, lang, n_batches, pad_tokens, padded_tokens,
          |  CAST(pad_tokens * 1000000 // padded_tokens AS BIGINT) AS waste_ppm
          |FROM r ORDER BY strategy, lang""".stripMargin)),

    Q("text_rouge_overlap",
      // ROUGE-2 as a DISTRIBUTED eval metric — the generation-eval face
      // the registry lacked (text_retrieval_rr evaluates retrieval; this
      // evaluates text-vs-reference overlap, the summarization/distill
      // scorecard). Candidate doc i scores against reference doc i+1 — a
      // deterministic pairing both engines replay; swap in any (cand, ref)
      // key column and the plan is unchanged. CLIPPED bigram counts, the
      // real ROUGE definition: overlap = Σ_g min(count_cand(g),
      // count_ref(g)), so a candidate can't farm score by repeating one
      // shared bigram. Exact integers throughout: P = o/c, R = o/r in e6,
      // and F1 folds to the exact single division 2o·10⁶ DIV (c + r) —
      // no floating harmonic mean. Shape: grams ride the one-pass
      // NgramHashSeq expression, one (doc, gram) count aggregation, one
      // equi-join on (doc_id+1, gram) for the clipped overlap, one totals
      // join — every stage keyed and map-side combinable, nothing
      // all-pairs, nothing global. 100 TB story: scoring N candidate/
      // reference pairs is two shuffles of the gram table, independent of
      // pair ordering.
      (s, d) => {
        val grams = tbl(s, d, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            explode(graft.expr.NgramHashSeq(col("text"), 2)).as("h"))
          .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
          .truncateLineage() // feeds totals, cand side, and ref side
        val totals = grams.groupBy("doc_id").agg(sum(col("c")).as("tot"))
        // ref grams re-keyed to the CANDIDATE id they evaluate (i+1 → i):
        // the overlap join is then a plain equi-join on (doc_id, h)
        val ref = grams.select((col("doc_id") - 1).as("doc_id"), col("h"),
          col("c").as("rc"))
        val olap = grams.join(ref, Seq("doc_id", "h"))
          .groupBy("doc_id")
          .agg(sum(least(col("c"), col("rc"))).as("overlap"))
        val rt = totals.select((col("doc_id") - 1).as("doc_id"),
          col("tot").as("ref_grams"))
        totals.join(rt, "doc_id")
          .join(olap, Seq("doc_id"), "left")
          .select(col("doc_id"), col("tot").as("cand_grams"),
            col("ref_grams"),
            coalesce(col("overlap"), lit(0L)).as("overlap"))
          .selectExpr("doc_id", "cand_grams", "ref_grams", "overlap",
            "overlap * 1000000 DIV cand_grams AS p_e6",
            "overlap * 1000000 DIV ref_grams AS r_e6",
            "2 * overlap * 1000000 DIV (cand_grams + ref_grams) AS f1_e6")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH g0 AS (
           |  SELECT doc_id, ($hexHead32Sql) AS h FROM (
           |    SELECT doc_id, md5(array_to_string(ws[i + 1: i + 2], ' ')) AS mh
           |    FROM (SELECT doc_id,
           |            regexp_split_to_array(lower(trim(text)), '\\s+') AS ws,
           |            unnest(range(0, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 2, 0) + 1)) AS i
           |          FROM documents WHERE length(trim(text)) > 0))),
           |gc AS (SELECT doc_id, h, count(*) AS c FROM g0 GROUP BY 1, 2),
           |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot
           |        FROM gc GROUP BY 1),
           |ol AS (SELECT a.doc_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS overlap
           |       FROM gc a JOIN gc b ON b.doc_id = a.doc_id + 1 AND b.h = a.h
           |       GROUP BY 1)
           |SELECT t.doc_id, t.tot AS cand_grams, r.tot AS ref_grams,
           |  coalesce(ol.overlap, 0) AS overlap,
           |  coalesce(ol.overlap, 0) * 1000000 // t.tot AS p_e6,
           |  coalesce(ol.overlap, 0) * 1000000 // r.tot AS r_e6,
           |  2 * coalesce(ol.overlap, 0) * 1000000 // (t.tot + r.tot) AS f1_e6
           |FROM tot t JOIN tot r ON r.doc_id = t.doc_id + 1
           |LEFT JOIN ol ON ol.doc_id = t.doc_id
           |ORDER BY t.doc_id""".stripMargin),
      bench = true),

    Q("text_simpson_diversity",
      // Simpson diversity (collision probability) of the unigram
      // distribution per source — the PROBABILISTIC repetitiveness dial
      // beside text_distinct_ngrams' set-based distinct-n: D = Σc(c−1) /
      // N(N−1) is exactly the chance two tokens drawn without replacement
      // are the same type, so boilerplate-heavy sources score high even
      // when their distinct-count looks healthy (a million "the"s and a
      // diverse tail have the same distinct-1 as a flat corpus; Simpson
      // separates them). Pure BIGINT end-to-end: Σc(c−1) ≤ N² stays under
      // 2⁶³ to ~3·10⁹ tokens per source, and the inverse 1/D (effective
      // vocabulary size — how many equally-common types would collide
      // this often) is a second integer division, no reciprocals. Shape:
      // one gram explode, one (source, gram) count, one thin per-source
      // aggregation — all map-side combinable.
      (s, d) => tbl(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          explode(graft.expr.NgramHashSeq(col("text"), 1)).as("h"))
        .groupBy("source", "h").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("c") * (col("c") - 1)).as("coll"))
        .selectExpr("source", "n_tokens", "n_types",
          "coll * 1000000 DIV greatest(n_tokens * (n_tokens - 1), 1) AS simpson_e6",
          """CAST(greatest(n_tokens * (n_tokens - 1), 1)
            | DIV greatest(coll, 1) AS BIGINT) AS inv_simpson""".stripMargin)
        .orderBy("source"),
      Some(
        s"""WITH g0 AS (
           |  SELECT source, ($hexHead32Sql) AS h FROM (
           |    SELECT source, md5(array_to_string(ws[i + 1: i + 1], ' ')) AS mh
           |    FROM (SELECT source,
           |            regexp_split_to_array(lower(trim(text)), '\\s+') AS ws,
           |            unnest(range(0, greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 1, 0) + 1)) AS i
           |          FROM documents WHERE length(trim(text)) > 0))),
           |gc AS (SELECT source, h, count(*) AS c FROM g0 GROUP BY 1, 2),
           |ag AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
           |       count(*) AS n_types,
           |       CAST(sum(c * (c - 1)) AS BIGINT) AS coll
           |       FROM gc GROUP BY 1)
           |SELECT source, n_tokens, n_types,
           |  coll * 1000000 // greatest(n_tokens * (n_tokens - 1), 1)
           |    AS simpson_e6,
           |  CAST(greatest(n_tokens * (n_tokens - 1), 1)
           |    // greatest(coll, 1) AS BIGINT) AS inv_simpson
           |FROM ag ORDER BY source""".stripMargin),
      bench = true)
  )

  /** Oracle CTE chain for the BPE queries: word freqs, char-wrapped
    * symbol strings (each symbol in its own chr(31) pair, so a literal
    * replace of "␟l␟␟r␟"→"␟lr␟" IS the greedy left-to-right BPE merge),
    * then `k` unrolled rounds of pair-count → argmax → rewrite,
    * mirroring Bpe.learnMerges exactly.
    */
  private def bpeCtes(k: Int): String = {
    val base =
      """toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w FROM documents),
        |wf AS (
        |  SELECT w, COUNT(*) AS freq FROM toks
        |  WHERE regexp_matches(w, '^[a-z]+$') AND len(w) BETWEEN 2 AND 12
        |  GROUP BY w HAVING COUNT(*) >= 5),
        |w0 AS (SELECT w, regexp_replace(w, '(.)', chr(31)||'\1'||chr(31), 'g') AS sym, freq FROM wf)"""
        .stripMargin
    val steps = (1 to k).map { i =>
      s"""p$i AS (SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest([ {'l': parts[j], 'r': parts[j+1]} FOR j IN generate_series(1, len(parts)-1) ]) AS p, freq
         |    FROM (SELECT string_split(trim(sym, chr(31)), chr(31)||chr(31)) AS parts, freq FROM w${i - 1})
         |    WHERE len(parts) >= 2)
         |  GROUP BY 1, 2),
         |t$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |w$i AS (SELECT w, replace(sym, chr(31)||t.l||chr(31)||chr(31)||t.r||chr(31), chr(31)||t.l||t.r||chr(31)) AS sym, freq FROM w${i - 1}, t$i t)"""
        .stripMargin
    }
    (base +: steps).mkString("WITH ", ",\n", "")
  }

  /** Oracle for text_bm25: identical tokenization, the same query-token
    * tf/df, and the same integer-cleared BM25 arithmetic (see
    * TextStats.bm25 — numerator and denominator multiplied through by
    * 10·L, integer division last).
    */
  /** Shared mixture-plan CTEs (per-source token counts → sqrt-temperature
    * weights → corpus totals), ending in `w(source, n_docs, tokens, w)`
    * and `t(tot_tokens, tot_w)` — used by both the plan and apply
    * queries.
    */
  private lazy val MIXTURE_CTES: String =
    """b AS (
      |  SELECT lang AS source, count(*) AS n_docs,
      |    sum(CASE WHEN length(trim(text)) = 0 THEN 0
      |        ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS tokens
      |  FROM documents GROUP BY lang),
      |w AS (SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens,
      |        CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
      |      FROM b WHERE tokens > 0),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot_tokens,
      |        CAST(sum(w) AS BIGINT) AS tot_w FROM w)""".stripMargin

  /** [[MIXTURE_CTES]] extended to per-document realized copy counts,
    * ending in `p(source, share_e6, repeat_e6)` and
    * `pd(source, doc_id, toks, n_copies)` — shared by the apply and
    * training-mix queries.
    */
  private lazy val MIXTURE_PD_CTES: String =
    s"""$MIXTURE_CTES,
       |p AS (SELECT source,
       |    CAST((w * 1000000) // tot_w AS BIGINT) AS share_e6,
       |    CAST((((w * 1000000) // tot_w) * tot_tokens) // tokens AS BIGINT) AS repeat_e6
       |  FROM w CROSS JOIN t),
       |dd AS (SELECT lang AS source, doc_id,
       |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS toks,
       |    md5(CAST(doc_id AS VARCHAR) || '#mix') AS mh
       |  FROM documents),
       |pd AS (SELECT dd.source, dd.doc_id, dd.toks,
       |    repeat_e6 // 1000000 +
       |      CASE WHEN ($hexHead32Sql) % 1000000 < repeat_e6 % 1000000
       |           THEN 1 ELSE 0 END AS n_copies
       |  FROM dd JOIN p USING (source))""".stripMargin

  /** Oracle for text_perceptron: eight unrolled pocket-perceptron rounds.
    * Round r evaluates w_r into miss set m$r (prediction ≠ label), then
    * w_{r+1} = w_r + sign(d)·(|d| // |m$r|) per feature — the sign-aware
    * truncating division matching Spark's DIV on the positive operand.
    * Weight merges drop exact zeros to mirror the trainer's compaction;
    * the curve is the nine miss counts and the pocket is the first
    * minimal round.
    */
  private lazy val PERCEPTRON_SQL: String =
    s"""WITH $PERCEPTRON_CTES
       |SELECT CAST(round AS BIGINT) AS round, CAST(n_miss AS BIGINT) AS n_miss,
       |  round = (SELECT pr FROM pk) AS is_pocket,
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
       |FROM curve ORDER BY round""".stripMargin

  /** Oracle for text_perceptron_score: the training CTEs, the pocket
    * round's weights picked by a 9-branch union (the round index is a
    * scalar subquery, so exactly one branch survives), then corpus-wide
    * scoring aggregated per source.
    */
  private lazy val PERCEPTRON_SCORE_SQL: String = {
    val branches = (0 to 8)
      .map(r => s"SELECT f, w FROM w$r WHERE $r = (SELECT pr FROM pk)")
      .mkString("\n  UNION ALL ")
    s"""WITH $PERCEPTRON_CTES,
       |pw AS MATERIALIZED ($branches),
       |ssc AS (SELECT fx.doc_id, sum(fx.cnt * COALESCE(pw.w, 0)) AS s
       |        FROM fx LEFT JOIN pw USING (f) GROUP BY 1),
       |j AS (SELECT dd.source, CASE WHEN ssc.s > 0 THEN 1 ELSE -1 END AS p, dl.y
       |      FROM ssc JOIN dl USING (doc_id)
       |      JOIN (SELECT doc_id, source FROM documents) dd USING (doc_id))
       |SELECT source, count(*) AS n_docs,
       |  CAST(count(*) FILTER (WHERE p = 1) AS BIGINT) AS n_pred_pos,
       |  CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS n_label_pos,
       |  CAST(count(*) FILTER (WHERE p = y) AS BIGINT) AS n_correct
       |FROM j GROUP BY source ORDER BY source""".stripMargin
  }

  /** Oracle for text_curation_chain_v3: perceptron training CTEs → pocket
    * weights → score-gate (s > 0 keeps) → gated relation `gdocs` → the
    * span-scrub chain re-run AGAINST gdocs (shared spans are detected
    * within the gated corpus only, matching the Spark composition) → md5
    * exact dedup of the cleaned text.
    */
  private lazy val CURATION_V3_SQL: String = {
    val branches = (0 to 8)
      .map(r => s"SELECT f, w FROM w$r WHERE $r = (SELECT pr FROM pk)")
      .mkString("\n  UNION ALL ")
    s"""WITH $PERCEPTRON_CTES,
       |pw AS MATERIALIZED ($branches),
       |ssc AS (SELECT fx.doc_id, sum(fx.cnt * COALESCE(pw.w, 0)) AS s
       |        FROM fx LEFT JOIN pw USING (f) GROUP BY 1),
       |gdocs AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d
       |        JOIN ssc ON ssc.doc_id = d.doc_id WHERE ssc.s > 0),
       |${DedupQueries.cleanTextCtes("gdocs")},
       |ex AS (SELECT min(id) AS doc_id, count(*) AS n_copies,
       |         CAST(min(n_tokens - n_removed_tokens) AS BIGINT) AS n_clean_tokens
       |       FROM cleaned WHERE length(clean_text) > 0
       |       GROUP BY md5(clean_text))
       |SELECT doc_id, n_clean_tokens, n_copies
       |FROM ex ORDER BY doc_id""".stripMargin
  }

  /** Shared perceptron-training CTE chain: features, labels, 8 unrolled
    * rounds (w0..w8, miss sets m0..m8), the miss curve, and the pocket
    * round pk(pr).
    */
  private lazy val PERCEPTRON_CTES: String = {
    val iters = 8
    // every chained CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    // reference, and an 8-round unrolled chain re-expands (and re-opens
    // the parquet) exponentially without it — fd exhaustion, not just cost
    def round(i: Int): String = {
      val (prev, cur) = (s"w$i", s"w${i + 1}")
      s"""s$i AS MATERIALIZED (SELECT fx.doc_id, sum(fx.cnt * COALESCE($prev.w, 0)) AS s
         |      FROM fx LEFT JOIN $prev USING (f) GROUP BY 1),
         |m$i AS MATERIALIZED (SELECT dl.doc_id, dl.y FROM s$i JOIN dl USING (doc_id)
         |      WHERE (CASE WHEN s$i.s > 0 THEN 1 ELSE -1 END) <> dl.y),
         |d$i AS MATERIALIZED (SELECT f, CASE WHEN d >= 0 THEN 1 ELSE -1 END *
         |        (abs(d) // (SELECT count(*) FROM m$i)) AS d
         |      FROM (SELECT f, sum(y * cnt) AS d
         |            FROM fx JOIN m$i USING (doc_id) GROUP BY f)),
         |$cur AS MATERIALIZED (SELECT COALESCE($prev.f, d$i.f) AS f,
         |        COALESCE($prev.w, 0) + COALESCE(d$i.d, 0) AS w
         |      FROM $prev FULL OUTER JOIN d$i ON $prev.f = d$i.f
         |      WHERE COALESCE($prev.w, 0) + COALESCE(d$i.d, 0) <> 0)""".stripMargin
    }
    val rounds = (0 until iters).map(round).mkString(",\n")
    val lastEval =
      s"""sE AS MATERIALIZED (SELECT fx.doc_id, sum(fx.cnt * COALESCE(w$iters.w, 0)) AS s
         |      FROM fx LEFT JOIN w$iters USING (f) GROUP BY 1),
         |m$iters AS MATERIALIZED (SELECT dl.doc_id, dl.y FROM sE JOIN dl USING (doc_id)
         |      WHERE (CASE WHEN sE.s > 0 THEN 1 ELSE -1 END) <> dl.y)""".stripMargin
    val curve = (0 to iters)
      .map(r => s"SELECT $r AS round, (SELECT count(*) FROM m$r) AS n_miss")
      .mkString("\n  UNION ALL ")
    s"""dl AS MATERIALIZED (SELECT doc_id,
       |    CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                 x -> x = 'spark')) >= 2
       |         THEN 1 ELSE -1 END AS y
       |  FROM documents),
       |tk AS (SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) WHERE tok <> ''),
       |fh AS (SELECT doc_id, ($hexHead32Sql) % 256 AS f
       |       FROM (SELECT doc_id, md5(tok || '#feat') AS mh FROM tk)),
       |fx0 AS (SELECT doc_id, f, count(*) AS cnt FROM fh GROUP BY 1, 2),
       |fx AS MATERIALIZED (SELECT doc_id, f, cnt FROM fx0
       |       UNION ALL SELECT doc_id, -1, 1 FROM documents),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS w WHERE false),
       |$rounds,
       |$lastEval,
       |curve AS MATERIALIZED ($curve),
       |mn AS (SELECT min(n_miss) AS mm FROM curve),
       |pk AS MATERIALIZED (SELECT min(round) AS pr FROM curve, mn WHERE n_miss = mm)""".stripMargin
  }

  /** Oracle for text_prf_search: two Okapi rounds around the feedback
    * harvest — initial per-query-bag BM25 top-5, Σtf·idf expansion-term
    * pick (NEW tokens only, ties to smaller token), expanded re-score.
    * Heavily-referenced CTEs are MATERIALIZED.
    */
  private lazy val PRF_SQL: String = {
    def okapiRound(suffix: String, bagCte: String, limit: Int): String =
      s"""tf$suffix AS (SELECT doc_id, tok, count(*) AS tf FROM tk
         |      WHERE tok IN (SELECT DISTINCT tok FROM $bagCte)
         |      GROUP BY doc_id, tok),
         |df$suffix AS (SELECT tok, count(*) AS df FROM tf$suffix GROUP BY tok),
         |sc$suffix AS (SELECT q.query_id, t.doc_id,
         |        CAST((((nn.n * 1000000) // d.df) * 22 * t.tf * ll.l) //
         |             (10 * t.tf * ll.l + 3 * ll.l + 9 * ln.len * nn.n) AS BIGINT) AS part_e6
         |      FROM tf$suffix t JOIN df$suffix d USING (tok)
         |      JOIN $bagCte q USING (tok)
         |      JOIN ln ON ln.doc_id = t.doc_id
         |      CROSS JOIN nn CROSS JOIN ll
         |      WHERE t.doc_id <> q.query_id),
         |sp$suffix AS (SELECT query_id, doc_id, CAST(sum(part_e6) AS BIGINT) AS score_e6
         |      FROM sc$suffix GROUP BY 1, 2),
         |rk$suffix AS MATERIALIZED (SELECT query_id, doc_id, score_e6, rn FROM (
         |      SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_e6 DESC, doc_id) AS rn FROM sp$suffix)
         |      WHERE rn <= $limit)""".stripMargin
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) WHERE tok <> ''),
       |qt0 AS MATERIALIZED (SELECT DISTINCT doc_id AS query_id, tok FROM tk
       |      WHERE doc_id % 50 = 0),
       |ln AS MATERIALIZED (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
       |nn AS (SELECT count(*) AS n FROM documents),
       |ll AS (SELECT CAST(sum(len) AS BIGINT) AS l FROM ln),
       |${okapiRound("1", "qt0", 5)},
       |tfa AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
       |dfa AS (SELECT tok, count(*) AS df
       |        FROM (SELECT DISTINCT doc_id, tok FROM tk) GROUP BY tok),
       |cand AS (SELECT r.query_id, t.tok,
       |        CAST(sum(t.tf * ((nn.n * 1000000) // d.df)) AS BIGINT) AS w
       |      FROM rk1 r JOIN tfa t USING (doc_id)
       |      JOIN dfa d ON d.tok = t.tok CROSS JOIN nn
       |      WHERE NOT EXISTS (SELECT 1 FROM qt0 q
       |        WHERE q.query_id = r.query_id AND q.tok = t.tok)
       |      GROUP BY 1, 2),
       |exp AS (SELECT query_id, tok FROM (
       |      SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY w DESC, tok) AS rn FROM cand) WHERE rn <= 3),
       |qt AS MATERIALIZED (SELECT query_id, tok FROM qt0
       |      UNION ALL SELECT query_id, tok FROM exp),
       |${okapiRound("2", "qt", 10)}
       |SELECT query_id, doc_id, score_e6, CAST(rn AS BIGINT) AS rnk
       |FROM rk2 ORDER BY query_id, rnk""".stripMargin
  }

  /** Oracle for text_retrieval_rr: BM25_SQL's Okapi chain, full-match
    * flag from n_terms = 3, the same coalesced reciprocal-rank and
    * precision@10 arithmetic.
    */
  private lazy val RETRIEVAL_RR_SQL: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |              FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
      |       WHERE tok IN ('hash', 'join', 'spark') GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |l AS (SELECT sum(len) AS l FROM lens),
      |sc AS (SELECT t.doc_id,
      |         (((n.n * 1000000) // d.df) * 22 * t.tf * l.l) //
      |           (10 * t.tf * l.l + 3 * l.l + 9 * le.len * n.n) AS part
      |       FROM tf t JOIN df d USING (tok)
      |       JOIN lens le ON le.doc_id = t.doc_id
      |       CROSS JOIN n CROSS JOIN l),
      |agg AS (SELECT doc_id, count(*) AS n_terms, sum(part) AS score_e6
      |        FROM sc GROUP BY 1),
      |topk AS (SELECT * FROM
      |         (SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rnk FROM agg)
      |         WHERE rnk <= 10)
      |SELECT CAST(COALESCE(min(CASE WHEN n_terms = 3 THEN rnk END), 0) AS BIGINT) AS first_full_rank,
      |  CAST(COALESCE(1000000 // min(CASE WHEN n_terms = 3 THEN rnk END), 0) AS BIGINT) AS rr_e6,
      |  CAST(sum(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
      |  CAST(sum(CASE WHEN n_terms = 3 THEN 1 ELSE 0 END) * 1000000 // 10 AS BIGINT) AS p_at_10_e6
      |FROM topk ORDER BY first_full_rank""".stripMargin

  /** Oracle for text_rag_chain: the chunk layout (text_chunk_windows
    * arithmetic) fed through the BM25_SQL Okapi form keyed by
    * (doc_id, chunk_id), best passage per doc, exact top-10 docs — the
    * oracle computes the FULL ranking (no shortlist), certifying the
    * heap-shortlist path exact.
    */
  private lazy val RAG_CHAIN_SQL: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents WHERE length(trim(text)) > 0),
      |n0 AS (SELECT doc_id, toks,
      |    1 + (GREATEST(len(toks) - 64, 0) + 47) // 48 AS nc FROM t),
      |e AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n0),
      |ch AS (SELECT doc_id, chunk_id,
      |    array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text
      |  FROM e),
      |ctk AS (SELECT doc_id, chunk_id, tok FROM (
      |    SELECT doc_id, chunk_id,
      |      unnest(regexp_split_to_array(lower(trim(chunk_text)), '\s+')) AS tok
      |    FROM ch) WHERE tok <> ''),
      |lens AS (SELECT doc_id, chunk_id, count(*) AS len FROM ctk GROUP BY 1, 2),
      |tf AS (SELECT doc_id, chunk_id, tok, count(*) AS tf FROM ctk
      |       WHERE tok IN ('hash', 'join', 'spark') GROUP BY 1, 2, 3),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM ch),
      |ll AS (SELECT sum(len) AS l FROM lens),
      |sc AS (SELECT t.doc_id, t.chunk_id,
      |         (((nn.n * 1000000) // d.df) * 22 * t.tf * ll.l) //
      |           (10 * t.tf * ll.l + 3 * ll.l + 9 * le.len * nn.n) AS part
      |       FROM tf t JOIN df d USING (tok)
      |       JOIN lens le ON le.doc_id = t.doc_id AND le.chunk_id = t.chunk_id
      |       CROSS JOIN nn CROSS JOIN ll),
      |agg AS (SELECT doc_id, chunk_id, sum(part) AS score_e6 FROM sc GROUP BY 1, 2),
      |best AS (SELECT doc_id, chunk_id, score_e6,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, chunk_id) AS pr
      |         FROM agg),
      |top AS (SELECT doc_id, chunk_id, score_e6 FROM best WHERE pr = 1)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, CAST(score_e6 AS BIGINT) AS score_e6
      |FROM (SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rn FROM top)
      |WHERE rn <= 10 ORDER BY score_e6 DESC, doc_id""".stripMargin

  private lazy val BM25_SQL: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |              FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
      |       WHERE tok IN ('hash', 'join', 'spark') GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |l AS (SELECT sum(len) AS l FROM lens),
      |sc AS (SELECT t.doc_id,
      |         (((n.n * 1000000) // d.df) * 22 * t.tf * l.l) //
      |           (10 * t.tf * l.l + 3 * l.l + 9 * le.len * n.n) AS part
      |       FROM tf t JOIN df d USING (tok)
      |       JOIN lens le ON le.doc_id = t.doc_id
      |       CROSS JOIN n CROSS JOIN l),
      |agg AS (SELECT doc_id, count(*) AS n_terms, sum(part) AS score_e6
      |        FROM sc GROUP BY 1)
      |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms, CAST(score_e6 AS BIGINT) AS score_e6
      |FROM (SELECT *, row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rn FROM agg)
      |WHERE rn <= 20 ORDER BY score_e6 DESC, doc_id""".stripMargin

  /** Oracle for text_decontaminate: identical word-3-gram construction
    * (the MINHASH_CTES shingle shape), identical md5-head32 gram hashes
    * with `list_distinct` applied AFTER hashing — deduping by hash, not
    * by gram string, exactly as NgramHashes does, so an md5-head32
    * collision can never split the engines — then the integer `//` ppm
    * and the cross-multiplied flag compare.
    */
  private lazy val DECONTAMINATE_SQL: String =
    s"""WITH w AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |g AS (SELECT id, list_distinct(list_transform(
       |    list_transform(
       |      list_filter(
       |        list_transform(range(0, greatest(len(ws) - 3, 0) + 1),
       |          i -> array_to_string(ws[i + 1:i + 3], ' ')),
       |        x -> x <> ''),
       |      s -> md5(s)),
       |    mh -> ($hexHead32Sql))) AS hs FROM w),
       |cg AS (SELECT id, unnest(hs) AS h FROM g WHERE id % 50 <> 0),
       |eh AS (SELECT DISTINCT h FROM
       |       (SELECT unnest(hs) AS h FROM
       |         (SELECT * FROM g WHERE id % 50 = 0 ORDER BY id LIMIT 1024))),
       |hits AS (SELECT id, count(*) AS n_hits FROM cg JOIN eh USING (h) GROUP BY id),
       |rep AS (SELECT g.id, len(hs) AS n_grams, COALESCE(h.n_hits, 0) AS n_hits
       |        FROM g LEFT JOIN hits h ON h.id = g.id WHERE g.id % 50 <> 0)
       |SELECT id AS doc_id,
       |  CAST(n_grams AS BIGINT) AS n_grams,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(CASE WHEN n_grams = 0 THEN 0 ELSE n_hits * 1000000 // n_grams END AS BIGINT)
       |    AS contam_ppm,
       |  (n_grams > 0 AND n_hits * 100 >= n_grams * 10) AS contaminated
       |FROM rep ORDER BY doc_id""".stripMargin

  /** Oracle for text_split_novelty: the DECONTAMINATE gram pipeline
    * (identical 3-gram md5-head32 hashes, distinct BY HASH) with the
    * salted-md5 split assignment deciding sides — val docs audited
    * against the train gram set.
    */
  private lazy val SPLIT_NOVELTY_SQL: String =
    s"""WITH w AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |g AS (SELECT id, list_distinct(list_transform(
       |    list_transform(
       |      list_filter(
       |        list_transform(range(0, greatest(len(ws) - 3, 0) + 1),
       |          i -> array_to_string(ws[i + 1:i + 3], ' ')),
       |        x -> x <> ''),
       |      s -> md5(s)),
       |    mh -> ($hexHead32Sql))) AS hs FROM w),
       |asg AS (SELECT id,
       |    CASE WHEN substr(md5(CAST(id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
       |         WHEN substr(md5(CAST(id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM g),
       |vg AS (SELECT g.id, hs FROM g JOIN asg USING (id) WHERE split = 'val'),
       |tg AS (SELECT DISTINCT h FROM
       |       (SELECT unnest(hs) AS h FROM g JOIN asg USING (id) WHERE split = 'train')),
       |ve AS (SELECT id, unnest(hs) AS h FROM vg),
       |hits AS (SELECT id, count(*) AS n_hits FROM ve JOIN tg USING (h) GROUP BY id),
       |rep AS (SELECT v.id, len(hs) AS n_grams, COALESCE(h.n_hits, 0) AS n_hits
       |        FROM vg v LEFT JOIN hits h ON h.id = v.id)
       |SELECT id AS doc_id,
       |  CAST(n_grams AS BIGINT) AS n_grams,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(CASE WHEN n_grams = 0 THEN 0
       |            ELSE (n_grams - n_hits) * 1000000 // n_grams END AS BIGINT) AS novel_ppm
       |FROM rep ORDER BY doc_id""".stripMargin

  /** Oracle for text_repetition: same word arrays, same bigram counts,
    * same (cnt DESC, bg DESC) argmax, same exact ratio arithmetic.
    */
  private lazy val REPETITION_SQL: String =
    """WITH w AS (SELECT doc_id,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS ws,
      |    length(text) AS nc,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt
      |  FROM documents),
      |t AS (SELECT doc_id, nc, nt,
      |        CASE WHEN nt = 0 THEN 0 ELSE len(list_distinct(ws)) END AS nd
      |      FROM w),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
      |       FROM w WHERE len(ws) >= 2),
      |bc AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, bg, cnt FROM (
      |          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg DESC) AS rn
      |          FROM bc) WHERE rn = 1)
      |SELECT t.doc_id,
      |  CAST(t.nt AS BIGINT) AS n_tokens,
      |  CAST(t.nd AS BIGINT) AS n_distinct_tokens,
      |  CAST(floor((CASE WHEN t.nt = 0 THEN 0.0
      |        ELSE 1.0 - CAST(t.nd AS DOUBLE) / t.nt END) * 1000000) AS BIGINT)
      |    AS dup_token_ratio_e6,
      |  COALESCE(top.bg, '') AS top_bigram,
      |  CAST(COALESCE(top.cnt, 0) AS BIGINT) AS top_bigram_cnt,
      |  CAST(floor((CASE WHEN t.nc = 0 THEN 0.0
      |        ELSE CAST(COALESCE(top.cnt, 0) AS DOUBLE) * length(COALESCE(top.bg, '')) / t.nc END)
      |      * 1000000) AS BIGINT) AS top_bigram_ratio_e6,
      |  (CASE WHEN t.nt = 0 THEN 0.0 ELSE 1.0 - CAST(t.nd AS DOUBLE) / t.nt END) > 0.3
      |    OR (CASE WHEN t.nc = 0 THEN 0.0
      |        ELSE CAST(COALESCE(top.cnt, 0) AS DOUBLE) * length(COALESCE(top.bg, '')) / t.nc END) > 0.2
      |    AS repetition_flag
      |FROM t LEFT JOIN top USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Oracle for text_redact: identical spike construction, identical
    * pattern chain in the identical order ('g' — DuckDB replaces only the
    * first match without it; Spark always replaces all).
    */
  private lazy val REDACT_SQL: String = {
    val url = """https?://[^\s]+"""
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val digits = "[0-9]{7,}"
    s"""WITH sp AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail.example.com or https://ex.example/d/' || CAST(doc_id AS VARCHAR) ||
       |    '?ref=abc id ' || CAST((doc_id + 1) * 1234567 AS VARCHAR) AS text
       |  FROM documents),
       |st AS (SELECT doc_id, text,
       |         regexp_replace(text, '$url', '<URL>', 'g') AS after_url
       |       FROM sp),
       |st2 AS (SELECT doc_id, text, after_url,
       |          regexp_replace(after_url, '$email', '<EMAIL>', 'g') AS after_email
       |        FROM st)
       |SELECT doc_id,
       |  regexp_replace(after_email, '$digits', '<NUM>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
       |  CAST(len(regexp_extract_all(after_url, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(after_email, '$digits')) AS BIGINT) AS n_nums
       |FROM st2 ORDER BY doc_id""".stripMargin
  }

  private def BLOOM_BLOCKLIST_SQL: String =
    s"""WITH fp AS (SELECT doc_id, source,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents),
       |block AS (SELECT DISTINCT fp FROM fp WHERE source IN ('src0', 'src1')),
       |bpos AS (SELECT DISTINCT pos FROM (
       |  ${bloomPosSql("block", BLOOM_LIST_M)}
       |)),
       |ppos AS (
       |  ${bloomPosSql("fp", BLOOM_LIST_M, extra = "doc_id")}
       |),
       |bh AS (SELECT p.doc_id, count(b.pos) = $BLOOM_K AS bloom_hit
       |       FROM ppos p LEFT JOIN bpos b USING (pos) GROUP BY p.doc_id),
       |eh AS (SELECT doc_id, fp IN (SELECT fp FROM block) AS exact_hit FROM fp)
       |SELECT doc_id, bloom_hit, exact_hit FROM bh JOIN eh USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Oracle for text_stratified_sample: identical md5 hash points, bottom
    * 40 per language with the same doc_id tiebreak.
    */
  private def STRATIFIED_SAMPLE_SQL: String =
    s"""WITH h AS (SELECT lang, doc_id, ($hexHead32Sql) AS h
       |  FROM (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS mh FROM documents)),
       |r AS (SELECT lang, doc_id,
       |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM h)
       |SELECT lang, doc_id FROM r WHERE rn <= 40 ORDER BY lang, doc_id""".stripMargin

  /** Oracle for text_robust_outliers: DuckDB median() is the same type-7
    * interpolation as Spark percentile(0.5); on integer token counts the
    * med/mad/flag arithmetic is exact in both engines.
    */
  private def ROBUST_OUTLIERS_SQL: String =
    """WITH t AS (SELECT doc_id, lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n FROM documents),
      |m AS (SELECT lang, median(n) AS med FROM t GROUP BY lang),
      |d AS (SELECT t.doc_id, t.lang, t.n, m.med, abs(n - med) AS ad FROM t JOIN m USING (lang)),
      |md AS (SELECT lang, median(ad) AS mad FROM d GROUP BY lang)
      |SELECT d.lang, d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
      |  CAST(floor(med * 1000000) AS BIGINT) AS med_e6,
      |  CAST(floor(mad * 1000000) AS BIGINT) AS mad_e6,
      |  ad > 2.0 * mad AS is_outlier
      |FROM d JOIN md USING (lang) ORDER BY doc_id""".stripMargin

  /** Oracle for agg_kmv_distinct: same hash points, same k minima, same
    * estimator arithmetic (double-exact constant, one division).
    */
  /** CMS matrix + stopword-probe CTE chain ending in
    * `est(item, est_count)` (with `toks` still in scope for exact-count
    * joins) — shared by the point-estimate oracle and the error harness.
    */
  private lazy val cmsProbeCtes: String = {
    val stop = sqlList(TextStats.enStopwords)
    s"""toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |              FROM documents),
       |tr AS (SELECT tok, unnest([0, 1, 2, 3]) AS r FROM toks WHERE tok <> ''),
       |tb AS (SELECT r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT r, md5(CAST(r AS VARCHAR) || '#' || tok) AS mh FROM tr)),
       |m AS (SELECT r, bucket, count(*) AS cnt FROM tb GROUP BY r, bucket),
       |pr AS (SELECT item, unnest([0, 1, 2, 3]) AS r
       |       FROM (SELECT unnest($stop) AS item)),
       |pb AS (SELECT item, r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT item, r, md5(CAST(r AS VARCHAR) || '#' || item) AS mh FROM pr)),
       |est AS (SELECT item, CAST(min(COALESCE(m.cnt, 0)) AS BIGINT) AS est_count
       |        FROM pb LEFT JOIN m USING (r, bucket)
       |        GROUP BY item)""".stripMargin
  }

  private lazy val CMS_SQL: String =
    s"""WITH $cmsProbeCtes
       |SELECT item, est_count FROM est ORDER BY item""".stripMargin

  private lazy val CMS_ERROR_SQL: String =
    s"""WITH $cmsProbeCtes,
       |cx AS (SELECT tok AS item, count(*) AS exact_count
       |       FROM toks WHERE tok <> '' GROUP BY 1)
       |SELECT e.item, e.est_count,
       |  CAST(COALESCE(cx.exact_count, 0) AS BIGINT) AS exact_count,
       |  CAST(CASE WHEN COALESCE(cx.exact_count, 0) = 0 THEN -1
       |       ELSE (e.est_count - cx.exact_count) * 1000000 // cx.exact_count
       |       END AS BIGINT) AS overcount_e6
       |FROM est e LEFT JOIN cx USING (item)
       |ORDER BY item""".stripMargin

  /** Oracle for text_tfidf: identical tf/df counts and the same exact
    * integer-division idf.
    */
  /** Oracle for text_lm_surprisal: same tokenize convention as TFIDF_SQL,
    * bigrams by positional index, same add-one model and the identical
    * integer ⌊log2⌋ via unpadded bin().
    */
  /** Bigram-surprisal CTE chain ending in `sc(doc_id, k)` — shared by the
    * per-doc surprisal report and the curriculum phases.
    */
  private lazy val LM_CTES: String =
    """toks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws0
      |              FROM documents),
      |tk AS (SELECT doc_id, list_filter(ws0, w -> w <> '') AS ws FROM toks),
      |tk2 AS (SELECT doc_id, ws FROM tk WHERE len(ws) >= 2),
      |pairs AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      |          FROM (SELECT doc_id, ws,
      |                  unnest(generate_series(1, len(ws) - 1)) AS i
      |                FROM tk2)),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
      |v AS (SELECT count(DISTINCT w2) AS v FROM pairs),
      |sc AS (SELECT p.doc_id,
      |         length(bin((c1.c1 + v.v) // (c12.c12 + 1))) - 1 AS k
      |       FROM pairs p
      |       JOIN c12 ON p.w1 = c12.w1 AND p.w2 = c12.w2
      |       JOIN c1 ON p.w1 = c1.w1
      |       CROSS JOIN v)""".stripMargin

  private lazy val LM_SURPRISAL_SQL: String =
    s"""WITH $LM_CTES
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(k) AS BIGINT) AS surprisal_bits,
       |  (CAST(sum(k) AS BIGINT) * 1000000) // count(*) AS mean_bits_e6
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for text_dsir_weights: md5-bucketed unigram features, add-one
    * smoothed whole-bit log-ratio per bucket (bin()-length ⌊log2⌋, the
    * LM_SURPRISAL convention), per-doc Σ tf·lam.
    */
  private lazy val DSIR_SQL: String =
    s"""WITH toks AS (SELECT doc_id, lang = 'en' AS is_tgt,
       |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      w -> w <> '')) AS tok
       |  FROM documents),
       |tb AS (SELECT doc_id, is_tgt, ($hexHead32Sql) % 1024 AS b
       |  FROM (SELECT doc_id, is_tgt, md5(tok) AS mh FROM toks)),
       |cnt AS (SELECT b, count(*) AS raw_c,
       |    CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_c
       |  FROM tb GROUP BY b),
       |tot AS (SELECT CAST(sum(raw_c) AS BIGINT) AS raw_tot,
       |    CAST(sum(tgt_c) AS BIGINT) AS tgt_tot FROM cnt),
       |lam AS (SELECT b,
       |    (length(bin((tgt_c + 1) * (raw_tot + 1024))) - 1)
       |      - (length(bin((raw_c + 1) * (tgt_tot + 1024))) - 1) AS lam
       |  FROM cnt, tot),
       |tf AS (SELECT doc_id, b, count(*) AS tf FROM tb GROUP BY 1, 2)
       |SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_toks,
       |  CAST(sum(t.tf * l.lam) AS BIGINT) AS dsir_bits
       |FROM tf t JOIN lam l ON l.b = t.b
       |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for text_curriculum: mean-surprisal difficulty, contiguous
    * rank, phase = rank·4 div n — the same arithmetic decile convention
    * as dash_pareto_deciles.
    */
  private lazy val CURRICULUM_SQL: String =
    s"""WITH $LM_CTES,
       |sd AS (SELECT doc_id, (CAST(sum(k) AS BIGINT) * 1000000) // count(*) AS diff_e6
       |       FROM sc GROUP BY doc_id),
       |r AS (SELECT diff_e6,
       |        row_number() OVER (ORDER BY diff_e6, doc_id) - 1 AS rank,
       |        count(*) OVER () AS n_tot
       |      FROM sd)
       |SELECT CAST(rank * 4 // n_tot AS INT) AS phase, count(*) AS n_docs,
       |  CAST(min(diff_e6) AS BIGINT) AS min_diff_e6,
       |  CAST(max(diff_e6) AS BIGINT) AS max_diff_e6
       |FROM r GROUP BY 1 ORDER BY phase""".stripMargin

  private lazy val TFIDF_SQL: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |              FROM documents),
      |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT t.doc_id, t.tok, t.tf, d.df,
      |  t.tf * ((n.n * 1000000) // d.df) AS score_e6
      |FROM tf t JOIN df d USING (tok) CROSS JOIN n
      |ORDER BY doc_id, tok""".stripMargin

  /** Oracle for text_cms_heavy_hitters: same matrix as CMS_SQL, probes =
    * the distinct token set, same min-over-rows estimate, φ = 1/32 of the
    * stream length as the support threshold.
    */
  private lazy val CMS_HH_SQL: String =
    s"""WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |              FROM documents),
       |tk AS (SELECT tok FROM toks WHERE tok <> ''),
       |tr AS (SELECT tok, unnest([0, 1, 2, 3]) AS r FROM tk),
       |tb AS (SELECT r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT r, md5(CAST(r AS VARCHAR) || '#' || tok) AS mh FROM tr)),
       |m AS (SELECT r, bucket, count(*) AS cnt FROM tb GROUP BY r, bucket),
       |pe AS (SELECT item, unnest([0, 1, 2, 3]) AS r
       |       FROM (SELECT DISTINCT tok AS item FROM tk)),
       |pb AS (SELECT item, r, ($hexHead32Sql) % 1024 AS bucket
       |       FROM (SELECT item, r, md5(CAST(r AS VARCHAR) || '#' || item) AS mh FROM pe)),
       |est AS (SELECT item, CAST(min(COALESCE(m.cnt, 0)) AS BIGINT) AS est_count
       |        FROM pb LEFT JOIN m USING (r, bucket) GROUP BY item)
       |SELECT item, est_count FROM est
       |WHERE est_count >= (SELECT count(*) FROM tk) / 32.0
       |ORDER BY item""".stripMargin

  /** Oracle for dedup_cc_labels: the same simhash pair set, components via
    * a recursive transitive-closure CTE, label = least(self, min reachable),
    * isolated docs labeled with themselves.
    */
  /** Shared recursive-CTE prelude: simhash pairs → transitive closure →
    * per-node min-label `lbl(id, component)`.
    */
  private lazy val TEXT_STATS_SQL: String =
    s"WITH $TEXT_STATS_CTES\nSELECT * FROM stats ORDER BY doc_id"

  /** Oracle for text_curation_chain: stats CTEs + simhash CTEs composed —
    * language/quality filter, min-id dedup on the content fingerprint,
    * near-dup drop of every pair's greater id (restricted to surviving
    * docs on both sides; per-doc signatures are corpus-independent so
    * computing them over all documents and restricting the pairs is
    * equivalent), then the salted-md5 split.
    */
  private lazy val CURATION_SQL: String =
    s"""WITH $TEXT_STATS_CTES,
       |$SIMHASH_CTES,
       |fl AS (SELECT doc_id, lang_guess, quality_e6, fp FROM stats
       |       WHERE lang_guess IN ('en') AND quality_e6 >= 650000),
       |kp AS (SELECT min(doc_id) AS doc_id FROM fl GROUP BY fp),
       |surv AS (SELECT fl.* FROM fl JOIN kp USING (doc_id)),
       |prs AS (SELECT b.id AS id_b
       |        FROM sigd a JOIN sigd b ON a.id < b.id
       |        JOIN surv sa ON sa.doc_id = a.id
       |        JOIN surv sb ON sb.doc_id = b.id
       |        WHERE $simhashHamSql <= 3),
       |fin AS (SELECT s.doc_id, s.lang_guess, s.quality_e6 FROM surv s
       |        LEFT JOIN (SELECT DISTINCT id_b FROM prs) p ON p.id_b = s.doc_id
       |        WHERE p.id_b IS NULL)
       |SELECT doc_id, lang_guess, quality_e6,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM fin ORDER BY doc_id""".stripMargin

  /** The documentStats computation as reusable CTEs ending in
    * `stats(doc_id, …, quality_e6, lang_guess, fp)` — shared by the
    * text_stats oracle and the curation chain.
    */
  private lazy val TEXT_STATS_CTES: String = {
    val stop = sqlList(TextStats.enStopwords)
    val en = sqlList(TextStats.langVocab("en"))
    val de = sqlList(TextStats.langVocab("de"))
    val fr = sqlList(TextStats.langVocab("fr"))
    val es = sqlList(TextStats.langVocab("es"))
    s"""base AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
       |    length(text) AS n_chars_computed,
       |    length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS words
       |  FROM documents
       |),
       |ratios AS (
       |  SELECT *,
       |    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(len(list_filter(words, w -> list_contains($stop, w))) AS DOUBLE) / n_tokens END AS stopword_ratio,
       |    CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_tokens END AS mean_word_len,
       |    len(list_filter(words, w -> list_contains($en, w))) AS h_en,
       |    len(list_filter(words, w -> list_contains($de, w))) AS h_de,
       |    len(list_filter(words, w -> list_contains($es, w))) AS h_es,
       |    len(list_filter(words, w -> list_contains($fr, w))) AS h_fr
       |  FROM base
       |),
       |scored AS (
       |  SELECT *,
       |    least(CAST(n_chars_computed AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
       |    + least(stopword_ratio * CAST(4.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
       |    + (CASE WHEN mean_word_len >= CAST(3.0 AS DOUBLE) AND mean_word_len <= CAST(10.0 AS DOUBLE)
       |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * CAST(0.2 AS DOUBLE)
       |    + greatest(CAST(0.0 AS DOUBLE),
       |        CAST(0.2 AS DOUBLE)
       |        - (CASE WHEN n_chars_computed = 0 THEN CAST(0.0 AS DOUBLE)
       |                ELSE CAST(n_punct AS DOUBLE) / n_chars_computed END)
       |        - (CASE WHEN n_chars_computed = 0 THEN CAST(0.0 AS DOUBLE)
       |                ELSE CAST(n_digits AS DOUBLE) / n_chars_computed END)) AS quality,
       |    greatest(h_en, h_de, h_es, h_fr) AS h_max
       |  FROM ratios
       |),
       |stats AS (
       |  SELECT doc_id, n_tokens, n_subwords, n_chars_computed, n_punct, n_digits,
       |    CAST(floor(stopword_ratio * 1000000) AS BIGINT) AS stopword_ratio_e6,
       |    CAST(floor(mean_word_len * 1000000) AS BIGINT) AS mean_word_len_e6,
       |    CAST(floor(quality * 1000000) AS BIGINT) AS quality_e6,
       |    CASE WHEN h_max = 0 THEN 'und'
       |         WHEN h_en = h_max THEN 'en'
       |         WHEN h_de = h_max THEN 'de'
       |         WHEN h_es = h_max THEN 'es'
       |         ELSE 'fr' END AS lang_guess,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM scored
       |)""".stripMargin
  }

  /** Oracle for dedup_jaccard_pairs — replicates the symmetric
    * (lang, length-bucket ±1) blocking exactly.
    */}
