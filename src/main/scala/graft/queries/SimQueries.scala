package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Bloom, Dashboard}
import graft.etl.{Parse, Transform}
import graft.expr.Transliterate
import graft.llm.{Corpus, Dedup, Multimodal, Similarity, TextStats}
import graft.schema.PropertySchema
import graft.streaming.Events
import graft.util.Lineage._
import graft.util.Num.{cents, e6}
import graft.queries.Fixtures._
import graft.queries.OracleShared._

/** Similarity-search and multimodal families: brute-force/LSH/IVF ANN,
  * embedding near-dup, asset metadata/decode/resize/frame-sample. Pure
  * move.
  */
private[graft] object SimQueries {

  /** Published-model helpers: each trainer runs AT MOST ONCE per (dataset,
    * config) per store root and is served from the [[graft.llm.ModelStore]]
    * create-once artifact afterwards — production's train-once/serve-many,
    * and why one suite run no longer pays three identical PQ trainings.
    * All trainers are deterministic, so serving from the artifact is a
    * pure memoization (bit-identical to retraining) and the oracles can
    * keep replaying the training inline. The `_v1` suffix is the
    * algorithm-version half of the cache key — bump it if a trainer's
    * arithmetic ever changes.
    */
  private def modelKey(d: String, name: String): String =
    name + "_" + d.replaceAll("[^A-Za-z0-9]+", "_")

  /** Fixed-SIZE query workload for the ANN/retrieval family: the 1-in-50
    * deterministic sample CAPPED at 64 queries. The cap is what makes the
    * query side structurally bounded (a GlobalLimit) instead of a fixed
    * FRACTION of the corpus — a 1/50 slice of 100 TB is 2 TB and neither
    * broadcasts nor keeps the brute-force baselines O(N·Q) with constant
    * Q; a query workload is fixed-size by nature. At every test SF the
    * sample is 10–40 vectors, so the cap is a provable no-op there and
    * every oracle hash is unchanged; base-table oracle CTEs mirror it as
    * ORDER BY vec_id LIMIT 64 (vec_id is unique → deterministic), while
    * derived-CTE `% 50` filters need no mirror at oracle SFs.
    */
  private val QBATCH_CAP = 64
  private def qb(emb: DataFrame, every: Int = 50,
      idCol: String = "vec_id"): DataFrame =
    emb.filter(pmod(col(idCol), lit(every)) === 0)
      .orderBy(idCol).limit(QBATCH_CAP)

  private def pqCb(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "pq_s8_k32_i2_v1"))(
      Similarity.pqCodebooksE6(tbl(s, d, "embeddings"),
        numSub = 8, kSub = 32, iters = 2))

  private def km8(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "kmeans_k8_i2_v1"))(
      Similarity.kMeansCentroidsE6(tbl(s, d, "embeddings"), k = 8, iters = 2))

  private def ivfpqCents(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "ivfpq_cents_c8_i2_n100_v1"))(
      Similarity.kMeansCentroidsE6(tbl(s, d, "embeddings"), k = 8, iters = 2,
        trainSample = 100))

  private def ivfpqCb(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "ivfpq_cb_s8_k32_i2_n100_v1"))(
      Similarity.pqCodebooksE6(tbl(s, d, "embeddings"),
        numSub = 8, kSub = 32, iters = 2, trainSample = 100))

  // clustered-corpus family: the SAME trainers re-run over the
  // deterministic 50-cell clustered twin (Similarity.clusteredEmbeddings),
  // published under their own keys — the fixture on which recall numbers
  // discriminate ANN configs (the isotropic corpus leaves every config
  // near-equidistant)
  private def cemb(s: SparkSession, d: String): DataFrame =
    Similarity.clusteredEmbeddings(tbl(s, d, "embeddings"))

  private def clPqCb(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "cl_pq_s8_k32_i2_v1"))(
      Similarity.pqCodebooksE6(cemb(s, d), numSub = 8, kSub = 32, iters = 2))

  private def clKm8(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "cl_kmeans_k8_i2_v1"))(
      Similarity.kMeansCentroidsE6(cemb(s, d), k = 8, iters = 2))

  private def clIvfpqCents(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "cl_ivfpq_cents_c8_i2_n100_v1"))(
      Similarity.kMeansCentroidsE6(cemb(s, d), k = 8, iters = 2,
        trainSample = 100))

  private def clIvfpqCb(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "cl_ivfpq_cb_s8_k32_i2_n100_v1"))(
      Similarity.pqCodebooksE6(cemb(s, d),
        numSub = 8, kSub = 32, iters = 2, trainSample = 100))

  // residual family: coarse centroids live in the NORMALIZED space (so
  // centroids and residuals subtract meaningfully) and the codebooks train
  // on the residual longs — both published once, served by both queries
  private def ivfpqrCents(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "ivfpqr_cents_c8_i2_n100_v1"))(
      Similarity.kMeansCentroidsE6(
        Similarity.normalizedView(tbl(s, d, "embeddings")),
        k = 8, iters = 2, idCol = "id", vecCol = "nv", trainSample = 100))

  private def ivfpqrCb(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s, modelKey(d, "ivfpqr_cb_s8_k32_i2_n100_v1"))(
      Similarity.pqCodebooksE6(
        Similarity.residualView(tbl(s, d, "embeddings"), ivfpqrCents(s, d)),
        numSub = 8, kSub = 32, iters = 2, idCol = "id", vecCol = "rq",
        normalize = false, trainSample = 100, quantized = true))

  val qs: Vector[Q] = Vector(
    Q("sim_dim_stats",
      // embedding observability: per-DIMENSION profile of the corpus in
      // e6 fixed point — count, sum, min, max per coordinate. Dead
      // dimensions (all ~0), scale drift between ingest batches, and
      // clipped values all surface here before they silently poison
      // similarity search. One posexplode + one thin aggregation,
      // linear in corpus × dim.
      (s, d) => tbl(s, d, "embeddings")
        .select(posexplode(expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
          .as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_e6"),
          min(col("v")).as("min_e6"), max(col("v")).as("max_e6"))
        .orderBy("dim"),
      Some(
        """WITH e AS (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
          |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim
          |  FROM embeddings),
          |q AS (SELECT dim, CAST(floor(x * 1000000) AS BIGINT) AS v FROM e)
          |SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_e6,
          |  min(v) AS min_e6, max(v) AS max_e6
          |FROM q GROUP BY dim ORDER BY dim""".stripMargin)),

    Q("sim_radius_search",
      // threshold retrieval — every neighbor with cosine ≥ 0.2, the
      // similarity-floor face top-k cannot express (near-copy audits and
      // dedup candidate harvests want ALL matches, not the k best). Same
      // broadcast-thin query side and codegen'd integer cosine as
      // sim_cosine_topk; zero shuffles, output size data-dependent by
      // design.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.radiusSearch(emb,
            qb(emb), tauE6 = 200000L)
          .orderBy("query_id", "neighbor_id")
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
          |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM c, q WHERE neighbor_id <> query_id)
          |SELECT query_id, neighbor_id, sim_e6 FROM s WHERE sim_e6 >= 200000
          |ORDER BY query_id, neighbor_id""".stripMargin)),

    Q("sim_hard_negatives",
      // contrastive-training data mining: per query the 5 most-similar
      // vectors of a DIFFERENT label — the high-similarity/wrong-class
      // negatives a metric-learning objective needs (random negatives
      // carry no gradient). Label filter before the heap top-k.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.hardNegatives(emb,
          qb(emb), k = 5)
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
          |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
          |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label AS nlabel
          |      FROM embeddings),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM c, q WHERE nlabel <> qlabel),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
          |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
          |ORDER BY query_id, rnk""".stripMargin)),

    Q("sim_cosine_topk",
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.bruteForceTopK(emb, qb(emb), k = 5)
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
          |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM c, q WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
          |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
          |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    Q("text_cluster_keywords",
      // the human-readable face of the embedding clusters: assign every
      // vector to its published k-means cell, then label each cell with
      // its top-5 tokens by exact-integer c-TF-IDF (frequent in the
      // cell, rare across cells, stopwords dropped) — semantic topic
      // discovery composed from the trained-centroid artifact and the
      // aligned documents table
      (s, d) => {
        val cells = Similarity.kMeansAssign(tbl(s, d, "embeddings"), km8(s, d))
          .select(col("id"), col("cell"))
        TextStats.clusterKeywords(tbl(s, d, "documents"), cells, k = 5)
          .orderBy("cell", "rnk")
      },
      Some(CLUSTER_KEYWORDS_SQL)),

    Q("sim_hybrid_rrf",
      // hybrid retrieval: dense (brute-force cosine top-10 over the
      // embeddings) and sparse (per-query-doc more-like-this BM25 top-10
      // over the aligned documents) lists fused by reciprocal-rank
      // fusion, 1e6 DIV (60 + rank) — the standard two-tower + lexical
      // combiner, exact-integer so the fused ranking replays in DuckDB
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val qv = qb(emb)
        val dense = Similarity.bruteForceTopK(emb, qv, k = 10)
          .select(col("query_id"), col("neighbor_id").as("id"), col("rnk"))
        val sparse = TextStats.moreLikeThis(tbl(s, d, "documents"),
            qv.select(col("vec_id").as("doc_id")), k = 10)
          .select(col("query_id"), col("doc_id").as("id"), col("rnk"))
        Similarity.rrfFuse(dense, sparse, k = 10)
          .orderBy("query_id", "rnk")
      },
      Some(HYBRID_RRF_SQL),
      bench = true),

    Q("sim_mmr_rerank",
      // diversified retrieval: the exact top-20 cosine shortlist per
      // query reranked by greedy MMR (λ = 7/10, integer mmr_e7 =
      // 7·rel − 3·max-sim-to-selected) into a top-5 that is relevant AND
      // non-redundant — the RAG diversity pass, every greedy round
      // oracle-unrolled
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val qv = qb(emb)
        val pool = Similarity.bruteForceTopK(emb, qv, k = 20)
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("v")), "neighbor_id")
          .select(col("query_id"), col("neighbor_id").as("id"),
            col("sim_e6").as("rel_e6"), col("v"))
        Similarity.mmrRerank(pool, k = 5)
      },
      Some(MMR_SQL),
      bench = true),

    Q("sim_exact_neardup_pairs",
      // threshold 0.3: the synthetic embeddings top out at cos ≈ 0.46, so a
      // "real" near-dup threshold matches a 0-row oracle — vacuously. 0.3
      // keeps ~42 pairs at sf0.01 so the value compare actually compares.
      (s, d) => Similarity.exactNearDupPairs(
          tbl(s, d, "embeddings").filter(pmod(col("vec_id"), lit(5)) === 0), minCosine = 0.3)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings WHERE vec_id % 5 = 0)
          |SELECT a.id AS id_a, b.id AS id_b,
          |  CAST(floor(list_inner_product(a.e, b.e) /
          |    (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) * 1000000) AS BIGINT) AS cos_e6
          |FROM v a JOIN v b ON a.id < b.id
          |WHERE CAST(floor(list_inner_product(a.e, b.e) /
          |    (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) * 1000000) AS BIGINT) >= 300000
          |ORDER BY id_a, id_b""".stripMargin)),

    Q("sim_lsh_topk",
      // The hyperplanes are deterministic constants (±1 by murmur3 parity
      // of (seed, bit, dim)), so the oracle embeds the 12×64 sign matrix
      // as literals and replays the projection with the same sequential
      // double fold (list_reduce) — bit-identical signs, buckets, probes,
      // and rerank. Fully oracle-checked, multi-probe included.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.lshTopK(emb, qb(emb), k = 5)
      },
      Some(LSH_TOPK_SQL),
      bench = true),

    Q("sim_kmeans_cells",
      // deterministic fixed-point k-means (Lloyd, 2 iterations, k=8):
      // md5-rank seed sample, e6-quantized integer centroid sums, argmax
      // cosine assignment with lower-cell tie-break — the TRAINED
      // clustering path made bit-reproducible, so DuckDB replays the whole
      // training trajectory and the final assignment hash-matches.
      (s, d) => Similarity.kMeansAssign(tbl(s, d, "embeddings"), km8(s, d))
        .select(col("id").as("vec_id"), col("cell"), col("sim_e6"))
        .orderBy("vec_id"),
      Some(KMEANS_CELLS_SQL),
      bench = true),

    Q("sim_cluster_margin",
      // clustering quality off the same trained k=8 artifact: per cell,
      // the distribution of ASSIGNMENT MARGINS (best-cell cosine minus
      // best other cell's — Similarity.kMeansMargins, the cosine-space
      // simplified silhouette; margins are exact e6 integers, so the
      // whole metric hash-matches where true silhouette's pairwise
      // means + sqrt could not). mean/min margin say how separated a
      // cell is; amb_share_e6 counts the near-zero-margin mass (< 0.01
      // cosine) — the points a SemDeDup threshold or IVF nProbe dial
      // actually fights over. One broadcast cross-score + two thin
      // aggregates; k is a constant, so work is O(k·n) forever.
      (s, d) => Similarity.kMeansMargins(tbl(s, d, "embeddings"), km8(s, d))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          sum(col("margin")).as("msum"),
          min(col("margin")).as("min_margin_e6"),
          sum(when(col("margin") < 10000L, 1L).otherwise(0L)).as("namb"))
        .selectExpr("cell", "n",
          "CAST(msum DIV n AS BIGINT) AS mean_margin_e6",
          "min_margin_e6",
          "CAST(namb * 1000000 DIV n AS BIGINT) AS amb_share_e6")
        .orderBy("cell"),
      Some(CLUSTER_MARGIN_SQL),
      bench = true),

    Q("sim_ivf_trained_topk",
      // IVF ANN over TRAINED k-means cells (the faiss-style coarse
      // quantizer): cells sized by the data rather than id arithmetic, and
      // still fully oracle-checkable because the training is fixed-point.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfTopKTrained(emb,
          qb(emb),
          k = 5, numCells = 8, trainIters = 2, nProbe = 2,
          centroids = Some(km8(s, d)))
      },
      Some(IVF_TRAINED_SQL)),

    Q("sim_radius_ivf",
      // sim_radius_search's SCALE path: the cosine floor evaluated only
      // inside each query's 2 nearest trained cells (shared centroid
      // artifact). Routing makes it approximate — a missed cell hides
      // its members — but never wrong: results are a SUBSET of the
      // exact radius set. sim_radius_recall measures exactly how much
      // the routing misses.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfRadiusSearch(emb,
            qb(emb), tauE6 = 200000L,
            numCells = 8, trainIters = 2, nProbe = 2,
            centroids = Some(km8(s, d)))
          .orderBy("query_id", "neighbor_id")
      },
      Some(RADIUS_IVF_SQL),
      bench = true), // the scale path carries the headline, not the O(n²) face

    Q("sim_radius_recall",
      // the harness row that certifies (or vetoes) the routed radius
      // config: pair recall of IVF-radius vs the exact radius truth —
      // routed results are a subset, so recall is ivf/exact on counts
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val qs = qb(emb)
        val ne = Similarity.radiusSearch(emb, qs, tauE6 = 200000L)
          .agg(count(lit(1)).as("exact_pairs"))
        val ni = Similarity.ivfRadiusSearch(emb, qs, tauE6 = 200000L,
            numCells = 8, trainIters = 2, nProbe = 2,
            centroids = Some(km8(s, d)))
          .agg(count(lit(1)).as("ivf_pairs"))
        ne.crossJoin(broadcast(ni)) // 1-row × 1-row
          .withColumn("recall_e6",
            expr("ivf_pairs * 1000000 DIV exact_pairs"))
      },
      Some(RADIUS_RECALL_SQL)), // recall = CONFIG quality, not engine speed:
      // correctness-gated every round, off the bench board (r12 next #7)

    Q("sim_ivfsq8_topk",
      // the faiss "IVF,SQ8" production composition: trained-cell routing
      // (shared centroid artifact with sim_ivf_trained_topk — train once,
      // serve every index variant) shrinks the candidate set, then the
      // integer byte-dot scores only the probed cells' 4×-compressed codes
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfSq8TopK(emb,
          qb(emb),
          k = 5, numCells = 8, trainIters = 2, nProbe = 2,
          centroids = Some(km8(s, d)))
      },
      Some(IVF_SQ8_SQL)),

    Q("sim_sq8_topk",
      // scalar-quantization tier: signed-byte codes (4× compression),
      // ranking by exact integer dot — the compressed-domain full-scan
      // baseline between raw cosine and PQ-ADC on the memory/recall curve
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.sq8TopK(emb,
          qb(emb), k = 5)
      },
      Some(SQ8_TOPK_SQL),
      bench = true),

    Q("sim_sq8_recall",
      // recall@5 of the SQ8 scan vs exact cosine — the harness row that
      // justifies (or vetoes) the 4× compression for a given corpus
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.sq8TopK(emb, queries, k = 5),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(SQ8_RECALL_SQL)),

    Q("sim_pq_topk",
      // product-quantization ADC top-k (Jégou et al., TPAMI 2011): per-
      // subspace integer-L2 codebooks trained in e6 fixed point, corpus
      // compressed to (sub, code) pairs, query scored via a broadcast
      // lookup table of precomputed query·codeword dots — the 32×
      // embedding-compression story, and the whole trajectory (seeding,
      // Lloyd rounds, encode, ADC) replays digit-for-digit in DuckDB
      // because every number is a long. This FLAT scan (every code meets
      // every query) is the exact/verify ADC baseline; the scale path is
      // sim_ivfpq_topk, which routes through coarse cells and trains on a
      // bounded sample. Codebooks come from the published model artifact
      // — trained once per suite, served here.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.pqTopK(emb, qb(emb),
          k = 5, numSub = 8, kSub = 32, trainIters = 2,
          codebooks = Some(pqCb(s, d)))
      },
      Some(PQ_TOPK_SQL),
      bench = true),

    Q("sim_ivfpq_topk",
      // IVF-PQ (Jégou et al., TPAMI 2011, §V): coarse k-means cells route
      // each query to nProbe=2 of 8 cells and ADC scores ONLY the PQ codes
      // inside them — ~nProbe/numCells of the corpus per query instead of
      // the flat scan — with BOTH models trained on a bounded md5-bottom-k
      // sample (100 of 500 vectors here; fixed size at any corpus scale)
      // and served from published artifacts. The trillion-vector shape:
      // after encode, training cost is constant and serving reads codes
      // plus one cell id per vector.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfPqTopK(emb,
          qb(emb),
          k = 5, numCells = 8, nProbe = 2, numSub = 8, kSub = 32,
          trainIters = 2, trainSample = 100,
          centroids = Some(ivfpqCents(s, d)), codebooks = Some(ivfpqCb(s, d)))
      },
      Some(IVFPQ_TOPK_SQL),
      bench = true),

    Q("sim_ivfpq_residual_topk",
      // the faithful IVFADC (Jégou TPAMI'11 §V): PQ encodes each vector's
      // RESIDUAL from its coarse centroid, so the code budget spends its
      // precision on what routing hasn't already explained; the ADC score
      // decomposes exactly as q·c_cell + Σ q_sub·r̂_code in e12 integers.
      // Coarse centroids train in the normalized space on the same bounded
      // sample; both models are published artifacts.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfPqResidualTopK(emb,
          qb(emb),
          k = 5, numCells = 8, nProbe = 2, numSub = 8, kSub = 32,
          trainIters = 2, trainSample = 100,
          centroids = Some(ivfpqrCents(s, d)),
          codebooks = Some(ivfpqrCb(s, d)))
      },
      Some(IVFPQ_RES_TOPK_SQL),
      bench = true),

    Q("sim_ivfpq_residual_recall",
      // recall@5 of residual IVF-PQ vs exact cosine truth — measured next
      // to sim_ivfpq_recall so the residual refinement's lift (or its
      // absence on this isotropic corpus) is a number, not a guess
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.ivfPqResidualTopK(emb, queries,
              k = 5, numCells = 8, nProbe = 2, numSub = 8, kSub = 32,
              trainIters = 2, trainSample = 100,
              centroids = Some(ivfpqrCents(s, d)),
              codebooks = Some(ivfpqrCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(IVFPQ_RES_RECALL_SQL)),

    Q("sim_ivfpq_recall",
      // recall@5 of routed IVF-PQ against the exact cosine ground truth —
      // the probe-count dial is tuned by MEASURING this number, never by
      // guessing; both pipelines (sampled training included) replay in the
      // oracle
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.ivfPqTopK(emb, queries,
              k = 5, numCells = 8, nProbe = 2, numSub = 8, kSub = 32,
              trainIters = 2, trainSample = 100,
              centroids = Some(ivfpqCents(s, d)),
              codebooks = Some(ivfpqCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(IVFPQ_RECALL_SQL)),

    Q("sim_pq_recall",
      // recall@5 of PQ-ADC against the exact cosine ground truth — the
      // evaluation harness run before trusting any ANN config; per-query
      // integer-exact e6 ratios, both pipelines replayed in the oracle
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.pqTopK(emb, queries, k = 5, numSub = 8, kSub = 32,
              trainIters = 2, codebooks = Some(pqCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(PQ_RECALL_SQL)),

    Q("sim_pq_rerank_recall",
      // the production PQ config measured: ADC shortlists 25 candidates
      // from the compressed codes, the exact cosine re-scores only those,
      // and recall@5 against brute force quantifies what the shortlist
      // recovered — on this isotropic synthetic corpus raw ADC recall is
      // ~0.2 (near-equidistant points; quantization scrambles hairline
      // rank gaps) and the rerank lifts exactly as the harness shows,
      // which is the point: config quality is MEASURED, not assumed
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.pqTopKReranked(emb, queries, k = 5, shortlist = 25,
              numSub = 8, kSub = 32, trainIters = 2,
              codebooks = Some(pqCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(PQ_RERANK_RECALL_SQL)),

    Q("sim_pq_recall_clustered",
      // sim_pq_recall re-run on the 50-cell CLUSTERED twin corpus: same
      // trainer, same k/subspace config, same oracle pipeline (retargeted
      // at the cemb CTE) — the row that shows what PQ recall looks like
      // when the corpus has structure to exploit, against the isotropic
      // row's honest-but-flat number. Config decisions (numSub, kSub)
      // cite THIS number, not the isotropic one: measured recall@5 mean
      // 0.56 at sf0.01 here vs ~0.24 on the isotropic corpus — the 8×32
      // codebook is adequate once the corpus has cluster structure.
      (s, d) => {
        val emb = cemb(s, d)
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.pqTopK(emb, queries, k = 5, numSub = 8, kSub = 32,
              trainIters = 2, codebooks = Some(clPqCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(onClustered(PQ_RECALL_SQL))),

    Q("sim_ivfpq_recall_clustered",
      // recall@5 of routed IVF-PQ on the clustered twin — the nProbe dial
      // reads THIS row: on separated cells, probing 2 of 8 cells keeps the
      // true neighbors (same-cluster vectors share cells), which the
      // isotropic corpus cannot show because its cells are arbitrary cuts.
      // Measured at sf0.01: identical per-query hits to raw PQ (mean 0.56)
      // — nProbe=2 routing loses ZERO recall on clustered data, so the
      // probe dial stays at 2 and the quantizer is the binding constraint.
      (s, d) => {
        val emb = cemb(s, d)
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.ivfPqTopK(emb, queries,
              k = 5, numCells = 8, nProbe = 2, numSub = 8, kSub = 32,
              trainIters = 2, trainSample = 100,
              centroids = Some(clIvfpqCents(s, d)),
              codebooks = Some(clIvfpqCb(s, d))),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(onClustered(IVFPQ_RECALL_SQL))),

    Q("sim_radius_recall_clustered",
      // pair recall of IVF-routed radius search on the clustered twin —
      // the row that certifies the nProbe=2 routing config where cells
      // align with real clusters (the isotropic row's 0.44 pair-recall
      // reflects the corpus, not the router): measured pair-recall 0.85
      // at sf0.01 (262/309) — the router is sound; isotropic 0.44 was
      // the corpus's near-equidistance, as claimed.
      (s, d) => {
        val emb = cemb(s, d)
        val qs = qb(emb)
        val ne = Similarity.radiusSearch(emb, qs, tauE6 = 200000L)
          .agg(count(lit(1)).as("exact_pairs"))
        val ni = Similarity.ivfRadiusSearch(emb, qs, tauE6 = 200000L,
            numCells = 8, trainIters = 2, nProbe = 2,
            centroids = Some(clKm8(s, d)))
          .agg(count(lit(1)).as("ivf_pairs"))
        ne.crossJoin(broadcast(ni)) // 1-row × 1-row
          .withColumn("recall_e6",
            expr("ivf_pairs * 1000000 DIV exact_pairs"))
      },
      Some(onClustered(RADIUS_RECALL_SQL))),

    Q("sim_ivf_topk",
      // IVF coarse quantization with deterministic centroids (vec_id % 100
      // = 0) — fully oracle-checkable with no training pass; the trained
      // variant is sim_ivf_trained_topk.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.ivfTopK(emb, qb(emb),
          k = 5, centStep = 100, nProbe = 2)
      },
      Some(
        """WITH c AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
          |           FROM embeddings WHERE vec_id % 100 = 0
          |           ORDER BY vec_id LIMIT 64),
          |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |vc AS (
          |  SELECT id, e, cent_id, row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT v.id, v.e, c.cent_id,
          |          CAST(floor(list_inner_product(v.e, c.cv) /
          |            (sqrt(list_inner_product(v.e, v.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM v, c)
          |),
          |cells AS (SELECT id AS neighbor_id, e AS cv, cent_id FROM vc WHERE rn = 1),
          |probes AS (SELECT id AS query_id, e AS qv, cent_id FROM vc WHERE rn <= 2 AND id % 50 = 0),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM cells JOIN probes USING (cent_id) WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
          |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
          |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    Q("sim_filtered_recall",
      // FILTERED ANN — the vector-database face plain top-k cannot serve:
      // "nearest neighbors WHERE label = 3". Ground truth is exact cosine
      // top-5 over the PRE-filtered corpus (predicate pushed below the
      // scan); the measured candidate is IVF POST-filtering — search the
      // unfiltered index top-k', then filter — the production shortcut
      // whose recall starves when k' ≪ k/selectivity (10 labels ≈ 10%
      // pass rate: k'=20 leaves ~2 surviving candidates for 5 slots).
      // Both k'=20 and k'=60 are measured per query; the recall_e6 pair
      // IS the sizing rule (k' must scale with 1/selectivity) — the same
      // measure-don't-guess discipline as the PQ/IVF recall rows.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val q = qb(emb)
        val truth = Similarity.bruteForceTopK(
            emb.filter(col("label") === 3), q, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val nTruth = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
        val lab = emb.select(col("vec_id").as("neighbor_id"), col("label"))
        def post(kp: Int): DataFrame = {
          val cand = Similarity.ivfTopK(emb, q, k = kp, centStep = 100, nProbe = 2)
            .join(lab, "neighbor_id")
            .filter(col("label") === 3)
          val w = Window.partitionBy("query_id")
            .orderBy(col("sim_e6").desc, col("neighbor_id"))
          cand.withColumn("__r", row_number().over(w)).filter(col("__r") <= 5)
            .select(col("query_id"), col("neighbor_id"), lit(kp.toLong).as("kprime"))
        }
        val hits = post(20).unionByName(post(60))
          .join(truth, Seq("query_id", "neighbor_id"))
          .groupBy("query_id", "kprime").agg(count(lit(1)).as("n_hit"))
        nTruth.select(col("query_id"), col("n_truth"),
            explode(array(lit(20L), lit(60L))).as("kprime"))
          .join(hits, Seq("query_id", "kprime"), "left")
          .select(col("query_id"), col("kprime"), col("n_truth"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_e6", expr("n_hit * 1000000L DIV n_truth"))
          .orderBy("query_id", "kprime")
      },
      Some(
        """WITH c AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
          |           FROM embeddings WHERE vec_id % 100 = 0
          |           ORDER BY vec_id LIMIT 64),
          |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
          |vc AS (
          |  SELECT id, e, cent_id, row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT v.id, v.e, c.cent_id,
          |          CAST(floor(list_inner_product(v.e, c.cv) /
          |            (sqrt(list_inner_product(v.e, v.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM v, c)
          |),
          |cells AS (SELECT id AS neighbor_id, e AS cv, cent_id FROM vc WHERE rn = 1),
          |probes AS (SELECT id AS query_id, e AS qv, cent_id FROM vc WHERE rn <= 2 AND id % 50 = 0),
          |s AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM cells JOIN probes USING (cent_id) WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s),
          |tr0 AS (SELECT q.id AS query_id, v2.id AS neighbor_id,
          |          CAST(floor(list_inner_product(q.e, v2.e) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(v2.e, v2.e))) * 1000000) AS BIGINT) AS sim_e6
          |        FROM (SELECT * FROM v WHERE id % 50 = 0) q
          |        JOIN (SELECT * FROM v WHERE label = 3) v2 ON v2.id <> q.id),
          |truth AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS trk
          |    FROM tr0) WHERE trk <= 5),
          |nt AS (SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1),
          |post AS (SELECT query_id, neighbor_id, kp FROM (
          |    SELECT r.query_id, r.neighbor_id, kp.kp,
          |      row_number() OVER (PARTITION BY r.query_id, kp.kp
          |        ORDER BY r.sim_e6 DESC, r.neighbor_id) AS rr
          |    FROM r JOIN v lv ON lv.id = r.neighbor_id AND lv.label = 3
          |    CROSS JOIN (SELECT unnest([20, 60]) AS kp) kp
          |    WHERE r.rnk <= kp.kp) WHERE rr <= 5),
          |hits AS (SELECT p.query_id, p.kp, count(*) AS n_hit
          |  FROM post p JOIN truth t ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
          |  GROUP BY 1, 2),
          |keys AS (SELECT query_id, n_truth, unnest([20, 60]) AS kp FROM nt)
          |SELECT k.query_id, CAST(k.kp AS BIGINT) AS kprime, k.n_truth,
          |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
          |  CAST(COALESCE(h.n_hit, 0) * 1000000 // k.n_truth AS BIGINT) AS recall_e6
          |FROM keys k LEFT JOIN hits h ON h.query_id = k.query_id AND h.kp = k.kp
          |ORDER BY k.query_id, kprime""".stripMargin),
      // recall diagnostic — correctness-gated, off the bench board (r12 #7)
      bench = false),

    Q("sim_filtered_prefilter",
      // LABEL-AWARE ANN routing — the fix for the starvation
      // sim_filtered_recall measured (post-filter k′=20 at 10% selectivity
      // leaves ~2 survivors for 5 slots): the label predicate prunes the
      // IVF posting lists BEFORE scoring (Similarity.ivfFilteredCandidates,
      // same global centroid artifact as ivfTopK), so every scored
      // candidate is already label-3 and the whole budget goes to
      // qualifying rows. n_scored is published per query precisely so the
      // equal-budget comparison is part of the oracled output: at 10
      // labels it sits near the post-filter arm's k′=20 budget while
      // recall_e6 recovers to near-exact (FilteredAnnSpec pins the win).
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val q = qb(emb)
        val truth = Similarity.bruteForceTopK(
            emb.filter(col("label") === 3), q, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val nTruth = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
        val cand = Similarity.ivfFilteredCandidates(emb, q,
          col("label") === 3, centStep = 100, nProbe = 2)
        val nScored = cand.groupBy("query_id").agg(count(lit(1)).as("n_scored"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim_e6").desc, col("neighbor_id"))
        val top5 = cand.withColumn("__r", row_number().over(w))
          .filter(col("__r") <= 5)
          .select(col("query_id"), col("neighbor_id"))
        val hits = top5.join(truth, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        nTruth.join(nScored, Seq("query_id"), "left")
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_scored"), lit(0L)).as("n_scored"),
            col("n_truth"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_e6", expr("n_hit * 1000000L DIV n_truth"))
          .orderBy("query_id")
      },
      Some(
        """WITH c AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
          |           FROM embeddings WHERE vec_id % 100 = 0
          |           ORDER BY vec_id LIMIT 64),
          |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
          |pfq AS (SELECT id, e FROM v WHERE id % 50 = 0 ORDER BY id LIMIT 64),
          |pffa AS (
          |  SELECT id, e, cent_id, row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT f.id, f.e, c.cent_id,
          |          CAST(floor(list_inner_product(f.e, c.cv) /
          |            (sqrt(list_inner_product(f.e, f.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM (SELECT * FROM v WHERE label = 3) f, c)
          |),
          |pfcells AS (SELECT id AS neighbor_id, e AS cv, cent_id FROM pffa WHERE rn = 1),
          |pfqa AS (
          |  SELECT id, e, cent_id, row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT q.id, q.e, c.cent_id,
          |          CAST(floor(list_inner_product(q.e, c.cv) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM pfq q, c)
          |),
          |pfprobes AS (SELECT id AS query_id, e AS qv, cent_id FROM pfqa WHERE rn <= 2),
          |pfcand AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM pfcells JOIN pfprobes USING (cent_id) WHERE neighbor_id <> query_id),
          |pfns AS (SELECT query_id, count(*) AS n_scored FROM pfcand GROUP BY 1),
          |pftop5 AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rr
          |    FROM pfcand) WHERE rr <= 5),
          |pftr0 AS (SELECT q.id AS query_id, v2.id AS neighbor_id,
          |          CAST(floor(list_inner_product(q.e, v2.e) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(v2.e, v2.e))) * 1000000) AS BIGINT) AS sim_e6
          |        FROM pfq q JOIN (SELECT * FROM v WHERE label = 3) v2 ON v2.id <> q.id),
          |pftruth AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS trk
          |    FROM pftr0) WHERE trk <= 5),
          |pfnt AS (SELECT query_id, count(*) AS n_truth FROM pftruth GROUP BY 1),
          |pfhits AS (SELECT p.query_id, count(*) AS n_hit
          |  FROM pftop5 p JOIN pftruth t ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
          |  GROUP BY 1)
          |SELECT nt.query_id,
          |  CAST(COALESCE(ns.n_scored, 0) AS BIGINT) AS n_scored,
          |  nt.n_truth,
          |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
          |  CAST(COALESCE(h.n_hit, 0) * 1000000 // nt.n_truth AS BIGINT) AS recall_e6
          |FROM pfnt nt LEFT JOIN pfns ns ON ns.query_id = nt.query_id
          |LEFT JOIN pfhits h ON h.query_id = nt.query_id
          |ORDER BY nt.query_id""".stripMargin),
      bench = true),

    Q("sim_filtered_partitioned",
      // LABEL-PARTITIONED filtered ANN vs the prefilter arm, at equal
      // budget, in one oracled row set. sim_filtered_prefilter prunes a
      // GLOBAL index's posting lists per query — right for a handful of
      // labels; at high label cardinality the production layout is a
      // label-keyed partitioned index (Similarity
      // .ivfLabelPartitionedCandidates): each label owns its own
      // centroids (its mod-10 rows + its min-id fallback), rows assign
      // within their label's cells only, and a query routes straight to
      // its label's cells — zero non-matching rows ever read, where
      // prefilter still scans mixed cells and drops. BOTH arms run here
      // against the same exhaustive label-3 truth, publishing per query
      // n_scored (the budget) and hits (the recall numerator) side by
      // side — the comparison IS the oracled output, not prose: at test
      // SF the partitioned arm's budget (~2 of the label's ~5-6 cells,
      // ~18 scored) lands in the same range as prefilter's (~2 of 5
      // global cells, label rows only, ~23 scored), and recall is
      // comparable within small-sample geometry noise (isotropic test
      // vectors give either 40%-coverage probe ~50-80%; neither arm
      // dominates on ACCURACY — the partitioned layout's win is read
      // volume: at L labels the prefilter probe reads ~L× the qualifying
      // rows from mixed posting lists before dropping, the partitioned
      // probe reads label cells only). The oracle replays both index
      // builds, both routings, both scorings and the shared truth from
      // the base table.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val q = qb(emb)
        val truth = Similarity.bruteForceTopK(
            emb.filter(col("label") === 3), q, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val nTruth = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
        def arm(cand: DataFrame, tag: String): DataFrame = {
          val ns = cand.groupBy("query_id")
            .agg(count(lit(1)).as(s"${tag}_scored"))
          val w = Window.partitionBy("query_id")
            .orderBy(col("sim_e6").desc, col("neighbor_id"))
          val hits = cand.withColumn("__r", row_number().over(w))
            .filter(col("__r") <= 5)
            .select(col("query_id"), col("neighbor_id"))
            .join(truth, Seq("query_id", "neighbor_id"))
            .groupBy("query_id").agg(count(lit(1)).as(s"${tag}_hit"))
          ns.join(hits, Seq("query_id"), "left")
            .select(col("query_id"), col(s"${tag}_scored"),
              coalesce(col(s"${tag}_hit"), lit(0L)).as(s"${tag}_hit"))
        }
        val part = arm(Similarity.ivfLabelPartitionedCandidates(
          emb, q, "label", 3L, centStep = 10, nProbe = 2), "part")
        val pref = arm(Similarity.ivfFilteredCandidates(
          emb, q, col("label") === 3, centStep = 100, nProbe = 2), "pref")
        nTruth.join(part, Seq("query_id"), "left")
          .join(pref, Seq("query_id"), "left")
          .select(col("query_id"), col("n_truth"),
            coalesce(col("part_scored"), lit(0L)).as("part_scored"),
            coalesce(col("part_hit"), lit(0L)).as("part_hit"),
            coalesce(col("pref_scored"), lit(0L)).as("pref_scored"),
            coalesce(col("pref_hit"), lit(0L)).as("pref_hit"))
          .withColumn("part_recall_e6", expr("part_hit * 1000000L DIV n_truth"))
          .withColumn("pref_recall_e6", expr("pref_hit * 1000000L DIV n_truth"))
          .orderBy("query_id")
      },
      Some(
        """WITH lqv AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
          |lqq AS (SELECT id, e FROM lqv WHERE id % 50 = 0 ORDER BY id LIMIT 64),
          |lqtr0 AS (SELECT q.id AS query_id, v2.id AS neighbor_id,
          |          CAST(floor(list_inner_product(q.e, v2.e) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(v2.e, v2.e))) * 1000000) AS BIGINT) AS sim_e6
          |        FROM lqq q JOIN (SELECT * FROM lqv WHERE label = 3) v2 ON v2.id <> q.id),
          |lqtruth AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS trk
          |    FROM lqtr0) WHERE trk <= 5),
          |lqnt AS (SELECT query_id, count(*) AS n_truth FROM lqtruth GROUP BY 1),
          |lqc0 AS (SELECT label AS lbl, id AS cent_id, e AS cent_v FROM lqv WHERE id % 10 = 0
          |         UNION
          |         SELECT v.label AS lbl, v.id AS cent_id, v.e AS cent_v
          |         FROM lqv v JOIN (SELECT label, min(id) AS mid FROM lqv GROUP BY 1) m
          |           ON m.label = v.label AND m.mid = v.id),
          |lqcents AS (SELECT lbl, cent_id, cent_v FROM (
          |    SELECT *, row_number() OVER (PARTITION BY lbl ORDER BY cent_id) AS cr
          |    FROM lqc0) WHERE cr <= 64),
          |lqasg AS (SELECT lbl, id, e, cent_id,
          |    row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT v.label AS lbl, v.id, v.e, c.cent_id,
          |          CAST(floor(list_inner_product(v.e, c.cent_v) /
          |            (sqrt(list_inner_product(v.e, v.e)) * sqrt(list_inner_product(c.cent_v, c.cent_v))) * 1000000) AS BIGINT) AS cs
          |        FROM lqv v JOIN lqcents c ON c.lbl = v.label)),
          |lqcells AS (SELECT lbl, id AS neighbor_id, e AS cv, cent_id FROM lqasg WHERE rn = 1),
          |lqqa AS (SELECT id, e, cent_id,
          |    row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT q.id, q.e, c.cent_id,
          |          CAST(floor(list_inner_product(q.e, c.cent_v) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.cent_v, c.cent_v))) * 1000000) AS BIGINT) AS cs
          |        FROM lqq q JOIN lqcents c ON c.lbl = 3)),
          |lqprobes AS (SELECT id AS query_id, e AS qv, cent_id FROM lqqa WHERE rn <= 2),
          |lqpc AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM (SELECT * FROM lqcells WHERE lbl = 3) pcell JOIN lqprobes USING (cent_id)
          |      WHERE neighbor_id <> query_id),
          |lqpns AS (SELECT query_id, count(*) AS part_scored FROM lqpc GROUP BY 1),
          |lqptop AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rr
          |    FROM lqpc) WHERE rr <= 5),
          |lqphits AS (SELECT p.query_id, count(*) AS part_hit
          |  FROM lqptop p JOIN lqtruth t ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
          |  GROUP BY 1),
          |lqgc AS (SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cv
          |         FROM embeddings WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 64),
          |lqfa AS (SELECT id, e, cent_id,
          |    row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT f.id, f.e, c.cent_id,
          |          CAST(floor(list_inner_product(f.e, c.cv) /
          |            (sqrt(list_inner_product(f.e, f.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM (SELECT * FROM lqv WHERE label = 3) f, lqgc c)),
          |lqfcells AS (SELECT id AS neighbor_id, e AS cv, cent_id FROM lqfa WHERE rn = 1),
          |lqfqa AS (SELECT id, e, cent_id,
          |    row_number() OVER (PARTITION BY id ORDER BY cs DESC, cent_id) AS rn
          |  FROM (SELECT q.id, q.e, c.cent_id,
          |          CAST(floor(list_inner_product(q.e, c.cv) /
          |            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS cs
          |        FROM lqq q, lqgc c)),
          |lqfprobes AS (SELECT id AS query_id, e AS qv, cent_id FROM lqfqa WHERE rn <= 2),
          |lqfc AS (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM lqfcells JOIN lqfprobes USING (cent_id)
          |      WHERE neighbor_id <> query_id),
          |lqfns AS (SELECT query_id, count(*) AS pref_scored FROM lqfc GROUP BY 1),
          |lqftop AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rr
          |    FROM lqfc) WHERE rr <= 5),
          |lqfhits AS (SELECT p.query_id, count(*) AS pref_hit
          |  FROM lqftop p JOIN lqtruth t ON t.query_id = p.query_id AND t.neighbor_id = p.neighbor_id
          |  GROUP BY 1)
          |SELECT nt.query_id, nt.n_truth,
          |  CAST(COALESCE(pn.part_scored, 0) AS BIGINT) AS part_scored,
          |  CAST(COALESCE(ph.part_hit, 0) AS BIGINT) AS part_hit,
          |  CAST(COALESCE(fn.pref_scored, 0) AS BIGINT) AS pref_scored,
          |  CAST(COALESCE(fh.pref_hit, 0) AS BIGINT) AS pref_hit,
          |  CAST(COALESCE(ph.part_hit, 0) * 1000000 // nt.n_truth AS BIGINT) AS part_recall_e6,
          |  CAST(COALESCE(fh.pref_hit, 0) * 1000000 // nt.n_truth AS BIGINT) AS pref_recall_e6
          |FROM lqnt nt
          |LEFT JOIN lqpns pn ON pn.query_id = nt.query_id
          |LEFT JOIN lqphits ph ON ph.query_id = nt.query_id
          |LEFT JOIN lqfns fn ON fn.query_id = nt.query_id
          |LEFT JOIN lqfhits fh ON fh.query_id = nt.query_id
          |ORDER BY nt.query_id""".stripMargin),
      bench = true),

    Q("dedup_semantic",
      // SemDeDup (Abbas et al. 2023): embedding-space dedup — route every
      // vector to its trained k-means cell (the SAME published centroid
      // artifact the IVF family serves from), pairwise cosine only within
      // a cell, >= 0.3 pairs become edges, min-id survivor per connected
      // semantic group. Catches paraphrase-class duplicates token dedup
      // can't; quadratic work bounded per cell. Oracle replays training,
      // assignment, within-cell pairs, and the transitive closure.
      (s, d) => Dedup.semanticDedup(tbl(s, d, "embeddings"), km8(s, d),
          minCosine = 0.3)
        .select(col("id").as("vec_id"), col("component"), col("keep"))
        .orderBy("vec_id"),
      Some(SEMANTIC_DEDUP_SQL),
      bench = true),

    Q("text_curation_chain_v2",
      // the round-6 operators composed end to end, the way a training-data
      // pipeline actually runs them: exact-substring span SCRUB (one copy
      // of every repeated passage survives) → md5-fingerprint exact dedup
      // of the cleaned text (fingerprint, not full-string, is the shuffle
      // key at scale) → SEMANTIC keep via trained-cell embedding CC. The
      // surviving corpus with clean token counts and copy multiplicities.
      (s, d) => {
        val cleaned = Dedup.removeSharedSpans(tbl(s, d, "documents"),
            n = 8, minTokens = 16, maxDf = 20)
          .filter(length(col("clean_text")) > 0)
          .select(col("doc_id"), col("clean_text"),
            (col("n_tokens") - col("n_removed_tokens")).as("n_clean_tokens"))
        val exact = cleaned.groupBy(md5(col("clean_text")).as("__fp"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_copies"),
            min(col("n_clean_tokens")).as("n_clean_tokens"))
        val semKeep = Dedup.semanticDedup(tbl(s, d, "embeddings"), km8(s, d),
            minCosine = 0.3)
          .filter(col("keep")).select(col("id").as("doc_id"))
        exact.join(semKeep, Seq("doc_id"))
          .select(col("doc_id"), col("n_clean_tokens"), col("n_copies"))
          .orderBy("doc_id")
      },
      Some(CURATION_V2_SQL)),

    Q("sim_embedding_neardup_lsh",
      // 0.3 (see sim_exact_neardup_pairs) so the bucketed variant emits a
      // nonzero candidate set (23 pairs at sf0.01); recall vs the exact
      // pairs is unit-tested. Oracle replays the 8-bit bucket blocking
      // with the literal sign matrix (see sim_lsh_topk).
      (s, d) => Similarity.embeddingNearDupPairs(tbl(s, d, "embeddings"), minCosine = 0.3)
        .orderBy("id_a", "id_b"),
      Some(EMB_NEARDUP_LSH_SQL)),

    // ---- LLM ops: multimodal ---------------------------------------------------

    Q("mm_asset_metadata",
      (s, d) => Multimodal.assetMetadata(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"))
        .orderBy("asset_id"),
      Some(
        """SELECT doc_id AS asset_id,
          |  list_extract(['image/png', 'image/jpeg', 'audio/wav', 'video/mp4'], CAST(doc_id % 4 AS INT) + 1) AS mime,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS checksum,
          |  substring(md5(text), 1, 8) AS shard_key,
          |  octet_length(encode(text)) > 1048576 AS is_large
          |FROM documents ORDER BY asset_id""".stripMargin),
      bench = true),

    Q("mm_decode_features",
      // The decode kernel is the declared deterministic stub, but it is a
      // PURE function of the payload bytes — so the whole decode path
      // (binary plumbing, dims, frame counts, per-slot feature sums) is
      // oracle-checkable: DuckDB re-derives every byte from hex(payload).
      // feats(j) = sum(bytes at i≡j mod 8) / 255 / n with one double
      // division, so round(f * 255 * n) recovers the integer sum exactly.
      (s, d) => {
        val feats = Multimodal.decodeFeatures(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text")).toDF()
        val sumCols = (0 until Multimodal.ByteProfiler.featureDim).map(j =>
          round(element_at(col("features"), j + 1).cast("double") * 255.0 *
            greatest(col("n_bytes"), lit(1L))).cast("long").as(s"f${j}_sum"))
        feats.select(Seq(col("asset_id"), col("mime"), col("n_bytes"),
            col("width"), col("height"), col("n_frames")) ++ sumCols: _*)
          .orderBy("asset_id")
      },
      Some(MM_DECODE_SQL)),

    Q("mm_phash_neardup",
      // media near-dup via perceptual hash: aHash bits (slot vs mean,
      // integer cross-multiplied) block on (phash, w, h) — a bucketed
      // equi-join, the LSH propose-then-verify shape for assets — then a
      // scale-invariant byte-profile tolerance confirms inside buckets.
      // Every quantity is an exact integer, so the pair set replays
      // byte-for-byte in DuckDB.
      (s, d) => Multimodal.phashNearDupPairs(
          Multimodal.decodeFeatures(
            Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text")).toDF())
        .orderBy("id_a", "id_b"),
      Some(MM_PHASH_SQL),
      bench = true),

    Q("mm_resize",
      // Resize stub is likewise byte-deterministic: dims scale to fit
      // 32x32, the payload is truncated/zero-padded to area-proportional
      // length — all reproducible from hex(payload) in DuckDB, with
      // md5-of-hex as the content checksum (DuckDB cannot slice blobs,
      // but slicing the hex string is byte-equivalent).
      (s, d) => Multimodal.resizeAssets(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"),
          maxW = 32, maxH = 32)
        .toDF().select(col("asset_id"), col("mime"), col("width"), col("height"),
          octet_length(col("payload")).cast("long").as("out_len"),
          md5(hex(col("payload")).cast("binary")).as("hex_md5"))
        .orderBy("asset_id"),
      Some(MM_RESIZE_SQL)),

    Q("mm_frame_sample",
      // frame fan-out: every stride-th frame of a video asset, one row per
      // (asset, frame) — n_frames is byte-deterministic, so the generator
      // shape is exactly reproducible with range() in DuckDB.
      (s, d) => Multimodal.sampleFrames(
          Multimodal.synthesizeAssets(tbl(s, d, "documents"), "doc_id", "text"),
          stride = 10)
        .toDF().select("asset_id", "frame_idx")
        .orderBy("asset_id", "frame_idx"),
      Some(
        """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
          |f AS (SELECT doc_id, CASE WHEN doc_id % 4 = 3 THEN 1 + n % 30 ELSE 1 END AS nf FROM b)
          |SELECT doc_id AS asset_id, CAST(unnest(range(0, nf, 10)) AS INT) AS frame_idx
          |FROM f ORDER BY asset_id, frame_idx""".stripMargin)),

    Q("mm_shot_boundaries",
      // shot-boundary detection over the VIDEO assets — the video face of
      // the segmentation family (audio has VAD; this is the standard first
      // pass over video data before captioning/sampling: where are the
      // cuts?). Each frame reduces to an integral 8-byte-sample signature
      // (videoFrameSignatures — a real video decoder slots in at that
      // exact (asset, frame) → signature boundary with nothing downstream
      // changing); a cut falls between consecutive frames whose signatures
      // differ by > 96, shots are the runs between cuts (running-sum
      // islands). lag + running-sum windows PARTITION BY asset (≤ 30
      // frames each, never global). Every quantity is an exact integer,
      // so DuckDB replays signatures and cuts byte-for-byte from the hex.
      (s, d) => {
        val assets = Multimodal.synthesizeAssets(
          tbl(s, d, "documents"), "doc_id", "text")
        Multimodal.shotSummary(
            Multimodal.videoFrameSignatures(assets).toDF(), threshold = 96L)
          .orderBy("asset_id")
      },
      Some(
        """WITH b AS (SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) AS n
          |  FROM documents
          |  WHERE doc_id % 4 = 3 AND octet_length(encode(text)) > 0),
          |fx AS (SELECT asset_id, hx, n, unnest(range(1 + n % 30)) AS f FROM b),
          |sj AS (SELECT asset_id, hx, n, f, unnest(range(8)) AS j FROM fx),
          |off AS (SELECT asset_id, f, (f * 131 + j * 7) % n AS i, hx FROM sj),
          |sg AS (SELECT asset_id, f AS frame,
          |    CAST(sum((strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
          |      + strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1) AS BIGINT) AS sig
          |  FROM off GROUP BY 1, 2),
          |ct AS (SELECT asset_id, frame,
          |    CASE WHEN lag(sig) OVER w IS NOT NULL
          |           AND abs(sig - lag(sig) OVER w) > 96 THEN 1 ELSE 0 END AS is_cut
          |  FROM sg WINDOW w AS (PARTITION BY asset_id ORDER BY frame)),
          |sh AS (SELECT asset_id, frame, sum(is_cut) OVER (PARTITION BY asset_id
          |    ORDER BY frame ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
          |  FROM ct),
          |sl AS (SELECT asset_id, shot, count(*) AS len FROM sh GROUP BY 1, 2),
          |r AS (SELECT asset_id, CAST(sum(len) AS BIGINT) AS n_frames,
          |    CAST(count(*) - 1 AS BIGINT) AS n_cuts, count(*) AS n_shots,
          |    CAST(max(len) AS BIGINT) AS longest_shot FROM sl GROUP BY 1)
          |SELECT asset_id, n_frames, n_cuts, n_shots, longest_shot,
          |  n_cuts * 1000000 // greatest(n_frames - 1, 1) AS cut_rate_ppm
          |FROM r ORDER BY asset_id""".stripMargin)),

    Q("mm_audio_vad",
      // voice-activity-style segmentation over the AUDIO assets — the
      // audio face of the multimodal family (the image path has decode/
      // resize/phash; this is the standard first pass over speech data
      // before transcription: which stretches carry signal?). The payload
      // chops into 64-byte frames reduced to integral energies
      // (audioFrameEnergies — a real PCM decoder slots in at that exact
      // boundary with nothing downstream changing); a frame is "voiced"
      // when its energy exceeds the asset's own mean, cross-multiplied
      // (energy·n_frames > Σenergy) so the mean never materializes as a
      // fraction. The longest voiced run is gaps-and-islands on the frame
      // index — island key = frame − row_number, windows PARTITIONED BY
      // asset (group size = one asset's frames, never global). Output per
      // asset: frames, total energy, voiced count, longest run, voiced
      // ratio e6.
      (s, d) => {
        val assets = Multimodal.synthesizeAssets(
          tbl(s, d, "documents"), "doc_id", "text")
        Multimodal.vadSummary(Multimodal.audioFrameEnergies(assets).toDF())
          .orderBy("asset_id")
      },
      Some(
        """WITH b AS (SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
          |    octet_length(encode(text)) AS n
          |  FROM documents
          |  WHERE doc_id % 4 = 2 AND octet_length(encode(text)) > 0),
          |by AS (SELECT asset_id, i // 64 AS frame,
          |    (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
          |    + strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1 AS byte
          |  FROM (SELECT asset_id, hx, unnest(range(n)) AS i FROM b)),
          |fr AS (SELECT asset_id, frame, CAST(sum(byte) AS BIGINT) AS energy
          |       FROM by GROUP BY 1, 2),
          |tot AS (SELECT asset_id, count(*) AS n_frames,
          |        CAST(sum(energy) AS BIGINT) AS total_energy
          |        FROM fr GROUP BY 1),
          |vo AS (SELECT f.asset_id, f.frame FROM fr f JOIN tot t USING (asset_id)
          |       WHERE f.energy * t.n_frames > t.total_energy),
          |rn AS (SELECT asset_id, frame - row_number()
          |         OVER (PARTITION BY asset_id ORDER BY frame) AS isl FROM vo),
          |rl AS (SELECT asset_id, count(*) AS len FROM rn GROUP BY asset_id, isl),
          |lg AS (SELECT asset_id, max(len) AS longest_voiced FROM rl GROUP BY 1),
          |nv AS (SELECT asset_id, count(*) AS n_voiced FROM vo GROUP BY 1)
          |SELECT t.asset_id, t.n_frames, t.total_energy,
          |  coalesce(nv.n_voiced, 0) AS n_voiced,
          |  CAST(coalesce(lg.longest_voiced, 0) AS BIGINT) AS longest_voiced,
          |  coalesce(nv.n_voiced, 0) * 1000000 // t.n_frames AS voiced_ratio_e6
          |FROM tot t LEFT JOIN nv USING (asset_id) LEFT JOIN lg USING (asset_id)
          |ORDER BY t.asset_id""".stripMargin),
      bench = true),

    Q("mm_audio_decode",
      // REAL audio codec, REAL oracle — the audio twin of mm_real_decode
      // (closes VERDICT r13 next #5): one PCM16 mono WAV per document,
      // samples a closed-form function of doc_id, encoded with the
      // canonical 44-byte RIFF header and decoded back through
      // WavCodec's chunk-walking parser — actual header validation,
      // actual little-endian sample extraction. The oracle never parses
      // a byte: it re-derives every |sample| from the generative formula
      // and replays the 64-sample frame energies exactly. Downstream is
      // the SAME vadSummary the byte-kernel mm_audio_vad uses — the
      // factored proof that a real decoder slots in at the frame
      // boundary with nothing below it changing. sample_rate/n_channels/
      // n_samples come from the fmt and data chunks (header-parse
      // witnesses); any endianness, offset, or chunk-walk bug shifts a
      // frame energy and the hash diverges.
      (s, d) => {
        val assets = Multimodal.synthesizeWavAssets(
          tbl(s, d, "documents"), "doc_id")
        val meta = Multimodal.audioMeta(assets).toDF()
        val vad = Multimodal.vadSummary(
          Multimodal.audioSampleFrameEnergies(assets).toDF())
        meta.join(vad, "asset_id")
          .select(col("asset_id"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_channels").cast("long").as("n_channels"),
            col("n_samples"), col("n_frames"), col("total_energy"),
            col("n_voiced"), col("longest_voiced"), col("voiced_ratio_e6"))
          .orderBy("asset_id")
      },
      Some(
        """WITH p AS (SELECT doc_id AS asset_id, 50 + doc_id % 200 AS n FROM documents),
          |sm AS (SELECT asset_id, n, unnest(range(n)) AS i FROM p),
          |fr AS (SELECT asset_id, i // 64 AS frame,
          |    CAST(sum(abs((asset_id * 7 + i * 13) % 2001 - 1000)) AS BIGINT) AS energy
          |  FROM sm GROUP BY 1, 2),
          |tot AS (SELECT asset_id, count(*) AS n_frames,
          |        CAST(sum(energy) AS BIGINT) AS total_energy
          |        FROM fr GROUP BY 1),
          |vo AS (SELECT f.asset_id, f.frame FROM fr f JOIN tot t USING (asset_id)
          |       WHERE f.energy * t.n_frames > t.total_energy),
          |rn AS (SELECT asset_id, frame - row_number()
          |         OVER (PARTITION BY asset_id ORDER BY frame) AS isl FROM vo),
          |rl AS (SELECT asset_id, count(*) AS len FROM rn GROUP BY asset_id, isl),
          |lg AS (SELECT asset_id, max(len) AS longest_voiced FROM rl GROUP BY 1),
          |nv AS (SELECT asset_id, count(*) AS n_voiced FROM vo GROUP BY 1)
          |SELECT p.asset_id, CAST(8000 AS BIGINT) AS sample_rate,
          |  CAST(1 AS BIGINT) AS n_channels, CAST(p.n AS BIGINT) AS n_samples,
          |  t.n_frames, t.total_energy,
          |  coalesce(nv.n_voiced, 0) AS n_voiced,
          |  CAST(coalesce(lg.longest_voiced, 0) AS BIGINT) AS longest_voiced,
          |  coalesce(nv.n_voiced, 0) * 1000000 // t.n_frames AS voiced_ratio_e6
          |FROM p JOIN tot t USING (asset_id)
          |LEFT JOIN nv USING (asset_id) LEFT JOIN lg USING (asset_id)
          |ORDER BY p.asset_id""".stripMargin),
      bench = true),

    Q("mm_audio_segments",
      // the VAD pass's actual deliverable: each maximal voiced run as its
      // own row (start/end frame, length, energy) — the segment list a
      // transcription stage consumes, where mm_audio_decode reports only
      // the per-asset summary. Runs on the REAL-decoded WAV frames
      // (WavCodec), same cross-multiplied voiced test, gaps-and-islands
      // per asset; the oracle re-derives every segment from the
      // generative sample formula.
      (s, d) => {
        val assets = Multimodal.synthesizeWavAssets(
          tbl(s, d, "documents"), "doc_id")
        Multimodal.vadSegments(
            Multimodal.audioSampleFrameEnergies(assets).toDF())
          .orderBy("asset_id", "seg_idx")
      },
      Some(
        """WITH p AS (SELECT doc_id AS asset_id, 50 + doc_id % 200 AS n FROM documents),
          |sm AS (SELECT asset_id, n, unnest(range(n)) AS i FROM p),
          |fr AS (SELECT asset_id, i // 64 AS frame,
          |    CAST(sum(abs((asset_id * 7 + i * 13) % 2001 - 1000)) AS BIGINT) AS energy
          |  FROM sm GROUP BY 1, 2),
          |tot AS (SELECT asset_id, count(*) AS nf,
          |        CAST(sum(energy) AS BIGINT) AS total_energy
          |        FROM fr GROUP BY 1),
          |vo AS (SELECT f.asset_id, f.frame, f.energy
          |       FROM fr f JOIN tot t USING (asset_id)
          |       WHERE f.energy * t.nf > t.total_energy),
          |rn AS (SELECT asset_id, frame, energy, frame - row_number()
          |         OVER (PARTITION BY asset_id ORDER BY frame) AS isl FROM vo),
          |sg AS (SELECT asset_id, isl, min(frame) AS start_frame,
          |         max(frame) AS end_frame, count(*) AS n_frames,
          |         CAST(sum(energy) AS BIGINT) AS seg_energy
          |       FROM rn GROUP BY asset_id, isl)
          |SELECT asset_id,
          |  CAST(row_number() OVER (PARTITION BY asset_id ORDER BY start_frame)
          |    AS BIGINT) AS seg_idx,
          |  start_frame, end_frame, n_frames, seg_energy
          |FROM sg ORDER BY asset_id, seg_idx""".stripMargin)),

    Q("mm_audio_resample",
      // REAL resample round-trip — the audio twin of mm_real_resize: the
      // WAV fixtures decode through WavCodec, decimate 2:1, re-encode at
      // half rate, and the OUTPUT payload re-decodes through the same
      // production path (audioMeta header facts + frame energies + the
      // shared vadSummary). The oracle replays the decimated stream in
      // closed form: kept sample j is original sample 2j, so |s| =
      // |(id·7 + j·26) mod 2001 − 1000| over ceil(n/2) samples — any
      // off-by-one in the stride, the re-encoded header, or the
      // round-trip shifts a frame energy and the hash diverges.
      (s, d) => {
        val assets = Multimodal.synthesizeWavAssets(
          tbl(s, d, "documents"), "doc_id")
        val rs = Multimodal.resampleWav(assets, factor = 2)
        val meta = Multimodal.audioMeta(rs).toDF()
        val vad = Multimodal.vadSummary(
          Multimodal.audioSampleFrameEnergies(rs).toDF())
        meta.join(vad, "asset_id")
          .select(col("asset_id"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("n_samples"), col("n_frames"), col("total_energy"),
            col("n_voiced"), col("longest_voiced"), col("voiced_ratio_e6"))
          .orderBy("asset_id")
      },
      Some(
        """WITH p AS (SELECT doc_id AS asset_id,
          |    (50 + doc_id % 200 + 1) // 2 AS m FROM documents),
          |sm AS (SELECT asset_id, m, unnest(range(m)) AS j FROM p),
          |fr AS (SELECT asset_id, j // 64 AS frame,
          |    CAST(sum(abs((asset_id * 7 + j * 26) % 2001 - 1000)) AS BIGINT) AS energy
          |  FROM sm GROUP BY 1, 2),
          |tot AS (SELECT asset_id, count(*) AS n_frames,
          |        CAST(sum(energy) AS BIGINT) AS total_energy
          |        FROM fr GROUP BY 1),
          |vo AS (SELECT f.asset_id, f.frame FROM fr f JOIN tot t USING (asset_id)
          |       WHERE f.energy * t.n_frames > t.total_energy),
          |rn AS (SELECT asset_id, frame - row_number()
          |         OVER (PARTITION BY asset_id ORDER BY frame) AS isl FROM vo),
          |rl AS (SELECT asset_id, count(*) AS len FROM rn GROUP BY asset_id, isl),
          |lg AS (SELECT asset_id, max(len) AS longest_voiced FROM rl GROUP BY 1),
          |nv AS (SELECT asset_id, count(*) AS n_voiced FROM vo GROUP BY 1)
          |SELECT p.asset_id, CAST(4000 AS BIGINT) AS sample_rate,
          |  CAST(p.m AS BIGINT) AS n_samples,
          |  t.n_frames, t.total_energy,
          |  coalesce(nv.n_voiced, 0) AS n_voiced,
          |  CAST(coalesce(lg.longest_voiced, 0) AS BIGINT) AS longest_voiced,
          |  coalesce(nv.n_voiced, 0) * 1000000 // t.n_frames AS voiced_ratio_e6
          |FROM p JOIN tot t USING (asset_id)
          |LEFT JOIN nv USING (asset_id) LEFT JOIN lg USING (asset_id)
          |ORDER BY p.asset_id""".stripMargin)),

    Q("mm_real_decode",
      // REAL codec, REAL oracle: one solid-color PNG per document
      // (dims/color closed-form functions of doc_id), encoded with
      // javax.imageio, decoded back through the production decodeFeatures
      // path — actual PNG parsing, actual pixel loops. The oracle never
      // sees a byte: PNG is lossless and a solid color's channel means
      // ARE the channel values, so DuckDB predicts the decode output
      // from the generative parameters alone. The quadrant slot equaling
      // the global slot is the structural witness that the pixel loop
      // (not a metadata shortcut) produced the features.
      (s, d) => {
        val feats = Multimodal.decodeFeatures(
          Multimodal.synthesizePngAssets(tbl(s, d, "documents"), "doc_id")).toDF()
        feats.select(col("asset_id"), col("width"), col("height"),
            round(element_at(col("features"), 1) * 255.0).cast("long").as("r"),
            round(element_at(col("features"), 2) * 255.0).cast("long").as("g"),
            round(element_at(col("features"), 3) * 255.0).cast("long").as("b"),
            round(element_at(col("features"), 4) * 765.0).cast("long").as("rgb_sum"),
            round(element_at(col("features"), 5) * 255.0).cast("long").as("quad_r"))
          .orderBy("asset_id")
      },
      Some(
        """SELECT doc_id AS asset_id,
          |  CAST(4 + doc_id % 13 AS INT) AS width,
          |  CAST(4 + doc_id % 11 AS INT) AS height,
          |  CAST((doc_id * 37) % 256 AS BIGINT) AS r,
          |  CAST((doc_id * 59) % 256 AS BIGINT) AS g,
          |  CAST((doc_id * 83) % 256 AS BIGINT) AS b,
          |  CAST((doc_id * 37) % 256 + (doc_id * 59) % 256 + (doc_id * 83) % 256
          |    AS BIGINT) AS rgb_sum,
          |  CAST((doc_id * 37) % 256 AS BIGINT) AS quad_r
          |FROM documents ORDER BY asset_id""".stripMargin),
      bench = true),

    Q("mm_real_resize",
      // REAL resample verified end to end: the PNG fixtures resized to
      // fit 8×8 through Graphics2D bilinear + PNG re-encode, then the
      // OUTPUT payload re-decoded through the real codec — dims follow
      // the scale-to-fit formula (replayed in IEEE doubles by the
      // oracle: /, least, trunc are all correctly rounded in both
      // engines), and the solid color survives interpolation exactly
      // (every bilinear sample is the same pixel).
      (s, d) => {
        val resized = Multimodal.resizeAssets(
          Multimodal.synthesizePngAssets(tbl(s, d, "documents"), "doc_id"),
          maxW = 8, maxH = 8).toDF()
        val redecoded = Multimodal.decodeFeatures(
          resized.select(col("asset_id"), col("mime"), col("payload"),
            octet_length(col("payload")).cast("long").as("n_bytes"))).toDF()
        redecoded.select(col("asset_id"), col("width"), col("height"),
            round(element_at(col("features"), 1) * 255.0).cast("long").as("r"),
            round(element_at(col("features"), 2) * 255.0).cast("long").as("g"),
            round(element_at(col("features"), 3) * 255.0).cast("long").as("b"))
          .orderBy("asset_id")
      },
      Some(
        """WITH mp AS (SELECT doc_id, 4 + doc_id % 13 AS w0, 4 + doc_id % 11 AS h0,
          |    (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g,
          |    (doc_id * 83) % 256 AS b
          |  FROM documents),
          |ms AS (SELECT *, least(1.0, least(8.0 / w0, 8.0 / h0)) AS sc FROM mp)
          |SELECT doc_id AS asset_id,
          |  CAST(greatest(1, CAST(trunc(w0 * sc) AS INT)) AS INT) AS width,
          |  CAST(greatest(1, CAST(trunc(h0 * sc) AS INT)) AS INT) AS height,
          |  CAST(r AS BIGINT) AS r, CAST(g AS BIGINT) AS g, CAST(b AS BIGINT) AS b
          |FROM ms ORDER BY asset_id""".stripMargin)),

    Q("sim_matryoshka_recall",
      // Matryoshka/progressive ANN measured: shortlist with the 16-dim
      // PREFIX of the 64-dim embedding (¼ the dot-product cost), exact
      // rerank of the 20 shortlisted, recall@5 vs full brute force — the
      // prefix's ranking fidelity as a number, like the PQ/SQ harnesses.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        val queries = qb(emb)
        Similarity.recallAtK(
            Similarity.prefixTopKReranked(emb, queries, k = 5,
              shortlist = 20, prefixDims = 16),
            Similarity.bruteForceTopK(emb, queries, k = 5))
          .orderBy("query_id")
      },
      Some(
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
          |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
          |pre AS (SELECT query_id, neighbor_id,
          |    CAST(floor(list_inner_product(qv[1:16], cv[1:16]) /
          |      (sqrt(list_inner_product(qv[1:16], qv[1:16])) * sqrt(list_inner_product(cv[1:16], cv[1:16]))) * 1000000) AS BIGINT) AS pre_e6
          |  FROM c, q WHERE neighbor_id <> query_id),
          |short AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY pre_e6 DESC, neighbor_id) AS r
          |    FROM pre) WHERE r <= 20),
          |resc AS (SELECT s.query_id, s.neighbor_id,
          |    CAST(floor(list_inner_product(q.qv, c.cv) /
          |      (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.cv, c.cv))) * 1000000) AS BIGINT) AS sim_e6
          |  FROM short s JOIN q ON q.query_id = s.query_id
          |  JOIN c ON c.neighbor_id = s.neighbor_id),
          |ann AS (SELECT query_id, neighbor_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk
          |    FROM resc) WHERE rnk <= 5),
          |ex AS (SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk
          |    FROM (SELECT query_id, neighbor_id,
          |        CAST(floor(list_inner_product(qv, cv) /
          |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
          |      FROM c, q WHERE neighbor_id <> query_id)) WHERE rnk <= 5)
          |SELECT e.query_id, count(*) AS n_exact, count(a.neighbor_id) AS n_hits,
          |  CAST(count(a.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_e6
          |FROM ex e LEFT JOIN ann a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
          |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin)),

    Q("sim_power_iteration",
      // the corpus's dominant principal direction by 3 fixed-point power
      // iteration rounds — the in-engine spectral primitive behind PCA
      // whitening / anisotropy diagnostics, all-dataflow (explode + join
      // + agg per half-step, 64-row broadcasts), trajectory exactly
      // replayed by the unrolled oracle.
      (s, d) => Similarity.powerIterationE6(tbl(s, d, "embeddings"), rounds = 3),
      Some {
        val rounds = (1 to 3).map { r =>
          s"""u$r AS (SELECT id, CAST(sum(x * v) AS BIGINT) // 100000000 AS u
             |  FROM x JOIN v${r - 1} USING (dim) GROUP BY id),
             |w$r AS (SELECT dim, CAST(sum(x * u) AS BIGINT) AS w
             |  FROM x JOIN u$r USING (id) GROUP BY dim),
             |m$r AS (SELECT max(abs(w)) AS m FROM w$r),
             |v$r AS (SELECT dim, w // greatest(m // 1000000, 1) AS v
             |  FROM w$r CROSS JOIN m$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH x AS (
           |  SELECT vec_id AS id,
           |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x
           |  FROM embeddings),
           |v0 AS (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS v FROM x),
           |$rounds
           |SELECT dim, CAST(v AS BIGINT) AS v_e6 FROM v3 ORDER BY dim""".stripMargin
      },
      bench = true),

    Q("sim_pca2_deflate",
      // top-2 principal directions by power iteration WITH DEFLATION
      // (Hotelling's sequential extraction): v1 as in
      // sim_power_iteration, every vector's v1 component subtracted at
      // fixed truncation points, v2 from the identical loop over the
      // residual triples — the in-engine spectral pair behind PCA
      // whitening / 2-D corpus maps. Spark DIV and DuckDB // both
      // truncate toward zero, so the negative residual components
      // divide identically and the doubly-unrolled oracle replays the
      // whole trajectory digit-for-digit.
      (s, d) => Similarity.pca2E6(tbl(s, d, "embeddings"), rounds = 3),
      Some {
        def unroll(xn: String, pfx: String, prev0: String): String =
          (1 to 3).map { r =>
            val prev = if (r == 1) prev0 else s"$pfx${r - 1}"
            s"""${pfx}u$r AS (SELECT id, CAST(sum(x * v) AS BIGINT) // 100000000 AS u
               |  FROM $xn JOIN $prev USING (dim) GROUP BY id),
               |${pfx}w$r AS (SELECT dim, CAST(sum(x * u) AS BIGINT) AS w
               |  FROM $xn JOIN ${pfx}u$r USING (id) GROUP BY dim),
               |${pfx}m$r AS (SELECT max(abs(w)) AS m FROM ${pfx}w$r),
               |$pfx$r AS (SELECT dim, w // greatest(m // 1000000, 1) AS v
               |  FROM ${pfx}w$r CROSS JOIN ${pfx}m$r)""".stripMargin
          }.mkString(",\n")
        s"""WITH x AS MATERIALIZED (
           |  SELECT vec_id AS id,
           |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x
           |  FROM embeddings),
           |a0 AS (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS v FROM x),
           |${unroll("x", "a", "a0")},
           |n1 AS (SELECT CAST(sum(v * v) AS BIGINT) AS n1 FROM a3),
           |cs AS (SELECT id, CAST(sum(x * v) AS BIGINT) AS s
           |       FROM x JOIN a3 USING (dim) GROUP BY id),
           |cc AS (SELECT id, s // greatest(n1 // 1000000, 1) AS c
           |       FROM cs CROSS JOIN n1),
           |x2 AS MATERIALIZED (SELECT x.id, x.dim, x.x - (cc.c * a3.v) // 1000000 AS x
           |      FROM x JOIN cc USING (id) JOIN a3 USING (dim)),
           |b0 AS (SELECT DISTINCT dim, CAST(1000000 AS BIGINT) AS v FROM x2),
           |${unroll("x2", "b", "b0")}
           |SELECT a3.dim, CAST(a3.v AS BIGINT) AS v1_e6, CAST(b3.v AS BIGINT) AS v2_e6
           |FROM a3 JOIN b3 USING (dim) ORDER BY a3.dim""".stripMargin
      }),

    Q("sim_knn_graph",
      // NN-descent k-NN graph build: LSH-bucket seeding, exact top-5 per
      // node, one neighbor-of-neighbor refinement round over the
      // symmetrized graph — the artifact graph-ANN indexes start from,
      // with the whole trajectory (buckets, both scoring passes, the
      // refinement closure) replayed in the oracle.
      (s, d) => Similarity.knnGraph(tbl(s, d, "embeddings"), k = 5, bits = 8),
      Some(
        s"""WITH $KNN_GRAPH_CTES
           |SELECT query_id, CAST(r AS BIGINT) AS rnk, neighbor_id, sim_e6 FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY sim_e6 DESC, neighbor_id) AS r
           |  FROM sc1) WHERE r <= 5
           |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    Q("sim_knn_graph_recall",
      // the NN-descent graph's fidelity as a number: per-node recall@5
      // of the refined graph against brute-force truth over every node —
      // the same measured-quantity discipline as the PQ/SQ/matryoshka
      // harnesses, closing the loop on the seeding + one-round-refine
      // config (isolated LSH islands show up here as low-recall nodes,
      // not as silent gaps).
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.recallAtK(
            Similarity.knnGraph(emb, k = 5, bits = 8),
            Similarity.bruteForceTopK(emb, emb, k = 5))
          .orderBy("query_id")
      },
      Some(
        s"""WITH $KNN_GRAPH_CTES,
           |ann AS (SELECT query_id, neighbor_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim_e6 DESC, neighbor_id) AS r
           |    FROM sc1) WHERE r <= 5),
           |exact AS (SELECT query_id, neighbor_id FROM (
           |    SELECT a.id AS query_id, b.id AS neighbor_id,
           |      row_number() OVER (PARTITION BY a.id
           |        ORDER BY ${COS_E6("a.e", "b.e")} DESC, b.id) AS r
           |    FROM v a JOIN v b ON a.id <> b.id) WHERE r <= 5)
           |SELECT e.query_id, count(*) AS n_exact, count(a.neighbor_id) AS n_hits,
           |  CAST(count(a.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_e6
           |FROM exact e LEFT JOIN ann a
           |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin)),

    Q("sim_binary_hamming_topk",
      // 1-bit binary quantization: sign bits packed into two 32-bit
      // words, candidates ranked by ascending Hamming distance — 64 bits
      // per vector, the cheapest shortlist stage in the quantization
      // family (vs SQ8's 8 bits/dim and PQ's sub-codes), two popcounts
      // per pair in whole-stage codegen.
      (s, d) => {
        val emb = tbl(s, d, "embeddings")
        Similarity.binarySignTopK(emb,
          qb(emb), k = 5)
      },
      Some(
        """WITH v AS (SELECT vec_id AS id,
          |    list_reduce(list_transform(CAST(embedding AS DOUBLE[])[1:32],
          |      x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
          |      (a, b) -> a * 2 + b) AS w0,
          |    list_reduce(list_transform(CAST(embedding AS DOUBLE[])[33:64],
          |      x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
          |      (a, b) -> a * 2 + b) AS w1
          |  FROM embeddings),
          |q AS (SELECT id AS query_id, w0 AS q0, w1 AS q1 FROM v WHERE id % 50 = 0),
          |c AS (SELECT id AS neighbor_id, w0 AS c0, w1 AS c1 FROM v),
          |s AS (SELECT query_id, neighbor_id,
          |    CAST(bit_count(xor(q0, c0)) + bit_count(xor(q1, c1)) AS BIGINT) AS hamming
          |  FROM c, q WHERE neighbor_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY hamming, neighbor_id) AS rnk FROM s)
          |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, hamming
          |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    Q("sim_ivf_balance",
      // index observability: per-cell population of the trained k-means
      // coarse quantizer plus its load factor (cell size over the
      // balanced share, e6) — the number that says whether nProbe recall
      // will be uniform or hostage to one overfull cell. Reads the same
      // published centroid artifact the IVF family serves from; the
      // oracle replays the full training trajectory.
      (s, d) => {
        val cells = Similarity.kMeansAssign(tbl(s, d, "embeddings"), km8(s, d))
          .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
        cells.crossJoin(broadcast(
            cells.agg(sum(col("n_vectors")).as("tot"), count(lit(1)).as("k"))))
          .selectExpr("cell", "CAST(n_vectors AS BIGINT) AS n_vectors",
            "n_vectors * k * 1000000L DIV tot AS load_e6")
          .orderBy("cell")
      },
      Some(
        s"""WITH ${kmeansCtes(8, 2)},
           |fin AS (SELECT id, cell FROM (
           |    SELECT v.id, c.cell,
           |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
           |    FROM ve v, c2d c) WHERE rn = 1),
           |cc AS (SELECT cell, count(*) AS n_vectors FROM fin GROUP BY 1),
           |tt AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS tot, count(*) AS k FROM cc)
           |SELECT cell, CAST(n_vectors AS BIGINT) AS n_vectors,
           |  CAST(n_vectors * k * 1000000 // tot AS BIGINT) AS load_e6
           |FROM cc CROSS JOIN tt ORDER BY cell""".stripMargin))
  )

  private def MM_MIME_SQL: String =
    "list_extract(['image/png', 'image/jpeg', 'audio/wav', 'video/mp4'], CAST(doc_id % 4 AS INT) + 1)"

  /** Oracle for mm_decode_features: every byte re-derived from hex(payload)
    * (two hex chars → one byte), per-slot integer sums, dims from n.
    */
  /** Oracle for mm_phash_neardup: the decode byte sums (MM_DECODE_SQL's
    * CTEs), the same integer aHash bits, the same (phash, w, h) block and
    * cross-multiplied profile tolerance.
    */
  /** Oracle for text_cluster_keywords: k-means training + assignment
    * (the kmeansCtes twin of the Spark trainer), token explode minus
    * stopwords, (cell, tok) tf, cross-cluster cf, exact c-TF-IDF
    * score_e6 = tf · (nClusters·1e6 DIV cf), top-5 per cell.
    */
  private lazy val CLUSTER_KEYWORDS_SQL: String = {
    val stop = TextStats.enStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH ${kmeansCtes(8, 2)},
       |asg AS (SELECT id, cell FROM (
       |    SELECT v.id, c.cell,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM ve v, c2d c) WHERE rn = 1),
       |tk AS (SELECT doc_id, tok FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |    FROM documents) WHERE tok <> '' AND tok NOT IN ($stop)),
       |tfc AS (SELECT cell, tok, count(*) AS tf
       |        FROM tk JOIN asg ON asg.id = tk.doc_id GROUP BY 1, 2),
       |cfr AS (SELECT tok, count(*) AS cf FROM tfc GROUP BY tok),
       |ncc AS (SELECT count(DISTINCT cell) AS nc FROM asg),
       |sc AS (SELECT cell, tok, tf, cf,
       |        tf * ((nc * 1000000) // cf) AS score_e6
       |      FROM tfc JOIN cfr USING (tok) CROSS JOIN ncc),
       |r AS (SELECT *, row_number() OVER (PARTITION BY cell
       |        ORDER BY score_e6 DESC, tok) AS rnk FROM sc)
       |SELECT cell, tok, CAST(tf AS BIGINT) AS tf, CAST(cf AS BIGINT) AS cf,
       |  CAST(score_e6 AS BIGINT) AS score_e6, CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= 5 ORDER BY cell, rnk""".stripMargin
  }

  /** Oracle for sim_mmr_rerank: exact top-20 cosine pool, then 5
    * unrolled greedy MMR rounds — round r penalizes each remaining
    * candidate by its max cosine to the selected set and picks the
    * (mmr_e7 desc, id) argmax per query. sel CTEs are MATERIALIZED
    * (chained CTEs inline per reference otherwise).
    */
  private lazy val MMR_SQL: String = {
    val rounds = (1 to 5).map { r =>
      val prev = s"sel${r - 1}"
      s"""rem$r AS (SELECT p.* FROM pool p LEFT JOIN $prev l
         |      ON l.query_id = p.query_id AND l.id = p.id WHERE l.id IS NULL),
         |pen$r AS (SELECT c.query_id, c.id, max(${cosE6Sql("c.cv", "s.cv")}) AS mp
         |      FROM rem$r c JOIN $prev l ON l.query_id = c.query_id
         |      JOIN pool s ON s.query_id = l.query_id AND s.id = l.id
         |      GROUP BY c.query_id, c.id),
         |sc$r AS (SELECT c.query_id, c.id, c.rel_e6,
         |        7 * c.rel_e6 - 3 * COALESCE(p.mp, 0) AS mmr_e7
         |      FROM rem$r c LEFT JOIN pen$r p
         |      ON p.query_id = c.query_id AND p.id = c.id),
         |pk$r AS (SELECT query_id, id, rel_e6, mmr_e7 FROM (
         |      SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY mmr_e7 DESC, id) AS rn FROM sc$r) WHERE rn = 1),
         |sel$r AS MATERIALIZED (SELECT * FROM $prev
         |      UNION ALL SELECT query_id, id, CAST($r AS BIGINT) AS rk,
         |        rel_e6, mmr_e7 FROM pk$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       |sd AS (SELECT query_id, neighbor_id, cv,
       |        CAST(floor(list_inner_product(qv, cv) /
       |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
       |      FROM c, q WHERE neighbor_id <> query_id),
       |pool AS MATERIALIZED (SELECT query_id, neighbor_id AS id, sim_e6 AS rel_e6, cv FROM (
       |        SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim_e6 DESC, neighbor_id) AS rn FROM sd) WHERE rn <= 20),
       |sel0 AS (SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS id,
       |         CAST(NULL AS BIGINT) AS rk, CAST(NULL AS BIGINT) AS rel_e6,
       |         CAST(NULL AS BIGINT) AS mmr_e7 WHERE false),
       |$rounds
       |SELECT query_id, rk, id, rel_e6, mmr_e7
       |FROM sel5 ORDER BY query_id, rk""".stripMargin
  }

  /** Oracle for sim_hybrid_rrf: dense cosine top-10, sparse
    * more-like-this BM25 top-10 (bm25's exact long arithmetic with
    * per-query token bags), full-outer RRF fuse at c = 60, re-rank.
    */
  private lazy val HYBRID_RRF_SQL: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
      |sd AS (SELECT query_id, neighbor_id,
      |        CAST(floor(list_inner_product(qv, cv) /
      |          (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) * 1000000) AS BIGINT) AS sim_e6
      |      FROM c, q WHERE neighbor_id <> query_id),
      |dl AS (SELECT query_id, id, rd FROM (
      |        SELECT query_id, neighbor_id AS id,
      |          row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rd
      |        FROM sd) WHERE rd <= 10),
      |tk AS (SELECT doc_id, tok FROM (
      |        SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |        FROM documents) WHERE tok <> ''),
      |-- query docs are the EMBEDDING-derived ids (the Spark side feeds
      |-- qv.vec_id into the sparse leg): at sf0.1 embeddings has 2000 rows
      |-- to documents' 5000, so doc_id % 50 alone would invent 60 queries
      |-- the dense leg can never see
      |qt AS (SELECT DISTINCT doc_id AS query_id, tok FROM tk
      |       WHERE doc_id % 50 = 0 AND doc_id IN (SELECT query_id FROM q)),
      |ln AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
      |       WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok),
      |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |nn AS (SELECT count(*) AS n FROM documents),
      |ll AS (SELECT CAST(sum(len) AS BIGINT) AS l FROM ln),
      |sc AS (SELECT qt.query_id, tf.doc_id,
      |        CAST((((n * 1000000) // df) * 22 * tf * l) //
      |             (10 * tf * l + 3 * l + 9 * len * n) AS BIGINT) AS part_e6
      |      FROM tf JOIN dfq USING (tok) JOIN qt USING (tok)
      |      JOIN ln ON ln.doc_id = tf.doc_id
      |      CROSS JOIN nn CROSS JOIN ll
      |      WHERE tf.doc_id <> qt.query_id),
      |sp AS (SELECT query_id, doc_id AS id, CAST(sum(part_e6) AS BIGINT) AS score_e6
      |       FROM sc GROUP BY 1, 2),
      |sl AS (SELECT query_id, id, rs FROM (
      |        SELECT query_id, id,
      |          row_number() OVER (PARTITION BY query_id ORDER BY score_e6 DESC, id) AS rs
      |        FROM sp) WHERE rs <= 10),
      |f AS (SELECT COALESCE(dl.query_id, sl.query_id) AS query_id,
      |        COALESCE(dl.id, sl.id) AS id,
      |        COALESCE(1000000 // (60 + rd), 0) + COALESCE(1000000 // (60 + rs), 0) AS rrf_e6,
      |        COALESCE(rd, 0) AS rank_a, COALESCE(rs, 0) AS rank_b
      |      FROM dl FULL OUTER JOIN sl
      |        ON dl.query_id = sl.query_id AND dl.id = sl.id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_e6 DESC, id) AS rnk
      |      FROM f)
      |SELECT query_id, id, CAST(rrf_e6 AS BIGINT) AS rrf_e6,
      |  CAST(rank_a AS BIGINT) AS rank_a, CAST(rank_b AS BIGINT) AS rank_b,
      |  CAST(rnk AS BIGINT) AS rnk
      |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  private lazy val MM_PHASH_SQL: String = {
    val dim = Multimodal.ByteProfiler.featureDim
    val sumSelects = (0 until dim).map(j =>
      s"CAST(COALESCE(sum(byte) FILTER (WHERE i % $dim = $j), 0) AS BIGINT) AS f$j").mkString(",\n        ")
    val sumCols = (0 until dim).map(j => s"COALESCE(s.f$j, 0) AS s$j").mkString(", ")
    val total = (0 until dim).map(j => s"s$j").mkString(" + ")
    val bits = (0 until dim).map(j =>
      s"(CASE WHEN s$j * $dim > ($total) THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    val tolCond = (0 until dim).map(j =>
      s"abs(a.s$j * b.n - b.s$j * a.n) * 100 <= 255 * a.n * b.n").mkString("\n  AND ")
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
       |             octet_length(encode(text)) AS n FROM documents),
       |by AS (SELECT doc_id, i,
       |         (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
       |         + strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1 AS byte
       |       FROM (SELECT doc_id, hx, unnest(range(n)) AS i FROM b)),
       |s AS (SELECT doc_id,
       |        $sumSelects
       |      FROM by GROUP BY doc_id),
       |p AS (SELECT b.doc_id AS id, b.n,
       |        16 + b.n % 64 AS w, 16 + (b.n // 64) % 64 AS h,
       |        $sumCols
       |      FROM b LEFT JOIN s USING (doc_id)),
       |q AS (SELECT *, CAST($bits AS BIGINT) AS phash FROM p)
       |SELECT a.id AS id_a, b.id AS id_b, a.phash
       |FROM q a JOIN q b ON a.phash = b.phash AND a.w = b.w AND a.h = b.h
       |  AND a.id < b.id
       |  AND $tolCond
       |ORDER BY id_a, id_b""".stripMargin
  }

  private lazy val MM_DECODE_SQL: String = {
    val sumSelects = (0 until Multimodal.ByteProfiler.featureDim).map(j =>
      s"CAST(COALESCE(sum(byte) FILTER (WHERE i % 8 = $j), 0) AS BIGINT) AS f${j}_sum").mkString(",\n        ")
    val sumCols = (0 until Multimodal.ByteProfiler.featureDim).map(j =>
      s"CAST(COALESCE(s.f${j}_sum, 0) AS BIGINT) AS f${j}_sum").mkString(",\n      ")
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       |by AS (SELECT doc_id, i,
       |         (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
       |         + strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1 AS byte
       |       FROM (SELECT doc_id, hx, unnest(range(n)) AS i FROM b)),
       |s AS (SELECT doc_id,
       |        $sumSelects
       |      FROM by GROUP BY doc_id)
       |SELECT b.doc_id AS asset_id, $MM_MIME_SQL AS mime,
       |      CAST(b.n AS BIGINT) AS n_bytes,
       |      CAST(16 + b.n % 64 AS INT) AS width,
       |      CAST(16 + (b.n // 64) % 64 AS INT) AS height,
       |      CAST(CASE WHEN b.doc_id % 4 = 3 THEN 1 + b.n % 30 ELSE 1 END AS INT) AS n_frames,
       |      $sumCols
       |FROM b LEFT JOIN s USING (doc_id) ORDER BY asset_id""".stripMargin
  }

  /** Oracle for mm_resize: scale/truncate arithmetic mirrored op-for-op
    * (same IEEE double ops, trunc-toward-zero), zero-byte padding as '0'
    * hex chars via rpad.
    */
  private lazy val MM_RESIZE_SQL: String =
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       |g AS (SELECT doc_id, hx, n, 16 + n % 64 AS w0, 16 + (n // 64) % 64 AS h0 FROM b),
       |sc AS (SELECT *, least(CAST(1.0 AS DOUBLE),
       |         least(CAST(32.0 AS DOUBLE) / w0, CAST(32.0 AS DOUBLE) / h0)) AS scale FROM g),
       |r AS (SELECT doc_id, hx, n,
       |        CAST(greatest(1, trunc(w0 * scale)) AS INT) AS width,
       |        CAST(greatest(1, trunc(h0 * scale)) AS INT) AS height,
       |        greatest(1, CAST(trunc((n * scale) * scale) AS BIGINT)) AS out_len
       |      FROM sc)
       |SELECT doc_id AS asset_id, $MM_MIME_SQL AS mime, width, height, out_len,
       |  md5(rpad(substr(hx, 1, CAST(2 * least(out_len, n) AS INT)),
       |           CAST(2 * out_len AS INT), '0')) AS hex_md5
       |FROM r ORDER BY asset_id""".stripMargin

  /** The hyperplane-LSH bucket signature as a DuckDB expression over a
    * DOUBLE[] column `e`: per bit, the ±1 sign matrix is precomputed here
    * with the same murmur3 chain HyperplaneSig uses
    * (hashInt(d, hashInt(b, hashInt(seed, 42)))) and embedded as literals;
    * the projection is the same left-to-right double fold (list_reduce
    * seeds with the first element — IEEE-identical to Spark's 0.0-seeded
    * fold), so every sign bit matches exactly.
    */
  /** Fixed-point cosine in DuckDB — the SQL mirror of both CosineSimE6 and
    * the fold form (sequential double accumulation, one floor).
    */
  private def cosE6Sql(a: String, b: String): String =
    s"""CAST(floor(list_inner_product($a, $b) /
       |  (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))) * 1000000) AS BIGINT)""".stripMargin

  /** k-means CTE chain: seed sample by md5 rank → `iters` unrolled
    * assign/update rounds, every number e6 fixed point — generated next to
    * the Spark form so the two trainings cannot drift. Exposes
    * `c$iters(cell, ce)` (final centroids, e6 longs) and `c${iters}d
    * (cell, cd)` (double form).
    */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val b = new StringBuilder
    b ++= s"""ve AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |         WHERE sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) > 0),
       |kh AS (SELECT id, e, ($hexHead32Sql) AS h
       |       FROM (SELECT id, e, md5(CAST(id AS VARCHAR)) AS mh FROM ve)),
       |seed AS (SELECT id, e, row_number() OVER (ORDER BY h, id) AS rn FROM kh),
       |c0 AS (SELECT rn - 1 AS cell,
       |         list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT)) AS ce
       |       FROM seed WHERE rn <= $k)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |c${i}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$i),
       |a$i AS (SELECT id, e, cell FROM (
       |    SELECT v.id, v.e, c.cell,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM ve v, c${i}d c) WHERE rn = 1),
       |u$i AS (SELECT cell, pos, sum(q) AS s, count(*) AS n FROM (
       |    SELECT cell, unnest(range(1, len(e) + 1)) AS pos,
       |           unnest(list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT))) AS q
       |    FROM a$i) GROUP BY cell, pos),
       |c${i + 1} AS (SELECT cell, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |          FROM u$i GROUP BY cell)""".stripMargin
    }
    b ++= s""",
       |c${iters}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$iters)""".stripMargin
    b.toString
  }

  /** Exact integer dot of two BIGINT lists in DuckDB: the values this
    * oracle handles stay far below 2^53, so routing through DOUBLE
    * list_inner_product is exact — the SQL mirror of graft.expr.LongDot.
    */
  private def intDotSql(a: String, b: String): String =
    s"""CAST(list_inner_product(list_transform($a, x -> CAST(x AS DOUBLE)),
       |      list_transform($b, x -> CAST(x AS DOUBLE))) AS BIGINT)""".stripMargin

  private def l2DistSql(a: String, b: String): String =
    s"(${intDotSql(a, a)} + ${intDotSql(b, b)} - 2 * ${intDotSql(a, b)})"

  /** PQ CTE chain — the SQL twin of Similarity.pqCodebooksE6/pqEncode:
    * e6 subvector split, md5-bottom-k seeding, `iters` unrolled integer-L2
    * Lloyd rounds, final encode. Exposes `subs(id, sub, sv)`,
    * `cb$iters(sub, code, ce)`, `enc(id, sub, code)`.
    */
  private def pqCtes(numSub: Int, kSub: Int, iters: Int): String = {
    val b = new StringBuilder
    // normalized-then-quantized vectors: x / sqrt(Σx²) is IEEE-identical
    // to Spark's fold-norm division, so the e6 floor matches exactly
    b ++= s"""vq AS (SELECT id,
       |         list_transform(e,
       |           x -> CAST(floor(x / sqrt(list_inner_product(e, e)) * 1000000) AS BIGINT)) AS q
       |       FROM (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |       WHERE list_inner_product(e, e) > 0),
       |subs AS (SELECT id, CAST(m.sub AS BIGINT) AS sub,
       |           list_slice(q, CAST(m.sub * (len(q) // $numSub) + 1 AS INT),
       |             CAST((m.sub + 1) * (len(q) // $numSub) AS INT)) AS sv
       |         FROM vq, (SELECT unnest(range(0, $numSub)) AS sub) m),
       |kh AS (SELECT id, ($hexHead32Sql) AS h
       |       FROM (SELECT id, md5(CAST(id AS VARCHAR)) AS mh FROM vq)),
       |sd AS (SELECT id, rn - 1 AS code FROM
       |        (SELECT id, row_number() OVER (ORDER BY h, id) AS rn FROM kh)
       |       WHERE rn <= $kSub),
       |cb0 AS (SELECT s.sub, sd.code, s.sv AS ce FROM subs s JOIN sd ON s.id = sd.id)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |a$i AS (SELECT sub, sv, code FROM (
       |    SELECT s.sub, s.id, s.sv, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM subs s JOIN cb$i c ON s.sub = c.sub) WHERE rn = 1),
       |u$i AS (SELECT sub, code, pos, sum(x) AS sx, count(*) AS n FROM (
       |    SELECT sub, code, unnest(range(1, len(sv) + 1)) AS pos, unnest(sv) AS x
       |    FROM a$i) GROUP BY sub, code, pos),
       |cb${i + 1} AS (SELECT sub, code,
       |    list(CAST(floor(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |  FROM u$i GROUP BY sub, code)""".stripMargin
    }
    b ++= s""",
       |enc AS (SELECT id, sub, code FROM (
       |    SELECT s.id, s.sub, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM subs s JOIN cb$iters c ON s.sub = c.sub) WHERE rn = 1)""".stripMargin
    b.toString
  }

  /** pqCtes + the query LUT and summed ADC scores — ends in
    * `sc(query_id, neighbor_id, adc_e12)`, shared by all three PQ oracles.
    */
  private def pqScoreCtes(numSub: Int, kSub: Int, iters: Int): String =
    s"""${pqCtes(numSub, kSub, iters)},
       |lut AS (SELECT s.id AS query_id, s.sub, c.code,
       |          ${intDotSql("s.sv", "c.ce")} AS pdot
       |        FROM subs s JOIN cb$iters c ON s.sub = c.sub WHERE s.id % 50 = 0),
       |sc AS (SELECT l.query_id, e.id AS neighbor_id,
       |         CAST(sum(l.pdot) AS BIGINT) AS adc_e12
       |       FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
       |       WHERE e.id <> l.query_id GROUP BY 1, 2)""".stripMargin

  /** Sampled-training IVF-PQ CTE chain — the SQL twin of
    * Similarity.ivfPqTopK with trainSample=sampleN: one md5-bottom-k
    * sample feeds BOTH trainers (coarse k-means over `ve`, PQ Lloyd over
    * `subsT`), while assignment (`asg`), encode (`enc`) and the query LUT
    * run over the FULL corpus — exactly the Spark split between bounded
    * training and one-pass build stages. Ends in
    * `sc(query_id, neighbor_id, adc_e12)` with scoring restricted to the
    * nProbe probed cells. Queries are `id % 50 = 0`.
    */
  private def ivfPqScoreCtes(numCells: Int, nProbe: Int, numSub: Int,
      kSub: Int, iters: Int, sampleN: Int): String = {
    val b = new StringBuilder
    // the sample ranks ALL ids (zero-norm included) by md5 head-32, the
    // mirror of hashSample running before the trainers' norm filters
    b ++= s"""allv AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |sh AS (SELECT id, ($hexHead32Sql) AS h
       |       FROM (SELECT id, md5(CAST(id AS VARCHAR)) AS mh FROM allv)),
       |smp AS (SELECT id FROM (SELECT id, row_number() OVER (ORDER BY h, id) AS rn FROM sh)
       |        WHERE rn <= $sampleN),
       |ve AS (SELECT a.id, a.e FROM allv a JOIN smp USING (id)
       |       WHERE sqrt(list_inner_product(a.e, a.e)) > 0),
       |kh AS (SELECT id, e, ($hexHead32Sql) AS h
       |       FROM (SELECT id, e, md5(CAST(id AS VARCHAR)) AS mh FROM ve)),
       |seed AS (SELECT id, e, row_number() OVER (ORDER BY h, id) AS rn FROM kh),
       |c0 AS (SELECT rn - 1 AS cell,
       |         list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT)) AS ce
       |       FROM seed WHERE rn <= $numCells)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |c${i}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$i),
       |a$i AS (SELECT id, e, cell FROM (
       |    SELECT v.id, v.e, c.cell,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM ve v, c${i}d c) WHERE rn = 1),
       |u$i AS (SELECT cell, pos, sum(q) AS s, count(*) AS n FROM (
       |    SELECT cell, unnest(range(1, len(e) + 1)) AS pos,
       |           unnest(list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT))) AS q
       |    FROM a$i) GROUP BY cell, pos),
       |c${i + 1} AS (SELECT cell, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |          FROM u$i GROUP BY cell)""".stripMargin
    }
    b ++= s""",
       |c${iters}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$iters),
       |vqA AS (SELECT id,
       |          list_transform(e,
       |            x -> CAST(floor(x / sqrt(list_inner_product(e, e)) * 1000000) AS BIGINT)) AS q
       |        FROM allv WHERE list_inner_product(e, e) > 0),
       |subsA AS (SELECT id, CAST(m.sub AS BIGINT) AS sub,
       |            list_slice(q, CAST(m.sub * (len(q) // $numSub) + 1 AS INT),
       |              CAST((m.sub + 1) * (len(q) // $numSub) AS INT)) AS sv
       |          FROM vqA, (SELECT unnest(range(0, $numSub)) AS sub) m),
       |subsT AS (SELECT s.id, s.sub, s.sv FROM subsA s JOIN smp USING (id)),
       |pkh AS (SELECT v.id, ($hexHead32Sql) AS h
       |        FROM (SELECT vq.id, md5(CAST(vq.id AS VARCHAR)) AS mh
       |              FROM vqA vq JOIN smp USING (id)) v),
       |sd AS (SELECT id, rn - 1 AS code FROM
       |        (SELECT id, row_number() OVER (ORDER BY h, id) AS rn FROM pkh)
       |       WHERE rn <= $kSub),
       |cb0 AS (SELECT s.sub, sd.code, s.sv AS ce FROM subsT s JOIN sd ON s.id = sd.id)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |pa$i AS (SELECT sub, sv, code FROM (
       |    SELECT s.sub, s.id, s.sv, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM subsT s JOIN cb$i c ON s.sub = c.sub) WHERE rn = 1),
       |pu$i AS (SELECT sub, code, pos, sum(x) AS sx, count(*) AS n FROM (
       |    SELECT sub, code, unnest(range(1, len(sv) + 1)) AS pos, unnest(sv) AS x
       |    FROM pa$i) GROUP BY sub, code, pos),
       |cb${i + 1} AS (SELECT sub, code,
       |    list(CAST(floor(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |  FROM pu$i GROUP BY sub, code)""".stripMargin
    }
    b ++= s""",
       |enc AS (SELECT id, sub, code FROM (
       |    SELECT s.id, s.sub, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM subsA s JOIN cb$iters c ON s.sub = c.sub) WHERE rn = 1),
       |lut AS (SELECT s.id AS query_id, s.sub, c.code,
       |          ${intDotSql("s.sv", "c.ce")} AS pdot
       |        FROM subsA s JOIN cb$iters c ON s.sub = c.sub WHERE s.id % 50 = 0),
       |asg AS (SELECT id, cell, rn FROM (
       |    SELECT v.id, c.cell,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM (SELECT id, e FROM allv WHERE sqrt(list_inner_product(e, e)) > 0) v,
       |         c${iters}d c)),
       |cells AS (SELECT id AS neighbor_id, cell FROM asg WHERE rn = 1),
       |probes AS (SELECT id AS query_id, cell FROM asg WHERE rn <= $nProbe AND id % 50 = 0),
       |sc AS (SELECT l.query_id, e.id AS neighbor_id,
       |         CAST(sum(l.pdot) AS BIGINT) AS adc_e12
       |       FROM enc e
       |       JOIN cells cl ON cl.neighbor_id = e.id
       |       JOIN probes p ON p.cell = cl.cell
       |       JOIN lut l ON l.query_id = p.query_id AND l.sub = e.sub AND l.code = e.code
       |       WHERE e.id <> l.query_id GROUP BY 1, 2)""".stripMargin
    b.toString
  }

  /** Residual IVF-PQ CTE chain — the SQL twin of
    * Similarity.ivfPqResidualTopK: everything lives in the NORMALIZED
    * space (`nv`), the sample ranks the nonzero-norm ids (hashSample runs
    * on the normalized view), coarse k-means trains on sampled normalized
    * vectors, residuals are exact long subtractions of the assigned
    * centroid, PQ Lloyd runs over sampled residual slices, and the ADC
    * score is qcdot(query, cell) + Σ pdot(sub, code). Ends in
    * `sc(query_id, neighbor_id, adc_e12)`.
    */
  private def ivfPqResidualScoreCtes(numCells: Int, nProbe: Int, numSub: Int,
      kSub: Int, iters: Int, sampleN: Int): String = {
    val b = new StringBuilder
    b ++= s"""allv AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |nv AS (SELECT id, list_transform(e, x -> x / sqrt(list_inner_product(e, e))) AS ne
       |       FROM allv WHERE list_inner_product(e, e) > 0),
       |sh AS (SELECT id, ($hexHead32Sql) AS h
       |       FROM (SELECT id, md5(CAST(id AS VARCHAR)) AS mh FROM nv)),
       |smp AS (SELECT id FROM (SELECT id, row_number() OVER (ORDER BY h, id) AS rn FROM sh)
       |        WHERE rn <= $sampleN),
       |ve AS (SELECT n.id, n.ne AS e FROM nv n JOIN smp USING (id)),
       |kh AS (SELECT id, e, ($hexHead32Sql) AS h
       |       FROM (SELECT id, e, md5(CAST(id AS VARCHAR)) AS mh FROM ve)),
       |seed AS (SELECT id, e, row_number() OVER (ORDER BY h, id) AS rn FROM kh),
       |c0 AS (SELECT rn - 1 AS cell,
       |         list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT)) AS ce
       |       FROM seed WHERE rn <= $numCells)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |c${i}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$i),
       |a$i AS (SELECT id, e, cell FROM (
       |    SELECT v.id, v.e, c.cell,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM ve v, c${i}d c) WHERE rn = 1),
       |u$i AS (SELECT cell, pos, sum(q) AS s, count(*) AS n FROM (
       |    SELECT cell, unnest(range(1, len(e) + 1)) AS pos,
       |           unnest(list_transform(e, x -> CAST(floor(x * 1000000) AS BIGINT))) AS q
       |    FROM a$i) GROUP BY cell, pos),
       |c${i + 1} AS (SELECT cell, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |          FROM u$i GROUP BY cell)""".stripMargin
    }
    b ++= s""",
       |c${iters}d AS (SELECT cell, list_transform(ce, x -> CAST(x AS DOUBLE) / 1000000) AS cd FROM c$iters),
       |vq AS (SELECT id, list_transform(ne, x -> CAST(floor(x * 1000000) AS BIGINT)) AS q FROM nv),
       |asg AS (SELECT id, cell, rn FROM (
       |    SELECT n.id, c.cell,
       |      row_number() OVER (PARTITION BY n.id ORDER BY ${cosE6Sql("n.ne", "c.cd")} DESC, c.cell) AS rn
       |    FROM nv n, c${iters}d c)),
       |cells AS (SELECT id, cell FROM asg WHERE rn = 1),
       |resid AS (SELECT v.id, cl.cell,
       |    list_transform(range(1, len(v.q) + 1), i -> v.q[i] - ct.ce[i]) AS rq
       |  FROM vq v JOIN cells cl ON cl.id = v.id JOIN c$iters ct ON ct.cell = cl.cell),
       |rsubs AS (SELECT id, CAST(m.sub AS BIGINT) AS sub,
       |    list_slice(rq, CAST(m.sub * (len(rq) // $numSub) + 1 AS INT),
       |      CAST((m.sub + 1) * (len(rq) // $numSub) AS INT)) AS sv
       |  FROM resid, (SELECT unnest(range(0, $numSub)) AS sub) m),
       |rsubsT AS (SELECT s.id, s.sub, s.sv FROM rsubs s JOIN smp USING (id)),
       |pkh AS (SELECT r.id, ($hexHead32Sql) AS h
       |        FROM (SELECT rr.id, md5(CAST(rr.id AS VARCHAR)) AS mh
       |              FROM resid rr JOIN smp USING (id)) r),
       |sd AS (SELECT id, rn - 1 AS code FROM
       |        (SELECT id, row_number() OVER (ORDER BY h, id) AS rn FROM pkh)
       |       WHERE rn <= $kSub),
       |rcb0 AS (SELECT s.sub, sd.code, s.sv AS ce FROM rsubsT s JOIN sd ON s.id = sd.id)""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
       |pa$i AS (SELECT sub, sv, code FROM (
       |    SELECT s.sub, s.id, s.sv, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM rsubsT s JOIN rcb$i c ON s.sub = c.sub) WHERE rn = 1),
       |pu$i AS (SELECT sub, code, pos, sum(x) AS sx, count(*) AS n FROM (
       |    SELECT sub, code, unnest(range(1, len(sv) + 1)) AS pos, unnest(sv) AS x
       |    FROM pa$i) GROUP BY sub, code, pos),
       |rcb${i + 1} AS (SELECT sub, code,
       |    list(CAST(floor(CAST(sx AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS ce
       |  FROM pu$i GROUP BY sub, code)""".stripMargin
    }
    b ++= s""",
       |renc AS (SELECT id, sub, code FROM (
       |    SELECT s.id, s.sub, c.code,
       |      row_number() OVER (PARTITION BY s.id, s.sub
       |        ORDER BY ${l2DistSql("s.sv", "c.ce")}, c.code) AS rn
       |    FROM rsubs s JOIN rcb$iters c ON s.sub = c.sub) WHERE rn = 1),
       |qsub AS (SELECT id, CAST(m.sub AS BIGINT) AS sub,
       |    list_slice(q, CAST(m.sub * (len(q) // $numSub) + 1 AS INT),
       |      CAST((m.sub + 1) * (len(q) // $numSub) AS INT)) AS sv
       |  FROM vq, (SELECT unnest(range(0, $numSub)) AS sub) m WHERE id % 50 = 0),
       |rlut AS (SELECT s.id AS query_id, s.sub, c.code,
       |          ${intDotSql("s.sv", "c.ce")} AS pdot
       |        FROM qsub s JOIN rcb$iters c ON s.sub = c.sub),
       |qc AS (SELECT v.id AS query_id, ct.cell, ${intDotSql("v.q", "ct.ce")} AS qcdot
       |       FROM vq v, c$iters ct WHERE v.id % 50 = 0),
       |probes AS (SELECT id AS query_id, cell FROM asg WHERE rn <= $nProbe AND id % 50 = 0),
       |sc AS (SELECT l.query_id, e.id AS neighbor_id,
       |         CAST(min(qc.qcdot) + sum(l.pdot) AS BIGINT) AS adc_e12
       |       FROM renc e
       |       JOIN cells cl ON cl.id = e.id
       |       JOIN probes p ON p.cell = cl.cell
       |       JOIN rlut l ON l.query_id = p.query_id AND l.sub = e.sub AND l.code = e.code
       |       JOIN qc ON qc.query_id = p.query_id AND qc.cell = cl.cell
       |       WHERE e.id <> p.query_id
       |       GROUP BY 1, 2)""".stripMargin
    b.toString
  }

  /** Oracle for sim_ivfpq_residual_topk. */
  private lazy val IVFPQ_RES_TOPK_SQL: String =
    s"""WITH ${ivfPqResidualScoreCtes(8, 2, 8, 32, 2, 100)},
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, adc_e12 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** Oracle for sim_ivfpq_residual_recall. */
  private lazy val IVFPQ_RES_RECALL_SQL: String =
    s"""WITH ${ivfPqResidualScoreCtes(8, 2, 8, 32, 2, 100)},
       |ann AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc) WHERE rnk <= 5),
       |$EXACT_TOP5_CTES
       |$RECALL_SELECT""".stripMargin

  /** Oracle for sim_ivfpq_topk: sampled training, cell routing, ADC. */
  private lazy val IVFPQ_TOPK_SQL: String =
    s"""WITH ${ivfPqScoreCtes(8, 2, 8, 32, 2, 100)},
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, adc_e12 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** Oracle for sim_ivfpq_recall: routed IVF-PQ top-5 vs the exact
    * cosine top-5.
    */
  /** CTE chain ending in `cemb(vec_id, embedding DOUBLE[])` — the SQL
    * mirror of [[graft.llm.Similarity.clusteredEmbeddings]]: 50 md5-seeded
    * integer-grid centers + bounded integer noise, every component a small
    * integer so float/double representations agree bit-for-bit.
    */
  private lazy val CLUSTERED_CTES: String =
    s"""ccl AS (SELECT vec_id,
       |    (${hx("md5(CAST(vec_id AS VARCHAR) || '#cl')")}) % 50 AS cluster
       |  FROM embeddings),
       |cdim AS (SELECT vec_id, i,
       |    md5('c' || CAST(cluster AS VARCHAR) || '#d' || CAST(i AS VARCHAR)) AS mhc,
       |    md5('v' || CAST(vec_id AS VARCHAR) || '#d' || CAST(i AS VARCHAR)) AS mhv
       |  FROM ccl, range(0, 64) t(i)),
       |cval AS (SELECT vec_id, i,
       |    CAST(((${hx("mhc")}) % 2001 - 1000) * 4 + ((${hx("mhv")}) % 201 - 100) AS DOUBLE) AS x
       |  FROM cdim),
       |cemb AS (SELECT vec_id, list(x ORDER BY i) AS embedding FROM cval GROUP BY vec_id)""".stripMargin

  /** Retarget a WITH-prefixed oracle from the `embeddings` table to the
    * clustered twin: prepend the cemb CTEs and redirect every table scan.
    * The whole downstream pipeline (training included) replays unchanged
    * on the substituted corpus.
    */
  private def onClustered(sql: String): String = {
    require(sql.startsWith("WITH "), "clustered wrapper expects a WITH oracle")
    "WITH " + CLUSTERED_CTES + ",\n" +
      sql.drop(5).replace("FROM embeddings", "FROM cemb")
  }

  private lazy val IVFPQ_RECALL_SQL: String =
    s"""WITH ${ivfPqScoreCtes(8, 2, 8, 32, 2, 100)},
       |ann AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc) WHERE rnk <= 5),
       |$EXACT_TOP5_CTES
       |$RECALL_SELECT""".stripMargin

  /** Brute-force cosine top-5 CTEs, ending in `ex(query_id, neighbor_id)`
    * — the ground truth both recall oracles compare against.
    */
  private lazy val EXACT_TOP5_CTES: String =
    s"""qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |       FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
       |cv AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |bs AS (SELECT query_id, neighbor_id,
       |        CAST(floor(list_inner_product(qe, ce) /
       |          (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(ce, ce))) * 1000000) AS BIGINT) AS sim_e6
       |      FROM cv, qv WHERE neighbor_id <> query_id),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM bs) WHERE rnk <= 5)""".stripMargin

  private lazy val RECALL_SELECT: String =
    s"""SELECT e.query_id, count(*) AS n_exact, count(a.neighbor_id) AS n_hits,
       |  count(a.neighbor_id) * 1000000 // count(*) AS recall_e6
       |FROM ex e LEFT JOIN ann a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  /** Oracle for sim_pq_topk: codebooks + encode + broadcast-LUT ADC. */
  private lazy val PQ_TOPK_SQL: String =
    s"""WITH ${pqScoreCtes(8, 32, 2)},
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, adc_e12 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** Oracle for sim_pq_rerank_recall: ADC shortlist-25 → exact cosine
    * rerank top-5 → recall against the brute-force truth.
    */
  private lazy val PQ_RERANK_RECALL_SQL: String =
    s"""WITH ${pqScoreCtes(8, 32, 2)},
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc) WHERE rnk <= 25),
       |$EXACT_TOP5_CTES,
       |rs AS (SELECT s.query_id, s.neighbor_id,
       |         CAST(floor(list_inner_product(q.qe, c.ce) /
       |           (sqrt(list_inner_product(q.qe, q.qe)) * sqrt(list_inner_product(c.ce, c.ce))) * 1000000) AS BIGINT) AS sim_e6
       |       FROM short s JOIN qv q ON s.query_id = q.query_id
       |       JOIN cv c ON s.neighbor_id = c.neighbor_id),
       |ann AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM rs) WHERE rnk <= 5)
       |$RECALL_SELECT""".stripMargin

  /** Oracle for sim_pq_recall: the full PQ ranking, the exact cosine
    * ranking, and the recall join — all in one statement.
    */
  /** Shared SQ8 CTE prefix: normalized e0 codes per vector (floor(127·x
    * + 0.5) on the L2-normalized components), corpus + query views, and
    * the integer-dot scores — the exact mirror of Similarity.sq8Encode /
    * sq8TopK (sums of small integers are exact in doubles, so
    * list_inner_product over the cast code lists replays LongDot).
    */
  private lazy val SQ8_CORE_SQL: String =
    """WITH nv AS (SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(floor(x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
      |                                                  CAST(embedding AS DOUBLE[]))) * 127.0 + 0.5) AS BIGINT)) AS codes
      |  FROM embeddings
      |  WHERE list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
      |c AS (SELECT vec_id AS neighbor_id, codes AS cc FROM nv),
      |qsel AS (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0
      |         ORDER BY vec_id LIMIT 64),
      |q AS (SELECT vec_id AS query_id, codes AS qc FROM nv JOIN qsel USING (vec_id)),
      |s AS (SELECT query_id, neighbor_id,
      |        CAST(list_inner_product(CAST(qc AS DOUBLE[]), CAST(cc AS DOUBLE[])) AS BIGINT) AS score_i8
      |      FROM c, q WHERE neighbor_id <> query_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY score_i8 DESC, neighbor_id) AS rnk FROM s)""".stripMargin

  private lazy val SQ8_TOPK_SQL: String =
    SQ8_CORE_SQL +
      """
        |SELECT query_id, rnk, neighbor_id, score_i8 FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin

  private lazy val SQ8_RECALL_SQL: String =
    SQ8_CORE_SQL +
      """,
        |sq AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= 5),
        |dv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |es AS (SELECT q2.vec_id AS query_id, c2.vec_id AS neighbor_id,
        |         CAST(floor(list_inner_product(q2.v, c2.v) /
        |           (sqrt(list_inner_product(q2.v, q2.v)) * sqrt(list_inner_product(c2.v, c2.v))) * 1000000) AS BIGINT) AS sim_e6
        |       FROM dv c2, (SELECT d2.vec_id, d2.v FROM dv d2
        |                    JOIN qsel USING (vec_id)) q2
        |       WHERE c2.vec_id <> q2.vec_id),
        |er AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |         ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM es),
        |ex AS (SELECT query_id, neighbor_id FROM er WHERE rnk <= 5),
        |g AS (SELECT e.query_id, COUNT(*) AS n_exact, COUNT(s2.neighbor_id) AS n_hits
        |      FROM ex e LEFT JOIN sq s2
        |        ON e.query_id = s2.query_id AND e.neighbor_id = s2.neighbor_id
        |      GROUP BY e.query_id)
        |SELECT query_id, n_exact, n_hits,
        |  (n_hits * 1000000) // n_exact AS recall_e6
        |FROM g ORDER BY query_id""".stripMargin

  /** Oracle for sim_ivfsq8_topk: the trained-centroid CTE chain (same
    * replayed fixed-point k-means as IVF_TRAINED_SQL), the same rn-ranked
    * cell assignment, but scoring via the SQ8 integer dot over the code
    * lists instead of the float cosine.
    */
  private lazy val IVF_SQ8_SQL: String =
    s"""WITH ${kmeansCtes(8, 2)},
       |av AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cod AS (SELECT vec_id AS id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(floor(x / sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                                                  CAST(embedding AS DOUBLE[]))) * 127.0 + 0.5) AS BIGINT)) AS codes
       |  FROM embeddings
       |  WHERE list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
       |asg AS (SELECT id, e, cell, row_number() OVER (PARTITION BY id ORDER BY ${cosE6Sql("av.e", "c.cd")} DESC, c.cell) AS rn
       |        FROM av, c2d c),
       |cells AS (SELECT a.id AS neighbor_id, a.cell, cd.codes AS cc
       |          FROM asg a JOIN cod cd ON a.id = cd.id WHERE a.rn = 1),
       |probes AS (SELECT a.id AS query_id, a.cell, cd.codes AS qc
       |           FROM asg a JOIN cod cd ON a.id = cd.id
       |           WHERE a.rn <= 2 AND a.id % 50 = 0),
       |s AS (SELECT query_id, neighbor_id,
       |        CAST(list_inner_product(CAST(qc AS DOUBLE[]), CAST(cc AS DOUBLE[])) AS BIGINT) AS score_i8
       |      FROM cells JOIN probes USING (cell) WHERE neighbor_id <> query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_i8 DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, rnk, neighbor_id, score_i8 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  private lazy val PQ_RECALL_SQL: String =
    s"""WITH ${pqScoreCtes(8, 32, 2)},
       |ann AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_e12 DESC, neighbor_id) AS rnk FROM sc) WHERE rnk <= 5),
       |$EXACT_TOP5_CTES
       |$RECALL_SELECT""".stripMargin

  /** Oracle for dedup_semantic: k-means training + assignment, within-cell
    * cosine pairs, recursive-CTE transitive closure, min-label component,
    * keep = id-is-its-own-component. Isolated vectors (no qualifying pair,
    * or no cell for a zero-norm vector) self-label and survive.
    */
  /** Semantic-dedup CTE chain ending in `lbl(id, component)` — k-means
    * training + assignment, within-cell pairs, recursive closure. Shared
    * by the dedup_semantic oracle and the curation-chain composition.
    */
  private lazy val SEM_CC_CTES: String =
    s"""${kmeansCtes(8, 2)},
       |av AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |asg AS (SELECT id, e, cell FROM (
       |    SELECT v.id, v.e, c.cell,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM (SELECT id, e FROM av WHERE sqrt(list_inner_product(e, e)) > 0) v,
       |         c2d c) WHERE rn = 1),
       |prs AS (SELECT a.id AS id_a, b.id AS id_b
       |        FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
       |        WHERE ${cosE6Sql("a.e", "b.e")} >= 300000),
       |edges AS (SELECT id_a AS a, id_b AS b FROM prs
       |          UNION SELECT id_b, id_a FROM prs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)""".stripMargin

  private lazy val SEMANTIC_DEDUP_SQL: String =
    s"""WITH RECURSIVE $SEM_CC_CTES
       |SELECT v.vec_id, COALESCE(l.component, v.vec_id) AS component,
       |  COALESCE(l.component, v.vec_id) = v.vec_id AS keep
       |FROM embeddings v LEFT JOIN lbl l ON l.id = v.vec_id
       |ORDER BY vec_id""".stripMargin

  /** Oracle for text_curation_chain_v2: span scrub → md5 exact dedup →
    * semantic min-id keep, every stage the proven CTE chain of its own
    * oracle.
    */
  private lazy val CURATION_V2_SQL: String =
    s"""WITH RECURSIVE ${DedupQueries.CLEAN_TEXT_CTES},
       |$SEM_CC_CTES,
       |ex AS (SELECT min(id) AS doc_id, count(*) AS n_copies,
       |         CAST(min(n_tokens - n_removed_tokens) AS BIGINT) AS n_clean_tokens
       |       FROM cleaned WHERE length(clean_text) > 0
       |       GROUP BY md5(clean_text)),
       |semkeep AS (SELECT v.vec_id AS id FROM embeddings v
       |            LEFT JOIN lbl l ON l.id = v.vec_id
       |            WHERE COALESCE(l.component, v.vec_id) = v.vec_id)
       |SELECT e.doc_id, e.n_clean_tokens, e.n_copies
       |FROM ex e JOIN semkeep s ON s.id = e.doc_id
       |ORDER BY e.doc_id""".stripMargin

  /** Oracle for sim_kmeans_cells: the training chain + final argmax
    * assignment (cs DESC, cell — the max-struct tie-break's mirror).
    */
  private lazy val KMEANS_CELLS_SQL: String =
    s"""WITH ${kmeansCtes(8, 2)},
       |fin AS (SELECT id, cell, cs AS sim_e6 FROM (
       |    SELECT v.id, c.cell, ${cosE6Sql("v.e", "c.cd")} AS cs,
       |      row_number() OVER (PARTITION BY v.id ORDER BY ${cosE6Sql("v.e", "c.cd")} DESC, c.cell) AS rn
       |    FROM ve v, c2d c) WHERE rn = 1)
       |SELECT id AS vec_id, cell, sim_e6 FROM fin ORDER BY vec_id""".stripMargin

  /** Oracle for sim_cluster_margin: the training chain, the full k·n
    * score table, argmax with the max-struct tie-break's mirror, and the
    * best-other max — all integer e6 cosines, so the per-cell margin
    * aggregates hash-match.
    */
  private lazy val CLUSTER_MARGIN_SQL: String =
    s"""WITH ${kmeansCtes(8, 2)},
       |sims AS (SELECT v.id, c.cell, ${cosE6Sql("v.e", "c.cd")} AS cs
       |  FROM ve v, c2d c),
       |sbest AS (SELECT id, cell AS bcell, cs AS bs FROM (
       |    SELECT id, cell, cs,
       |      row_number() OVER (PARTITION BY id ORDER BY cs DESC, cell) AS rn
       |    FROM sims WHERE cs IS NOT NULL) WHERE rn = 1),
       |marg AS (SELECT b.id, b.bcell AS cell, b.bs - max(s.cs) AS margin
       |  FROM sbest b JOIN sims s ON s.id = b.id AND s.cell <> b.bcell
       |  WHERE s.cs IS NOT NULL
       |  GROUP BY b.id, b.bcell, b.bs)
       |SELECT cell, count(*) AS n,
       |  CAST(sum(margin) // count(*) AS BIGINT) AS mean_margin_e6,
       |  CAST(min(margin) AS BIGINT) AS min_margin_e6,
       |  CAST(sum(CASE WHEN margin < 10000 THEN 1 ELSE 0 END) * 1000000
       |       // count(*) AS BIGINT) AS amb_share_e6
       |FROM marg GROUP BY cell ORDER BY cell""".stripMargin

  /** Oracle for sim_ivf_trained_topk: k-means cells + the IVF probe/rerank
    * shape of the sampled-centroid oracle.
    */
  /** Shared routed-candidate CTE tail for the IVF radius pair: identical
    * cell assignment/probing to IVF_TRAINED_SQL, ending in
    * `s(query_id, neighbor_id, sim_e6)` over probed candidates only.
    */
  private lazy val IVF_ROUTED_CTES: String =
    s"""${kmeansCtes(8, 2)},
       |av AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |asg AS (SELECT id, e, cell, row_number() OVER (PARTITION BY id ORDER BY ${cosE6Sql("av.e", "c.cd")} DESC, c.cell) AS rn
       |        FROM av, c2d c),
       |cells AS (SELECT id AS neighbor_id, e AS cv, cell FROM asg WHERE rn = 1),
       |probes AS (SELECT id AS query_id, e AS qv, cell FROM asg WHERE rn <= 2 AND id % 50 = 0),
       |s AS (SELECT query_id, neighbor_id, ${cosE6Sql("qv", "cv")} AS sim_e6
       |      FROM cells JOIN probes USING (cell) WHERE neighbor_id <> query_id)""".stripMargin

  private lazy val RADIUS_IVF_SQL: String =
    s"""WITH $IVF_ROUTED_CTES
       |SELECT query_id, neighbor_id, sim_e6 FROM s WHERE sim_e6 >= 200000
       |ORDER BY query_id, neighbor_id""".stripMargin

  private lazy val RADIUS_RECALL_SQL: String =
    s"""WITH $IVF_ROUTED_CTES,
       |qx AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |       FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 64),
       |cx AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       |se AS (SELECT query_id, neighbor_id FROM (
       |         SELECT query_id, neighbor_id, ${cosE6Sql("qv", "cv")} AS sim_e6
       |         FROM cx, qx WHERE neighbor_id <> query_id)
       |       WHERE sim_e6 >= 200000),
       |si AS (SELECT query_id, neighbor_id FROM s WHERE sim_e6 >= 200000)
       |SELECT (SELECT count(*) FROM se) AS exact_pairs,
       |  (SELECT count(*) FROM si) AS ivf_pairs,
       |  CAST((SELECT count(*) FROM si) * 1000000 // (SELECT count(*) FROM se) AS BIGINT) AS recall_e6
       |ORDER BY exact_pairs""".stripMargin

  private lazy val IVF_TRAINED_SQL: String =
    s"""WITH ${kmeansCtes(8, 2)},
       |av AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |asg AS (SELECT id, e, cell, row_number() OVER (PARTITION BY id ORDER BY ${cosE6Sql("av.e", "c.cd")} DESC, c.cell) AS rn
       |        FROM av, c2d c),
       |cells AS (SELECT id AS neighbor_id, e AS cv, cell FROM asg WHERE rn = 1),
       |probes AS (SELECT id AS query_id, e AS qv, cell FROM asg WHERE rn <= 2 AND id % 50 = 0),
       |s AS (SELECT query_id, neighbor_id, ${cosE6Sql("qv", "cv")} AS sim_e6
       |      FROM cells JOIN probes USING (cell) WHERE neighbor_id <> query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  private def hyperplaneSigSql(bits: Int, dim: Int, seed: Int = 42): String = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    (0 until bits).map { b =>
      val hb = Murmur3_x86_32.hashInt(b, Murmur3_x86_32.hashInt(seed, 42))
      val signs = (0 until dim).map { dIdx =>
        val h = Murmur3_x86_32.hashInt(dIdx, hb)
        if (((h % 2) + 2) % 2 == 0) "1.0" else "-1.0"
      }.mkString("[", ", ", "]")
      s"""(CASE WHEN list_reduce(list_transform(range(1, ${dim + 1}),
         |      d -> e[d] * (CAST($signs AS DOUBLE[]))[d]), (x, y) -> x + y) > 0
         |    THEN ${1L << b} ELSE 0 END)""".stripMargin
    }.mkString("\n   + ")
  }

  /** Shared CTE chain of the NN-descent kNN-graph oracle, ending at the
    * refined candidate scores `sc1` — reused by the graph query and its
    * recall harness so the two replays can never drift.
    */
  private lazy val KNN_GRAPH_CTES: String = {
    val scoreSql = (cand: String, out: String) =>
      s"""$out AS (SELECT c.query_id, c.neighbor_id,
         |    ${COS_E6("qa.e", "qb.e")} AS sim_e6
         |  FROM $cand c JOIN v qa ON qa.id = c.query_id
         |  JOIN v qb ON qb.id = c.neighbor_id)""".stripMargin
    s"""v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (SELECT id, e,
       |   ${hyperplaneSigSql(8, 64)} AS sig
       |   FROM v),
       |c0 AS (SELECT a.id AS query_id, b.id AS neighbor_id
       |       FROM s a JOIN s b ON a.sig = b.sig AND a.id <> b.id),
       |${scoreSql("c0", "sc0")},
       |k0 AS (SELECT query_id, neighbor_id FROM (
       |        SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY sim_e6 DESC, neighbor_id) AS r
       |        FROM sc0) WHERE r <= 5),
       |sym AS (SELECT query_id, neighbor_id FROM k0
       |        UNION ALL SELECT neighbor_id, query_id FROM k0),
       |non AS (SELECT x.query_id, y.neighbor_id
       |        FROM sym x JOIN sym y ON x.neighbor_id = y.query_id
       |        WHERE x.query_id <> y.neighbor_id),
       |c1 AS (SELECT DISTINCT query_id, neighbor_id FROM (
       |        SELECT query_id, neighbor_id FROM c0
       |        UNION ALL SELECT query_id, neighbor_id FROM sym
       |        UNION ALL SELECT query_id, neighbor_id FROM non)),
       |${scoreSql("c1", "sc1")}""".stripMargin
  }

  private def COS_E6(a: String, b: String): String =
    s"""CAST(floor(list_inner_product($a, $b) /
       |    (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))) * 1000000) AS BIGINT)""".stripMargin

  /** Oracle for sim_lsh_topk: signatures + multi-probe (all 1-bit flips)
    * + exact rerank, all replayed in SQL.
    */
  private lazy val LSH_TOPK_SQL: String = {
    val masks = Similarity.probeMasks(12, 1).mkString("[", ", ", "]")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (SELECT id, e,
       |   ${hyperplaneSigSql(12, 64)} AS sig
       |   FROM v),
       |probes AS (SELECT id AS query_id, e AS qv, xor(sig, m) AS bucket
       |           FROM s, (SELECT unnest($masks) AS m) WHERE id % 50 = 0),
       |sc AS (SELECT p.query_id, c.id AS neighbor_id,
       |         ${COS_E6("p.qv", "c.e")} AS sim_e6
       |       FROM probes p JOIN s c ON c.sig = p.bucket AND c.id <> p.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim_e6 DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, sim_e6 FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Oracle for sim_embedding_neardup_lsh: 8-bit exact-bucket blocking,
    * then the cosine threshold.
    */
  private lazy val EMB_NEARDUP_LSH_SQL: String =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (SELECT id, e,
       |   ${hyperplaneSigSql(8, 64)} AS sig
       |   FROM v)
       |SELECT a.id AS id_a, b.id AS id_b, ${COS_E6("a.e", "b.e")} AS cos_e6
       |FROM s a JOIN s b ON a.sig = b.sig AND a.id < b.id
       |WHERE ${COS_E6("a.e", "b.e")} >= 300000
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared CTEs for the winnowing oracles (k=5, w=4), ending in
    * `fp(id, h)` — the distinct selected hash set per document. Gram
    * hashes are the exact base-31 polynomial values WinnowSig computes
    * (no wrap under 2^27 for k=5); windows replay the rightmost-min rule
    * via (h ASC, pos DESC) ranking.
    */}
