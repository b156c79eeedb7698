package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Lineage._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — a broadcast nested-loop join, embarrassingly parallel over
  *    corpus partitions, exact. The right baseline, and the right answer
  *    whenever |queries| × dim fits in executor memory.
  *  - LSH-bucketed ANN (random hyperplane signs): narrow signature compute,
  *    equi-join on bucket key — the 100 TB path, where the corpus never
  *    meets more than its bucket's candidates.
  *
  * Dot products are computed by a sequential left-fold (`aggregate`) over
  * the zipped arrays in double precision: deterministic evaluation order,
  * so results are bit-stable and oracle-comparable.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm (double, sequential fold). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Fixed-point cosine: floor(cos * 1e6) as long — see graft.util.Num.e6
    * for why compared outputs avoid raw doubles. Ranking on the fixed-point
    * value (with an id tiebreak) also makes the top-k CUT deterministic:
    * last-ulp disagreements between engines can't flip ranks.
    *
    * Computed by the CosineSimE6 expression (one primitive pass per pair)
    * rather than three interpreted aggregate-folds — same IEEE arithmetic
    * in the same order, parity-tested against the Column form below.
    */
  def cosineE6(a: Column, b: Column): Column = graft.expr.CosineSimE6(a, b)

  /** Declarative reference formulation of [[cosineE6]] (kept for parity
    * tests): floor((a·b)/(|a||b|) * 1e6) via aggregate folds.
    */
  def cosineE6Columns(a: Column, b: Column): Column =
    floor(cosine(a, b) * 1e6).cast("long")

  /** Shared top-k epilogue: rank scored (query_id, neighbor_id, sim_e6)
    * candidates per query — desc sim, neighbor-id tiebreak — keep k,
    * emit the canonical (query_id, rnk BIGINT, neighbor_id, sim_e6)
    * contract. One place to change the output shape for every ANN path.
    */
  private def topKSelect(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_e6").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("sim_e6"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Reciprocal-rank fusion of two ranked retrieval lists (Cormack,
    * Clarke & Büttcher, SIGIR'09) — the standard hybrid-search combiner:
    * rrf(d) = Σ_lists 1/(c + rank_list(d)), here in exact e6 integers
    * (1e6 DIV (c + rank)), so the fused ranking replays digit-for-digit
    * cross-engine. Documents missing from a list contribute 0 from it —
    * RRF's whole point is that rank, not score scale, carries the signal,
    * which is what lets a BM25 list and a cosine list fuse at all.
    *
    * Scale shape: both inputs are already top-k-per-query (broadcast-
    * thin); one full-outer equi-join on (query_id, id), one heap top-k.
    *
    * @param a,b ranked lists as (query_id, id, rnk) with rnk from 1
    * @return (query_id, id, rrf_e6, rank_a, rank_b, rnk) — rank_a/b 0
    *         when absent from that list; rnk by (rrf_e6 desc, id)
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 0, s"c must be >= 0, got $c")
    val la = a.select(col("query_id"), col("id"),
      col("rnk").cast("long").as("__ra"))
    val lb = b.select(col("query_id"), col("id"),
      col("rnk").cast("long").as("__rb"))
    val fused = la.join(lb, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"),
        (coalesce(expr(s"1000000L DIV ($c + __ra)"), lit(0L)) +
          coalesce(expr(s"1000000L DIV ($c + __rb)"), lit(0L))).as("rrf_e6"),
        coalesce(col("__ra"), lit(0L)).as("rank_a"),
        coalesce(col("__rb"), lit(0L)).as("rank_b"))
    graft.plans.TopK.perGroup(fused, Seq("query_id"), col("rrf_e6"),
        col("id"), k, rankName = "rnk")
      .select(col("query_id"), col("id"), col("rrf_e6"),
        col("rank_a"), col("rank_b"), col("rnk").cast("long").as("rnk"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR'98)
    * — the diversity pass a RAG retriever runs on its shortlist: greedily
    * pick k items maximizing λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s), so
    * each pick is relevant AND far from what's already selected. λ = 7/10
    * cleared to integers: mmr_e7 = 7·rel_e6 − 3·maxsim_e6 (no division —
    * the 1/10 scale is monotone, so ranking by the numerator is exact and
    * sidesteps the Spark-DIV-vs-DuckDB-// disagreement on negatives).
    * With S empty the penalty term is 0 (the conventional first pick =
    * pure relevance). Ties break by id; every round replays in the
    * oracle's unrolled CTEs.
    *
    * Scale shape: the pool is already top-n-per-query (broadcast-thin);
    * each of the k rounds is a pool×selected join bounded by n·k rows
    * per query. k and n are constants — the corpus never re-enters.
    *
    * @param pool (query_id, id, rel_e6, v) relevance-ranked shortlist
    * @return (query_id, rk, id, rel_e6, mmr_e7), rk ∈ [1, k]
    */
  def mmrRerank(pool: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val p = pool.select(col("query_id"), col("id"),
      col("rel_e6").cast("long"), col("v")).truncateLineage()
    var sel: DataFrame = null // (query_id, id, rk, rel_e6, mmr_e7)
    for (r <- 1 to k) {
      val cand = if (sel == null) p
        else p.join(sel.select("query_id", "id"), Seq("query_id", "id"), "left_anti")
      val pen = if (sel == null) null
        else {
          val sv = sel.select(col("query_id"), col("id").as("sid"))
            .join(p.select(col("query_id"), col("id").as("sid"), col("v").as("sv")),
              Seq("query_id", "sid"))
          cand.join(sv, Seq("query_id"))
            .select(col("query_id"), col("id"), cosineE6(col("v"), col("sv")).as("s"))
            .groupBy("query_id", "id").agg(max(col("s")).as("mp"))
        }
      val scored0 = if (pen == null) cand.withColumn("mp", lit(0L))
        else cand.join(pen, Seq("query_id", "id"), "left")
          .withColumn("mp", coalesce(col("mp"), lit(0L)))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("mmr_e7").desc, col("id"))
      val pick = scored0
        .withColumn("mmr_e7", lit(7L) * col("rel_e6") - lit(3L) * col("mp"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("id"), lit(r.toLong).as("rk"),
          col("rel_e6"), col("mmr_e7"))
      sel = (if (sel == null) pick else sel.union(pick)).truncateLineage()
    }
    sel.select(col("query_id"), col("rk"), col("id"), col("rel_e6"),
      col("mmr_e7")).orderBy(col("query_id"), col("rk"))
  }

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Query side is broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    topKSelect(scored, k)
  }

  /** Hard-negative mining for contrastive embedding training: for each
    * query, the k most-similar corpus vectors whose label DIFFERS from
    * the query's — high-similarity/wrong-class examples are exactly the
    * negatives that sharpen a metric-learning objective (easy random
    * negatives carry no gradient). Same broadcast-thin query side and
    * codegen'd integer cosine as [[bruteForceTopK]]; the label filter
    * runs before the heap top-k, so the per-query state stays k rows. At
    * corpus scale route the candidate generation through the trained IVF
    * cells first and label-filter within probed cells.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("nlabel"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nlabel") =!= col("qlabel"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    topKSelect(scored, k)
  }

  /** Radius (threshold) similarity search: ALL corpus vectors within
    * cosine ≥ tauE6 of each query — the retrieval face top-k cannot
    * express (dedup candidate harvesting, recall-first gathering, "every
    * near-copy of this doc" audits want a similarity floor, not a count
    * cap). Exact: the broadcast-thin query side streams past the corpus
    * once; one codegen'd CosineSimE6 per (candidate, query), no shuffle
    * at all — output size is data-dependent by design. At larger query
    * batches route through the trained IVF cells first ([[ivfTrainedTopK]]'s
    * routing) and radius-filter within probed cells.
    */
  def radiusSearch(corpus: DataFrame, queries: DataFrame, tauE6: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
      .filter(col("sim_e6") >= tauE6)
      .select("query_id", "neighbor_id", "sim_e6")
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes, packed into a long. The
    * hyperplane components are derived from (bit, dim) via a hash → cheap,
    * reproducible, no driver-side random state to ship. Computed by the
    * HyperplaneSig expression (one pass; parity-tested against
    * [[hyperplaneSignatureColumns]]).
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    graft.expr.HyperplaneSig(vec, bits)

  /** Declarative reference formulation of [[hyperplaneSignature]], kept for
    * parity tests.
    */
  def hyperplaneSignatureColumns(vec: Column, bits: Int, seed: Int = 42): Column = {
    val bitCols = (0 until bits).map { b =>
      // pseudo-random ±1 hyperplane: sign of murmur3(seed, b, dim index)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") *
            when(pmod(hash(lit(seed), lit(b), i), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH buckets with multi-probe: candidates are corpus vectors in
    * the query's exact bucket OR any 1-bit-flip neighbor bucket (the
    * standard multi-probe sequence — a near neighbor that disagrees on one
    * hyperplane sign is still found). Probing fans out only the QUERY side
    * (×(bits+1)), which is the small side; the corpus is hashed once.
    * Exact rerank within candidates; one equi-join shuffle on the bucket
    * key — scales linearly in corpus size.
    *
    * `probeFlips` = how many sign bits may differ (0 = exact bucket only,
    * 1 = all single-bit flips). Recall at bits=12/probeFlips=1 measured
    * ~0.95+ on near-dup clusters vs ~0.8 single-probe.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 12,
      probeFlips: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneSignature(col(vecCol), bits).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneSignature(col(vecCol), bits).as("sig"))
    // all XOR masks with popcount <= probeFlips (0 mask = the exact bucket)
    val masks = Similarity.probeMasks(bits, probeFlips)
    val q = qBase.select(col("query_id"), col("qv"),
      explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("bucket"))
    // no pair dedup needed: the probe buckets are pairwise distinct and a
    // corpus vector lives in exactly one bucket, so each (query, neighbor)
    // pair joins at most once.
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    topKSelect(scored, k)
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantization scale path.
    *
    * Centroids are the corpus vectors whose id ≡ 0 (mod centStep):
    * deterministic, tiny, broadcastable, and SQL-expressible so the whole
    * operator is oracle-checkable with no training pass ([[ivfTopKTrained]]
    * is the trained-centroid variant — equally oracle-checkable thanks to
    * fixed-point k-means, at the cost of the training iterations).
    * Corpus vectors are assigned to their nearest centroid's cell (one
    * broadcast join + argmax, no shuffle of the corpus); queries probe the
    * `nProbe` nearest cells and exact-rerank inside them. At 100 TB the
    * corpus-side cost is one narrow pass over the vectors; the probe join
    * touches nProbe/numCells of the corpus per query instead of all of it.
    *
    * Ties in the argmax are broken by the lower centroid id — mirrored in
    * the oracle — so cell assignment is bit-deterministic.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, centStep: Int,
      nProbe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", maxCells: Int = 64): DataFrame =
    // the unfiltered index IS the filtered index with a vacuous predicate
    // (Catalyst folds the `true` filter away) — one implementation, one
    // tie-break/cap convention, shared with the metadata-filtered face
    topKSelect(ivfFilteredCandidates(corpus, queries, lit(true), centStep,
      nProbe, idCol, vecCol, maxCells), k)

  /** Metadata-FILTERED IVF ANN candidates — label-aware routing, the fix
    * for the post-filter recall starvation `sim_filtered_recall` measures
    * (rank the unfiltered index top-k′, filter, and with 10% selectivity
    * k′=20 leaves ~2 survivors for 5 slots): here the predicate prunes
    * the index's posting lists BEFORE scoring, so every scored candidate
    * already satisfies it and the whole budget goes to qualifying rows.
    *
    * The index structure is SHARED with [[ivfTopK]] — same global
    * mod-centStep centroids, same maxCells cap — so one index build
    * serves any metadata predicate (the vector-DB "metadata-partitioned
    * posting lists" layout). Because a vector's cell depends only on its
    * embedding, filtering entries before assignment computes exactly the
    * partitioned posting lists a stored index would serve, minus the
    * assignment work for non-qualifying rows.
    *
    * Returns UNRANKED scored candidates (query_id, neighbor_id, sim_e6);
    * the per-query candidate count IS the scored budget — publish it next
    * to recall so arms compare at equal budget. [[ivfTopK]] is this with
    * a vacuous predicate + top-k ranking — ONE implementation carries the
    * cap/tie-break convention for both faces.
    */
  def ivfFilteredCandidates(corpus: DataFrame, queries: DataFrame,
      pred: Column, centStep: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCells: Int = 64): DataFrame = {
    // a real IVF has a FIXED cell budget: the 1-in-centStep slice is only
    // the deterministic stand-in for trained centroids, and the maxCells
    // cap (no-op at every test SF, ≤ 40 cells) is what keeps the centroid
    // table bounded — and the assignment cost O(N·cells), not O(N²/step)
    // — at 100 TB; vec_id order makes the cap deterministic. Centroids
    // come from the UNFILTERED corpus: the shared index artifact.
    val cents = corpus.filter(pmod(col(idCol), lit(centStep)) === 0)
      .orderBy(col(idCol)).limit(maxCells)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))

    // Corpus-side cell assignment: broadcast-join the centroids, then a
    // map-side-combinable max_by argmax — the exchange carries ONE row per
    // corpus vector, not the |corpus|×C scored frame a ranking window
    // would shuffle. Tiebreak (highest sim, then LOWEST cent_id) mirrors
    // the oracle's ORDER BY cent_sim DESC, cent_id.
    val cells = corpus.filter(pred)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim", cosineE6(col("cv"), col("cent_v")))
      .groupBy("neighbor_id")
      .agg(max_by(struct(col("cv"), col("cent_id")),
        struct(col("cent_sim"), (-col("cent_id")).as("__nci"))).as("__r"))
      .select(col("neighbor_id"), col("__r.cv").as("cv"),
        col("__r.cent_id").as("cent_id"))

    // Query side probes nProbe cells — queries are the small side, so a
    // ranking window over |queries|×C rows is fine.
    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim", cosineE6(col("qv"), col("cent_v")))
      .drop("cent_v")
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cent_id"))
    val probes = qScored.withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id"))

    cells.join(probes, Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("sim_e6"))
  }

  /** Label-PARTITIONED IVF ANN candidates — the high-cardinality-filter
    * companion to [[ivfFilteredCandidates]]. Prefilter routing prunes a
    * GLOBAL index's posting lists per query — right for a handful of
    * labels, but every probe still reads a cell mixing all labels and
    * drops the non-matching entries it paid to store. Here the index
    * itself is keyed by label: each label value owns its own centroids
    * (drawn from the label's OWN mod-centStep rows, plus the label's
    * min-id row so a sparse label is never cell-less, capped to the
    * maxCellsPerLabel lowest centroid ids via the heap top-k operator —
    * never a low-cardinality ranking window over the corpus), every
    * corpus row is assigned within its label's cells only, and a query
    * routes straight to the cells of the label it filters on — zero
    * non-matching rows are ever read. This is the vector-DB
    * "partition-per-tenant" layout; its cost is that cell geometry is
    * per-label (fine when labels are many and balanced, wasteful for one
    * giant label — that's prefilter territory).
    *
    * The plan declares the FULL all-label artifact (build once, serve any
    * label); Catalyst pushes the query's label equality through the
    * assignment aggregate's group key, so the executed plan only ever
    * assigns the queried label's rows — declare the artifact, let the
    * optimizer prune to the partition.
    *
    * Returns UNRANKED scored candidates (query_id, neighbor_id, sim_e6),
    * the [[ivfFilteredCandidates]] contract: per-query candidate count =
    * the scored budget, published next to recall by the harness.
    */
  def ivfLabelPartitionedCandidates(corpus: DataFrame, queries: DataFrame,
      labelCol: String, queryLabel: Long, centStep: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCellsPerLabel: Int = 64): DataFrame = {
    val base = corpus.select(col(labelCol).cast("long").as("lbl"),
      col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    val modHits = base.filter(pmod(col("cent_id"), lit(centStep)) === 0)
    val fallback = base.groupBy("lbl").agg(min(col("cent_id")).as("cent_id"))
      .join(base, Seq("lbl", "cent_id"))
    // the all-label centroid table (the artifact): one per-label heap cap.
    // It is L × maxCells rows — BOUNDED PER LABEL but not globally (L is
    // data-dependent), so it is deliberately NEVER broadcast: that hint
    // would OOM exactly in the high-label-cardinality regime this
    // operator exists for (the registry plan lint rejects it).
    def capped(src: DataFrame): DataFrame =
      graft.plans.TopK.perGroup(src.dropDuplicates("lbl", "cent_id"),
        Seq("lbl"), -col("cent_id"), col("cent_id"), maxCellsPerLabel)
        .drop("rnk")
    val cents = capped(modHits.unionByName(fallback))
    // per-label assignment: a corpus row joins ONLY its own label's
    // centroids — a plain EQUI-join on lbl (shuffle by label: the
    // partition-per-label layout itself; a hot label is ordinary AQE
    // skew territory), then the same map-side-combinable argmax +
    // (sim DESC, cent_id ASC) tie-break as the global index
    val cells = corpus
      .select(col(labelCol).cast("long").as("lbl"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(cents, Seq("lbl"))
      .withColumn("cent_sim", cosineE6(col("cv"), col("cent_v")))
      .groupBy("lbl", "neighbor_id")
      .agg(max_by(struct(col("cv"), col("cent_id")),
        struct(col("cent_sim"), (-col("cent_id")).as("__nci"))).as("__r"))
      .select(col("lbl"), col("neighbor_id"), col("__r.cv").as("cv"),
        col("__r.cent_id").as("cent_id"))
    // routing: probe the nProbe nearest cells OF THE QUERIED LABEL. The
    // label filter sits BELOW the per-label cap (they commute — the cap
    // is per label), so this side is structurally ≤ maxCellsPerLabel
    // rows at any SF and the broadcast is provably safe.
    val tc = capped(modHits.unionByName(fallback)
        .filter(col("lbl") === queryLabel))
      .drop("lbl")
    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(tc))
      .withColumn("cent_sim", cosineE6(col("qv"), col("cent_v")))
      .drop("cent_v")
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cent_id"))
    val probes = qScored.withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cent_id"))
    cells.filter(col("lbl") === queryLabel).drop("lbl")
      .join(probes, Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("sim_e6"))
  }

  /** Fixed-point cosine for the trained-centroid path: CosineSimE6
    * dispatches per-side element types at analysis, so the mixed
    * float-vector × double-centroid pair runs the same primitive loop as
    * the float-only hot paths (NULL on zero norm either way).
    */
  private def cosineE6Mixed(a: Column, b: Column): Column =
    graft.expr.CosineSimE6(a, b)

  /** Deterministic bounded training sample: the `n` vectors with smallest
    * md5(id) — the same KMV bottom-k rank the centroid/codebook seeding
    * uses, so the seed set is always a prefix of the training set. This is
    * how training costs stay FIXED at 100 TB: Lloyd iterations touch a
    * few thousand sampled rows instead of the corpus, and only the
    * one-pass assign/encode stages ever scan everything. Heap-based
    * bottom-k — no global sort, no RNG state.
    */
  def hashSample(vectors: DataFrame, n: Int,
      idCol: String = "vec_id"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val hashed = vectors
      .withColumn("__h", graft.analytics.Sketch.hashPoint32(col(idCol)))
      .withColumn("__g", lit(0))
    graft.plans.TopK.perGroup(hashed, Seq("__g"), -col("__h"), col(idCol), n)
      .drop("__h", "__g")
  }

  /** Deterministic distributed k-means (Lloyd's algorithm) over the
    * embedding column, every step in e6 FIXED POINT so training is
    * bit-reproducible and SQL-oracle-checkable — the construction the
    * sampled-centroid [[ivfTopK]] doc calls impossible for "trained
    * k-means" is possible once the arithmetic is pinned:
    *
    *  - init: the k vectors with smallest md5(id) hash (the KMV
    *    deterministic-sample trick), cell index = hash rank;
    *  - assign: argmax fixed-point cosine against the broadcast centroids,
    *    ties to the lower cell — spherical k-means (cosine is invariant
    *    to centroid scale, so unnormalized mean centroids are exact);
    *  - update: per-dimension e6-quantized integer sums (exact,
    *    order-independent — the same reason [[graft.analytics.Sketch]]
    *    sums HLL registers in integer space) divided by the cell count
    *    with one deterministic floor.
    *
    * Dead cells (no assigned vectors) drop out, the standard Lloyd
    * behavior; zero-norm vectors are excluded from training (their cosine
    * is undefined). Scale shape per iteration: one broadcast cross join +
    * map-side-combinable argmax (one row per vector through the
    * exchange), then a (cell, dim) sum aggregation — |v|·dim rows,
    * map-side combinable to k·dim. No driver-side state beyond the plan.
    *
    * @return (cell, ce) — centroid components as e6 longs
    */
  def kMeansCentroidsE6(vectors: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(trainSample == 0 || trainSample >= k,
      s"trainSample ($trainSample) must be 0 (full corpus) or >= k ($k)")
    // bounded training set (see [[hashSample]]): at scale the Lloyd rounds
    // run over the sample; seeding is unchanged because the seed bottom-k
    // is a prefix of the sample bottom-n under the same hash order
    val base = if (trainSample > 0) hashSample(vectors, trainSample, idCol)
               else vectors
    val v = base.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(l2Norm(col("v")) > 0.0)
    val hashed = v.withColumn("__h", graft.analytics.Sketch.hashPoint32(col("id")))
      .withColumn("__g", lit(0))
    // bottom-k by hash via the heap operator (no global sort of the
    // corpus); the k survivors are tiny, so the indexing window is free
    val seed = graft.plans.TopK.perGroup(hashed, Seq("__g"), -col("__h"), col("id"), k)
    val wk = Window.partitionBy(col("__g")).orderBy(col("__h"), col("id"))
    val quantize: Column => Column =
      vc => transform(vc, x => floor(x.cast("double") * 1e6).cast("long"))
    // cell as BIGINT from the start: the oracle's row_number() is BIGINT
    // and the driver's schema compare is strict about integer widths
    var cents = seed.withColumn("cell", (row_number().over(wk) - 1).cast("long"))
      .select(col("cell"), quantize(col("v")).as("ce"))
    for (_ <- 0 until iters) {
      val cd = cents.select(col("cell"),
        transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
      val assigned = v.crossJoin(broadcast(cd))
        .withColumn("__sim", cosineE6Mixed(col("v"), col("cd")))
        .groupBy("id")
        .agg(max_by(struct(col("v"), col("cell")),
          struct(col("__sim"), (-col("cell")).as("__nc"))).as("__r"))
        .select(col("__r.v").as("v"), col("__r.cell").as("cell"))
      cents = assigned
        .select(col("cell"), posexplode(quantize(col("v"))))
        .groupBy("cell", "pos")
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c")))).as("__pc"))
        .select(col("cell"), transform(col("__pc"), p => p.getField("c")).as("ce"))
    }
    cents
  }

  /** Final cell assignment against trained centroids: (id, cell, sim_e6),
    * argmax fixed-point cosine, ties to the lower cell.
    */
  def kMeansAssign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cd = centroids.select(col("cell"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
    vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cd))
      .withColumn("__sim", cosineE6Mixed(col("v"), col("cd")))
      .filter(col("__sim").isNotNull)
      .groupBy("id")
      .agg(max_by(struct(col("cell"), col("__sim")),
        struct(col("__sim"), (-col("cell")).as("__nc"))).as("__r"))
      .select(col("id"), col("__r.cell").as("cell"), col("__r.__sim").as("sim_e6"))
  }

  /** Per-point assignment margin of a trained clustering: best-cell
    * cosine minus best OTHER cell's cosine — the integer-exact
    * cohesion/separation dial (the cosine-space simplified silhouette;
    * silhouette proper needs pairwise means and a sqrt, neither of which
    * survives cross-engine exactness). Margin ≥ 0 by construction; a
    * small margin marks a point the quantizer barely routed — the mass
    * near 0 is what a SemDeDup threshold or an IVF nProbe dial is
    * actually fighting. Cost: one broadcast cross-score (k·n rows, k
    * constant) + one argmax + one second-max join, all equi-keyed.
    *
    * @return (id, cell, margin) with margin in e6 cosine units
    */
  def kMeansMargins(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cd = centroids.select(col("cell"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
    val sims = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(cd))
      .withColumn("sim", cosineE6Mixed(col("v"), col("cd")))
      .filter(col("sim").isNotNull)
      .select("id", "cell", "sim")
      .truncateLineage() // scored once, read by argmax AND second-max
    val best = sims.groupBy("id")
      .agg(max_by(struct(col("cell"), col("sim")),
        struct(col("sim"), (-col("cell")).as("nc"))).as("r"))
      .select(col("id"), col("r.cell").as("bcell"), col("r.sim").as("bsim"))
    best.join(sims, Seq("id"))
      .filter(col("cell") =!= col("bcell"))
      .groupBy(col("id"), col("bcell"), col("bsim"))
      .agg(max(col("sim")).as("second"))
      .select(col("id"), col("bcell").as("cell"),
        (col("bsim") - col("second")).as("margin"))
  }

  /** Trained-IVF ANN: [[ivfTopK]]'s probe/rerank shape with
    * [[kMeansCentroidsE6]] cells instead of the modulo-sampled ones —
    * cells sized by the data, not by id arithmetic, which is what keeps
    * probe selectivity stable on skewed corpora. Same contract and the
    * same oracle-checkability (the centroids are fixed-point-exact).
    */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, trainIters: Int = 2, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None): DataFrame =
    topKSelect(ivfProbedScored(corpus, queries, numCells, trainIters,
      nProbe, idCol, vecCol, centroids), k)

  /** IVF-routed RADIUS search — [[radiusSearch]]'s scale path: each query
    * scores only its nProbe nearest trained cells' members, then keeps
    * everything at or above the cosine floor. Approximate by routing
    * (neighbors outside probed cells are missed — results are a SUBSET of
    * the exact radius set, never wrong pairs); measure the miss rate with
    * the recall harness before trusting a (numCells, nProbe) config.
    */
  def ivfRadiusSearch(corpus: DataFrame, queries: DataFrame, tauE6: Long,
      numCells: Int, trainIters: Int = 2, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None): DataFrame =
    ivfProbedScored(corpus, queries, numCells, trainIters, nProbe,
        idCol, vecCol, centroids)
      .filter(col("sim_e6") >= tauE6)
      .select("query_id", "neighbor_id", "sim_e6")

  /** Shared IVF candidate generation: corpus routed to its nearest
    * trained cell, queries to their nProbe nearest, exact cosine on the
    * co-celled pairs — (query_id, neighbor_id, sim_e6), unranked.
    */
  private def ivfProbedScored(corpus: DataFrame, queries: DataFrame,
      numCells: Int, trainIters: Int, nProbe: Int,
      idCol: String, vecCol: String,
      centroids: Option[DataFrame]): DataFrame = {
    val cents = centroids.getOrElse(
      kMeansCentroidsE6(corpus, numCells, trainIters, idCol, vecCol))
    val cd = cents.select(col("cell"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))

    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("cv"), col("cd")))
      .filter(col("cent_sim").isNotNull)
      .groupBy("neighbor_id")
      .agg(max_by(struct(col("cv"), col("cell")),
        struct(col("cent_sim"), (-col("cell")).as("__nc"))).as("__r"))
      .select(col("neighbor_id"), col("__r.cv").as("cv"), col("__r.cell").as("cell"))

    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("qv"), col("cd")))
      .filter(col("cent_sim").isNotNull)
      .drop("cd")
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = qScored.withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
  }

  // ---- Product quantization (PQ) ------------------------------------------

  /** e6 quantization of a float/double vector — the shared fixed point of
    * the PQ family (train, encode, and ADC all operate on these longs, so
    * every stage is exact integer arithmetic).
    */
  private def quantE6(vc: Column): Column =
    transform(vc, x => floor(x.cast("double") * 1e6).cast("long"))

  /** Exploded subspace view: (id, sub, sv) with sv = the `sub`-th of
    * `numSub` equal slices of the e6-quantized vector (trailing remainder
    * dims are dropped when numSub does not divide the dimension — pick a
    * divisor in practice). With `normalize` (the default across the PQ
    * family) each vector is L2-normalized BEFORE quantization, so ADC
    * dots approximate COSINE — the ranking the rest of the similarity
    * family uses; zero-norm vectors are excluded (they have no cosine).
    * Division and sqrt are IEEE-identical across engines, so normalized
    * quantization replays exactly like the raw form.
    */
  private def subVectors(vectors: DataFrame, numSub: Int,
      idCol: String, vecCol: String, normalize: Boolean,
      quantized: Boolean = false): DataFrame = {
    val base =
      if (quantized) // vecCol is ALREADY an e6 long array (e.g. residuals)
        vectors.select(col(idCol).as("id"), col(vecCol).as("vq"))
      else if (!normalize)
        vectors.select(col(idCol).as("id"), quantE6(col(vecCol)).as("vq"))
      else vectors
        .filter(l2Norm(col(vecCol)) > 0.0)
        .withColumn("__n", l2Norm(col(vecCol)))
        .select(col(idCol).as("id"),
          quantE6(transform(col(vecCol), x => x.cast("double") / col("__n")))
            .as("vq"))
    val w = expr(s"size(vq) DIV $numSub").cast("int")
    base
      .select(col("id"), explode(sequence(lit(0), lit(numSub - 1))).as("sub"),
        col("vq"))
      .select(col("id"), col("sub").cast("long").as("sub"),
        slice(col("vq"), (col("sub") * w + 1).cast("int"), w).as("sv"))
  }

  /** Squared L2 distance between two e6 long vectors via the integer
    * identity |a−b|² = a·a + b·b − 2·a·b — three [[graft.expr.LongDot]]
    * primitive loops, no interpreted HOF, exact at any partitioning.
    */
  private def l2DistE12(a: Column, b: Column): Column =
    graft.expr.LongDot(a, a) + graft.expr.LongDot(b, b) -
      lit(2L) * graft.expr.LongDot(a, b)

  /** Product-quantization codebooks: an independent `kSub`-word codebook
    * per subspace, trained with integer-L2 Lloyd iterations in e6 fixed
    * point — deterministic and SQL-replayable end to end, the PQ analogue
    * of [[kMeansCentroidsE6]] (same md5-bottom-k seeding, same floored
    * integer mean update, argmin L2 with ties to the lower code).
    *
    * PQ is the 100 TB memory story for embeddings: a D-dim float vector
    * (4·D bytes) compresses to `numSub` single-byte codes (kSub ≤ 256) —
    * 32× for D=64/numSub=8 — so a trillion-vector corpus' codes fit a
    * cluster's RAM and ADC scoring never touches the raw floats. [Jégou,
    * Douze, Schmid: "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011.]
    *
    * Scale shape per iteration: subvectors × broadcast codebooks (the
    * codebook is numSub·kSub rows — tiny), map-side-combinable argmin,
    * then a (sub, code, pos) integer-sum aggregation. One exchange per
    * round over |v|·numSub narrow rows; no driver state.
    *
    * @return (sub, code, ce: array<long>) — codeword components, e6
    */
  def pqCodebooksE6(vectors: DataFrame, numSub: Int, kSub: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      normalize: Boolean = true, trainSample: Int = 0,
      quantized: Boolean = false): DataFrame = {
    require(numSub >= 1, s"numSub must be >= 1, got $numSub")
    require(kSub >= 1, s"kSub must be >= 1, got $kSub")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(trainSample == 0 || trainSample >= kSub,
      s"trainSample ($trainSample) must be 0 (full corpus) or >= kSub ($kSub)")
    // bounded training set (see [[hashSample]]): the seed bottom-kSub is a
    // prefix of the sample bottom-n under the same hash order, so sampled
    // training changes the Lloyd inputs, never the seeding rule
    val base = if (trainSample > 0) hashSample(vectors, trainSample, idCol)
               else vectors
    val subs = subVectors(base, numSub, idCol, vecCol, normalize, quantized)
    // seed: the kSub vectors with smallest md5(id) — the SAME ids seed
    // every subspace (their sv differs per sub), code = hash rank;
    // seeded from the same (possibly normalize-filtered) id set the
    // subvectors come from, so a seed id always has rows to seed with
    val hashed = subs.filter(col("sub") === 0).select(col("id"))
      .withColumn("__h", graft.analytics.Sketch.hashPoint32(col("id")))
      .withColumn("__g", lit(0))
    val seed = graft.plans.TopK.perGroup(hashed, Seq("__g"), -col("__h"),
      col("id"), kSub)
    val wk = Window.partitionBy(col("__g")).orderBy(col("__h"), col("id"))
    val seedCodes = seed
      .withColumn("code", (row_number().over(wk) - 1).cast("long"))
      .select(col("id"), col("code"))
    var cb = subs.join(seedCodes, Seq("id"))
      .select(col("sub"), col("code"), col("sv").as("ce"))
    for (_ <- 0 until iters) {
      val assigned = subs.join(broadcast(cb), Seq("sub"))
        .withColumn("__d", l2DistE12(col("sv"), col("ce")))
        .groupBy("id", "sub")
        .agg(min_by(struct(col("sv"), col("code")),
          struct(col("__d"), col("code"))).as("__r"))
        .select(col("sub"), col("__r.sv").as("sv"), col("__r.code").as("code"))
      cb = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy("sub", "code", "pos")
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .groupBy("sub", "code")
        .agg(sort_array(collect_list(struct(col("pos"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))))
          .as("__pc"))
        .select(col("sub"), col("code"),
          transform(col("__pc"), p => p.getField("c")).as("ce"))
    }
    cb
  }

  /** PQ encoding: each vector's nearest codeword per subspace (integer
    * L2 argmin, ties to the lower code) — long format (id, sub, code),
    * the join-friendly shape of the compressed corpus.
    */
  def pqEncode(vectors: DataFrame, codebooks: DataFrame, numSub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      normalize: Boolean = true, quantized: Boolean = false): DataFrame =
    subVectors(vectors, numSub, idCol, vecCol, normalize, quantized)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("__d", l2DistE12(col("sv"), col("ce")))
      .groupBy("id", "sub")
      .agg(min_by(col("code"), struct(col("__d"), col("code"))).as("code"))

  /** PQ-ADC top-k: asymmetric distance computation — the query stays
    * exact, the corpus is its codes, and each candidate's score is the
    * sum over subspaces of a PRECOMPUTED query·codeword dot (the lookup
    * table), so scoring a candidate costs numSub integer adds and never
    * touches the original vectors. Scores are exact e12 integer dots of
    * the query against each vector's RECONSTRUCTION (the PQ
    * approximation), deterministic in any engine.
    *
    * Scale shape: the LUT is |queries|·numSub·kSub rows — broadcast; the
    * compressed corpus joins it on (sub, code) with no shuffle of the
    * codes, and the per-(query, candidate) sum is map-side combinable.
    * At 100 TB the codes table is the only corpus-sized input — the raw
    * embeddings are read once at encode time, never per query.
    */
  /** ADC scores for every (query, candidate) pair: train codebooks,
    * encode the corpus, broadcast the per-query lookup table, sum — the
    * shared front half of [[pqTopK]] and [[pqTopKReranked]].
    */
  private def pqAdcScores(corpus: DataFrame, queries: DataFrame, numSub: Int,
      kSub: Int, trainIters: Int, idCol: String, vecCol: String,
      normalize: Boolean, codebooks: Option[DataFrame] = None): DataFrame = {
    val cb = codebooks.getOrElse(pqCodebooksE6(corpus, numSub, kSub,
      trainIters, idCol, vecCol, normalize))
    val codes = pqEncode(corpus, cb, numSub, idCol, vecCol, normalize)
      .select(col("id").as("neighbor_id"), col("sub"), col("code"))
    val lut = subVectors(queries, numSub, idCol, vecCol, normalize)
      .select(col("id").as("query_id"), col("sub"), col("sv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        graft.expr.LongDot(col("sv"), col("ce")).as("pdot"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("pdot")).as("adc_e12"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, numSub: Int,
      kSub: Int, trainIters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", normalize: Boolean = true,
      codebooks: Option[DataFrame] = None): DataFrame = {
    val scored = pqAdcScores(corpus, queries, numSub, kSub, trainIters,
      idCol, vecCol, normalize, codebooks)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_e12").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("adc_e12"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The production PQ pipeline: ADC ranks a cheap SHORTLIST (compressed
    * codes only), then the shortlist alone is re-scored with the exact
    * cosine — recall recovers most of what quantization lost while the
    * exact kernel touches `shortlist`/|corpus| of the vectors per query.
    * At 100 TB the shortlist join is the only stage that reads raw
    * embeddings after encode time, and it reads them by id.
    */
  def pqTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, numSub: Int, kSub: Int, trainIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      normalize: Boolean = true, codebooks: Option[DataFrame] = None): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val scored = pqAdcScores(corpus, queries, numSub, kSub, trainIters,
      idCol, vecCol, normalize, codebooks)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_e12").desc, col("neighbor_id"))
    val short = scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = short
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    topKSelect(rescored, k)
  }

  /** IVF-PQ: the trillion-vector composition [Jégou et al., TPAMI 2011,
    * §V] — a coarse k-means quantizer routes every vector to a cell, the
    * corpus is stored ONLY as PQ codes (+ one cell id per vector), and a
    * query ADC-scores just the codes inside its `nProbe` nearest cells
    * instead of all of them. This variant encodes the (normalized)
    * vectors directly rather than cell residuals — the `by_residual =
    * false` flavor — which keeps one shared codebook table and an
    * oracle-replayable integer trajectory; residual encoding is the
    * accuracy refinement on top, not a different plan shape.
    *
    * Both models train on the [[hashSample]] bounded sample (`trainSample`
    * > 0 is the scale path; 0 falls back to full-corpus training), so at
    * 100 TB the ONLY corpus-sized stages are the one-pass assign + encode
    * (build-time artifacts, stored once) and the probed-cell ADC join —
    * which touches ~nProbe/numCells of the codes per query. Training cost
    * no longer grows with the corpus at all. Pretrained `centroids` /
    * `codebooks` (e.g. read from a [[ModelStore]] publish) skip training
    * entirely — the serve-many path.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, nProbe: Int = 2, numSub: Int = 8, kSub: Int = 32,
      trainIters: Int = 2, trainSample: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None,
      codebooks: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(kMeansCentroidsE6(corpus, numCells,
      trainIters, idCol, vecCol, trainSample))
    val cb = codebooks.getOrElse(pqCodebooksE6(corpus, numSub, kSub,
      trainIters, idCol, vecCol, normalize = true, trainSample))

    // build-time artifacts (one narrow pass each over the corpus; at scale
    // these are written once and served, not recomputed per query)
    val cells = kMeansAssign(corpus, cents, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("cell"))
    val codes = pqEncode(corpus, cb, numSub, idCol, vecCol, normalize = true)
      .select(col("id").as("neighbor_id"), col("sub"), col("code"))

    // query side: nProbe nearest cells per query (tiny), plus the ADC LUT
    val cd = cents.select(col("cell"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("qv"), col("cd")))
      .filter(col("cent_sim").isNotNull)
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = qScored.withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("cell"))
    val lut = subVectors(queries, numSub, idCol, vecCol, normalize = true)
      .select(col("id").as("query_id"), col("sub"), col("sv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        graft.expr.LongDot(col("sv"), col("ce")).as("pdot"))

    // routing BEFORE scoring is the point: only codes in probed cells meet
    // the LUT, so the ADC join carries ~nProbe/numCells of the corpus
    val scored = codes.join(cells, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("pdot")).as("adc_e12"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_e12").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("adc_e12"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Residual IVF-PQ — the faithful IVFADC of [Jégou et al., TPAMI 2011,
    * §V]: PQ encodes each vector's RESIDUAL from its coarse centroid
    * (r = v − c_cell) instead of the vector itself. Residuals concentrate
    * near the origin once the coarse quantizer has absorbed the cell's
    * mean, so the same code budget spends its precision on the part of
    * the vector the routing hasn't already explained — the accuracy
    * refinement over [[ivfPqTopK]]'s `by_residual = false` form.
    *
    * Everything stays exact integer arithmetic: vectors are L2-normalized
    * then e6-quantized; the coarse k-means trains ON THE NORMALIZED
    * vectors (so centroids and residuals live in one space); the residual
    * is a long-array subtraction; PQ trains/encodes the residual longs
    * directly (`quantized = true` path); and the ADC score decomposes as
    * q·(c_cell + r̂) = q·c_cell + Σ q_sub·r̂_code — one extra broadcast
    * (query, cell) dot added to the LUT sum. Same scale shape as
    * [[ivfPqTopK]]: bounded-sample training, one-pass assign/encode build
    * artifacts, probed-cell-only scoring.
    */
  /** L2-normalized double view (id, nv) of an embedding column — the one
    * shared space the residual family (coarse centroids, residuals,
    * queries) lives in. Zero-norm vectors are excluded.
    */
  /** Deterministic CLUSTERED synthetic corpus derived from an id column —
    * a mixture of `numClusters` md5-seeded integer-grid centers plus
    * bounded integer per-vector noise. The isotropic test corpus leaves
    * every ANN config near-equidistant (PQ recall ~0.24, radius
    * pair-recall 0.44 — honestly measured, but non-discriminating); this
    * clustered twin is the fixture on which recall harnesses actually
    * separate good configs from bad, the way real embedding corpora do.
    *
    * Every component is a small integer ((center%2001-1000)*4 +
    * (noise%201-100) ∈ [-4100, 4100]), exactly representable in float AND
    * double, so the DuckDB oracle regenerates the corpus bit-for-bit from
    * the same md5 draws — no RNG, no seed state, no parquet fixture.
    */
  def clusteredEmbeddings(df: DataFrame, numClusters: Int = 50,
      dims: Int = 64, idCol: String = "vec_id"): DataFrame = {
    import graft.analytics.Sketch.hashPoint32
    df.select(col(idCol),
        (hashPoint32(concat(col(idCol).cast("string"), lit("#cl")))
          % numClusters).as("__cluster"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          ((hashPoint32(concat(lit("c"), col("__cluster").cast("string"),
              lit("#d"), i.cast("string"))) % 2001 - 1000) * 4 +
            (hashPoint32(concat(lit("v"), col(idCol).cast("string"),
              lit("#d"), i.cast("string"))) % 201 - 100))
            .cast("float")).as("embedding"))
  }

  def normalizedView(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = df
    .filter(l2Norm(col(vecCol)) > 0.0)
    .withColumn("__n", l2Norm(col(vecCol)))
    .select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double") / col("__n")).as("nv"))

  /** Residual view (id, cell, rq): each normalized-then-e6-quantized
    * vector minus its assigned cell's centroid components — exact long
    * subtraction, the PQ training/encode input of [[ivfPqResidualTopK]].
    * `centroids` must come from [[kMeansCentroidsE6]] over
    * [[normalizedView]] of the same corpus.
    */
  def residualView(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cn = normalizedView(corpus, idCol, vecCol)
    val cells = kMeansAssign(cn, centroids, "id", "nv").select("id", "cell")
    cn.select(col("id"), quantE6(col("nv")).as("vq"))
      .join(cells, Seq("id"))
      .join(broadcast(centroids), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("vq"), col("ce"), (a, b) => a - b).as("rq"))
  }

  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, nProbe: Int = 2, numSub: Int = 8, kSub: Int = 32,
      trainIters: Int = 2, trainSample: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None,
      codebooks: Option[DataFrame] = None): DataFrame = {
    val cn = normalizedView(corpus, idCol, vecCol)
    val cents = centroids.getOrElse(kMeansCentroidsE6(cn, numCells,
      trainIters, "id", "nv", trainSample))
    val resid = residualView(corpus, cents, idCol, vecCol)
    val cells = resid.select("id", "cell")
    val cb = codebooks.getOrElse(pqCodebooksE6(resid, numSub, kSub,
      trainIters, "id", "rq", normalize = false, trainSample,
      quantized = true))
    val codes = pqEncode(resid, cb, numSub, "id", "rq",
      normalize = false, quantized = true)

    // query side: nProbe nearest cells, each with the q·c_cell dot the ADC
    // decomposition needs, plus the per-(sub, code) residual LUT
    val cd = cents.select(col("cell"), col("ce"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
    val qn = normalizedView(queries, idCol, vecCol)
    val qScored = qn
      .select(col("id").as("query_id"), col("nv"), quantE6(col("nv")).as("qq"))
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("nv"), col("cd")))
      .filter(col("cent_sim").isNotNull)
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = qScored.withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("cell"),
        graft.expr.LongDot(col("qq"), col("ce")).as("qcdot"))
    val lut = subVectors(
        qn.select(col("id"), quantE6(col("nv")).as("qq")),
        numSub, "id", "qq", normalize = false, quantized = true)
      .select(col("id").as("query_id"), col("sub"), col("sv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        graft.expr.LongDot(col("sv"), col("ce")).as("pdot"))

    val scored = codes.join(cells, Seq("id"))
      .withColumnRenamed("id", "neighbor_id")
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id", "qcdot")
      .agg(sum(col("pdot")).as("rdot"))
      .select(col("query_id"), col("neighbor_id"),
        (col("qcdot") + col("rdot")).as("adc_e12"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_e12").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("adc_e12"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Recall@k — the evaluation harness every approximate-ANN deployment
    * needs ("measure, don't guess"): per query, the fraction of the EXACT
    * top-k that the ANN result recovered, as an integer-exact e6 ratio.
    * Both inputs use the family's (query_id, neighbor_id, ...) contract;
    * one equi-join on small per-query result sets — negligible next to
    * either input pipeline at any scale.
    */
  // ---- Scalar quantization (SQ8) ------------------------------------------

  /** Symmetric signed-byte scalar quantization of the L2-normalized
    * vector: q_i = floor(127·x_i + 0.5) ∈ [−127, 127] (zero-point 0, one
    * global scale — the faiss `SQ8_direct_signed` / int8-inference
    * convention). Sits between raw floats and PQ on the memory/recall
    * curve: 4× compression (byte per dim vs 32× for PQ-8) but
    * near-lossless ranking, because each dimension keeps its own value
    * instead of sharing a codeword.
    *
    * Integer dot of two code vectors = 127²·cosine up to rounding, so
    * ranking needs no dequantization and the whole scoring path is exact
    * long arithmetic (LongDot primitive loop) — SQL-replayable, and on a
    * cluster it's the SIMD-able int8 kernel hardware loves.
    *
    * Zero-norm vectors are excluded (no cosine), mirroring the PQ family.
    */
  def sq8Encode(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vectors.filter(l2Norm(col(vecCol)) > 0.0)
      .withColumn("__n", l2Norm(col(vecCol)))
      .select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") / col("__n") * 127.0 + lit(0.5))
            .cast("long")).as("codes"))

  /** Top-k by SQ8 integer dot product — the compressed-domain full-scan
    * baseline (the only corpus-sized input after encode is the byte
    * codes). The scale path routes queries through IVF cells first
    * exactly as [[ivfTopKTrained]] does for exact scoring; this flat
    * variant is the correctness/recall anchor for that composition.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = sq8Encode(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("codes").as("cc"))
    val q = sq8Encode(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("codes").as("qc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score_i8", graft.expr.LongDot(col("qc"), col("cc")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_i8").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("score_i8"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF-routed SQ8 (the faiss "IVF,SQ8" production shape): corpus rows
    * are assigned to their nearest trained centroid cell in the same
    * single pass that computes their byte codes; queries probe their
    * nProbe nearest cells and score ONLY those cells' codes with the
    * integer dot. Combines the two scale levers — the candidate set
    * shrinks by ~numCells/nProbe via routing, and the scan that remains
    * touches 4×-compressed codes instead of floats. Training is shared
    * with [[ivfTopKTrained]] (same centroids artifact → train once,
    * serve every index variant).
    */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, trainIters: Int = 2, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(
      kMeansCentroidsE6(corpus, numCells, trainIters, idCol, vecCol))
    val cd = cents.select(col("cell"),
      transform(col("ce"), c => c.cast("double") / 1e6).as("cd"))
    // one pass over the corpus: norm → codes → broadcast-centroid argmax;
    // the ONLY corpus-sized state after this is (id, cell, codes)
    def encoded(df: DataFrame, outId: String): DataFrame = df
      .filter(l2Norm(col(vecCol)) > 0.0)
      .withColumn("__n", l2Norm(col(vecCol)))
      .select(col(idCol).as(outId), col(vecCol).as("__v"),
        transform(col(vecCol),
          x => floor(x.cast("double") / col("__n") * 127.0 + lit(0.5))
            .cast("long")).as("codes"))
    val cells = encoded(corpus, "neighbor_id")
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("__v"), col("cd")))
      .filter(col("cent_sim").isNotNull)
      .groupBy("neighbor_id")
      .agg(max_by(struct(col("codes"), col("cell")),
        struct(col("cent_sim"), (-col("cell")).as("__nc"))).as("__r"))
      .select(col("neighbor_id"), col("__r.codes").as("cc"),
        col("__r.cell").as("cell"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = encoded(queries, "query_id")
      .crossJoin(broadcast(cd))
      .withColumn("cent_sim", cosineE6Mixed(col("__v"), col("cd")))
      .filter(col("cent_sim").isNotNull)
      .withColumn("__cr", row_number().over(cw))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("codes").as("qc"), col("cell"))
    val scored = cells.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score_i8", graft.expr.LongDot(col("qc"), col("cc")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_i8").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("score_i8"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Matryoshka / progressive-refinement ANN (Kusupati et al., NeurIPS'22
    * nested-prefix representations): shortlist with the first
    * `prefixDims` coordinates of the vector — a prefixDims/dims-cost dot
    * product — then exact-rerank only the `shortlist` candidates with the
    * full vector. Pair with [[recallAtK]] so the prefix's ranking
    * fidelity is a measured quantity, like the PQ/SQ variants. Scale
    * shape: the prefilter is [[bruteForceTopK]]'s broadcast-thin pass at
    * a fraction of the arithmetic, and the rerank touches `shortlist`
    * rows per query; at corpus scale route the prefilter through the
    * trained IVF cells first — the two refinements compose.
    */
  def prefixTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, prefixDims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val q = queries.select(col(idCol).as("query_id"),
      expr(s"slice($vecCol, 1, $prefixDims)").as("qt"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      expr(s"slice($vecCol, 1, $prefixDims)").as("ct"))
    val pre = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("pre_e6", cosineE6(col("qt"), col("ct")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pre_e6").desc, col("neighbor_id"))
    val short = pre.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = short
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    topKSelect(rescored, k)
  }

  /** Dominant principal direction of the embedding corpus by `rounds`
    * synchronous power-iteration steps (v ← Xᵀ(Xv), renormalized), in
    * pure fixed-point integers so the trajectory replays digit-for-digit
    * in any engine: elements quantize to e6, the per-row projection
    * u = Σ_d x·v rescales by DIV 1e8, the per-dim update w = Σ_i x·u
    * renormalizes by its max |w|. Everything is dataflow — explode to
    * (id, dim, x) triples, one equi-join + one aggregation per half-step,
    * a 64-row broadcast for v — no driver-side vector, no single
    * partition anywhere; the unrolled fixed horizon keeps the loop
    * action-free like pageRank's. Integer-range bound: n·max|x_e6|·
    * max|u| must stay under 2^63 — with the DIV-1e8 projection rescale
    * that holds to ~10^7 rows; beyond that, train on a bounded
    * [[hashSample]] like the k-means/PQ artifacts do (the direction is a
    * model, not a per-row statistic).
    */
  def powerIterationE6(vectors: DataFrame, rounds: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    powerRoundsE6(explodeE6(vectors, idCol, vecCol), rounds)
      .select(col("dim"), col("v").as("v_e6")).orderBy("dim")

  /** (id, dim, x) e6-quantized triples of an embedding frame. */
  private def explodeE6(vectors: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vectors
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("dim", "xf")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        floor(col("xf").cast("double") * 1e6).cast("long").as("x"))

  /** The fixed-point power-iteration loop of [[powerIterationE6]] over an
    * arbitrary (id, dim, x) triple frame — shared with the deflated
    * second-component pass. Returns (dim, v) e6-normalized.
    */
  private def powerRoundsE6(x: DataFrame, rounds: Int): DataFrame = {
    var v = x.select("dim").distinct().withColumn("v", lit(1000000L))
    var r = 0
    while (r < rounds) {
      val u = x.join(broadcast(v), Seq("dim"))
        .groupBy("id").agg(sum(col("x") * col("v")).as("u12"))
        .select(col("id"), expr("u12 DIV 100000000").as("u"))
      val w = x.join(u, Seq("id"))
        .groupBy("dim").agg(sum(col("x") * col("u")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("dim"), expr("w DIV greatest(m DIV 1000000, 1)").as("v"))
      r += 1
    }
    v
  }

  /** Top-2 principal directions by power iteration WITH DEFLATION
    * (Hotelling 1933's sequential extraction): v₁ from the raw corpus,
    * then every vector's v₁ component removed —
    *   c_e6(i) = (Σ_d x·v₁) · 10⁶ DIV (Σ_d v₁·v₁),
    *   x′ = x − (c_e6 · v₁) DIV 10⁶
    * — and v₂ from the SAME loop over the residual triples. All of it
    * exact e6/e12 integer arithmetic (Spark DIV and DuckDB // both
    * truncate toward zero, so negative components divide identically),
    * replayed by a doubly-unrolled oracle. The residual frame is just a
    * projected copy of the triples — same partitioning, same join keys —
    * so the second component costs one more pass of the identical shape,
    * and truncation keeps |cos(v₁, v₂)| within a few‰ of 0 (the spec
    * pins it). Returns (dim, v1_e6, v2_e6), one row per dimension.
    */
  def pca2E6(vectors: DataFrame, rounds: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.util.Lineage._
    val x = explodeE6(vectors, idCol, vecCol).truncateLineage() // 2 passes
    val v1 = powerRoundsE6(x, rounds).truncateLineage() // deflate + output
    val n1 = v1.agg(sum(col("v") * col("v")).as("n1"))
    // c = s·10⁶/n1 computed as s DIV (n1 DIV 10⁶): s can reach ~6·10¹³
    // (64 dims × e12 products), so multiplying it by 10⁶ first would
    // overflow a long — pre-truncating the denominator keeps every value
    // in range at a cost of ≤ 1 part in n1/10⁶, replayed identically
    val c = x.join(broadcast(v1), Seq("dim"))
      .groupBy("id").agg(sum(col("x") * col("v")).as("s"))
      .crossJoin(broadcast(n1))
      .select(col("id"), expr("s DIV greatest(n1 DIV 1000000, 1)").as("c"))
    val x2 = x.join(c, Seq("id")).join(broadcast(v1), Seq("dim"))
      .select(col("id"), col("dim"),
        expr("x - (c * v) DIV 1000000").as("x"))
    val v2 = powerRoundsE6(x2, rounds)
    v1.select(col("dim"), col("v").as("v1_e6"))
      .join(v2.select(col("dim"), col("v").as("v2_e6")), Seq("dim"))
      .orderBy("dim")
  }

  /** Binary (1-bit) sign quantization top-k: each 64-dim vector collapses
    * to two 32-bit sign words (dim order = bit order, MSB-first fold), a
    * query ranks candidates by ascending Hamming distance over the xor'd
    * words — 64 bits per vector, the cheapest first-pass filter in the
    * quantization family (1 bit/dim vs SQ8's 8 and PQ's sub-codes), and
    * the standard shortlist stage before an exact or SQ8 rerank at
    * extreme scale. Two popcounts per pair, fully codegen-friendly.
    *
    * CONTRACT: input vectors must be exactly 64-dim (the two 32-bit sign
    * words are the dimension count) — enforced per row: a shorter or
    * longer vector raises an error instead of silently folding or
    * dropping dimensions into wrong Hamming rankings.
    */
  def binarySignTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def word(lo: Int): Column = expr(
      s"""CASE WHEN size($vecCol) = 64
         |  THEN aggregate(slice($vecCol, $lo, 32), 0L, (acc, x) -> acc * 2 + CASE WHEN x > 0 THEN 1L ELSE 0L END)
         |  ELSE raise_error(concat('binarySignTopK requires 64-dim vectors, got ',
         |    CAST(size($vecCol) AS STRING))) END""".stripMargin)
    def words(df: DataFrame, id: String, p: String): DataFrame =
      df.select(col(idCol).as(id), word(1).as(p + "0"), word(33).as(p + "1"))
    val q = words(queries, "query_id", "q")
    val c = words(corpus, "neighbor_id", "c")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", expr("bit_count(q0 ^ c0) + bit_count(q1 ^ c1)").cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("neighbor_id"), col("hamming"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** k-NN graph construction, NN-descent style (Dong, Moses & Li,
    * WWW'11): seed candidate edges from hyperplane-LSH buckets, exact-
    * score to an initial top-k graph, then ONE neighbor-of-neighbor
    * refinement round — symmetrize, self-join the graph, rescore the
    * union, keep top-k. The graph is the build artifact HNSW/NSG-class
    * ANN indexes start from. Scale shape: bucketed seeding (never
    * all-pairs); after round 0 every node's fan-out is ≤ 2k, so the
    * refinement contributes ≤ 4k² FRESH candidates per node — and round-0
    * scores are reused, never recomputed, so each candidate pair (bucket
    * pairs included) is exact-scored exactly once even under bucket skew.
    */
  def knnGraph(vectors: DataFrame, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"),
      hyperplaneSignature(col(vecCol), bits).as("bucket"))
    val cand0 = v.select(col("bucket"), col("id").as("query_id"))
      .join(v.select(col("bucket"), col("id").as("neighbor_id")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    def score(cand: DataFrame): DataFrame = cand
      .join(vectors.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        Seq("query_id"))
      .join(vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .withColumn("sim_e6", cosineE6(col("qv"), col("cv")))
    // round-0 bucket-pair scores materialize ONCE (localCheckpoint) and
    // feed both the initial graph and the final top-k; the refinement
    // round exact-scores only pairs NOT already scored (anti-join), so a
    // hot LSH bucket's quadratic pair set is never scored twice
    val s0 = score(cand0)
      .select("query_id", "neighbor_id", "sim_e6").truncateLineage(eager = true)
    val knn0 = topKSelect(s0, k).select("query_id", "neighbor_id")
    val sym = knn0.unionAll(knn0.select(col("neighbor_id").as("query_id"),
      col("query_id").as("neighbor_id")))
    val non = sym.as("x")
      .join(sym.withColumnsRenamed(Map("query_id" -> "mid", "neighbor_id" -> "nn")),
        col("neighbor_id") === col("mid"))
      .select(col("query_id"), col("nn").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val fresh = sym.unionAll(non).distinct()
      .join(s0.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
    topKSelect(s0.unionAll(
      score(fresh).select("query_id", "neighbor_id", "sim_e6")), k)
  }

  def recallAtK(ann: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(ann.select(col("query_id"), col("neighbor_id"),
        lit(1).as("__hit")), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
      .select(col("query_id"), col("n_exact"), col("n_hits"),
        expr("n_hits * 1000000 DIV n_exact").as("recall_e6"))

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-blocked:
    * same plan shape as MinHash-LSH dedup but over vectors.
    */
  def embeddingNearDupPairs(vectors: DataFrame, minCosine: Double,
      bits: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), bits).as("bucket"))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineE6(col("va"), col("vb")).as("cos_e6"))
      .filter(col("cos_e6") >= math.floor(minCosine * 1e6).toLong)
  }

  /** All bit masks over `bits` positions with popcount <= flips, smallest
    * popcount first (0 = the exact bucket). flips=1 → bits+1 probes;
    * flips=2 adds the C(bits,2) two-bit flips.
    */
  def probeMasks(bits: Int, flips: Int): Seq[Long] = {
    def combos(start: Int, remaining: Int, acc: Long): Seq[Long] =
      if (remaining == 0) Seq(acc)
      else (start until bits).flatMap(b => combos(b + 1, remaining - 1, acc | (1L << b)))
    // flips <= 0 → exact bucket only (never an empty probe list)
    (0 to math.max(0, math.min(flips, bits))).flatMap(f => combos(0, f, 0L))
  }

  /** Exact near-duplicate pairs by brute force (oracle-expressible path,
    * for correctness checking the LSH variant and for small corpora).
    */
  def exactNearDupPairs(vectors: DataFrame, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineE6(col("va"), col("vb")).as("cos_e6"))
      .filter(col("cos_e6") >= math.floor(minCosine * 1e6).toLong)
  }
}
