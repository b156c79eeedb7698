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
import graft.util.Num.{cents, e6}
import graft.queries.Fixtures._
import graft.queries.OracleShared._
import graft.util.Lineage._

/** Near-duplicate family: winnow containment, exact jaccard/edit
  * distance (labeled oracle paths), MinHash-LSH, the two-stage verified
  * pipeline, simhash, connected components. Pure move.
  */
private[graft] object DedupQueries {

  val qs: Vector[Q] = Vector(
    Q("dedup_winnow_pairs",
      // containment mining over the winnow signatures: hashes appearing in
      // many documents are template/boilerplate grams — dropping them
      // (df > 10) both removes noise pairs AND caps the join's bucket
      // sizes (the winnowing analogue of the MinHash maxBucketSize cap:
      // without it the hot grams make the self-join quasi-quadratic).
      // Then explode → (hash, id), self-equi-join on the hash, keep pairs
      // sharing >= 3 rare hashes. Oracle replays the same pipeline over
      // the SQL-recomputed fingerprint sets.
      (s, d) => Dedup.winnowContainmentPairs(
          tbl(s, d, "documents"), "text", "doc_id")
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $WINNOW_CTES,
              |rare AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 10),
              |kept AS (SELECT fp.id, fp.h FROM fp JOIN rare USING (h))
              |SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
              |FROM kept x JOIN kept y ON x.h = y.h AND x.id < y.id
              |GROUP BY x.id, y.id HAVING count(*) >= 3
              |ORDER BY id_a, id_b""".stripMargin),
      bench = true),

    Q("dedup_shared_spans",
      // exact-substring dedup (Lee et al., ACL 2022) as seed-and-chain:
      // positional 8-gram hashes, df-capped hash equi-join, consecutive
      // matches on one (pair, diagonal) merged into maximal shared spans
      // >= 16 tokens; oracle rebuilds positional grams, replays the cap,
      // the diagonal islands, and the span arithmetic
      (s, d) => Dedup.sharedSpanPairs(tbl(s, d, "documents"),
          n = 8, minTokens = 16, maxDf = 20)
        .orderBy("id_a", "id_b", "start_a", "start_b"),
      Some(
        s"""WITH $SPAN_CTES
           |SELECT id_a, id_b, start_a, start_b, n_tokens FROM sp
           |WHERE n_tokens >= 16
           |ORDER BY id_a, id_b, start_a, start_b""".stripMargin),
      bench = true),

    Q("dedup_span_coverage",
      // the corpus-health dial of exact-substring dedup: per-document
      // share of tokens inside at least one cross-document verbatim span
      // (both sides of every pair count), exact e6 ratio — run before and
      // after scrubbing to see what a pass would reclaim
      (s, d) => Dedup.spanCoverage(tbl(s, d, "documents"),
          n = 8, minTokens = 16, maxDf = 20)
        .orderBy("doc_id"),
      Some(
        s"""WITH $SPAN_CTES,
           |${spanMergeCtes("ab")},
           |cov AS (SELECT id, CAST(sum(e - s) AS BIGINT) AS covered FROM mg GROUP BY id),
           |tc AS (SELECT doc_id AS id,
           |    CASE WHEN length(trim(text)) = 0 THEN 0
           |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
           |  FROM documents)
           |SELECT tc.id AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(COALESCE(covered, 0) AS BIGINT) AS dup_tokens,
           |  CAST(CASE WHEN n_tokens = 0 THEN 0
           |       ELSE COALESCE(covered, 0) * 1000000 // n_tokens END AS BIGINT) AS dup_ratio_e6
           |FROM tc LEFT JOIN cov ON cov.id = tc.id
           |ORDER BY doc_id""".stripMargin)),

    Q("dedup_remove_spans",
      // the write side of exact-substring dedup (Lee et al., ACL 2022):
      // every maximal shared span is CUT from the greater-id document of
      // its pair, so exactly one copy of each repeated passage survives;
      // oracle replays the merged intervals and the positional splice
      (s, d) => Dedup.removeSharedSpans(tbl(s, d, "documents"),
          n = 8, minTokens = 16, maxDf = 20)
        .orderBy("doc_id"),
      Some(
        s"""WITH $CLEAN_TEXT_CTES
           |SELECT id AS doc_id, clean_text, n_tokens, n_removed_tokens
           |FROM cleaned ORDER BY doc_id""".stripMargin)),

    Q("dedup_cdc_chunks",
      // content-defined chunking census, the storage-level dedup face:
      // token streams cut where a positional 8-gram hash ≡ 0 (mod 16) —
      // the LBFS/FastCDC cut rule, boundaries follow content so an early
      // insertion shifts one chunk, not every downstream block — then the
      // top-20 most-duplicated chunk fingerprints across the corpus.
      // Fingerprint = order-sensitive modular fold of the chunk's gram
      // hashes; the oracle replays grams, cuts, fold, and ranking.
      (s, d) => Dedup.cdcChunks(tbl(s, d, "documents"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("id")).as("n_docs"),
          max(col("n_grams")).as("n_grams"))
        .filter(col("n_occurrences") >= 2)
        .orderBy(col("n_occurrences").desc, col("fp"))
        .limit(20),
      Some(
        s"""WITH $CDC_CTES
           |SELECT f AS fp, count(*) AS n_occurrences,
           |  count(DISTINCT id) AS n_docs, CAST(max(n_grams) AS BIGINT) AS n_grams
           |FROM cfp GROUP BY f HAVING count(*) >= 2
           |ORDER BY n_occurrences DESC, fp LIMIT 20""".stripMargin)),

    Q("dedup_cdc_ratio",
      // the corpus-level CDC dial: what share of content-defined chunks
      // are redundant copies — the number a chunk-store dedup layer would
      // reclaim. One aggregation over the chunk table.
      (s, d) => Dedup.cdcChunks(tbl(s, d, "documents"))
        .agg(count(lit(1)).as("total_chunks"),
          countDistinct(col("fp")).as("distinct_chunks"))
        .select(col("total_chunks"), col("distinct_chunks"),
          expr("(total_chunks - distinct_chunks) * 1000000 DIV total_chunks")
            .as("dup_ratio_e6"))
        .orderBy("total_chunks"),
      Some(
        s"""WITH $CDC_CTES
           |SELECT count(*) AS total_chunks, count(DISTINCT f) AS distinct_chunks,
           |  (count(*) - count(DISTINCT f)) * 1000000 // count(*) AS dup_ratio_e6
           |FROM cfp ORDER BY total_chunks""".stripMargin)),

    // ---- LLM ops: dedup -------------------------------------------------------

    Q("dedup_jaccard_pairs",
      (s, d) => Dedup.jaccardNearDupPairs(tbl(s, d, "documents"),
          "text", "doc_id", "lang", minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), e6(col("jaccard")).as("jaccard_e6"))
        .orderBy("id_a", "id_b"),
      Some(JACCARD_SQL),
      bench = true),

    Q("dedup_containment_bottomk",
      // ASYMMETRIC containment search: "is doc A mostly inside doc B?" —
      // the quote/subset detector Jaccard dedup systematically misses
      // (a paragraph quoted inside a 100× longer page has Jaccard ≈ 0 but
      // containment ≈ 1; LSH Ensemble / Mash screen solve exactly this).
      // Two stages, both equi-joins: (1) probe — each doc's bottom-16
      // shingle-hash sketch (heap TopK per group, O(k) state, not a sort)
      // joins the full corpus hash list on the hash value; ĉ(A→B) =
      // hits/|sketch A| ≥ ½ proposes candidates at O(k·df) join cost,
      // constant sketch bytes per doc no matter how long A is. (2)
      // confirm — exact hash-set containment |H(A)∩H(B)|/|H(A)|,
      // computed only for proposed pairs (candidate-bounded, the
      // minhash_verified discipline), kept at cont ≥ ½. The estimator's
      // hits column is part of the output, so the oracle mirrors BOTH
      // stages hash-exactly (same md5-head-32 points, same rank-16 cut)
      // rather than stating an independent definition. Shingle
      // construction is Dedup.shingles (k=3 words, list_distinct,
      // short-doc whole-text fallback); containment is over the hashed
      // shingle SET (collisions conflate — identically in both engines).
      (s, d) => {
        val sh = tbl(s, d, "documents")
          .select(col("doc_id").as("id"),
            explode(Dedup.shingles(col("text"), 3)).as("g"))
          .select(col("id"),
            graft.analytics.Sketch.hashPoint32(col("g")).as("h"))
          .distinct()
          .truncateLineage()
        val na = sh.groupBy("id").agg(count(lit(1)).as("na"))
        val bk = graft.plans.TopK
          .perGroup(sh, Seq("id"), -col("h"), col("h"), 16)
          .select(col("id").as("id_a"), col("h"))
        val probe = bk.join(sh.select(col("id").as("id_b"), col("h")), "h")
          .filter(col("id_a") =!= col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("hits"))
        // |sketch A| is min(na, 16) by construction — derived from na,
        // not re-counted from bk
        val cand = probe.join(na.select(col("id").as("id_a"), col("na")), "id_a")
          .withColumn("ka", least(col("na"), lit(16L)))
          .filter(col("hits") * 2 >= col("ka"))
        val inter = cand.select("id_a", "id_b")
          .join(sh.select(col("id").as("id_a"), col("h")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        cand.join(inter, Seq("id_a", "id_b"))
          .filter(col("inter") * 2 >= col("na"))
          .select(col("id_a"), col("id_b"), col("ka"), col("hits"),
            expr("hits * 1000000 DIV ka").as("est_e6"),
            col("na"), col("inter"),
            expr("inter * 1000000 DIV na").as("cont_e6"))
          .orderBy("id_a", "id_b")
      },
      Some(CONTAIN_SQL),
      bench = true),

    Q("dedup_ppjoin_pairs",
      // EXACT Jaccard ≥ 3/5 over 3-word shingles via prefix filtering
      // (SSJoin/PPJoin): rarity-ordered prefixes bound the candidate join,
      // the prefix theorem guarantees completeness, and the oracle states
      // the brute-force DEFINITION — so the gate certifies the optimized
      // algorithm's exactness, not a replay of its steps
      (s, d) => Dedup.ppjoinPairs(tbl(s, d, "documents"),
          tauNum = 3, tauDen = 5)
        .orderBy("id_a", "id_b"),
      Some(PPJOIN_SQL),
      bench = true),

    Q("dedup_minhash_pairs",
      // md5-head base hash + exact slice band keys make every stage of the
      // LSH pair search SQL-reproducible: shingle → 32-bit base hash (first
      // 8 md5 hex chars) → 64 affine perms mod 2^31-1 (same coefficient
      // table as MinHashSig) → 16×4-row band equi-join → signature-
      // agreement estimate. est = eq/64 and eq*15625 are double-exact, so
      // the e6 fixed-point compare is bit-deterministic.
      (s, d) => Dedup.minhashNearDupPairs(tbl(s, d, "documents"),
          "text", "doc_id", minJaccard = 0.3, md5Base = true)
        .select(col("id_a"), col("id_b"), e6(col("est_jaccard")).as("est_jaccard_e6"))
        .orderBy("id_a", "id_b"),
      Some(MINHASH_PAIRS_SQL),
      bench = true),

    Q("dedup_minhash_verified",
      // The standard two-stage scale dedup as ONE verified query: LSH
      // proposes candidates (capped banded equi-join), exact word-set
      // jaccard confirms them with work bounded by the CANDIDATE count —
      // the labeled exact path used the way its label says — then CC makes
      // confirmation transitive and the min-id canonical survives.
      // VerifiedDedupSpec pins the plan shape: the exact stage joins the
      // candidate set, never self-joins the corpus.
      (s, d) => Dedup.minhashVerifiedKeep(
          tbl(s, d, "documents").select("doc_id", "lang", "text"),
          "text", "doc_id", md5Base = true)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(MINHASH_VERIFIED_SQL),
      bench = true),

    Q("dedup_minhash_recall",
      // measure-don't-guess for the propose stage itself: recall and
      // precision of the LSH candidate set (est ≥ 0.3) against EXACT
      // shingle-Jaccard ≥ 3/5 truth from the lossless prefix-filtered
      // join. Recall is the number that justifies trusting banded LSH at
      // 100 TB (where the exact join is the thing you can no longer run);
      // precision quantifies how much the cheap verify stage filters.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val truth = Dedup.ppjoinPairs(docs, tauNum = 3, tauDen = 5)
          .select("id_a", "id_b")
        val prop = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
            minJaccard = 0.3, md5Base = true)
          .select("id_a", "id_b")
        val hit = truth.join(prop, Seq("id_a", "id_b"), "left_semi")
        val tc = truth.agg(count(lit(1)).as("n_truth"))
        val pc = prop.agg(count(lit(1)).as("n_proposed"))
        val hc = hit.agg(count(lit(1)).as("n_hit"))
        tc.crossJoin(broadcast(pc)).crossJoin(broadcast(hc))
          .select(col("n_truth"), col("n_proposed"), col("n_hit"),
            expr("(n_hit * 1000000L) DIV n_truth").as("recall_e6"),
            expr("(n_hit * 1000000L) DIV n_proposed").as("precision_e6"))
      },
      Some(MINHASH_RECALL_SQL)),

    Q("dedup_incremental",
      // the daily-shard production shape: batch (doc_id % 5 = 0) classified
      // against the base corpus (the rest) with NO base-vs-base work —
      // exact min-id fingerprint lookup, then MinHash bands batch×base
      // with fused-agreement verify at est ≥ 0.3. The oracle reuses the
      // full-corpus signature CTEs and keeps only the cross-set pairs.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        Dedup.incrementalDedup(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          minJaccard = 0.3, md5Base = true)
          .orderBy("doc_id")
      },
      Some(INCREMENTAL_SQL),
      bench = true),

    Q("dedup_simhash",
      // md5-bit signature variant: per-token bits from the md5 hex digest
      // instead of xxhash64, so the ±1-sum/sign aggregation is exactly
      // reproducible in DuckDB (same machinery as the fast path — see
      // Dedup.simhashFromBits). Output as hex: DuckDB can't build a
      // bit-63 BIGINT without overflow, digit arithmetic is safe.
      (s, d) => Dedup.simhashMd5(tbl(s, d, "documents"), "text", "doc_id")
        .select(col("id"), Dedup.simhashHex(col("simhash")).as("sig"))
        .orderBy("id"),
      Some(s"WITH $SIMHASH_CTES\nSELECT id, sig FROM sigs ORDER BY id"),
      bench = true),

    Q("dedup_simhash_pairs",
      // Banded Hamming-ball pairs over the md5-bit signatures. With
      // maxHamming=3 the band join uses 4 disjoint 16-bit bands, and by
      // pigeonhole ANY pair within Hamming 3 shares a clean band — the
      // banding is lossless, so the O(n²) hamming-filter oracle computes
      // the exact same pair set the bucketed join does.
      (s, d) => Dedup.simhashNearDupPairsFromSigs(
          Dedup.simhashMd5(tbl(s, d, "documents"), "text", "doc_id"),
          maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b"),
      Some(SIMHASH_PAIRS_SQL)),

    Q("dedup_cc_labels",
      // Transitive near-dup clusters: simhash pairs → connected components
      // by min-label propagation (the correct canonical assignment — the
      // greater-id-drop rule over-drops chains). Oracle computes the same
      // components with a recursive transitive-closure CTE.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
          .orderBy("id")
      },
      Some(CC_SQL),
      bench = true),

    Q("dedup_split_leakage",
      // the classic eval-contamination audit: near-dup clusters whose
      // members straddle train/val/test — a val doc with a train near-twin
      // inflates every metric. CC labels joined to the deterministic
      // split, per-cluster split census, is_leaky = more than one split
      // present. Singletons can't leak and are excluded.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        val cc = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        val sp = docs.select(col("doc_id").as("id"),
          Corpus.splitAssign(col("doc_id")).as("split"))
        cc.join(sp, "id")
          .groupBy("component").agg(
            count(lit(1)).as("n_docs"),
            count(when(col("split") === "train", 1)).as("n_train"),
            count(when(col("split") === "val", 1)).as("n_val"),
            count(when(col("split") === "test", 1)).as("n_test"),
            (countDistinct(col("split")) > 1).as("is_leaky"))
          .filter(col("n_docs") > 1)
          .orderBy("component")
      },
      Some(SPLIT_LEAKAGE_SQL)),

    Q("dedup_split_clustered",
      // the leakage FIX: assign the split per CLUSTER (the component
      // label goes through the same salted-md5 coin the per-doc splitter
      // uses), so near-twins land in the same split by construction.
      // The spec re-runs the leakage audit on this assignment and finds
      // zero leaky clusters.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs)
          .select(col("id").as("doc_id"), col("component"),
            Corpus.splitAssign(col("component")).as("split"))
          .orderBy("doc_id")
      },
      Some(
        s"""$CC_CTES,
           |asg AS (SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component
           |        FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
           |SELECT doc_id, component,
           |  CASE WHEN substr(md5(CAST(component AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
           |       WHEN substr(md5(CAST(component AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
           |       ELSE 'test' END AS split
           |FROM asg ORDER BY doc_id""".stripMargin)),

    Q("dedup_cc_keep",
      // cluster-level dedup, the actionable form of the CC labels: one
      // surviving doc (the min id) per transitive near-dup cluster, via a
      // semi-join against the canonical-id set. The greater-id-drop rule
      // this corrects over-drops chains.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        val labels = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        Dedup.keepClusterCanonical(docs.select("doc_id", "lang"), "doc_id", labels)
          .orderBy("doc_id")
      },
      Some(CC_KEEP_SQL)),

    Q("dedup_cc_keep_best",
      // KEEP-BEST cluster dedup — the survivor is the longest member
      // (n_chars DESC, doc_id ASC), not the arbitrary min id: the
      // production policy when near-dups genuinely differ (keep the
      // full document, drop its truncated mirrors). One struct-ordered
      // max_by per cluster, no ranking window.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        val labels = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        Dedup.keepClusterBest(docs.select("doc_id", "lang", "n_chars"),
            "doc_id", col("n_chars"), labels)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some(CC_KEEP_BEST_SQL)),

    Q("dedup_cluster_sizes",
      // the curator's ops report: near-dup cluster size distribution —
      // how much of the corpus sits in 2-doc mirror pairs vs big
      // boilerplate blobs decides which dedup policy to run. Two thin
      // aggregations over the CC labels (component census → size
      // histogram), linear at any corpus size.
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        val labels = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        docs.select(col("doc_id"))
          .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
          .groupBy("component").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
          .orderBy("cluster_size")
      },
      Some(
        s"""$CC_CTES,
           |comp AS (SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component
           |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
           |cs AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
           |SELECT cluster_size, count(*) AS n_clusters
           |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)),

    Q("dedup_cc_labels_altstar",
      // Same component contract computed by the alternating large-star/
      // small-star algorithm — O(log² n) rounds regardless of diameter,
      // the variant that survives chain-shaped duplicate graphs at scale.
      // Oracled against the identical recursive-CTE truth as
      // dedup_cc_labels (the two engines' outputs must agree exactly).
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val pairs = Dedup.simhashNearDupPairsFromSigs(
            Dedup.simhashMd5(docs, "text", "doc_id"), maxHamming = 3)
          .select("id_a", "id_b")
        Dedup.connectedComponentsAltStar(docs.select(col("doc_id").as("id")), pairs)
          .orderBy("id")
      },
      Some(CC_SQL)),

    // ---- LLM ops: similarity search -------------------------------------------

    Q("dedup_edit_distance_pairs",
      // character-level near-dup complement to the word-set measures:
      // banded levenshtein(l, r, threshold) inside (lang, length-bucket)
      // blocks with the |len diff| <= maxDist necessary-condition pushed
      // into the join predicate. Exact/oracle path (quasi-quadratic in a
      // block) — MinHash/SimHash banding stays the scale path.
      (s, d) => Dedup.editDistancePairs(
          tbl(s, d, "documents"), "text", "doc_id", "lang", maxDist = 64)
        .orderBy("id_a", "id_b"),
      Some(
        """WITH b AS (SELECT doc_id, text, lang, length(text) AS len,
          |            CAST(floor(length(text) / 64) AS BIGINT) AS lb FROM documents),
          |p AS (SELECT doc_id, text, lang, len, unnest([lb, lb + 1]) AS lb FROM b)
          |SELECT least(x.doc_id, y.doc_id) AS id_a, greatest(x.doc_id, y.doc_id) AS id_b,
          |  CAST(min(levenshtein(x.text, y.text)) AS INT) AS dist
          |FROM b x JOIN p y ON x.lang = y.lang AND x.lb = y.lb
          |  AND x.doc_id <> y.doc_id AND abs(x.len - y.len) <= 64
          |GROUP BY 1, 2 HAVING min(levenshtein(x.text, y.text)) <= 64
          |ORDER BY id_a, id_b""".stripMargin)),

    Q("dedup_lsh_curve",
      // the configured MinHash-LSH propose stage's S-curve as a table:
      // P(candidate | jaccard s) = 1 − (1 − s⁴)¹⁶ for the engine's
      // 64-perm / 16-band / 4-row config, evaluated at s = 0.1 … 0.9 in
      // pure fixed point (squarings with e6 DIV) — the operating curve a
      // dedup policy is tuned against, published as data so threshold
      // choices are auditable rather than folklore. Pairs with the
      // MEASURED recall harness (dedup_minhash_recall): theory here,
      // practice there.
      (s, d) => s.range(1, 10)
        .select((col("id") * 100000L).as("s_e6"))
        .withColumn("s2", expr("s_e6 * s_e6 DIV 1000000"))
        .withColumn("s4", expr("s2 * s2 DIV 1000000"))
        .withColumn("q", expr("1000000 - s4"))
        .withColumn("q2", expr("q * q DIV 1000000"))
        .withColumn("q4", expr("q2 * q2 DIV 1000000"))
        .withColumn("q8", expr("q4 * q4 DIV 1000000"))
        .withColumn("q16", expr("q8 * q8 DIV 1000000"))
        .select(col("s_e6"), expr("1000000L - q16").as("detect_ppm"))
        .orderBy("s_e6"),
      Some(
        """WITH s AS (SELECT CAST(unnest(range(1, 10)) * 100000 AS BIGINT) AS s_e6),
          |a AS (SELECT s_e6, s_e6 * s_e6 // 1000000 AS s2 FROM s),
          |b AS (SELECT s_e6, s2 * s2 // 1000000 AS s4 FROM a),
          |c AS (SELECT s_e6, 1000000 - s4 AS q FROM b),
          |d AS (SELECT s_e6, q, q * q // 1000000 AS q2 FROM c),
          |e AS (SELECT s_e6, q2 * q2 // 1000000 AS q4 FROM d),
          |f AS (SELECT s_e6, q4 * q4 // 1000000 AS q8 FROM e),
          |g AS (SELECT s_e6, q8 * q8 // 1000000 AS q16 FROM f)
          |SELECT s_e6, CAST(1000000 - q16 AS BIGINT) AS detect_ppm
          |FROM g ORDER BY s_e6""".stripMargin))
  )

  /** Shared-span CTE chain (n=8, minTokens=16, maxDf=20) ending in
    * `sp(id_a, id_b, start_a, start_b, n_tokens)` — the un-thresholded
    * island aggregation; consumers apply the >= 16 filter. Mirrors
    * Dedup.sharedSpanPairs step for step.
    */
  private lazy val SPAN_CTES: String = spanCtes()

  /** [[SPAN_CTES]] parameterized over the source relation, so compositions
    * can scrub a GATED subset (e.g. the quality-filtered corpus in
    * text_curation_chain_v3) instead of raw `documents`.
    */
  private[queries] def spanCtes(src: String = "documents"): String =
    s"""w AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM $src
       |  WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 8
       |    AND length(trim(text)) > 0),
       |gr AS (SELECT id, i + 1 AS pos,
       |    md5(array_to_string(ws[i + 1: i + 8], ' ')) AS mh
       |  FROM (SELECT id, ws, unnest(range(0, greatest(len(ws) - 8, 0) + 1)) AS i FROM w)
       |  WHERE array_to_string(ws[i + 1: i + 8], ' ') <> ''),
       |g0 AS (SELECT id, pos, ($hexHead32Sql) AS h FROM gr),
       |ok AS (SELECT h FROM g0 GROUP BY h
       |       HAVING count(DISTINCT id) BETWEEN 2 AND 20),
       |g AS (SELECT g0.id, g0.pos, g0.h FROM g0 JOIN ok USING (h)),
       |m AS (SELECT a.id AS id_a, b.id AS id_b, a.pos AS pa, b.pos AS pb,
       |        a.pos - b.pos AS diag
       |      FROM g a JOIN g b ON a.h = b.h AND a.id < b.id),
       |isl AS (SELECT *, pa - row_number() OVER (
       |          PARTITION BY id_a, id_b, diag ORDER BY pa) AS grp FROM m),
       |sp AS (SELECT id_a, id_b, min(pa) AS start_a, min(pb) AS start_b,
       |         count(*) + 7 AS n_tokens
       |       FROM isl GROUP BY id_a, id_b, diag, grp)""".stripMargin

  /** CDC chunk chain ending in `cfp(id, ci, n_grams, f)` — the SQL twin
    * of Dedup.cdcChunks(n=8, divisor=16): positional 8-gram hashes, cut
    * where hash ≡ 0 (mod 16) or at position 0, chunk index by running
    * boundary count, fingerprint by the 0-prepended list_reduce modular
    * fold (first step equals Spark's aggregate-with-init-0 step).
    */
  private[queries] lazy val CDC_CTES: String =
    s"""cw AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents
       |  WHERE length(trim(text)) > 0
       |    AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 8),
       |cgr AS (SELECT id, i AS pos, md5(array_to_string(ws[i + 1: i + 8], ' ')) AS mh
       |  FROM (SELECT id, ws, unnest(range(0, greatest(len(ws) - 8, 0) + 1)) AS i FROM cw)),
       |cg0 AS (SELECT id, pos, ($hexHead32Sql) AS h FROM cgr),
       |cmk AS (SELECT id, pos, h,
       |    CASE WHEN pos = 0 OR h % 16 = 0 THEN 1 ELSE 0 END AS b FROM cg0),
       |cch AS (SELECT id, pos, h, sum(b) OVER (PARTITION BY id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS ci FROM cmk),
       |cfp AS (SELECT id, ci, count(*) AS n_grams,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY pos)),
       |      (a, x) -> ((a * 31) % 1000000007 + x) % 1000000007) AS f
       |  FROM cch GROUP BY 1, 2)""".stripMargin

  /** Span-scrub chain ending in `cleaned(id, clean_text, n_tokens,
    * n_removed_tokens)` — the SQL twin of Dedup.removeSharedSpans, shared
    * by the dedup_remove_spans oracle and the curation-chain composition.
    */
  private[queries] lazy val CLEAN_TEXT_CTES: String = cleanTextCtes()

  private[queries] def cleanTextCtes(src: String = "documents"): String =
    s"""${spanCtes(src)},
       |${spanMergeCtes("b")},
       |tko AS (SELECT id, i + 1 AS p, wso[i + 1] AS tok
       |  FROM (SELECT doc_id AS id,
       |          regexp_split_to_array(trim(text), '\\s+') AS wso,
       |          unnest(range(0, len(regexp_split_to_array(trim(text), '\\s+')))) AS i
       |        FROM $src WHERE length(trim(text)) > 0)),
       |kept AS (SELECT t.id, t.p, t.tok FROM tko t
       |  WHERE NOT EXISTS (SELECT 1 FROM mg
       |                    WHERE mg.id = t.id AND t.p >= mg.s AND t.p < mg.e)),
       |ag AS (SELECT id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
       |         count(*) AS n_kept FROM kept GROUP BY id),
       |tc AS (SELECT doc_id AS id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
       |  FROM $src),
       |cleaned AS (SELECT tc.id, COALESCE(clean_text, '') AS clean_text,
       |    CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST(n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_removed_tokens
       |  FROM tc LEFT JOIN ag ON ag.id = tc.id)""".stripMargin

  /** Merged-interval CTEs over the thresholded spans: `iv(id, s, e)` from
    * the side selection, running-max islands, `mg(id, s, e)` merged.
    */
  private def spanMergeCtes(sides: String): String = {
    val sideSelects = sides.map {
      case 'a' => "SELECT id_a AS id, start_a AS s, start_a + n_tokens AS e FROM spk"
      case 'b' => "SELECT id_b AS id, start_b AS s, start_b + n_tokens AS e FROM spk"
    }.mkString("\n       UNION ALL\n       ")
    s"""spk AS (SELECT * FROM sp WHERE n_tokens >= 16),
       |iv AS (SELECT DISTINCT id, s, e FROM ($sideSelects)),
       |ivn AS (SELECT id, s, e,
       |    CASE WHEN max(e) OVER (PARTITION BY id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR s > max(e) OVER (PARTITION BY id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS nw
       |  FROM iv),
       |ivg AS (SELECT id, s, e, sum(nw) OVER (PARTITION BY id ORDER BY s, e
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |        FROM ivn),
       |mg AS (SELECT id, min(s) AS s, max(e) AS e FROM ivg GROUP BY id, grp)""".stripMargin
  }

  private lazy val MINHASH_CTES: String = {
    val perms = graft.expr.MinHashSig.coefficients(64, 42).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val hexParse = hexHead32Sql
    s"""w AS (SELECT doc_id AS id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
       |  FROM documents),
       |sh AS (SELECT id, unnest(list_distinct(list_filter(
       |    list_transform(range(0, greatest(len(ws) - 3, 0) + 1),
       |      i -> array_to_string(ws[i + 1:i + 3], ' ')),
       |    x -> x <> ''))) AS s FROM w),
       |hv AS (SELECT id, $hexParse AS h FROM (SELECT id, md5(s) AS mh FROM sh)),
       |perms(pk, a, b) AS (VALUES $perms),
       |sig AS (SELECT id, pk, min((h * a + b) % 2147483647) AS v
       |        FROM hv CROSS JOIN perms GROUP BY id, pk),
       |bands AS (SELECT id, pk // 4 AS band, string_agg(v, ',' ORDER BY pk) AS bkey
       |          FROM sig GROUP BY id, pk // 4),
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
       |m AS (SELECT c.id_a, c.id_b, count(*) FILTER (WHERE sa.v = sb.v) AS eq
       |      FROM cand c
       |      JOIN sig sa ON sa.id = c.id_a
       |      JOIN sig sb ON sb.id = c.id_b AND sb.pk = sa.pk
       |      GROUP BY c.id_a, c.id_b)""".stripMargin
  }

  private lazy val MINHASH_PAIRS_SQL: String =
    s"""WITH $MINHASH_CTES
       |SELECT id_a, id_b,
       |  CAST(floor(CAST(eq AS DOUBLE) / 64 * 1000000) AS BIGINT) AS est_jaccard_e6
       |FROM m WHERE CAST(eq AS DOUBLE) / 64 >= 0.3
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle for dedup_incremental: the full-corpus signature/agreement
    * CTEs (signatures depend only on the document, so computing them
    * corpus-wide matches the per-side Spark computation), restricted to
    * cross-set (batch, base) pairs; exact stage is the normalized-md5
    * min-id lookup.
    */
  private lazy val INCREMENTAL_SQL: String =
    s"""WITH $MINHASH_CTES,
       |np AS (SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS id,
       |              CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END AS bid
       |       FROM m
       |       WHERE CAST(eq AS DOUBLE) / 64 >= 0.3
       |         AND ((id_a % 5 = 0) <> (id_b % 5 = 0))),
       |nr AS (SELECT id, min(bid) AS near_of FROM np GROUP BY id),
       |fpt AS (SELECT doc_id,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |be AS (SELECT fp, min(doc_id) AS exact_of FROM fpt
       |       WHERE doc_id % 5 <> 0 GROUP BY fp),
       |bt AS (SELECT doc_id, exact_of FROM fpt LEFT JOIN be USING (fp)
       |       WHERE doc_id % 5 = 0)
       |SELECT bt.doc_id,
       |  CASE WHEN exact_of IS NOT NULL THEN 'exact_dup'
       |       WHEN near_of IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
       |  COALESCE(exact_of, near_of) AS dup_of
       |FROM bt LEFT JOIN nr ON nr.id = bt.doc_id
       |ORDER BY bt.doc_id""".stripMargin

  /** Oracle for dedup_minhash_recall: LSH candidate pairs (MINHASH_CTES,
    * est ≥ 0.3) scored against brute-force exact shingle-Jaccard ≥ 3/5
    * truth (the PPJOIN definition restated with t-prefixed CTE names).
    * Counts and e6 ratios are all integral.
    */
  private lazy val MINHASH_RECALL_SQL: String =
    s"""WITH $MINHASH_CTES,
       |prop AS (SELECT id_a, id_b FROM m WHERE CAST(eq AS DOUBLE) / 64 >= 0.3),
       |${OracleShared.shingleCtes("t")},
       |tsh AS (SELECT doc_id, s, len(s) AS n FROM tsh0 WHERE len(s) >= 1),
       |tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |        CAST(a.n + b.n - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
       |      FROM tsh a JOIN tsh b ON a.doc_id < b.doc_id),
       |truth AS (SELECT id_a, id_b FROM tp WHERE inter * 5 >= uni * 3),
       |hit AS (SELECT t.id_a, t.id_b
       |        FROM truth t JOIN prop p ON t.id_a = p.id_a AND t.id_b = p.id_b)
       |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM prop) AS BIGINT) AS n_proposed,
       |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
       |  CAST(((SELECT count(*) FROM hit) * 1000000)
       |       // (SELECT count(*) FROM truth) AS BIGINT) AS recall_e6,
       |  CAST(((SELECT count(*) FROM hit) * 1000000)
       |       // (SELECT count(*) FROM prop) AS BIGINT) AS precision_e6""".stripMargin

  /** Oracle for dedup_minhash_verified — the full two-stage pipeline:
    * LSH candidates (MINHASH_CTES), exact word-set jaccard confirm
    * restricted to the candidate pairs, recursive-CTE transitive closure
    * over the CONFIRMED pairs, min-id canonical keep.
    */
  private lazy val MINHASH_VERIFIED_SQL: String =
    s"""WITH RECURSIVE $MINHASH_CTES,
       |mcand AS (SELECT id_a, id_b FROM m WHERE CAST(eq AS DOUBLE) / 64 >= 0.3),
       |vws AS (SELECT doc_id AS id,
       |          list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ws
       |        FROM documents),
       |vp AS (SELECT c.id_a, c.id_b
       |       FROM mcand c JOIN vws a ON a.id = c.id_a JOIN vws b ON b.id = c.id_b
       |       WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
       |             (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.5),
       |vedges AS (SELECT id_a AS a, id_b AS b FROM vp UNION SELECT id_b, id_a FROM vp),
       |vreach(a, b) AS (
       |  SELECT a, b FROM vedges
       |  UNION
       |  SELECT r.a, e.b FROM vreach r JOIN vedges e ON r.b = e.a
       |),
       |vlbl AS (SELECT a AS id, least(a, min(b)) AS component FROM vreach GROUP BY a)
       |SELECT d.doc_id, d.lang
       |FROM documents d LEFT JOIN vlbl l ON l.id = d.doc_id
       |WHERE COALESCE(l.component, d.doc_id) = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Shared CTEs for the md5-bit simhash oracle: tokenize → md5 hex digits
    * (d0..d15, 4 bits each) → 64 ±1 sums → sign digits (dg0..dg15) →
    * `sigs(id, sig)` hex string. Mirrors Dedup.simhashMd5 bit for bit.
    */
  private lazy val SIMHASH_PAIRS_SQL: String = {
    val ham = simhashHamSql
    s"""WITH $SIMHASH_CTES
       |SELECT a.id AS id_a, b.id AS id_b, CAST($ham AS BIGINT) AS hamming
       |FROM sigd a JOIN sigd b ON a.id < b.id
       |WHERE $ham <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for text_cms_counts: the same d×w counter matrix from the
    * same md5-derived buckets, min over rows per probe.
    */
  private lazy val CC_CTES: String =
    s"""WITH RECURSIVE $SIMHASH_CTES,
       |prs AS (SELECT a.id AS id_a, b.id AS id_b
       |        FROM sigd a JOIN sigd b ON a.id < b.id
       |        WHERE $simhashHamSql <= 3),
       |edges AS (SELECT id_a AS a, id_b AS b FROM prs
       |          UNION SELECT id_b, id_a FROM prs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |lbl AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)""".stripMargin

  private lazy val CC_SQL: String =
    s"""$CC_CTES
       |SELECT d.doc_id AS id, COALESCE(l.component, d.doc_id) AS component
       |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
       |ORDER BY id""".stripMargin

  /** Oracle for dedup_cc_keep_best: per component the max-n_chars member
    * (ties → min doc_id) survives; singletons are their own component.
    */
  private lazy val CC_KEEP_BEST_SQL: String =
    s"""$CC_CTES,
       |comp AS (SELECT d.doc_id, d.n_chars,
       |    COALESCE(l.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
       |best AS (SELECT component, max(n_chars) AS bq FROM comp GROUP BY component),
       |win AS (SELECT c.component, min(c.doc_id) AS doc_id
       |  FROM comp c JOIN best b ON b.component = c.component AND c.n_chars = b.bq
       |  GROUP BY c.component)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN win w ON w.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Oracle for dedup_split_leakage: the CC closure joined to the salted
    * split assignment, per-cluster split census over multi-doc clusters.
    */
  private lazy val SPLIT_LEAKAGE_SQL: String =
    s"""$CC_CTES,
       |asg AS (SELECT d.doc_id AS id,
       |    COALESCE(l.component, d.doc_id) AS component,
       |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '#graft'), 1, 8) < 'e6666666' THEN 'train'
       |         WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || '#graft'), 1, 8) < 'f3333333' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
       |SELECT component, count(*) AS n_docs,
       |  CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT) AS n_train,
       |  CAST(count(*) FILTER (WHERE split = 'val') AS BIGINT) AS n_val,
       |  CAST(count(*) FILTER (WHERE split = 'test') AS BIGINT) AS n_test,
       |  count(DISTINCT split) > 1 AS is_leaky
       |FROM asg GROUP BY component HAVING count(*) > 1
       |ORDER BY component""".stripMargin

  /** Oracle for dedup_cc_keep: the docs whose id IS their component's
    * minimum label — exactly one survivor per transitive cluster.
    */
  private lazy val CC_KEEP_SQL: String =
    s"""$CC_CTES
       |SELECT d.doc_id, d.lang
       |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
       |WHERE COALESCE(l.component, d.doc_id) = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Oracle for text_stats — mirrors TextStats.documentStats op-for-op. */
  /** Oracle for dedup_ppjoin_pairs: the brute-force definition of "all
    * pairs with shingle-set Jaccard ≥ 3/5" — quadratic is fine for the
    * oracle at test scale, and deliberately NOT the prefix-filter plan:
    * a value match here proves the optimized join is lossless. The
    * shingle construction mirrors Dedup.shingles exactly (collapse
    * whitespace, k=3 word windows from every position, short docs yield
    * their whole-text shingle, empties dropped).
    */
  private lazy val PPJOIN_SQL: String =
    s"""WITH ${OracleShared.shingleCtes("")},
      |sh AS (SELECT doc_id, s, len(s) AS n FROM sh0 WHERE len(s) >= 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
      |        CAST(a.n + b.n - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, inter, uni, (inter * 1000000) // uni AS jacc_e6
      |FROM p WHERE inter * 5 >= uni * 3 ORDER BY id_a, id_b""".stripMargin

  /** Oracle for dedup_containment_bottomk — mirrors both pipeline stages
    * hash-exactly (the estimator's hits/ka are output columns, so the
    * oracle must replay the rank-16 sketch cut, not just the exact
    * containment definition). Shingles mirror Dedup.shingles; hash points
    * are the md5-head-32 convention; row_number over distinct h per id is
    * deterministic (no ties within a partition).
    */
  private lazy val CONTAIN_SQL: String = {
    val hg = OracleShared.hx("md5(g)")
    s"""WITH ${OracleShared.shingleCtes("c")},
       |chs AS (SELECT DISTINCT doc_id AS id, $hg AS h
       |        FROM (SELECT doc_id, unnest(s) AS g FROM csh0)),
       |cna AS (SELECT id, count(*) AS na FROM chs GROUP BY id),
       |cbk AS (SELECT id AS id_a, h FROM (
       |        SELECT id, h, row_number() OVER (PARTITION BY id ORDER BY h) AS rk
       |        FROM chs) WHERE rk <= 16),
       |cpr AS (SELECT b.id_a, t.id AS id_b, count(*) AS hits
       |        FROM cbk b JOIN chs t ON t.h = b.h AND t.id <> b.id_a
       |        GROUP BY b.id_a, t.id),
       |ccd AS (SELECT p.id_a, p.id_b, p.hits, n.na,
       |          least(n.na, 16) AS ka
       |        FROM cpr p JOIN cna n ON n.id = p.id_a
       |        WHERE p.hits * 2 >= least(n.na, 16)),
       |cit AS (SELECT c.id_a, c.id_b, count(*) AS inter
       |        FROM ccd c
       |        JOIN chs x ON x.id = c.id_a
       |        JOIN chs y ON y.id = c.id_b AND y.h = x.h
       |        GROUP BY c.id_a, c.id_b)
       |SELECT c.id_a, c.id_b, c.ka, c.hits,
       |  c.hits * 1000000 // c.ka AS est_e6,
       |  c.na, i.inter, i.inter * 1000000 // c.na AS cont_e6
       |FROM ccd c JOIN cit i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |WHERE i.inter * 2 >= c.na
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  private lazy val JACCARD_SQL: String =
    """WITH b AS (
      |  SELECT doc_id AS id, text AS t, lang,
      |    CAST(floor(CAST(length(text) AS DOUBLE) / 64) AS BIGINT) AS lb,
      |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS ws
      |  FROM documents
      |),
      |p AS (SELECT id, lang, ws, unnest([lb, lb + 1]) AS lb FROM b),
      |pairs AS (
      |  SELECT least(x.id, y.id) AS id_a, greatest(x.id, y.id) AS id_b,
      |    CAST(len(list_intersect(x.ws, y.ws)) AS DOUBLE)
      |      / (len(x.ws) + len(y.ws) - len(list_intersect(x.ws, y.ws))) AS j
      |  FROM b x JOIN p y ON x.lang = y.lang AND x.lb = y.lb AND x.id <> y.id
      |),
      |agg AS (SELECT id_a, id_b, max(j) AS j FROM pairs GROUP BY id_a, id_b)
      |SELECT id_a, id_b, CAST(floor(j * 1000000) AS BIGINT) AS jaccard_e6
      |FROM agg WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** name → query fn, for SparkEntry. */}
