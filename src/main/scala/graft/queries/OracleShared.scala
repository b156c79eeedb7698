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

/** Oracle-SQL builders used by MORE THAN ONE domain registrar (winnow
  * fingerprints: text + dedup; md5 head-32 parse: sketches, LSH, bloom;
  * bloom positions: join + text; simhash CTEs: dedup + text curation).
  * Pure move from the former monolithic Queries.scala.
  */
private[graft] object OracleShared {

  private[queries] lazy val WINNOW_CTES: String = {
    val powers = Seq(923521L, 29791L, 961L, 31L, 1L)
    val gramHash = powers.zipWithIndex.map { case (p, t) =>
      if (p == 1L) s"unicode(substr(nrm, pos + $t, 1))"
      else s"unicode(substr(nrm, pos + $t, 1)) * $p"
    }.mkString(" + ")
    s"""nd AS (SELECT doc_id AS id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nrm
       |       FROM documents),
       |nn AS (SELECT id, nrm, length(nrm) - 4 AS m FROM nd WHERE length(nrm) >= 5),
       |grams AS (SELECT id, m, pos, $gramHash AS h
       |          FROM (SELECT id, nrm, m, unnest(range(1, m + 1)) AS pos FROM nn)),
       |wins AS (SELECT id, h, pos,
       |           unnest(range(greatest(pos - 3, 1), least(pos, greatest(m - 3, 1)) + 1)) AS win
       |         FROM grams),
       |sel AS (SELECT id, win, h FROM (
       |          SELECT id, win, h,
       |            row_number() OVER (PARTITION BY id, win ORDER BY h ASC, pos DESC) AS rn
       |          FROM wins) WHERE rn = 1),
       |fp AS (SELECT DISTINCT id, h FROM sel)""".stripMargin
  }

  /** Oracle for dedup_minhash_pairs — the full MinHash-LSH pipeline in
    * DuckDB: word 3-shingles, md5-head base hashes, the same 64 (a,b)
    * coefficients (generated from the one shared
    * MinHashSig.coefficients(64, 42) table), per-permutation minima,
    * 16 bands × 4 rows joined on the exact band values, then the
    * signature-agreement fraction ≥ 0.3.
    */
  /** First 8 hex chars of a VARCHAR column `mh` (an md5 digest) parsed as
    * a base-16 BIGINT — the SQL mirror of MinHashSig.md5Head32 /
    * Sketch.hashPoint32.
    */
  private[queries] def hexHead32Sql: String = hx("mh")

  /** The document shingle-construction CTE pair mirroring Dedup.shingles
    * (whitespace-collapsed lowercased text, k=3 word windows from every
    * position, list_distinct, short docs yield their whole-text shingle,
    * empties dropped) — the ONE SQL copy, prefix-parameterized so every
    * oracle that needs doc shingles shares it and a convention change can
    * never leave a per-file copy stale. Emits `<p>tk(doc_id, ws)` and
    * `<p>sh0(doc_id, s)`.
    */
  private[queries] def shingleCtes(p: String): String =
    s"""${p}tk AS (SELECT doc_id,
       |    regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
       |  FROM documents),
       |${p}sh0 AS (SELECT doc_id, list_distinct(list_filter(
       |          [array_to_string(ws[CAST(i AS INT):CAST(i AS INT) + 2], ' ')
       |           FOR i IN generate_series(1, greatest(len(ws) - 3, 0) + 1)],
       |          x -> len(x) > 0)) AS s FROM ${p}tk)""".stripMargin

  /** [[hexHead32Sql]] generalized to ANY md5-digest SQL expression — the
    * one definition of the head-32 expansion, so a convention change can
    * never leave a per-file copy stale.
    */
  private[queries] def hx(mh: String): String = hxSlice(mh, "1", 8)

  /** [[hx]] generalized to an arbitrary start position (any SQL integer
    * expression) and slice width in hex chars — the ONE definition of the
    * hex-nibble decode (hx itself is the position-1, width-8 instance),
    * for oracles that read several independent uniforms out of a single
    * md5 digest.
    */
  private[queries] def hxSlice(mh: String, posSql: String, chars: Int): String =
    (0 until chars).map { c =>
      val mult = 1L << (4 * (chars - 1 - c))
      s"(strpos('0123456789abcdef', substr($mh, ($posSql) + $c, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** UNION ALL of the k per-row Bloom positions of column `fp` from table
    * `src` — the SQL mirror of Bloom.positions (md5("r#" || fp) head-32
    * mod m), with `extra` columns carried through.
    */
  private[queries] def bloomPosSql(src: String, m: Int, extra: String = ""): String = {
    val ex = if (extra.isEmpty) "" else s"$extra, "
    (0 until BLOOM_K).map { r =>
      s"""SELECT $ex($hexHead32Sql) % $m AS pos
         |  FROM (SELECT ${ex}md5('$r#' || fp) AS mh FROM $src)""".stripMargin
    }.mkString("\n  UNION ALL\n")
  }

  /** Oracle for text_bloom_blocklist: the filter's set bits, every probe's
    * k positions, and the all-k-present test re-derived bit-for-bit —
    * false positives and all.
    */
  private[queries] lazy val SIMHASH_CTES: String = {
    val digitCols = (0 until 16).map(c =>
      s"strpos('0123456789abcdef', substr(mh, ${c + 1}, 1)) - 1 AS d$c").mkString(",\n       ")
    val sumCols = (0 until 64).map { j =>
      s"sum(CASE WHEN (d${j / 4} >> ${j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n       ")
    val digitRecon = (0 until 16).map { c =>
      val terms = (0 until 4).map(k =>
        s"(CASE WHEN b${4 * c + k} > 0 THEN ${1 << k} ELSE 0 END)").mkString(" + ")
      s"$terms AS dg$c"
    }.mkString(",\n       ")
    val hexConcat = (0 until 16).map(c =>
      s"substr('0123456789abcdef', dg$c + 1, 1)").mkString(" || ")
    s"""toks AS (
       |  SELECT id, w FROM (
       |    SELECT doc_id AS id,
       |      unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS w
       |    FROM documents) WHERE w <> ''
       |),
       |hh AS (SELECT id, md5(w) AS mh FROM toks),
       |dd AS (SELECT id,
       |       $digitCols
       |       FROM hh),
       |ss AS (SELECT id,
       |       $sumCols
       |       FROM dd GROUP BY id),
       |sigd AS (SELECT id,
       |       $digitRecon
       |       FROM ss),
       |sigs AS (SELECT id, $hexConcat AS sig FROM sigd)""".stripMargin
  }

  /** Oracle for dedup_simhash_pairs: exact O(n²) Hamming filter over the
    * sign digits — equal to the banded join because 4 disjoint bands make
    * Hamming ≤ 3 pigeonhole-lossless.
    */
  /** Hamming distance between two sign-digit rows aliased a and b. */
  private[queries] def simhashHamSql: String =
    (0 until 16).map(c => s"bit_count(xor(a.dg$c, b.dg$c))").mkString(" + ")
}
