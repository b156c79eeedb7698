package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the assumption the sim oracles lean on: SimQueries' qb sampler
  * (`vec_id % 50 = 0` capped at QBATCH_CAP=64) is mirrored into BASE-table
  * oracle CTEs as `ORDER BY vec_id LIMIT 64`, but derived probe/truth CTEs
  * deliberately carry only the `% 50` filter — sound ONLY while every test
  * scale factor yields at most 64 sampled vec_ids, in the base corpus AND
  * the clustered twin. If a future testdata generation breaks this bound,
  * Spark (capped) and DuckDB (uncapped) would silently diverge on every
  * derived-CTE sim oracle; this spec turns that silent divergence into a
  * named failure. (r9 ADVICE item #1.)
  */
class QbCapSpec extends SparkSpec {

  private val cap = 64

  test("qb sample stays under QBATCH_CAP at every test SF, base and clustered") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val nBase = emb.filter(pmod(col("vec_id"), lit(50)) === 0).count()
      assert(nBase <= cap,
        s"$sf: $nBase sampled vec_ids > QBATCH_CAP=$cap — derived oracle " +
          "CTEs no longer mirror qb; add LIMIT 64 mirrors before trusting " +
          "any sim oracle at this SF")
      val nCl = Similarity.clusteredEmbeddings(emb)
        .filter(pmod(col("vec_id"), lit(50)) === 0).count()
      assert(nCl <= cap, s"$sf clustered twin: $nCl sampled vec_ids > $cap")
    }
  }
}
