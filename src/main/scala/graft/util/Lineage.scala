package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative dataflows, with a cluster
  * fault-tolerance escape hatch.
  *
  * Every fixed-round algorithm in this library (label propagation,
  * Δ-stepping SSSP, PageRank, the MinHash/IVF loops, …) truncates its
  * per-round lineage so the plan doesn't grow unboundedly. The DEFAULT
  * mechanism is `localCheckpoint` — executor-local RDD blocks, no
  * distributed filesystem round-trip, the right call at local[32] and on
  * healthy clusters where rounds are short. Its known cost: blocks are NOT
  * replicated, so on a real cluster an executor loss mid-algorithm kills
  * the job ("Checkpoint block ... not found" — lineage was truncated and
  * cannot be recomputed). That is a RESTART-the-job failure mode, not a
  * wrong-answer one.
  *
  * The escape hatch for long multi-round jobs at cluster scale: set a
  * checkpoint directory AND flip the conf below, and every truncation in
  * the library becomes a RELIABLE checkpoint (written to the checkpoint
  * dir, survives executor loss — Spark's own fault-tolerance contract):
  *
  * {{{
  * spark.sparkContext.setCheckpointDir("hdfs:///tmp/graft-ckpt")
  * spark.conf.set(Lineage.ReliableConfKey, "true")
  * }}}
  *
  * Both switches are required on purpose: the conf alone without a
  * checkpoint dir would throw deep inside an algorithm (Spark requires the
  * dir), and a checkpoint dir alone shouldn't silently tax local runs with
  * filesystem writes. With either missing, behavior is exactly the
  * pre-existing `localCheckpoint` path — the bench-measured default.
  */
object Lineage {

  /** Runtime conf key opting every library-internal lineage truncation
    * into reliable (checkpoint-dir-backed) checkpoints.
    */
  val ReliableConfKey = "spark.graft.checkpoint.reliable"

  implicit final class LineageOps(private val df: DataFrame) extends AnyVal {

    /** Drop-in replacement for `localCheckpoint(eager)`: truncates lineage
      * executor-locally by default, reliably when [[ReliableConfKey]] is
      * true and a checkpoint dir is set. `eager = false` keeps the
      * one-action discipline (the terminal action materializes the
      * checkpoint); `eager = true` materializes immediately for frames the
      * caller reads several times in the same round.
      */
    def truncateLineage(eager: Boolean = false): DataFrame = {
      val spark = df.sparkSession
      val reliable = spark.conf.getOption(ReliableConfKey)
        .exists(_.equalsIgnoreCase("true")) &&
        spark.sparkContext.getCheckpointDir.isDefined
      val ck = if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
      // Cap the carried-over stats: in iterative loops the origin plans'
      // join-product sizeInBytes COMPOUNDS across rounds' checkpoints and
      // the driver drowns in huge-BigInt stats arithmetic (see
      // GraftBridge.capCheckpointStats). Values at the cap plan identically.
      org.apache.spark.sql.GraftBridge.capCheckpointStats(ck)
    }
  }
}
