package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the Structured Streaming capability the rest of
  * the streaming surface (windows, sessions, dedup, sketches) composes
  * with: correlating two live event streams within a time bound, the
  * canonical case being ad attribution (which impression led to this
  * click?).
  *
  * Semantics and state model: an inner stream-stream join must buffer
  * both sides until the time-bound condition can no longer match — the
  * watermark plus the join's time range bound that buffer, so state is
  * O(rate × horizon), not unbounded. Both inputs therefore carry
  * `withWatermark`, and the join predicate carries the explicit
  * event-time range; without the range the state store would grow
  * forever. On batch frames the same function degrades to a plain
  * interval join (watermarks are a no-op in batch), which is what the
  * `ev_attribution` oracle checks row-for-row.
  */
object Joins {

  /** Attribute each click to every impression by the same user within
    * `within` BEFORE the click (inclusive bounds on both ends). Returns
    * (click_id, imp_id, user_id, imp_ts, click_ts); downstream pickers
    * (last-touch = max imp_ts per click) are one aggregation away.
    *
    * Works unchanged over streaming inputs (state bounded by the
    * watermark + range — JoinsSpec drives it through MemoryStream) and
    * batch inputs (plain interval join, oracle-compared).
    */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", within)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    clk.join(imp,
        col("user_id") === col("imp_user") &&
          col("imp_ts") <= col("click_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"interval $within"))
      .select(col("click_id"), col("imp_id"), col("user_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** Left-outer face of [[attributionJoin]], impressions-major: every
    * impression emits, matched or not. Streaming semantics are the point:
    * an unmatched impression CANNOT be emitted when it arrives (a matching
    * click may still come), so the state store holds it until the global
    * watermark passes `imp_ts + within` — only then does the null-extended
    * row flush. State stays O(rate × horizon) like the inner form; the
    * outer rows just ride the same eviction. Spark's global watermark is
    * the MIN across both inputs, so a stalled click stream also stalls
    * impression flushes — by design (a click could still arrive). On batch
    * frames this degrades to a plain left interval join (the oracle face).
    */
  def attributionJoinOuter(impressions: DataFrame, clicks: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", within)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    imp.join(clk,
        col("user_id") === col("imp_user") &&
          col("imp_ts") <= col("click_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"interval $within"),
        "leftOuter")
      .select(col("imp_id"), col("imp_user").as("user_id"),
        col("imp_ts"), col("click_id"), col("click_ts"))
  }

  /** Stream-static enrichment: every streaming event left-joined to a
    * static dimension on `keys` — the third join mode Structured
    * Streaming supports (besides batch and stream-stream), and the
    * stateless one: the dimension is broadcast per micro-batch, so no
    * state store, no watermark, and dimension updates picked up by
    * re-reading the static source each batch (Spark re-plans the static
    * side per micro-batch). Unmatched events keep flowing with nulls —
    * an enrichment miss must never drop a fact.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Last-touch reduction over [[attributionJoin]]: the single most recent
    * impression per click (ties broken by largest imp_id for determinism).
    * One map-side-combinable max_by aggregation — no ranking window.
    */
  def lastTouch(attributed: DataFrame): DataFrame =
    attributed.groupBy("click_id")
      .agg(max(struct(col("imp_ts"), col("imp_id"))).as("__best"),
        count(lit(1)).as("n_candidates"))
      .select(col("click_id"), col("__best.imp_id").as("imp_id"),
        col("n_candidates"))
}
