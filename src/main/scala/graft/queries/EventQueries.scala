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

/** Event-stream analytics run as batch queries: hourly rollup,
  * sessionization, sliding windows, JSON props. Pure move.
  */
private[graft] object EventQueries {

  val qs: Vector[Q] = Vector(
    Q("ev_hourly_rollup",
      (s, d) => Events.hourlyRollup(eventsTable(s, d))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value_c"), col("avg_value_e6"))
        .orderBy("hour", "event_type"),
      Some(
        s"""WITH $EV_SQL
           |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           |  count(*) AS n,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c,
           |  CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) * 1000000) AS BIGINT) AS avg_value_e6
           |FROM ev GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      bench = true),

    Q("ev_anomaly_days",
      // 3σ spike/dip days in the daily event-count series with ZERO
      // floating point: |x − μ| > 3σ multiplied through by n² so both
      // sides are exact integers — the monitoring alarm an ingest
      // pipeline hangs off this table, bit-replayable in any engine
      (s, d) => Dashboard.anomalyFlags(
          eventsTable(s, d).groupBy(to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")))
        .select(date_format(col("key"), "yyyy-MM-dd").as("day"),
          col("x").as("n_events"), col("dev2"), col("bound9"),
          col("is_anomaly"))
        .orderBy("day"),
      Some(
        s"""WITH $EV_SQL,
           |daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
           |          FROM ev GROUP BY 1),
           |tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
           |        CAST(sum(x * x) AS BIGINT) AS q FROM daily)
           |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(x AS BIGINT) AS n_events,
           |  CAST((n * x - s) * (n * x - s) AS BIGINT) AS dev2,
           |  CAST(9 * (n * q - s * s) AS BIGINT) AS bound9,
           |  (n * x - s) * (n * x - s) > 9 * (n * q - s * s) AS is_anomaly
           |FROM daily CROSS JOIN tot ORDER BY day""".stripMargin)),

    Q("ev_anomaly_deseasonal",
      // seasonally-adjusted anomaly detection: divide the day-of-week
      // index (dash_seasonality's exact e6 profile) OUT of the daily
      // series first, then run the 3σ integer test on the flattened
      // values — a hot-but-normal Monday no longer masks a genuinely
      // anomalous Sunday. Every step integer (two DIVs + the n²-scaled
      // σ compare); weekday() 0=Monday = DuckDB isodow()−1.
      (s, d) => {
        val daily = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("wd", expr("weekday(day)"))
        val byWd = daily.groupBy("wd").agg(sum(col("x")).as("wx"))
        val idx = byWd
          .crossJoin(broadcast(daily.agg(sum(col("x")).as("tot"))))
          .select(col("wd"), expr("(wx * 7 * 1000000L) DIV tot").as("idx_e6"))
        val adj = daily.join(broadcast(idx), Seq("wd"))
          .select(col("day"), expr("(x * 1000000L) DIV idx_e6").as("adj"))
        Dashboard.anomalyFlags(adj)
          .select(date_format(col("key"), "yyyy-MM-dd").as("day"),
            col("x").as("adj_events"), col("dev2"), col("bound9"),
            col("is_anomaly"))
          .orderBy("day")
      },
      Some(
        s"""WITH $EV_SQL,
           |daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
           |          FROM ev GROUP BY 1),
           |d2 AS (SELECT day, x, CAST(isodow(day) - 1 AS INT) AS wd FROM daily),
           |bywd AS (SELECT wd, CAST(sum(x) AS BIGINT) AS wx FROM d2 GROUP BY 1),
           |tt AS (SELECT CAST(sum(x) AS BIGINT) AS tot FROM daily),
           |idx AS (SELECT wd, CAST((wx * 7 * 1000000) // tot AS BIGINT) AS idx_e6
           |        FROM bywd CROSS JOIN tt),
           |adj AS (SELECT day, CAST((x * 1000000) // idx_e6 AS BIGINT) AS adj
           |        FROM d2 JOIN idx USING (wd)),
           |tot2 AS (SELECT count(*) AS n, CAST(sum(adj) AS BIGINT) AS s,
           |         CAST(sum(adj * adj) AS BIGINT) AS q FROM adj)
           |SELECT strftime(day, '%Y-%m-%d') AS day, adj AS adj_events,
           |  CAST((n * adj - s) * (n * adj - s) AS BIGINT) AS dev2,
           |  CAST(9 * (n * q - s * s) AS BIGINT) AS bound9,
           |  (n * adj - s) * (n * adj - s) > 9 * (n * q - s * s) AS is_anomaly
           |FROM adj CROSS JOIN tot2 ORDER BY day""".stripMargin)),

    Q("ev_session_window",
      // the NATIVE session_window operator, batch face: gap-merged
      // windows per user — the same operator the streaming path runs
      // with state, here planned as one aggregation. Window end = last
      // event + gap; an event at exactly prev+gap MERGES (inclusive
      // bound, spec-pinned), so the oracle's islands use strict >.
      (s, d) => Events.sessionWindows(eventsTable(s, d), gap = "30 minutes")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some(
        s"""WITH $EV_SQL,
           |lagged AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev
           |),
           |flagged AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           |    THEN 1 ELSE 0 END AS is_new
           |  FROM lagged
           |),
           |sess AS (
           |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           |  FROM flagged
           |)
           |SELECT user_id,
           |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           |  count(*) AS n_events
           |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_start""".stripMargin)),

    Q("ev_session_summary",
      (s, d) => Events.sessionSummary(eventsTable(s, d), gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"), col("sum_value_c"))
        .orderBy("user_id", "session_seq"),
      Some(
        s"""WITH $EV_SQL,
           |lagged AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev
           |),
           |flagged AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           |    THEN 1 ELSE 0 END AS is_new
           |  FROM lagged
           |),
           |sess AS (
           |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           |  FROM flagged
           |)
           |SELECT user_id, session_seq,
           |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           |  count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
           |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin),
      bench = true),

    Q("ev_sliding_counts",
      // sliding windows: every event lands in 4 overlapping 1h/15m windows.
      (s, d) => Events.slidingCounts(eventsTable(s, d)),
      Some(
        s"""WITH $EV_SQL,
           |slid AS (
           |  SELECT to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900) AS win_start,
           |         event_type
           |  FROM ev, (SELECT unnest([0, 1, 2, 3]) AS k)
           |)
           |SELECT strftime(win_start AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS win_start,
           |       event_type, count(*) AS n
           |FROM slid GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin),
      bench = true),

    Q("ev_props_json",
      (s, d) => eventsTable(s, d)
        .select(col("event_id"), Events.propsK(col("props")).as("k"))
        .orderBy("event_id"),
      Some(
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          |FROM events ORDER BY event_id""".stripMargin)),

    Q("ev_transitions",
      // first-order Markov transition matrix of user behavior: per-user
      // consecutive event pairs with exact e6 conditional probabilities
      // — the next-step baseline product analytics reasons against
      (s, d) => Events.transitionMatrix(eventsTable(s, d))
        .orderBy("from_type", "to_type"),
      Some(
        s"""WITH $EV_SQL,
           |nx AS (SELECT event_type, lead(event_type) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           |    FROM ev),
           |p AS (SELECT event_type AS from_type, next_type AS to_type,
           |      count(*) AS n FROM nx WHERE next_type IS NOT NULL
           |    GROUP BY 1, 2),
           |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
           |      FROM p GROUP BY from_type)
           |SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
           |  CAST((p.n * 1000000) // t.tot AS BIGINT) AS prob_e6
           |FROM p JOIN t USING (from_type)
           |ORDER BY from_type, to_type""".stripMargin)),

    Q("ev_funnel",
      // ordered view → click → purchase funnel: each stage's time is the
      // user's earliest qualifying event STRICTLY AFTER the previous
      // stage's — conditional-min aggregations chained on user_id, then a
      // 1-row reduce exploded into per-stage rows with integer ppm
      // conversions
      (s, d) => Events.funnelReport(eventsTable(s, d),
        Seq("view", "click", "purchase")),
      Some(
        s"""WITH $EV_SQL,
           |s1 AS (SELECT user_id AS u,
           |         min(ts) FILTER (WHERE event_type = 'view') AS t1
           |       FROM ev GROUP BY 1),
           |s2 AS (SELECT s1.u, s1.t1,
           |         min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > s1.t1) AS t2
           |       FROM s1 JOIN ev e ON e.user_id = s1.u GROUP BY s1.u, s1.t1),
           |s3 AS (SELECT s2.u, s2.t1, s2.t2,
           |         min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > s2.t2) AS t3
           |       FROM s2 JOIN ev e ON e.user_id = s2.u GROUP BY s2.u, s2.t1, s2.t2),
           |c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3)
           |SELECT * FROM (
           |  SELECT 1 AS stage_idx, 'view' AS stage, CAST(n1 AS BIGINT) AS n_users,
           |    CAST(1000000 AS BIGINT) AS conv_ppm FROM c
           |  UNION ALL
           |  SELECT 2, 'click', CAST(n2 AS BIGINT),
           |    CAST(CASE WHEN n1 = 0 THEN 0 ELSE n2 * 1000000 // n1 END AS BIGINT) FROM c
           |  UNION ALL
           |  SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           |    CAST(CASE WHEN n2 = 0 THEN 0 ELSE n3 * 1000000 // n2 END AS BIGINT) FROM c)
           |ORDER BY stage_idx""".stripMargin),
      bench = true),

    Q("ev_attribution_linear",
      // VALUE-credit attribution — the model the existing family lacks:
      // ev_attribution is last-touch view→click pairing (no money),
      // ev_attribution_decay weights by 2^-days; this row credits each
      // purchase's exact CENTS across its 7-day click/view touches under
      // the two book-balancing models at once — LAST-touch (final touch
      // gets full value) and LINEAR (v_c DIV n per touch, integer
      // remainder pinned to the last touch, so credited cents sum EXACTLY
      // to purchase cents — the invariant a finance-grade report needs
      // and floats can't give). Shape: one per-user equi-join with a
      // range predicate (the funnel discipline — candidates bounded by
      // per-user activity), then windows keyed by purchase id, a
      // data-sized key.
      (s, d) => {
        val ev = eventsTable(s, d)
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("p_ts"),
            (col("value").cast("decimal(18,2)") * 100).cast("long").as("v_c"))
        val touch = ev.filter(col("event_type").isin("click", "view"))
          .select(col("event_id").as("t_id"), col("user_id"),
            col("ts").as("t_ts"), col("event_type").as("t_type"))
        val cand = purch.join(touch, Seq("user_id"))
          .filter(col("t_ts") <= col("p_ts") &&
            col("t_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"))
        val w = Window.partitionBy("p_id")
        val wr = Window.partitionBy("p_id")
          .orderBy(col("t_ts").desc, col("t_id").desc)
        cand.withColumn("rn", row_number().over(wr))
          .withColumn("n_t", count(lit(1)).over(w))
          .withColumn("lin_c", expr("v_c DIV n_t") +
            when(col("rn") === 1,
              col("v_c") - expr("(v_c DIV n_t) * n_t")).otherwise(0L))
          .groupBy(col("t_type"))
          .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("lt_n"),
            sum(when(col("rn") === 1, col("v_c")).otherwise(0L)).as("lt_value_c"),
            sum(col("lin_c")).as("lin_value_c"))
          .orderBy("t_type")
      },
      Some(
        s"""WITH $EV_SQL,
           |atp AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
           |  FROM ev WHERE event_type = 'purchase'),
           |att AS (SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS t_type
           |  FROM ev WHERE event_type IN ('click', 'view')),
           |atc AS (SELECT p.p_id, p.v_c, t.t_id, t.t_ts, t.t_type
           |  FROM atp p JOIN att t ON t.user_id = p.user_id
           |    AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - INTERVAL 7 DAY),
           |ash AS (SELECT *,
           |    row_number() OVER (PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC) AS rn,
           |    count(*) OVER (PARTITION BY p_id) AS n_t
           |  FROM atc)
           |SELECT t_type,
           |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS lt_n,
           |  CAST(sum(CASE WHEN rn = 1 THEN v_c ELSE 0 END) AS BIGINT) AS lt_value_c,
           |  CAST(sum(v_c // n_t + CASE WHEN rn = 1
           |    THEN v_c - (v_c // n_t) * n_t ELSE 0 END) AS BIGINT) AS lin_value_c
           |FROM ash GROUP BY t_type ORDER BY t_type""".stripMargin),
      bench = true),

    Q("ev_funnel_windowed",
      // the TIME-BOUNDED funnel: each stage must land within 30 minutes
      // of the previous stage's event — "clicked within 30 min of the
      // view, purchased within 30 min of the click". Same chained
      // conditional-min shape as ev_funnel, with the staleness bound in
      // the stage predicate; conversion drops vs the unbounded funnel
      // quantify how much intent decays with delay.
      (s, d) => Events.funnelReport(eventsTable(s, d),
        Seq("view", "click", "purchase"), windowSeconds = Some(1800L)),
      Some(
        s"""WITH $EV_SQL,
           |s1 AS (SELECT user_id AS u,
           |         min(ts) FILTER (WHERE event_type = 'view') AS t1
           |       FROM ev GROUP BY 1),
           |s2 AS (SELECT s1.u, s1.t1,
           |         min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > s1.t1
           |           AND epoch_us(e.ts) - epoch_us(s1.t1) <= 1800000000) AS t2
           |       FROM s1 JOIN ev e ON e.user_id = s1.u GROUP BY s1.u, s1.t1),
           |s3 AS (SELECT s2.u, s2.t1, s2.t2,
           |         min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           |           AND epoch_us(e.ts) - epoch_us(s2.t2) <= 1800000000) AS t3
           |       FROM s2 JOIN ev e ON e.user_id = s2.u GROUP BY s2.u, s2.t1, s2.t2),
           |c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3)
           |SELECT * FROM (
           |  SELECT 1 AS stage_idx, 'view' AS stage, CAST(n1 AS BIGINT) AS n_users,
           |    CAST(1000000 AS BIGINT) AS conv_ppm FROM c
           |  UNION ALL
           |  SELECT 2, 'click', CAST(n2 AS BIGINT),
           |    CAST(CASE WHEN n1 = 0 THEN 0 ELSE n2 * 1000000 // n1 END AS BIGINT) FROM c
           |  UNION ALL
           |  SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           |    CAST(CASE WHEN n2 = 0 THEN 0 ELSE n3 * 1000000 // n2 END AS BIGINT) FROM c)
           |ORDER BY stage_idx""".stripMargin)),

    Q("ev_attribution",
      // last-touch ad attribution: each click joined to same-user views in
      // the 30 minutes before it (the BATCH face of the stream-stream
      // interval join — JoinsSpec drives the identical function through
      // MemoryStream with watermark-bounded state), then one max_by
      // aggregation picks the most recent view per click
      (s, d) => {
        val ev = eventsTable(s, d)
        graft.streaming.Joins.lastTouch(graft.streaming.Joins.attributionJoin(
            ev.filter(col("event_type") === "view"),
            ev.filter(col("event_type") === "click")))
          .orderBy("click_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |i AS (SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM ev
           |      WHERE event_type = 'view'),
           |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM ev
           |      WHERE event_type = 'click'),
           |pairs AS (SELECT c.click_id, i.imp_id, i.imp_ts
           |          FROM c JOIN i ON c.user_id = i.user_id
           |            AND i.imp_ts <= c.click_ts
           |            AND c.click_ts <= i.imp_ts + INTERVAL 30 MINUTE),
           |ranked AS (SELECT click_id, imp_id,
           |    row_number() OVER (PARTITION BY click_id ORDER BY imp_ts DESC, imp_id DESC) AS rn,
           |    count(*) OVER (PARTITION BY click_id) AS n_candidates
           |  FROM pairs)
           |SELECT click_id, imp_id, CAST(n_candidates AS BIGINT) AS n_candidates
           |FROM ranked WHERE rn = 1 ORDER BY click_id""".stripMargin),
      bench = true),

    Q("ev_attribution_outer",
      // batch face of the left-outer watermarked stream-stream join
      // (streaming/Joins.attributionJoinOuter, state-eviction semantics
      // spec-driven in JoinsSpec): every impression emits, null-extended
      // when no click follows within 30 min. The sort key coalesces the
      // nullable click_id because the engines disagree on default null
      // ordering (Spark NULLS FIRST asc, DuckDB NULLS LAST).
      (s, d) => {
        val ev = eventsTable(s, d)
        graft.streaming.Joins.attributionJoinOuter(
            ev.filter(col("event_type") === "view"),
            ev.filter(col("event_type") === "click"))
          .select(col("imp_id"), col("user_id"), col("click_id"))
          .orderBy(col("imp_id"), coalesce(col("click_id"), lit(-1L)))
      },
      Some(
        s"""WITH $EV_SQL,
           |i AS (SELECT event_id AS imp_id, user_id, ts AS imp_ts FROM ev
           |      WHERE event_type = 'view'),
           |c AS (SELECT event_id AS click_id, user_id AS click_user, ts AS click_ts FROM ev
           |      WHERE event_type = 'click')
           |SELECT imp_id, i.user_id, click_id
           |FROM i LEFT JOIN c ON click_user = i.user_id
           |  AND imp_ts <= click_ts AND click_ts <= imp_ts + INTERVAL 30 MINUTE
           |ORDER BY imp_id, COALESCE(click_id, -1)""".stripMargin),
      bench = true),

    Q("ev_attribution_decay",
      // time-decay MULTI-touch attribution — the fractional-credit model
      // beside ev_attribution's last-touch winner-take-all: every view or
      // click in the 7 days before a same-user purchase earns weight
      // 2^-days_gap, expressed as the integer shift 1000000 >> gap (zero
      // transcendentals — the decay constants are exact in both engines),
      // normalized per conversion to ppm credit, rolled up per channel.
      // Scale shape: the touch↔conversion join is key-aligned on user_id
      // (one shuffle), the residual time-band predicate evaluates inside
      // the joined partitions, and the per-conversion weight sum joins
      // back on the same conv_id key.
      (s, d) => {
        val ev = eventsTable(s, d)
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("conv_id"), col("user_id"),
            unix_micros(col("ts")).as("conv_us"))
        val touch = ev.filter(col("event_type").isin("view", "click"))
          .select(col("user_id").as("t_user"), col("event_type").as("channel"),
            unix_micros(col("ts")).as("touch_us"))
        val pairs = conv.join(touch,
            col("t_user") === col("user_id") &&
              col("touch_us") <= col("conv_us") &&
              col("conv_us") < col("touch_us") + lit(7L * 86400000000L))
          // gap_days ∈ [0, 6] by the band predicate, so the shifted weight
          // is always ≥ 1000000 >> 6 = 15625 > 0 — wsum can never be zero
          .withColumn("w",
            expr("shiftright(1000000L, cast((conv_us - touch_us) div 86400000000 as int))"))
        val wsum = pairs.groupBy("conv_id").agg(sum(col("w")).as("wsum"))
        pairs.join(wsum, "conv_id")
          .withColumn("credit_ppm", expr("w * 1000000L div wsum"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_touches"),
            sum(col("credit_ppm")).as("credit_ppm_total"))
          .orderBy("channel")
      },
      Some(
        s"""WITH $EV_SQL,
           |cv AS (SELECT event_id AS conv_id, user_id, epoch_us(ts) AS conv_us
           |       FROM ev WHERE event_type = 'purchase'),
           |tc AS (SELECT user_id, event_type AS channel, epoch_us(ts) AS touch_us
           |       FROM ev WHERE event_type IN ('view', 'click')),
           |pr AS (SELECT conv_id, channel,
           |         CAST(1000000 AS BIGINT) >> CAST((conv_us - touch_us) // 86400000000 AS INTEGER) AS w
           |       FROM cv JOIN tc USING (user_id)
           |       WHERE touch_us <= conv_us
           |         AND conv_us < touch_us + 7 * 86400000000),
           |ws AS (SELECT conv_id, sum(w) AS wsum FROM pr GROUP BY 1)
           |SELECT channel, count(*) AS n_touches,
           |  CAST(sum(w * 1000000 // wsum) AS BIGINT) AS credit_ppm_total
           |FROM pr JOIN ws USING (conv_id)
           |GROUP BY 1 ORDER BY channel""".stripMargin),
      bench = true),

    Q("ev_streaks",
      // longest consecutive-day activity streaks — the gaps-and-islands
      // pattern at the USER grain (engagement "7-day streak" metrics):
      // distinct active days per user, island key = day − row_number
      // (constant exactly across consecutive runs), one aggregate per
      // island, top-20 by length. The ranking window partitions by the
      // HIGH-cardinality user key (per-task state = one user's days) —
      // never a global window; the top-20 is a TakeOrdered heap. Dates
      // compare as epoch-day integers on both engines.
      (s, d) => {
        val days = eventsTable(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        days
          .withColumn("grp", expr("date_sub(day, row_number() OVER " +
            "(PARTITION BY user_id ORDER BY day))"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"),
            min(col("day")).as("start_day"), max(col("day")).as("end_day"))
          .select(col("user_id"), col("start_day").cast("string").as("start_day"),
            col("end_day").cast("string").as("end_day"), col("len"))
          .orderBy(col("len").desc, col("user_id"), col("start_day"))
          .limit(20)
      },
      Some(
        s"""WITH $EV_SQL,
           |ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
           |isl AS (SELECT user_id, day,
           |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
           |          AS INTEGER) AS grp
           |  FROM ud),
           |st AS (SELECT user_id, grp, count(*) AS len,
           |    min(day) AS start_day, max(day) AS end_day
           |  FROM isl GROUP BY 1, 2)
           |SELECT user_id, CAST(start_day AS VARCHAR) AS start_day,
           |  CAST(end_day AS VARCHAR) AS end_day, len
           |FROM st ORDER BY len DESC, user_id, start_day LIMIT 20""".stripMargin),
      bench = true),

    Q("ev_retention",
      // weekly cohort retention: cohort = ISO week of a user's FIRST
      // event, wk = whole weeks since that first day, cell = distinct
      // users still active. The shape that matters at scale: the
      // first-seen frame is a self-aggregation of events keyed by
      // user_id, so the join back is key-aligned — one shuffle total,
      // and AQE can reuse the exchange for the groupBy that follows.
      (s, d) => {
        val ev = eventsTable(s, d).select(col("user_id"), col("ts").cast("date").as("day"))
        val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
        ev.join(first, "user_id")
          .select(col("user_id"),
            date_trunc("week", col("first_day")).cast("date").as("cohort"),
            expr("datediff(day, first_day) div 7").as("wk"))
          .groupBy("cohort", "wk")
          .agg(countDistinct(col("user_id")).as("users"))
          .select(col("cohort").cast("string").as("cohort_week"), col("wk"), col("users"))
          .orderBy("cohort_week", "wk")
      },
      Some(
        s"""WITH $EV_SQL,
           |e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM ev),
           |f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1)
           |SELECT CAST(date_trunc('week', first_day) AS VARCHAR) AS cohort_week,
           |  datediff('day', first_day, day) // 7 AS wk,
           |  count(DISTINCT e.user_id) AS users
           |FROM e JOIN f ON e.user_id = f.user_id
           |GROUP BY 1, 2 ORDER BY cohort_week, wk""".stripMargin)),

    Q("ev_markov_transitions2",
      // (renamed from ev_markov_transitions in r11: the r8->r9 change from
      // first- to second-order transitions changed the workload under an
      // unchanged name, breaking cross-round bench/correctness history —
      // the "2" records the order and the discontinuity.)
      // SECOND-order Markov transitions — P(next | two-step history):
      // where ev_transitions (above) is the first-order next-step
      // baseline, this conditions on the ordered PAIR of preceding
      // events, the order-selection question a sequence modeler asks
      // before fitting (if these probabilities match the first-order
      // rows, the stream is memoryless at depth one). Per-user history
      // via two lead()s in ONE window pass (user_id is a data-sized key,
      // full parallelism); the probability window runs over the
      // AGGREGATED matrix — bounded by #event_types³, never the stream.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val c = eventsTable(s, d)
          .withColumn("src2", lead(col("event_type"), 1).over(w))
          .withColumn("dst", lead(col("event_type"), 2).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src1"), col("src2"), col("dst"))
          .agg(count(lit(1)).as("n"))
        c.withColumn("p_e6",
            expr("n * 1000000 DIV sum(n) OVER (PARTITION BY src1, src2)"))
          .orderBy("src1", "src2", "dst")
      },
      Some(
        """WITH me AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS mts, event_id, event_type
          |            FROM events),
          |mtr AS (SELECT event_type AS src1,
          |          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY mts, event_id) AS src2,
          |          lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY mts, event_id) AS dst
          |        FROM me),
          |mc AS (SELECT src1, src2, dst, count(*) AS n FROM mtr
          |       WHERE dst IS NOT NULL GROUP BY 1, 2, 3)
          |SELECT src1, src2, dst, n,
          |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY src1, src2) AS BIGINT) AS p_e6
          |FROM mc ORDER BY src1, src2, dst""".stripMargin)),

    Q("ev_top_paths",
      // top-20 session journeys: sessionize by the 30-min gap (same
      // island convention as ev_session_summary), truncate each session
      // to its first 8 events, concatenate the event types in time
      // order, count sessions per path. All windows are partitioned by
      // user (then user+session) — per-key state, never a global sort —
      // and the path string is bounded by the 8-event cap, so row width
      // can't blow up on a pathological always-on user at corpus scale.
      (s, d) => {
        val sess = Events.sessionize(eventsTable(s, d), gapMinutes = 30)
        val bySess = Window.partitionBy(col("user_id"), col("session_seq"))
          .orderBy(col("ts"), col("event_id"))
        val paths = sess
          .withColumn("rn", row_number().over(bySess))
          .filter(col("rn") <= 8)
          .groupBy("user_id", "session_seq")
          .agg(concat_ws(">", transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type"))).as("path"))
        paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some(
        s"""WITH $EV_SQL,
           |lagged AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev
           |),
           |flagged AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
           |    THEN 1 ELSE 0 END AS is_new
           |  FROM lagged
           |),
           |sess AS (
           |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           |  FROM flagged
           |),
           |rn AS (
           |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
           |    ORDER BY ts, event_id) AS rn
           |  FROM sess
           |),
           |p AS (
           |  SELECT user_id, session_seq, string_agg(event_type, '>' ORDER BY rn) AS path
           |  FROM rn WHERE rn <= 8 GROUP BY 1, 2
           |)
           |SELECT path, count(*) AS n_sessions
           |FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin),
      bench = true),

    Q("ev_sliding_uniques",
      // distinct users per sliding 1h/15m window from MERGEABLE HLL
      // sketches: the register table is built per (window, 15-min cell,
      // bucket) and rolled up by register max — the shape an incremental
      // pipeline persists (sketch each cell once, merge per window)
      // instead of re-counting distincts for every overlapping window.
      // The md5-bucketed estimate replays exactly in the oracle,
      // approximation error and all.
      (s, d) => {
        val cells = eventsTable(s, d)
          .select(window(col("ts"), "1 hour", "15 minutes").as("win"),
            expr("unix_seconds(ts) DIV 900").as("cell"), col("user_id"))
          .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
            col("cell"), col("user_id"))
        graft.analytics.Sketch.hllRollup(cells,
            col("win_start"), col("cell"), col("user_id"))
          .select(col("key").as("win_start"), col("n_distinct_e6"))
          .orderBy("win_start")
      },
      Some(graft.analytics.Sketch.hllRollupSql(
        """(SELECT strftime(to_timestamp(
          |      (CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 900 - k) * 900)
          |      AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS win_start,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 900 AS cell,
          |    user_id
          |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)) ev2""".stripMargin,
        "win_start", "win_start", "cell", "user_id"))),

    Q("ev_stickiness",
      // DAU/MAU engagement ratio per month: mean daily actives over
      // monthly actives, every step exact (sum of daily distincts DIV
      // days, then an e6 ratio against the month's distinct count) —
      // the one-number product-health metric. Two distinct aggregations
      // keyed by calendar, one tiny join.
      (s, d) => {
        val ev = eventsTable(s, d).select(
          date_format(col("ts"), "yyyy-MM").as("month"),
          to_date(col("ts")).as("day"), col("user_id"))
        val dau = ev.groupBy("month", "day")
          .agg(countDistinct(col("user_id")).as("dau"))
          .groupBy("month")
          .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
        val mau = ev.groupBy("month")
          .agg(countDistinct(col("user_id")).as("mau"))
        dau.join(mau, "month")
          .selectExpr("month", "n_days", "sum_dau", "mau",
            "sum_dau * 1000000L DIV (n_days * mau) AS stickiness_e6")
          .orderBy("month")
      },
      Some(
        s"""WITH $EV_SQL,
           |e AS (SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS day,
           |        user_id FROM ev),
           |dau AS (SELECT month, day, count(DISTINCT user_id) AS dau
           |        FROM e GROUP BY 1, 2),
           |md AS (SELECT month, count(*) AS n_days, CAST(sum(dau) AS BIGINT) AS sum_dau
           |       FROM dau GROUP BY 1),
           |mau AS (SELECT month, count(DISTINCT user_id) AS mau FROM e GROUP BY 1)
           |SELECT month, n_days, sum_dau, mau,
           |  CAST(sum_dau * 1000000 // (n_days * mau) AS BIGINT) AS stickiness_e6
           |FROM md JOIN mau USING (month) ORDER BY month""".stripMargin)),

    Q("ev_autocorr",
      // lag-k autocorrelation (k = 1..7) of the daily event-count series
      // — the seasonality detector behind "is this weekly-periodic?"
      // (dash_seasonality fits a known period; the ACF FINDS it). Exact
      // integer form: with S = Σx, n = #days, each deviation n·x − S is
      // BIGINT-exact (needs x ≈ 4·10¹⁵/day to overflow), but their
      // PRODUCTS are not: dev² ≈ (n·x)² grows with days²·daily-count²,
      // and a 64-bit Σdev² saturates near 2·10⁴ events/day over the
      // ~2500-day calendar. So every product/sum of deviations runs in
      // DECIMAL(38,0) (Spark: dev cast to DECIMAL(18,0), product 37
      // digits, sum 38) / HUGEINT (DuckDB), and only the final e6 ratio
      // casts back to BIGINT — headroom to ~10¹² events/day. The lag
      // pairing is a calendar-date EQUI-join (day+k = day), not a global
      // window: the naive lag() OVER (ORDER BY day) with no partition is
      // an Exchange SinglePartition; the join form shuffles on the date
      // key and survives any series length. Missing calendar days pair
      // with nothing and drop out (n_pairs says how many survived); mean
      // and variance stay global over all observed days.
      (s, d) => {
        // one row per day, materialized once (lazy localCheckpoint):
        // tot, the a-side, and the b-side all branch off this frame, and
        // without the checkpoint each branch re-runs the events scan+agg.
        val daily = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .truncateLineage()
        // q = Σx² widens BEFORE the square (x·x alone overflows BIGINT at
        // x ≈ 3·10⁹/day); n and S stay plain longs.
        val tot = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sv"),
          sum(col("x").cast("decimal(18,0)") * col("x")).as("q"))
        // dev is computed in BIGINT (exact, see header) then widened to
        // DECIMAL(18,0) so the downstream product/sum stays in decimal.
        val dev = daily.crossJoin(broadcast(tot))
          .select(col("day"),
            (col("n") * col("x") - col("sv")).cast("decimal(18,0)").as("dev"))
        val ks = dev.sparkSession.range(1, 8)
          .select(col("id").cast("int").as("k"))
        val a = dev.crossJoin(broadcast(ks))
          .select(col("k"), expr("date_add(day, k)").as("jday"),
            col("dev").as("dev_a"))
        val b = dev.select(col("day").as("jday"), col("dev").as("dev_b"))
        a.join(b, "jday")
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("dev_a") * col("dev_b")).as("num"))
          .crossJoin(broadcast(tot))
          // num is already DECIMAL(38,0) (sum of DECIMAL(37,0) products);
          // the denominator n(nQ − S²) widens each factor BEFORE the
          // multiply — computed in BIGINT it saturates at the same
          // ~2·10⁴ events/day the numerator did.
          // `num` works in DECIMAL(38,0) (see header) but LEAVES in BIGINT:
          // raw decimal output columns were the r12 correctness reds — the
          // driver's hasher doesn't canonicalize them — and the observed
          // range fits a long up to ~10⁹ events/day; past that the guarded
          // cast raises instead of silently NULLing.
          .selectExpr("CAST(k AS BIGINT) AS k", "n_pairs",
            decimalBoundaryToLong("num"),
            """CAST(num * 1000000
              |  DIV greatest(CAST(n AS DECIMAL(38,0))
              |                 * (CAST(n AS DECIMAL(38,0)) * q
              |                    - CAST(sv AS DECIMAL(38,0)) * sv),
              |               CAST(1 AS DECIMAL(38,0))) AS BIGINT) AS acf_e6""".stripMargin)
          .orderBy("k")
      },
      Some(
        s"""WITH $EV_SQL,
           |daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
           |          FROM ev GROUP BY 1),
           |tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sv,
           |        sum(CAST(x AS HUGEINT) * x) AS q FROM daily),
           |dev AS (SELECT day, n * x - sv AS dev FROM daily CROSS JOIN tot),
           |ks AS (SELECT unnest(range(1, 8)) AS k),
           |prs AS (SELECT a.k, a.dev AS dev_a, b.dev AS dev_b
           |        FROM (SELECT k, day + CAST(k AS INTEGER) AS jday, dev
           |              FROM dev CROSS JOIN ks) a
           |        JOIN dev b ON b.day = a.jday),
           |agg AS (SELECT k, count(*) AS n_pairs,
           |        CAST(sum(CAST(dev_a AS HUGEINT) * dev_b)
           |             AS DECIMAL(38,0)) AS num
           |        FROM prs GROUP BY k)
           |SELECT CAST(k AS BIGINT) AS k, n_pairs, CAST(num AS BIGINT) AS num,
           |  CAST(CAST(num AS HUGEINT) * 1000000
           |    // greatest(CAST(n AS HUGEINT)
           |                 * (CAST(n AS HUGEINT) * q
           |                    - CAST(sv AS HUGEINT) * sv),
           |                 CAST(1 AS HUGEINT)) AS BIGINT) AS acf_e6
           |FROM agg CROSS JOIN tot ORDER BY k""".stripMargin),
      bench = true),

    Q("ev_crosscorr",
      // lead/lag cross-correlation (k = −7..7) between the 'view' and
      // 'purchase' daily count series — does one signal LEAD the other,
      // and by how many days? ev_autocorr correlates a series with a
      // shifted copy of itself; this correlates two CONDITIONAL
      // aggregates of the same single events scan (a = views that day,
      // b = purchases that day), so adding a series costs a when(), not
      // another pass. Same exact-integer scheme as ev_autocorr:
      // deviations enter ×n (n·a − Sa) in BIGINT, then widen to
      // DECIMAL(18,0) so the lag-k numerator Σ devA(t)·devB(t+k) and the
      // Qa/Qb sums run in DECIMAL(38,0)/HUGEINT — a 64-bit Σdev² would
      // saturate near 2·10⁴ events/day over the ~2500-day calendar.
      // The symmetric normalizer √(Qa·Qb) is the one
      // place a root is unavoidable, taken as floor(sqrt(double)) —
      // correctly-rounded IEEE ops on identical integer inputs are
      // bit-equal across engines — and the final ratio is e6-scaled in
      // DECIMAL(38,0) DIV / HUGEINT //. Lag pairing is the date
      // equi-join (a-day + k = b-day), never a global window; negative
      // k asks whether purchases lead views instead. The daily frame
      // materializes once (lazy localCheckpoint) and feeds the totals,
      // both join sides, and the normalizer.
      (s, d) => {
        val daily = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("a"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("b"))
          .truncateLineage()
        val tot = daily.agg(count(lit(1)).as("n"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"))
        val dev = daily.crossJoin(broadcast(tot))
          .select(col("day"),
            (col("n") * col("a") - col("sa")).cast("decimal(18,0)")
              .as("dev_a"),
            (col("n") * col("b") - col("sb")).cast("decimal(18,0)")
              .as("dev_b"))
        val qq = dev.agg(sum(col("dev_a") * col("dev_a")).as("qa"),
          sum(col("dev_b") * col("dev_b")).as("qb"))
        val ks = daily.sparkSession.range(-7, 8)
          .select(col("id").cast("int").as("k"))
        val lhs = dev.crossJoin(broadcast(ks))
          .select(col("k"), expr("date_add(day, k)").as("jday"), col("dev_a"))
        val rhs = dev.select(col("day").as("jday"), col("dev_b"))
        lhs.join(rhs, "jday")
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("dev_a") * col("dev_b")).as("num"))
          .crossJoin(broadcast(qq))
          // num/qa/qb arrive as DECIMAL(38,0); decimal→double is
          // correctly rounded on both engines, so the floor(sqrt(·))
          // normalizer stays bit-equal.
          // same boundary rule as ev_autocorr: `num` computes in decimal,
          // leaves as guarded BIGINT (r12 red class: raw decimal outputs).
          .selectExpr("CAST(k AS BIGINT) AS k", "n_pairs",
            decimalBoundaryToLong("num"),
            """CAST(num * 1000000
              |  DIV greatest(CAST(floor(sqrt(CAST(qa AS DOUBLE)
              |                               * CAST(qb AS DOUBLE)))
              |               AS DECIMAL(38,0)),
              |               CAST(1 AS DECIMAL(38,0))) AS BIGINT)
              |AS ncc_e6""".stripMargin)
          .orderBy("k")
      },
      Some(
        s"""WITH $EV_SQL,
           |daily AS (SELECT CAST(ts AS DATE) AS day,
           |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS a,
           |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS b
           |  FROM ev GROUP BY 1),
           |tot AS (SELECT count(*) AS n, CAST(sum(a) AS BIGINT) AS sa,
           |        CAST(sum(b) AS BIGINT) AS sb FROM daily),
           |dev AS (SELECT day, n * a - sa AS dev_a, n * b - sb AS dev_b
           |        FROM daily CROSS JOIN tot),
           |qq AS (SELECT sum(CAST(dev_a AS HUGEINT) * dev_a) AS qa,
           |       sum(CAST(dev_b AS HUGEINT) * dev_b) AS qb FROM dev),
           |ks AS (SELECT unnest(range(-7, 8)) AS k),
           |prs AS (SELECT l.k, l.dev_a, r.dev_b
           |        FROM (SELECT k, day + CAST(k AS INTEGER) AS jday, dev_a
           |              FROM dev CROSS JOIN ks) l
           |        JOIN dev r ON r.day = l.jday),
           |agg AS (SELECT k, count(*) AS n_pairs,
           |        CAST(sum(CAST(dev_a AS HUGEINT) * dev_b)
           |             AS DECIMAL(38,0)) AS num
           |        FROM prs GROUP BY k)
           |SELECT CAST(k AS BIGINT) AS k, n_pairs, CAST(num AS BIGINT) AS num,
           |  CAST(CAST(num AS HUGEINT) * 1000000
           |    // greatest(CAST(floor(sqrt(CAST(qa AS DOUBLE)
           |                                * CAST(qb AS DOUBLE)))
           |               AS HUGEINT),
           |               CAST(1 AS HUGEINT)) AS BIGINT) AS ncc_e6
           |FROM agg CROSS JOIN qq ORDER BY k""".stripMargin),
      bench = true),

    Q("ev_gap_regularity",
      // bot/automation detector over inter-event timing: real users
      // arrive bursty (squared coefficient of variation of their gaps
      // cv² ≈ 1 for a Poisson process, higher with sessions); schedulers
      // and scripts tick regularly (cv² → 0). Emits the 20 most-regular
      // users with ≥ 5 gaps. Exact integers end-to-end: the mean gap
      // reports in ms; the variance inputs quantize to DECIseconds
      // (g DIV 100) first — the re-quantize-before-multiply rule — so
      // the widest product, (n·Σg² − S²)·10⁶ ≤ n²·g_max²·10⁶ ≈ 10³⁷,
      // stays inside 38 digits even for a 10⁷-event user over a year,
      // while cadences down to 100 ms still register jitter (finer ones
      // collapse to cv² 0 — the honest floor of this quantum). After
      // quantization Σg² ≤ g_max·Σg ≈ 10¹⁷ fits plain BIGINT, so only
      // the final cross-product needs DECIMAL(38,0) / HUGEINT;
      // cv²_e6 = (nΣg² − S²)·10⁶ DIV S². Scale shape: the lag window
      // partitions by user_id (data-parallel by key, never global), one
      // aggregation per user, and the final top-20 is TakeOrdered —
      // O(k) heap per partition, no global sort materialization.
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val gaps = eventsTable(s, d)
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("pts", lag(col("ts"), 1).over(byUser))
          .filter(col("pts").isNotNull)
          .select(col("user_id"),
            expr("(unix_micros(ts) - unix_micros(pts)) DIV 1000").as("g"))
        gaps.groupBy("user_id").agg(
            count(lit(1)).as("n_gaps"),
            sum(col("g")).as("sg"),
            sum(expr("g DIV 100")).as("sgs"),
            sum(expr("(g DIV 100) * (g DIV 100)")).as("q"))
          .filter(col("n_gaps") >= 5)
          .selectExpr("user_id", "n_gaps",
            "CAST(sg DIV n_gaps AS BIGINT) AS mean_gap_ms",
            """CAST((CAST(n_gaps AS DECIMAL(38,0)) * q
              |     - CAST(sgs AS DECIMAL(38,0)) * sgs) * 1000000
              |  DIV greatest(CAST(sgs AS DECIMAL(38,0)) * sgs,
              |               CAST(1 AS DECIMAL(38,0)))
              |AS BIGINT) AS cv2_e6""".stripMargin)
          .orderBy(col("cv2_e6"), col("user_id"))
          .limit(20)
      },
      Some(
        s"""WITH $EV_SQL,
           |gg AS (SELECT user_id,
           |    (epoch_us(ts) - epoch_us(lag(ts, 1) OVER
           |       (PARTITION BY user_id ORDER BY ts, event_id))) // 1000 AS g
           |  FROM ev),
           |gs AS (SELECT user_id, count(*) AS n_gaps,
           |       CAST(sum(g) AS BIGINT) AS sg,
           |       CAST(sum(g // 100) AS BIGINT) AS sgs,
           |       CAST(sum((g // 100) * (g // 100)) AS BIGINT) AS q
           |  FROM gg WHERE g IS NOT NULL GROUP BY user_id)
           |SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_ms,
           |  CAST((CAST(n_gaps AS HUGEINT) * q
           |       - CAST(sgs AS HUGEINT) * sgs) * 1000000
           |    // greatest(CAST(sgs AS HUGEINT) * sgs,
           |                CAST(1 AS HUGEINT)) AS BIGINT) AS cv2_e6
           |FROM gs WHERE n_gaps >= 5
           |ORDER BY cv2_e6, user_id LIMIT 20""".stripMargin),
      bench = true),

    Q("ev_survival_hazard",
      // censoring-aware churn life table (the counting half of
      // Kaplan-Meier): per lifetime-day t — days from a user's first to
      // last event — how many users were still at risk, how many
      // churned at exactly t (last event ≥ 14 days before the corpus
      // horizon), and how many are right-censored (still active at the
      // horizon; their lifetimes bound but don't count as deaths —
      // ev_retention has no censoring notion). The discrete hazard
      // d_t/n_risk(t) is exact (e6 integer division); the survival
      // curve itself is a running PRODUCT of rationals and is left out
      // deliberately — no exact cross-engine fixed-point form. n_risk
      // is a suffix count computed as N − prefix + self via the
      // distributed two-pass running sum (day-unique total order), so
      // there is no global window anywhere.
      (s, d) => {
        val ev = eventsTable(s, d)
        val ur = ev.groupBy("user_id").agg(
          min(to_date(col("ts"))).as("first_d"),
          max(to_date(col("ts"))).as("last_d"))
        val mx = ev.agg(max(to_date(col("ts"))).as("mx"))
        val lt = ur.crossJoin(broadcast(mx))
          .select(
            datediff(col("last_d"), col("first_d")).cast("long").as("t"),
            when(col("last_d") <= date_sub(col("mx"), 14), 1L)
              .otherwise(0L).as("churn"))
        val byT = lt.groupBy("t").agg(count(lit(1)).as("n_end"),
            sum(col("churn")).as("n_event"))
          .withColumn("g", lit(0))
        graft.etl.Ids.groupedRunningSum(byT, Seq("g"), Seq(col("t")),
            "n_end", "cum_end", "n_total")
          .select(col("t"),
            (col("n_total") - col("cum_end") + col("n_end")).as("n_risk"),
            col("n_event"),
            (col("n_end") - col("n_event")).as("n_censored"),
            expr("""CAST(n_event * 1000000
                   |  DIV (n_total - cum_end + n_end) AS BIGINT)"""
              .stripMargin).as("hazard_e6"))
          .orderBy("t")
      },
      Some(
        s"""WITH $EV_SQL,
           |su AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d,
           |       max(CAST(ts AS DATE)) AS last_d FROM ev GROUP BY user_id),
           |smx AS (SELECT max(CAST(ts AS DATE)) AS mx FROM ev),
           |slt AS (SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS t,
           |        CASE WHEN last_d <= mx - 14 THEN 1 ELSE 0 END AS churn
           |  FROM su CROSS JOIN smx),
           |sbt AS (SELECT t, count(*) AS n_end,
           |        CAST(sum(churn) AS BIGINT) AS n_event FROM slt GROUP BY t),
           |stot AS (SELECT CAST(sum(n_end) AS BIGINT) AS n_total FROM sbt),
           |srun AS (SELECT t, n_end, n_event,
           |         CAST(sum(n_end) OVER (ORDER BY t) AS BIGINT) AS cum_end
           |  FROM sbt)
           |SELECT t, n_total - cum_end + n_end AS n_risk, n_event,
           |  n_end - n_event AS n_censored,
           |  CAST(n_event * 1000000 // (n_total - cum_end + n_end) AS BIGINT)
           |    AS hazard_e6
           |FROM srun CROSS JOIN stot ORDER BY t""".stripMargin),
      bench = true),

    Q("ev_seq_patterns",
      // GSP-style sequential pattern mining (Srikant & Agrawal, EDBT'96)
      // over per-user journeys: frequent subsequences of length 1..3
      // with user support ≥ max(3, 25% of users). A pattern (a,b,c) is
      // supported by a user iff SOME strictly increasing position triple
      // of their first 12 events carries those types — general
      // subsequence, not adjacency (ev_transitions covers adjacency;
      // this is the order-containment face). The apriori ladder is what
      // scales it: L2 joins only L1-frequent item occurrences, L3
      // enumerates only candidates from the L2⋈L2 self-join (the GSP
      // candidate-generation step), and sequences are truncated to the
      // first 12 events — per-user join fan-out is C(12,3)-bounded and
      // candidate-pruned, never |history|³ on a pathological always-on
      // user. All joins are user-keyed equi-joins; supports are one
      // distinct + one count per level. Ordering by (len, p1, p2, p3)
      // is NULL-convention-safe: the NULL columns are constant within
      // each len group.
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pos = eventsTable(s, d)
          .withColumn("rn", row_number().over(byUser))
          .filter(col("rn") <= 12)
          .select(col("user_id"), col("event_type").as("item"), col("rn"))
          .truncateLineage()
        val ms = pos.select("user_id").distinct()
          .agg(greatest(lit(3L), (count(lit(1)) / 4).cast("long")).as("minsup"))
        val l1 = pos.groupBy("item")
          .agg(countDistinct(col("user_id")).as("support"))
          .crossJoin(broadcast(ms))
          .filter(col("support") >= col("minsup"))
        val p1 = pos.join(l1.select("item"), Seq("item"), "left_semi")
        val a = p1.select(col("user_id"), col("item").as("i1"),
          col("rn").as("rn1"))
        val b = p1.select(col("user_id"), col("item").as("i2"),
          col("rn").as("rn2"))
        val pairOcc = a.join(b, Seq("user_id"))
          .filter(col("rn1") < col("rn2"))
        val l2 = pairOcc.select("user_id", "i1", "i2").distinct()
          .groupBy("i1", "i2").agg(count(lit(1)).as("support"))
          .crossJoin(broadcast(ms))
          .filter(col("support") >= col("minsup"))
        val cand = l2.select(col("i1"), col("i2"))
          .join(l2.select(col("i1").as("i2"), col("i2").as("i3")), Seq("i2"))
          .select("i1", "i2", "i3").distinct()
        val c = p1.select(col("user_id"), col("item").as("i3"),
          col("rn").as("rn3"))
        val l3 = pairOcc
          .join(broadcast(cand.select("i1", "i2").distinct()), Seq("i1", "i2"),
            "left_semi")
          .join(c, Seq("user_id"))
          .filter(col("rn2") < col("rn3"))
          .join(broadcast(cand), Seq("i1", "i2", "i3"), "left_semi")
          .select("user_id", "i1", "i2", "i3").distinct()
          .groupBy("i1", "i2", "i3").agg(count(lit(1)).as("support"))
          .crossJoin(broadcast(ms))
          .filter(col("support") >= col("minsup"))
        val nul = lit(null).cast("string")
        l1.select(lit(1L).as("len"), col("item").as("p1"), nul.as("p2"),
            nul.as("p3"), col("support"))
          .unionAll(l2.select(lit(2L).as("len"), col("i1").as("p1"),
            col("i2").as("p2"), nul.as("p3"), col("support")))
          .unionAll(l3.select(lit(3L).as("len"), col("i1").as("p1"),
            col("i2").as("p2"), col("i3").as("p3"), col("support")))
          .orderBy("len", "p1", "p2", "p3")
      },
      Some(
        s"""WITH $EV_SQL,
           |pos AS (SELECT * FROM (
           |  SELECT user_id, event_type AS item,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS rn
           |  FROM ev) WHERE rn <= 12),
           |ns AS (SELECT greatest(3, count(DISTINCT user_id) // 4)
           |       AS minsup FROM pos),
           |l1 AS (SELECT item, count(DISTINCT user_id) AS support
           |  FROM pos GROUP BY 1
           |  HAVING count(DISTINCT user_id) >= (SELECT minsup FROM ns)),
           |pp1 AS (SELECT pos.* FROM pos WHERE item IN (SELECT item FROM l1)),
           |po AS (SELECT DISTINCT a.user_id, a.item AS i1, b.item AS i2
           |  FROM pp1 a JOIN pp1 b ON a.user_id = b.user_id AND a.rn < b.rn),
           |l2 AS (SELECT i1, i2, count(*) AS support FROM po GROUP BY 1, 2
           |  HAVING count(*) >= (SELECT minsup FROM ns)),
           |cand AS (SELECT DISTINCT x.i1, x.i2, y.i2 AS i3
           |  FROM l2 x JOIN l2 y ON x.i2 = y.i1),
           |t3 AS (SELECT DISTINCT a.user_id,
           |    a.item AS i1, b.item AS i2, c.item AS i3
           |  FROM pp1 a
           |  JOIN pp1 b ON a.user_id = b.user_id AND a.rn < b.rn
           |  JOIN pp1 c ON b.user_id = c.user_id AND b.rn < c.rn
           |  JOIN cand ON cand.i1 = a.item AND cand.i2 = b.item AND cand.i3 = c.item),
           |l3 AS (SELECT i1, i2, i3, count(*) AS support FROM t3 GROUP BY 1, 2, 3
           |  HAVING count(*) >= (SELECT minsup FROM ns))
           |SELECT CAST(1 AS BIGINT) AS len, item AS p1, CAST(NULL AS VARCHAR) AS p2,
           |  CAST(NULL AS VARCHAR) AS p3, CAST(support AS BIGINT) AS support FROM l1
           |UNION ALL
           |SELECT 2, i1, i2, CAST(NULL AS VARCHAR), CAST(support AS BIGINT) FROM l2
           |UNION ALL
           |SELECT 3, i1, i2, i3, CAST(support AS BIGINT) FROM l3
           |ORDER BY len, p1, p2, p3""".stripMargin),
      bench = true),

    Q("ev_bursts",
      // burst detection against a LOCAL trailing baseline — the traffic-
      // ops alarm ev_anomaly_days can't express: a 3σ global test flags
      // outliers vs the WHOLE calendar's mean, so a slow ramp makes early
      // days look calm and late days alarmed; a burst is a day loud
      // relative to ITS OWN recent past (cnt > 2× the trailing-7-day
      // mean). Exact integers: the mean never materializes —
      // cnt · n_prev ≥ 2 · trail_sum cross-multiplies it away, and the
      // reported ratio is the exact e6 integer cnt·n_prev·10⁶ DIV
      // trail_sum (headroom: cnt·7·10⁶ < 2⁶³ up to ~10¹¹ events/day).
      // Trailing window = the ev_autocorr date-shift EQUI-join (each day
      // contributes itself to days d+1..d+7; group on the receiving day),
      // never lag() over an unpartitioned global window. Days with < 4
      // observed baseline days are withheld — no verdict off a thin
      // baseline (and the calendar's leading edge drops out the same way).
      (s, d) => {
        val daily = eventsTable(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
          .truncateLineage() // feeds both the observation and baseline sides
        val ks = daily.sparkSession.range(1, 8)
          .select(col("id").cast("int").as("k"))
        val trail = daily.crossJoin(broadcast(ks))
          .select(expr("date_add(day, k)").as("day"), col("cnt").as("pcnt"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_prev"), sum(col("pcnt")).as("trail_sum"))
        daily.join(trail, Seq("day"))
          .filter(col("n_prev") >= 4)
          .select(col("day"), col("cnt"), col("n_prev"), col("trail_sum"),
            expr("cnt * n_prev * 1000000 DIV trail_sum").as("ratio_e6"),
            (col("cnt") * col("n_prev") >= lit(2L) * col("trail_sum"))
              .as("is_burst"))
          .orderBy("day")
      },
      Some(
        s"""WITH $EV_SQL,
           |daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
           |          FROM ev GROUP BY 1),
           |ks AS (SELECT unnest(range(1, 8)) AS k),
           |tr AS (SELECT d.day + CAST(ks.k AS INTEGER) AS day, d.cnt
           |       FROM daily d CROSS JOIN ks),
           |trail AS (SELECT day, count(*) AS n_prev,
           |          CAST(sum(cnt) AS BIGINT) AS trail_sum
           |          FROM tr GROUP BY 1)
           |SELECT d.day, d.cnt, t.n_prev, t.trail_sum,
           |  CAST(d.cnt * t.n_prev * 1000000 // t.trail_sum AS BIGINT)
           |    AS ratio_e6,
           |  CAST(d.cnt * t.n_prev >= 2 * t.trail_sum AS BOOLEAN) AS is_burst
           |FROM daily d JOIN trail t USING (day)
           |WHERE t.n_prev >= 4 ORDER BY d.day""".stripMargin),
      bench = true),

    Q("ev_user_lifecycle_states",
      // growth accounting (the Reforge/SaaS-metrics state machine): every
      // purchaser-day classified as new (first active day), retained
      // (active yesterday too), resurrected (active, but not yesterday,
      // not first), or churned (inactive today, active yesterday) — the
      // decomposition that tells a growth team WHERE a flat DAU curve
      // comes from (ev_retention gives the cohort view; this gives the
      // flow view). Purchase events define "active" (the sparse signal —
      // all-event activity is too dense in this corpus to ever churn).
      // Pure joins, no windows: the candidate day set is active-days ∪
      // their +1-day shadows (where churn rows live), first days come from
      // one min-aggregate, and yesterday's activity is a date-shift
      // equi-join — the same lag-free idiom as ev_autocorr/ev_bursts, so
      // the state machine is three keyed joins at any history length.
      (s, d) => {
        val am = eventsTable(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
          .truncateLineage() // cand ∪ shadow, first, today, yesterday
        val fm = am.groupBy("user_id").agg(min(col("d")).as("first_d"))
        val mx = am.agg(max(col("d")).as("dmax"))
        val shadow = am.crossJoin(broadcast(mx))
          .select(col("user_id"), expr("date_add(d, 1)").as("d"),
            col("dmax"))
          .filter(col("d") <= col("dmax")).select("user_id", "d")
        val cand = am.union(shadow).distinct()
        val today = am.withColumn("act", lit(1))
        val yday = am.select(col("user_id"),
          expr("date_add(d, 1)").as("d"), lit(1).as("prev"))
        cand.join(fm, "user_id")
          .join(today, Seq("user_id", "d"), "left")
          .join(yday, Seq("user_id", "d"), "left")
          .select(col("d").as("day"),
            when(col("act").isNotNull && col("d") === col("first_d"), "new")
              .when(col("act").isNotNull && col("prev").isNotNull, "retained")
              .when(col("act").isNotNull, "resurrected")
              .when(col("prev").isNotNull, "churned")
              .as("state"))
          .filter(col("state").isNotNull)
          .groupBy("day", "state").agg(count(lit(1)).as("n_users"))
          .orderBy("day", "state")
      },
      Some(
        s"""WITH $EV_SQL,
           |am AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM ev
           |       WHERE event_type = 'purchase'),
           |fm AS (SELECT user_id, min(d) AS first_d FROM am GROUP BY 1),
           |mx AS (SELECT max(d) AS dmax FROM am),
           |cand AS (
           |  SELECT user_id, d FROM am
           |  UNION
           |  SELECT a.user_id, a.d + 1 AS d FROM am a CROSS JOIN mx
           |  WHERE a.d + 1 <= mx.dmax),
           |st AS (SELECT c.user_id, c.d,
           |    CASE
           |      WHEN a.user_id IS NOT NULL AND c.d = f.first_d THEN 'new'
           |      WHEN a.user_id IS NOT NULL AND p.user_id IS NOT NULL
           |        THEN 'retained'
           |      WHEN a.user_id IS NOT NULL THEN 'resurrected'
           |      WHEN p.user_id IS NOT NULL THEN 'churned'
           |      ELSE NULL END AS state
           |  FROM cand c
           |  JOIN fm f ON f.user_id = c.user_id
           |  LEFT JOIN am a ON a.user_id = c.user_id AND a.d = c.d
           |  LEFT JOIN am p ON p.user_id = c.user_id AND p.d + 1 = c.d)
           |SELECT d AS day, state, count(*) AS n_users
           |FROM st WHERE state IS NOT NULL
           |GROUP BY 1, 2 ORDER BY day, state""".stripMargin),
      bench = true),

    Q("ev_conversion_latency",
      // time-to-convert distribution — the latency face of the funnel
      // family (ev_funnel counts WHO converts; this measures HOW LONG
      // first view → first subsequent purchase takes). Per-user firsts
      // are two keyed min-aggregations; the p50/p90 of the whole-second
      // latencies are EXACT nearest-rank reads off Ids.groupedRunningSum's
      // range-partitioned rank machinery (a global percentile window
      // would plan Exchange SinglePartition — the does-not-scale shape).
      // Microsecond arithmetic throughout; floor to whole seconds only at
      // the latency derivation, replayed identically by the oracle.
      (s, d) => {
        val ev = eventsTable(s, d).select(col("user_id"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("v_us"))
        val firstPurch = ev.filter(col("event_type") === "purchase")
          .join(firstView, "user_id")
          .filter(col("us") >= col("v_us"))
          .groupBy("user_id").agg(min(col("us")).as("p_us"))
        val conv = firstView.join(firstPurch, Seq("user_id"))
          .select(col("user_id"),
            expr("(p_us - v_us) DIV 1000000").as("lat_s"))
          .withColumn("w", lit(1L)).withColumn("g", lit(0))
        val pct = graft.etl.Ids.groupedRunningSum(conv, Seq("g"),
            Seq(col("lat_s"), col("user_id")), "w", "cum", "tot")
          .groupBy("g")
          .agg(
            min(when(col("cum") * 2 >= col("tot"), col("lat_s"))).as("p50_s"),
            min(when(col("cum") * 10 >= col("tot") * 9, col("lat_s"))).as("p90_s"),
            max(col("tot")).as("n_converted"))
        val nv = firstView.agg(count(lit(1)).as("n_viewers"))
        pct.crossJoin(broadcast(nv))
          .selectExpr("n_viewers", "n_converted",
            "n_converted * 1000000 DIV n_viewers AS conv_ppm",
            "p50_s", "p90_s")
          .orderBy("n_viewers")
      },
      Some(
        s"""WITH $EV_SQL,
           |e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM ev),
           |v AS (SELECT user_id, min(us) AS v_us FROM e
           |      WHERE event_type = 'view' GROUP BY 1),
           |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN v USING (user_id)
           |      WHERE event_type = 'purchase' AND us >= v_us GROUP BY 1),
           |c AS (SELECT v.user_id, (p_us - v_us) // 1000000 AS lat_s
           |      FROM v JOIN p USING (user_id)),
           |r AS (SELECT lat_s, sum(1) OVER (ORDER BY lat_s, user_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |      count(*) OVER () AS tot FROM c),
           |q AS (SELECT min(CASE WHEN cum * 2 >= tot THEN lat_s END) AS p50_s,
           |      min(CASE WHEN cum * 10 >= tot * 9 THEN lat_s END) AS p90_s,
           |      CAST(max(tot) AS BIGINT) AS n_converted FROM r),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_viewers FROM v)
           |SELECT n_viewers, n_converted,
           |  n_converted * 1000000 // n_viewers AS conv_ppm,
           |  CAST(p50_s AS BIGINT) AS p50_s, CAST(p90_s AS BIGINT) AS p90_s
           |FROM q CROSS JOIN n ORDER BY n_viewers""".stripMargin)),

    Q("ev_attribution_shapley",
      // Shapley-value attribution — the game-theoretic completion of the
      // attribution family (first/last/linear/decay divide credit by
      // POSITION; Shapley divides it by MARGINAL CONTRIBUTION over every
      // coalition of channels, the provably-fair split). Channels are the
      // 4 non-purchase event types touched strictly before a user's first
      // purchase; the characteristic function v(S) counts converters
      // whose touched set ⊆ S. With n = 4 the subset lattice is 16 rows,
      // so after ONE per-user bitmask aggregation everything is joins over
      // literal-bounded frames — the 100 TB cost is the user groupBy,
      // nothing else grows. Exact arithmetic: Shapley weights
      // |S|!·(n−1−|S|)! stay integral by scaling φ by n! = 24
      // (phi_x24 = Σ_S w·[v(S∪i)−v(S)], w ∈ {6,2,2,6}); monotone v keeps
      // every marginal ≥ 0, and Σᵢ φᵢ·24 = 24·[v(full)−v(∅)] funds the
      // exact share_ppm. DuckDB replays the identical lattice.
      (s, d) => {
        val ev = eventsTable(s, d).select(col("user_id"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        val firstP = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min(col("us")).as("p_us"))
        val chIdx = when(col("event_type") === "click", 0)
          .when(col("event_type") === "error", 1)
          .when(col("event_type") === "signup", 2)
          .when(col("event_type") === "view", 3)
        val touched = ev.join(firstP, "user_id")
          .filter(col("us") < col("p_us"))
          .withColumn("ci", chIdx).filter(col("ci").isNotNull)
        val userMask = firstP.join(
            touched.groupBy("user_id")
              .agg(expr("bit_or(shiftleft(1, ci))").as("mask")),
            Seq("user_id"), "left")
          .select(coalesce(col("mask"), lit(0)).as("mask"))
        graft.analytics.Shapley
          .attribution(userMask, Seq("click", "error", "signup", "view"))
          .selectExpr("channel", "n_users", "phi_xnf AS phi_x24", "share_ppm")
          .orderBy("channel")
      },
      Some(
        s"""WITH $EV_SQL,
           |e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM ev),
           |fp AS (SELECT user_id, min(us) AS p_us FROM e
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |tc AS (SELECT t.user_id, t.ci FROM (
           |         SELECT e.user_id,
           |           CASE e.event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
           |                WHEN 'signup' THEN 2 WHEN 'view' THEN 3 END AS ci
           |         FROM e JOIN fp USING (user_id) WHERE us < p_us) t
           |       WHERE t.ci IS NOT NULL),
           |um AS (SELECT fp.user_id, COALESCE(bit_or(1 << ci), 0) AS mask
           |       FROM fp LEFT JOIN tc ON tc.user_id = fp.user_id GROUP BY 1),
           |cn AS (SELECT mask, count(*) AS cnt FROM um GROUP BY 1),
           |sm AS (SELECT CAST(unnest(range(16)) AS INT) AS s_mask),
           |vv AS (SELECT s_mask, COALESCE(sum(cnt), 0) AS v FROM sm
           |       LEFT JOIN cn ON (cn.mask & (15 - sm.s_mask)) = 0 GROUP BY 1),
           |ch AS (SELECT CAST(unnest(range(4)) AS INT) AS ci),
           |cname AS (SELECT ci, CASE ci WHEN 0 THEN 'click' WHEN 1 THEN 'error'
           |            WHEN 2 THEN 'signup' ELSE 'view' END AS channel FROM ch),
           |pr AS (SELECT s_mask, ci,
           |         (s_mask & 1) + ((s_mask >> 1) & 1)
           |           + ((s_mask >> 2) & 1) + ((s_mask >> 3) & 1) AS s_size
           |       FROM sm CROSS JOIN ch WHERE (s_mask & (1 << ci)) = 0),
           |co AS (SELECT pr.ci,
           |         (CASE s_size WHEN 0 THEN 6 WHEN 1 THEN 2
           |               WHEN 2 THEN 2 ELSE 6 END) * (v2.v - v1.v) AS t
           |       FROM pr JOIN vv v1 ON v1.s_mask = pr.s_mask
           |               JOIN vv v2 ON v2.s_mask = pr.s_mask + (1 << pr.ci)),
           |ph AS (SELECT ci, CAST(sum(t) AS BIGINT) AS phi_x24 FROM co GROUP BY 1),
           |tn AS (SELECT ch.ci, CAST(COALESCE(sum(cnt), 0) AS BIGINT) AS n_users
           |       FROM ch LEFT JOIN cn ON (cn.mask & (1 << ch.ci)) <> 0 GROUP BY 1),
           |tt AS (SELECT sum(phi_x24) AS tot FROM ph)
           |SELECT cname.channel, tn.n_users, ph.phi_x24,
           |  CAST(phi_x24 * 1000000 // greatest(tot, 1) AS BIGINT) AS share_ppm
           |FROM ph JOIN cname USING (ci) JOIN tn USING (ci) CROSS JOIN tt
           |ORDER BY channel""".stripMargin))
  )
}
