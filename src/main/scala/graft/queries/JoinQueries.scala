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

/** Join family: broadcast/SMJ equi-joins, semi/anti, full outer, as-of,
  * range/band, and the bloom-pruned join. Pure move.
  */
private[graft] object JoinQueries {

  val qs: Vector[Q] = Vector(
    Q("join_orders_customer",
      // customer is fact-sized at scale (grows with SF), so the join
      // strategy is left to the planner: AQE auto-broadcasts at test SF
      // and degrades gracefully to a shuffle hash join at 100 TB.
      (s, d) => tbl(s, d, "orders")
        .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), cents(col("o_totalprice")).as("sum_price_c"))
        .orderBy("c_mktsegment"),
      Some(
        """SELECT c_mktsegment, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_c
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    Q("join_revenue_by_brand",
      // part scales linearly with SF — no forced broadcast; the planner
      // picks broadcast at test SF, shuffle join at scale.
      (s, d) => tbl(s, d, "lineitem")
        .join(tbl(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)").multiply(10000).cast("long").as("revenue_e4"))
        .orderBy("p_brand"),
      Some(
        """SELECT p_brand, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      bench = true),

    Q("join_multiway_revenue",
      // the TPC-H Q3 shape: selective filters pushed to all three scans
      // BEFORE any join, the fact-sized sides hash-joined on their keys,
      // then top-10 via the heap exec — the canonical multiway star-join
      // plan AQE and join reordering exist for. customer is fact-sized
      // (grows with SF) so even its segment-filtered slice is left to the
      // planner rather than force-broadcast.
      (s, d) => {
        val cutoff = lit("1998-06-01").cast("timestamp")
        val c = tbl(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = tbl(s, d, "orders").filter(col("o_orderdate") < cutoff)
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val l = tbl(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val grouped = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .multiply(10000).cast("long").as("revenue_e4"))
        graft.plans.TopK.perGroup(grouped.withColumn("__g", lit(1)), Seq("__g"),
            col("revenue_e4"), col("l_orderkey"), 10)
          .select(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      },
      Some(
        """WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
          |o AS (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
          |      WHERE o_orderdate < TIMESTAMP '1998-06-01'),
          |l AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
          |      WHERE l_shipdate > TIMESTAMP '1998-06-01'),
          |g AS (SELECT l.l_orderkey, o.o_orderdate,
          |        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |      FROM l JOIN o ON l.l_orderkey = o.o_orderkey
          |      JOIN c ON o.o_custkey = c.c_custkey
          |      GROUP BY 1, 2)
          |SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, revenue_e4
          |FROM (SELECT *, row_number() OVER (ORDER BY revenue_e4 DESC, l_orderkey) AS rn FROM g)
          |WHERE rn <= 10 ORDER BY revenue_e4 DESC, l_orderkey""".stripMargin),
      bench = true),

    Q("join_semi_anti",
      // explicit LEFT SEMI + LEFT ANTI (§2.12): every customer flagged by
      // order existence — semi and anti partition the table, so their
      // union is exactly the EXISTS() truth. Both plan as one broadcast/
      // hash join that ships only the key column, never duplicating
      // customer rows on multi-order matches.
      (s, d) => {
        val c = tbl(s, d, "customer").select(col("c_custkey"))
        val o = tbl(s, d, "orders").select(col("o_custkey"))
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .withColumn("has_orders", lit(true))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .withColumn("has_orders", lit(false))
        semi.union(anti).orderBy("c_custkey")
      },
      Some(
        """SELECT c_custkey,
          |  EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
          |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("join_full_outer",
      // FULL OUTER (§2.12): negative-balance customer vs supplier counts
      // per nation — either side can be absent, zero-filled after the
      // coalesced key. One shuffle per pre-aggregated (tiny) side.
      (s, d) => {
        val c = tbl(s, d, "customer").filter(col("c_acctbal") < 0)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val su = tbl(s, d, "supplier").filter(col("s_acctbal") < 0)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some(
        """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
          |           FROM customer WHERE c_acctbal < 0 GROUP BY 1),
          |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
          |      FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
          |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
          |  COALESCE(c.n_cust, 0) AS n_cust,
          |  COALESCE(s.n_supp, 0) AS n_supp
          |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
          |ORDER BY nationkey""".stripMargin)),

    Q("join_asof",
      // as-of join (§2.12, no Spark native op): each click matched to the
      // user's latest view at-or-before it — union-tag + per-key ordered
      // window carry-forward, oracled by DuckDB's native ASOF LEFT JOIN.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        // unique (user, ts) on the right so the as-of pick is deterministic
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("__r"))
          .select(col("user_id"), col("ts"),
            col("__r.event_id").as("view_id"), col("__r.value").as("view_value"))
        graft.plans.AsOf.asofJoin(clicks, views, "user_id", "ts",
            Seq("view_id", "view_value"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("asof_view_id"),
            (col("asof_view_value").cast("decimal(18,2)") * 100).cast("long")
              .as("view_value_c"))
          .orderBy("event_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
           |views AS (
           |  SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
           |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           |    FROM ev WHERE event_type = 'view') WHERE rn = 1
           |)
           |SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |  v.view_id AS asof_view_id,
           |  CAST(CAST(v.view_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS view_value_c
           |FROM clicks c ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
           |ORDER BY event_id""".stripMargin),
      bench = true),

    Q("join_asof_nearest",
      // nearest-direction as-of (pandas merge_asof direction='nearest'):
      // each click matched to the user's CLOSEST view in either
      // direction, equidistant → backward. Two window candidates over
      // the one union-tag sort (still a single exchange); the oracle
      // takes DuckDB's native backward ASOF plus a strictly-forward ASOF
      // and replays the identical pick rule, including the audited match
      // direction.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("__r"))
          .select(col("user_id"), col("ts"),
            col("__r.event_id").as("view_id"), col("__r.value").as("view_value"))
        graft.plans.AsOf.asofJoinNearest(clicks, views, "user_id", "ts",
            Seq("view_id", "view_value"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("asof_view_id"),
            (col("asof_view_value").cast("decimal(18,2)") * 100).cast("long")
              .as("view_value_c"),
            when(col("asof_ts").isNull, lit(null).cast("string"))
              .when(col("asof_ts") <= col("ts"), lit("b"))
              .otherwise(lit("f")).as("dir"))
          .orderBy("event_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
           |views AS (
           |  SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
           |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           |    FROM ev WHERE event_type = 'view') WHERE rn = 1
           |),
           |bk AS (SELECT c.event_id, v.view_id, v.view_value, v.ts AS vts
           |       FROM clicks c ASOF LEFT JOIN views v
           |         ON c.user_id = v.user_id AND c.ts >= v.ts),
           |fw AS (SELECT c.event_id, v.view_id, v.view_value, v.ts AS vts
           |       FROM clicks c ASOF LEFT JOIN views v
           |         ON c.user_id = v.user_id AND c.ts < v.ts),
           |pick AS (SELECT c.event_id, c.user_id, c.ts,
           |    CASE WHEN bk.vts IS NOT NULL AND (fw.vts IS NULL OR
           |           epoch_us(c.ts) - epoch_us(bk.vts)
           |             <= epoch_us(fw.vts) - epoch_us(c.ts))
           |         THEN 'b'
           |         WHEN fw.vts IS NOT NULL THEN 'f' END AS dir,
           |    bk.view_id AS b_id, bk.view_value AS b_val,
           |    fw.view_id AS f_id, fw.view_value AS f_val
           |  FROM clicks c
           |  LEFT JOIN bk ON bk.event_id = c.event_id
           |  LEFT JOIN fw ON fw.event_id = c.event_id)
           |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |  CASE dir WHEN 'b' THEN b_id WHEN 'f' THEN f_id END AS asof_view_id,
           |  CAST(CAST(CASE dir WHEN 'b' THEN b_val WHEN 'f' THEN f_val END
           |    AS DECIMAL(18,2)) * 100 AS BIGINT) AS view_value_c,
           |  dir
           |FROM pick ORDER BY event_id""".stripMargin)),

    Q("join_tpch_q10_shape",
      // the TPC-H Q10 returned-item reporting shape: customers ranked by
      // revenue lost to returns in one quarter — returnflag-filtered
      // lineitem joined up through date-filtered orders to customer
      // (fact-sized — join strategy left to the planner) and nation
      // (bounded 25-row dim, broadcast), exact-decimal revenue,
      // top-20 by (revenue, custkey) heap. The classic "who do I call
      // about returns" star query.
      (s, d) => {
        val l = tbl(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val o = tbl(s, d, "orders")
          .filter(col("o_orderdate").cast("date") >= lit("1995-01-01").cast("date") &&
            col("o_orderdate").cast("date") < lit("1995-04-01").cast("date"))
          .select("o_orderkey", "o_custkey")
        val c = tbl(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        val n = tbl(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val g = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .multiply(10000).cast("long").as("revenue_e4"))
        graft.plans.TopK.perGroup(g.withColumn("__g", lit(1)), Seq("__g"),
            col("revenue_e4"), col("c_custkey"), 20)
          .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("c_custkey"))
      },
      Some(
        """WITH g AS (
          |  SELECT c_custkey, c_name, n_name,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  WHERE l_returnflag = 'R'
          |    AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
          |    AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
          |  GROUP BY 1, 2, 3)
          |SELECT c_custkey, c_name, n_name, revenue_e4
          |FROM (SELECT *, row_number() OVER (ORDER BY revenue_e4 DESC, c_custkey) AS rn FROM g)
          |WHERE rn <= 20 ORDER BY revenue_e4 DESC, c_custkey""".stripMargin)),

    Q("join_tpch_q3_shape",
      // the TPC-H Q3 shipping-priority shape: unshipped-revenue top-10 —
      // segment-filtered customers (fact-sized at scale — no forced
      // broadcast; planner decides), date-bounded orders,
      // ship-date-filtered lineitem, exact-decimal revenue per order, and
      // the global top-10 via orderBy+limit which Spark plans as
      // TakeOrderedAndProject (per-partition heaps + driver merge of 10-row
      // heads — never a global sort; the scale-correct top-k).
      (s, d) => {
        val c = tbl(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = tbl(s, d, "orders")
          .filter(col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = tbl(s, d, "lineitem")
          .filter(col("l_shipdate").cast("date") > lit("1997-01-01").cast("date"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("o_day"),
            col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .multiply(10000).cast("long").as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey,
          |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_day, o_orderpriority,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
          |  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
          |GROUP BY 1, 2, 3
          |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin),
      bench = true),

    Q("join_tpch_q18_shape",
      // the TPC-H Q18 large-volume-customer shape: orders whose total line
      // quantity clears a floor. The classic formulation re-joins lineitem
      // against an IN-subquery of itself; here the grouped quantity table
      // is computed ONCE and reused as both the filter and the measure —
      // one lineitem scan, one shuffle, then the orders/customer hops
      // (both fact-sized: join strategy left to the planner).
      (s, d) => {
        val big = tbl(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
          .filter(col("qty") > lit(250).cast("decimal(18,2)"))
          .select(col("l_orderkey"), col("qty").multiply(100).cast("long").as("qty_c"))
        big.join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("date").cast("string").as("o_day"),
            col("o_totalprice").cast("decimal(18,2)").multiply(100)
              .cast("long").as("price_c"), col("qty_c"))
          .orderBy(col("price_c").desc, col("o_orderkey"))
      },
      Some(
        """WITH big AS (
          |  SELECT l_orderkey,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_c
          |  FROM lineitem GROUP BY 1
          |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2)))
          |SELECT c_name, c_custkey, o_orderkey,
          |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_day,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c, qty_c
          |FROM big JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |ORDER BY price_c DESC, o_orderkey""".stripMargin)),

    Q("join_asof_tolerance",
      // as-of join with a staleness bound (pandas merge_asof tolerance):
      // the latest view at-or-before each click counts only within 10
      // minutes — older context is stale and nulls out. One projection on
      // top of the as-of carry-forward, not a different plan; the oracle
      // gates DuckDB's native ASOF match on the same measured lag.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("__r"))
          .select(col("user_id"), col("ts"),
            col("__r.event_id").as("view_id"), col("__r.value").as("view_value"))
        graft.plans.AsOf.asofJoinTolerance(clicks, views, "user_id", "ts",
            Seq("view_id", "view_value"), toleranceSeconds = 600L)
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
            col("asof_view_id"),
            (col("asof_view_value").cast("decimal(18,2)") * 100).cast("long")
              .as("view_value_c"))
          .orderBy("event_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
           |views AS (
           |  SELECT user_id, ts, event_id AS view_id, value AS view_value FROM (
           |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
           |    FROM ev WHERE event_type = 'view') WHERE rn = 1
           |),
           |j AS (SELECT c.event_id, c.user_id, c.ts, v.ts AS vts, v.view_id, v.view_value
           |      FROM clicks c ASOF LEFT JOIN views v
           |        ON c.user_id = v.user_id AND c.ts >= v.ts)
           |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           |  CASE WHEN vts IS NULL OR epoch_us(ts) - epoch_us(vts) > 600000000
           |       THEN NULL ELSE view_id END AS asof_view_id,
           |  CASE WHEN vts IS NULL OR epoch_us(ts) - epoch_us(vts) > 600000000
           |       THEN NULL
           |       ELSE CAST(CAST(view_value AS DECIMAL(18,2)) * 100 AS BIGINT) END AS view_value_c
           |FROM j ORDER BY event_id""".stripMargin)),

    Q("join_range_events",
      // band join (§2.12): click-purchase pairs of the same user within
      // 5 minutes — interval-bucketed equi-join, never a nested loop.
      (s, d) => {
        val ev = eventsTable(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            unix_micros(col("ts")).as("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("t"))
        graft.plans.RangeJoin.bandPairs(clicks, purchases, "user_id", "t",
            width = 300000000L)
          .select(col("l.click_id").as("click_id"),
            col("r.purchase_id").as("purchase_id"),
            (col("r.t") - col("l.t")).as("delta_us"))
          .orderBy("click_id", "purchase_id")
      },
      Some(
        s"""WITH $EV_SQL,
           |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS t FROM ev WHERE event_type = 'click'),
           |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t FROM ev WHERE event_type = 'purchase')
           |SELECT c.click_id, p.purchase_id, p.t - c.t AS delta_us
           |FROM c JOIN p ON c.user_id = p.user_id AND abs(c.t - p.t) <= 300000000
           |ORDER BY click_id, purchase_id""".stripMargin),
      bench = true),

    Q("join_salted_skew",
      // explicit-salt equi-join (§2.12 skew discipline): the probe's hot
      // supplier keys are spread over 8 tasks by a deterministic salt from
      // l_orderkey while the build side replicates ×8 — row-for-row equal
      // to the plain join (the oracle IS the plain join), for the cases
      // AQE's skew split can't reach (shuffled-hash path, downstream
      // stateful ops). The aggregate pins the join's row multiset.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val supp = tbl(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        graft.plans.Skew.saltedJoin(li, supp, Seq("l_suppkey"),
            col("l_orderkey"), salts = 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
          .orderBy("s_nationkey")
      },
      Some(
        """SELECT s_nationkey, count(*) AS n_items,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    Q("join_tpch_q5_shape",
      // the TPC-H Q5 shape — the deepest join tree on the board: SIX
      // tables, with the c_nationkey = s_nationkey residual (the
      // predicate that makes Q5 a benchmark classic). Plan: only the
      // geography-bounded region→nation spine broadcasts EXPLICITLY;
      // supplier is FACT-sized (grows linearly with SF — ~1 B rows at
      // the 100 TB design point, 1/5 of it after the ASIA filter), so
      // its join, like customer's, is left to the planner — equi keys
      // with the nationkey residual, shuffle joins at 100 TB and
      // auto-broadcasts at test SF. Revenue in exact decimal→e4 longs.
      (s, d) => {
        val lo = lit("1996-01-01").cast("timestamp")
        val hi = lit("1997-01-01").cast("timestamp")
        val rn = tbl(s, d, "region").filter(col("r_name") === "ASIA")
          .select("r_regionkey")
          .join(tbl(s, d, "nation"),
            col("r_regionkey") === col("n_regionkey"))
          .select("n_nationkey", "n_name")
        val sup = tbl(s, d, "supplier")
          .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val cust = tbl(s, d, "customer").select("c_custkey", "c_nationkey")
        val o = tbl(s, d, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select("o_orderkey", "o_custkey")
        val l = tbl(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .multiply(10000).cast("long").as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("n_name"))
      },
      Some(
        """SELECT n_name,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM customer, orders, lineitem, supplier, nation, region
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name ORDER BY revenue_e4 DESC, n_name""".stripMargin),
      bench = true),

    Q("join_theta_bands",
      // pure THETA join (non-equi, no equality conjunct): price-band
      // lookup via half-open [lo, hi) range predicates against a 5-row
      // bands dim. The broadcast nested-loop join is the CORRECT plan
      // here — a tiny broadcast side scanned per row beats any shuffle,
      // and is the only strategy for a genuinely equality-free
      // condition. Cents-integer bounds keep the boundary decisions
      // exact in both engines.
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("p0_under_10k", 0L, 1000000L),
          ("p1_10k_25k", 1000000L, 2500000L),
          ("p2_25k_50k", 2500000L, 5000000L),
          ("p3_50k_75k", 5000000L, 7500000L),
          ("p4_75k_up", 7500000L, Long.MaxValue))
          .toDF("band", "lo_c", "hi_c")
        val li = tbl(s, d, "lineitem")
          .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_c"))
        li.join(broadcast(bands),
            col("price_c") >= col("lo_c") && col("price_c") < col("hi_c"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("band")
      },
      Some(
        """WITH bands(band, lo_c, hi_c) AS (VALUES
          |  ('p0_under_10k', 0, 1000000),
          |  ('p1_10k_25k', 1000000, 2500000),
          |  ('p2_25k_50k', 2500000, 5000000),
          |  ('p3_50k_75k', 5000000, 7500000),
          |  ('p4_75k_up', 7500000, 9223372036854775807)),
          |li AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          |       FROM lineitem)
          |SELECT band, count(*) AS n_items,
          |  CAST(sum(price_c) AS BIGINT) AS sum_price_c
          |FROM li JOIN bands ON price_c >= lo_c AND price_c < hi_c
          |GROUP BY band ORDER BY band""".stripMargin)),

    Q("join_correlated_subquery",
      // correlated scalar subqueries (orders priced above 2× their own
      // customer's average), written in SQL so Catalyst's decorrelation
      // rewrites them — at scale this MUST become one aggregate + one join
      // over orders, not a per-row re-scan. The threshold compare is exact
      // integer cross-multiplication (price_cents × n > 2 × sum_cents), so
      // no engine ever divides: DuckDB's double avg() vs Spark's decimal
      // avg() can disagree in the last ulp exactly at the boundary rows.
      (s, d) => {
        tbl(s, d, "orders").createOrReplaceTempView("corr_sq_orders")
        tbl(s, d, "customer").createOrReplaceTempView("corr_sq_customer")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n,
            |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
            |FROM corr_sq_orders o JOIN corr_sq_customer c ON o_custkey = c_custkey
            |WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            |      * (SELECT count(*) FROM corr_sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
            |    > 2 * (SELECT CAST(sum(CAST(CAST(o2.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
            |           FROM corr_sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some(
        """SELECT c_mktsegment, count(*) AS n,
          |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
          |FROM orders o JOIN customer c ON o_custkey = c_custkey
          |WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          |      * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |    > 2 * (SELECT CAST(sum(CAST(CAST(o2.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
          |           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("join_tpch_q21_shape",
      // the TPC-H Q21 waiting-orders shape — the hardest decorrelation
      // face: EXISTS + NOT EXISTS correlated self-joins on the fact table
      // itself. Suppliers (in two nations) whose line was flagged late
      // (l_returnflag = 'R' stands in for receiptdate > commitdate — the
      // test tables carry no receipt/commit dates) on a finalized order,
      // where the order is multi-supplier (EXISTS a line from another
      // supplier) and this supplier is the ONLY late one (NOT EXISTS a
      // late line from another supplier). Written in SQL so Catalyst
      // decorrelates: at scale both subqueries MUST become one LeftSemi
      // and one LeftAnti join on l_orderkey — never a re-scan per row.
      // PlanShapeSpec pins exactly that.
      (s, d) => {
        tbl(s, d, "lineitem").createOrReplaceTempView("q21_lineitem")
        tbl(s, d, "orders").createOrReplaceTempView("q21_orders")
        tbl(s, d, "supplier").createOrReplaceTempView("q21_supplier")
        tbl(s, d, "nation").createOrReplaceTempView("q21_nation")
        s.sql(
          """SELECT s_name, count(*) AS numwait
            |FROM q21_supplier JOIN q21_lineitem l1 ON s_suppkey = l1.l_suppkey
            |JOIN q21_orders ON o_orderkey = l1.l_orderkey
            |JOIN q21_nation ON s_nationkey = n_nationkey
            |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
            |  AND n_name IN ('NATION_7', 'NATION_13')
            |  AND EXISTS (SELECT 1 FROM q21_lineitem l2
            |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
            |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
            |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            |      AND l3.l_returnflag = 'R')
            |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
      },
      Some(
        """SELECT s_name, count(*) AS numwait
          |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND n_name IN ('NATION_7', 'NATION_13')
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_returnflag = 'R')
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
      bench = true),

    Q("join_tpch_q13_shape",
      // the TPC-H Q13 customer-distribution shape — the outer-aggregation
      // face: LEFT OUTER join customer→orders with the order predicate in
      // the ON clause (expressed here by pre-filtering the right side —
      // identical semantics, and the filter pushes to the orders scan), so
      // customers with zero qualifying orders still land in the c_count=0
      // bucket; then a second aggregation over the per-customer counts.
      // Two shuffles total (custkey, then the tiny c_count distribution).
      (s, d) => {
        val co = tbl(s, d, "customer").select("c_custkey")
          .join(tbl(s, d, "orders")
              .filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
              .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        co.groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        """SELECT c_count, count(*) AS custdist FROM (
          |  SELECT c_custkey, count(o_orderkey) AS c_count
          |  FROM customer LEFT OUTER JOIN orders
          |    ON c_custkey = o_custkey AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |  GROUP BY c_custkey) co
          |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      bench = true),

    Q("join_tpch_q16_shape",
      // the TPC-H Q16 supplier-count shape — anti-join + count-distinct:
      // the part-supplier relation (distinct (l_partkey, l_suppkey) from
      // lineitem — the test tables carry no partsupp) anti-joined against
      // excluded suppliers (negative balance stands in for the complaints
      // predicate), joined to brand/type/size-filtered parts, then
      // count(DISTINCT ps_suppkey) per (brand, type, size). supplier is
      // fact-sized, so the anti-join strategy is left to the planner.
      (s, d) => {
        val ps = tbl(s, d, "lineitem")
          .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
          .distinct()
        val excluded = tbl(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        val p = tbl(s, d, "part")
          .filter(col("p_brand") =!= "Brand#45" &&
            !col("p_type").startsWith("MEDIUM") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        ps.join(excluded, col("ps_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("ps_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some(
        """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
          |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
          |FROM ps JOIN part ON p_partkey = ps_partkey
          |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
          |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          |  AND NOT EXISTS (SELECT 1 FROM supplier
          |    WHERE s_suppkey = ps_suppkey AND s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    Q("join_tpcds_q67_shape",
      // TPC-DS Q67 plan shape — rank() over a ROLLUP lattice on a star,
      // the windowed-rollup combination neither the TPC-H sweep nor Q51
      // exercises: lineitem ⋈ orders ⋈ part aggregated over
      // ROLLUP(brand, type, year, month) (Expand + one hash aggregate —
      // the lattice costs ONE shuffle, not one scan per level), rolled
      // keys emitted as 'ALL' (never NULL: engines disagree on NULL sort
      // order), then a per-brand top-100 by revenue ACROSS lattice
      // levels. The rank window's input is the rollup REDUCE — bounded
      // by brand×type×calendar, not the scale factor — so the low-card
      // partition key is safe where the same window over raw fact rows
      // would not be. row_number with a full tiebreak chain keeps every
      // rank hash-deterministic.
      // stated in SQL: Dataset.rollup's Expand re-emits nullable twins of
      // the grouping attributes, and ANY later unqualified reference to
      // them (col(), selectExpr, even a window partition key) trips the
      // ambiguous-self-join detector; the SQL form resolves cleanly and
      // plans identically (Expand + one hash aggregate)
      (s, d) => {
        tbl(s, d, "lineitem").createOrReplaceTempView("q67_li")
        tbl(s, d, "orders").createOrReplaceTempView("q67_ord")
        tbl(s, d, "part").createOrReplaceTempView("q67_part")
        s.sql(
          """WITH star AS (SELECT p_brand, p_type,
            |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
            |    CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
            |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
            |  FROM q67_li
            |  JOIN q67_ord ON l_orderkey = o_orderkey
            |  JOIN q67_part ON l_partkey = p_partkey),
            |rolled AS (SELECT
            |    COALESCE(p_brand, 'ALL') AS brand_r,
            |    COALESCE(p_type, 'ALL') AS type_r,
            |    COALESCE(CAST(yr AS STRING), 'ALL') AS yr_r,
            |    COALESCE(CAST(mo AS STRING), 'ALL') AS mo_r,
            |    CAST(sum(rev_c) AS BIGINT) AS sumsales_c
            |  FROM star GROUP BY ROLLUP (p_brand, p_type, yr, mo)),
            |ranked AS (SELECT *, row_number() OVER (PARTITION BY brand_r
            |    ORDER BY sumsales_c DESC, type_r, yr_r, mo_r) AS rk
            |  FROM rolled)
            |SELECT brand_r, type_r, yr_r, mo_r, sumsales_c,
            |  CAST(rk AS BIGINT) AS rk
            |FROM ranked WHERE rk <= 100 ORDER BY brand_r, rk""".stripMargin)
      },
      Some(
        """WITH star AS (SELECT p_brand, p_type,
          |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          |    CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
          |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN part ON l_partkey = p_partkey),
          |rolled AS (SELECT
          |    COALESCE(p_brand, 'ALL') AS brand_r,
          |    COALESCE(p_type, 'ALL') AS type_r,
          |    COALESCE(CAST(yr AS VARCHAR), 'ALL') AS yr_r,
          |    COALESCE(CAST(mo AS VARCHAR), 'ALL') AS mo_r,
          |    CAST(sum(rev_c) AS BIGINT) AS sumsales_c
          |  FROM star GROUP BY ROLLUP (p_brand, p_type, yr, mo)),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY brand_r
          |    ORDER BY sumsales_c DESC, type_r, yr_r, mo_r) AS rk
          |  FROM rolled)
          |SELECT brand_r, type_r, yr_r, mo_r, sumsales_c, CAST(rk AS BIGINT) AS rk
          |FROM rk WHERE rk <= 100 ORDER BY brand_r, rk""".stripMargin),
      bench = true),

    Q("join_tpcds_q35_shape",
      // TPC-DS Q35 plan shape — the EXISTS DISJUNCTION: customers with
      // open orders AND (a big-ticket order OR a bulk line item), grouped
      // by demographics. The first EXISTS decorrelates to a LeftSemi; the
      // OR of two EXISTS cannot (a semi-join can't express "either") —
      // Catalyst plans each disjunct as an ExistenceJoin producing a
      // boolean exists-flag column that the filter ORs, the one join type
      // the rest of the registry never produces (plan-pinned). Stated in
      // SQL because the DataFrame API has no ExistenceJoin surface —
      // which is the point: the optimizer picks it from the declarative
      // EXISTS form. All three subqueries stay equi-correlated on
      // custkey, so every join shuffles on a data-sized key.
      (s, d) => {
        tbl(s, d, "customer").createOrReplaceTempView("q35_cust")
        tbl(s, d, "orders").createOrReplaceTempView("q35_ord")
        tbl(s, d, "lineitem").createOrReplaceTempView("q35_li")
        s.sql(
          """SELECT c_nationkey, c_mktsegment, count(*) AS cnt,
            |  min(bal_c) AS min_bal_c, max(bal_c) AS max_bal_c,
            |  sum(bal_c) AS sum_bal_c
            |FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
            |        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
            |      FROM q35_cust) c
            |WHERE EXISTS (SELECT 1 FROM q35_ord o
            |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
            |  AND (EXISTS (SELECT 1 FROM q35_ord o2
            |         WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 250000)
            |    OR EXISTS (SELECT 1 FROM q35_li l JOIN q35_ord o3
            |           ON l.l_orderkey = o3.o_orderkey
            |         WHERE o3.o_custkey = c.c_custkey AND l.l_quantity >= 49))
            |GROUP BY c_nationkey, c_mktsegment
            |ORDER BY c_nationkey, c_mktsegment""".stripMargin)
      },
      Some(
        """SELECT c_nationkey, c_mktsegment, count(*) AS cnt,
          |  min(bal_c) AS min_bal_c, max(bal_c) AS max_bal_c,
          |  CAST(sum(bal_c) AS BIGINT) AS sum_bal_c
          |FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
          |        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
          |      FROM customer) c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
          |  AND (EXISTS (SELECT 1 FROM orders o2
          |         WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 250000)
          |    OR EXISTS (SELECT 1 FROM lineitem l JOIN orders o3
          |           ON l.l_orderkey = o3.o_orderkey
          |         WHERE o3.o_custkey = c.c_custkey AND l.l_quantity >= 49))
          |GROUP BY c_nationkey, c_mktsegment
          |ORDER BY c_nationkey, c_mktsegment""".stripMargin),
      bench = true),

    Q("join_tpcds_q51_shape",
      // TPC-DS Q51 plan shape — the one TPC-H's 22 queries never exercise:
      // two per-key daily CUMULATIVE series (window sums partitioned by
      // the HIGH-cardinality customer key, aliased clerk — per-task state
      // is one key's days, so the shape scales where a low-card partition
      // would not),
      // FULL OUTER joined on (clerk, day) because either channel can be
      // silent on a day, then a running MAX over each side of the merged
      // calendar and the crossover filter (the day one channel's lifetime
      // total overtakes the other's). Channels are the F/O order-status
      // slices standing in for Q51's web/store. Deterministic top-100 by
      // the unique (clerk, day).
      (s, d) => {
        val daily = tbl(s, d, "orders")
          .groupBy(col("o_custkey").as("clerk"),
            col("o_orderdate").cast("date").as("day"),
            col("o_orderstatus").as("st"))
          .agg(cents(col("o_totalprice")).as("rev_c"))
        val w = Window.partitionBy("clerk").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        def cum(status: String, outCol: String): DataFrame =
          daily.filter(col("st") === status)
            .withColumn(outCol, sum(col("rev_c")).over(w))
            .select(col("clerk"), col("day"), col(outCol))
        val joined = cum("F", "cum_f")
          .join(cum("O", "cum_o"), Seq("clerk", "day"), "full_outer")
        joined
          .withColumn("max_f", coalesce(max(col("cum_f")).over(w), lit(0L)))
          .withColumn("max_o", coalesce(max(col("cum_o")).over(w), lit(0L)))
          .filter(col("max_o") > col("max_f"))
          .select(col("clerk"), col("day").cast("string").as("day"),
            col("max_f"), col("max_o"))
          .orderBy("clerk", "day").limit(100)
      },
      Some(
        """WITH daily AS (SELECT o_custkey AS clerk, CAST(o_orderdate AS DATE) AS day,
          |    o_orderstatus AS st,
          |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
          |  FROM orders GROUP BY 1, 2, 3),
          |fa AS (SELECT clerk, day, CAST(sum(rev_c) OVER (PARTITION BY clerk ORDER BY day
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_f
          |       FROM daily WHERE st = 'F'),
          |ob AS (SELECT clerk, day, CAST(sum(rev_c) OVER (PARTITION BY clerk ORDER BY day
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_o
          |       FROM daily WHERE st = 'O'),
          |j AS (SELECT COALESCE(fa.clerk, ob.clerk) AS clerk,
          |        COALESCE(fa.day, ob.day) AS day, cum_f, cum_o
          |      FROM fa FULL JOIN ob ON ob.clerk = fa.clerk AND ob.day = fa.day),
          |r AS (SELECT clerk, day,
          |        COALESCE(max(cum_f) OVER (PARTITION BY clerk ORDER BY day
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS max_f,
          |        COALESCE(max(cum_o) OVER (PARTITION BY clerk ORDER BY day
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS max_o
          |      FROM j)
          |SELECT clerk, CAST(day AS VARCHAR) AS day, max_f, max_o
          |FROM r WHERE max_o > max_f ORDER BY clerk, day LIMIT 100""".stripMargin),
      bench = true),

    Q("join_tpcds_q72_shape",
      // TPC-DS Q72's defining plan features on the TPC-H-ish tables: a
      // FACT×FACT equi-join (lineitem×orders on orderkey — neither side
      // broadcastable) whose join condition carries NON-EQUI residuals
      // evaluated inside the join — a date-CHAIN arithmetic predicate
      // (shipped more than 5 days after order: Q72's
      // d3.d_date > d1.d_date + 5) and a cross-side price inequality
      // (Q72's inv_quantity_on_hand < cs_quantity). Neither residual can
      // push to a scan (each references both sides), so the planner must
      // keep the orderkey equi-key for the shuffle and evaluate the
      // residuals as join filters — the sort-merge-with-residual shape a
      // 100 TB fact-fact join lives or dies on. Broadcast part dim on
      // top (the Q72 star), then the monthly per-brand census of late,
      // under-priced lines.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
        val o = tbl(s, d, "orders")
        val p = tbl(s, d, "part")
        val j = li.join(o, li("l_orderkey") === o("o_orderkey") &&
          to_date(li("l_shipdate")) > date_add(to_date(o("o_orderdate")), 5) &&
          li("l_extendedprice").cast("decimal(18,2)") * 4 <
            o("o_totalprice").cast("decimal(18,2)"))
        // part is NOT hinted: it scales with SF (a fact in the lint's
        // book) — at test SF AQE auto-broadcasts it, at 100 TB the
        // partkey equi-join shuffles, both correct
        j.join(p, li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            date_format(li("l_shipdate"), "yyyy-MM").as("mon"))
          .agg(count(lit(1)).as("n_late"),
            sum(li("l_quantity").cast("long")).as("qty"))
          .orderBy("brand", "mon")
      },
      Some(
        """SELECT p.p_brand AS brand, strftime(l.l_shipdate, '%Y-%m') AS mon,
          |  count(*) AS n_late,
          |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 5
          |  AND CAST(l.l_extendedprice AS DECIMAL(18,2)) * 4
          |      < CAST(o.o_totalprice AS DECIMAL(18,2))
          |JOIN part p ON p.p_partkey = l.l_partkey
          |GROUP BY 1, 2 ORDER BY brand, mon""".stripMargin),
      bench = true),

    Q("join_tpcds_q95_shape",
      // TPC-DS Q95's defining feature: TWO correlated EXISTS over the
      // same fact, one of them a fact-fact SELF join whose condition
      // carries an inequality residual — "shipped from more than one
      // warehouse" (ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk on the
      // same order) AND "has a return". Here: orders whose lineitems
      // come from ≥ 2 distinct suppliers (lineitem×lineitem equi on
      // orderkey + supplier <> residual, planned LeftSemi — fanout
      // bounded by order size, shuffle on the equi key) and with ≥ 1
      // returned line; monthly order/revenue census of that slice.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
        val o = tbl(s, d, "orders")
        val l1 = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val l2 = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val multi = l1.join(l2,
            col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
          .select(col("ok")).distinct()
        val returned = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("rk"))
        o.join(multi, o("o_orderkey") === multi("ok"), "left_semi")
          .join(returned, o("o_orderkey") === returned("rk"), "left_semi")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
          .agg(count(lit(1)).as("n_orders"), cents(col("o_totalprice")).as("rev_c"))
          .orderBy("mon")
      },
      Some(
        """SELECT strftime(o.o_orderdate, '%Y-%m') AS mon, count(*) AS n_orders,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
          |    ON l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          |    WHERE l1.l_orderkey = o.o_orderkey)
          |  AND EXISTS (SELECT 1 FROM lineitem lr
          |    WHERE lr.l_orderkey = o.o_orderkey AND lr.l_returnflag = 'R')
          |GROUP BY 1 ORDER BY mon""".stripMargin),
      bench = true),

    Q("join_tpcds_q64_shape",
      // TPC-DS Q64's defining MULTI-PASS feature: an aggregated star CTE
      // (cross_sales) joined TO ITSELF across two periods with a
      // crossover predicate (Q64: cs2.cnt <= cs1.cnt on the same item).
      // Two logical passes over the same star, ONE physical scan: the
      // brand×year star aggregate materializes once (lazy
      // localCheckpoint — the dash_dashboard_suite chain-boundary trick)
      // and both self-join sides read the cached frame; without it each
      // side would re-run the lineitem scan + part join. The self-join
      // keys on brand (bounded output), so the second pass is
      // broadcast-sized no matter the fact SF.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
        val p = tbl(s, d, "part")
        val sales = li.join(p, li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            year(to_date(col("l_shipdate"))).cast("long").as("yr"))
          .agg(count(lit(1)).as("cnt"),
            cents(col("l_extendedprice")).as("rev_c"))
          .truncateLineage()
        val c1 = sales.filter(col("yr") === 1996)
          .select(col("brand"), col("cnt").as("cnt1"), col("rev_c").as("rev1_c"))
        val c2 = sales.filter(col("yr") === 1997)
          .select(col("brand"), col("cnt").as("cnt2"), col("rev_c").as("rev2_c"))
        c1.join(c2, "brand")
          .filter(col("cnt2") <= col("cnt1"))
          .orderBy("brand")
      },
      Some(
        """WITH q64s AS (SELECT p.p_brand AS brand,
          |    CAST(year(l.l_shipdate) AS BIGINT) AS yr, count(*) AS cnt,
          |    CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
          |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |  GROUP BY 1, 2)
          |SELECT a.brand, a.cnt AS cnt1, a.rev_c AS rev1_c,
          |  b.cnt AS cnt2, b.rev_c AS rev2_c
          |FROM q64s a JOIN q64s b ON b.brand = a.brand
          |  AND a.yr = 1996 AND b.yr = 1997
          |WHERE b.cnt <= a.cnt ORDER BY a.brand""".stripMargin),
      bench = true),

    Q("join_spatial_grid",
      // spatial radius self-join via grid bucketing — the classic
      // cell-partitioned spatial join: deterministic fixed-point
      // coordinates (md5 head-32 of the customer key, mod 10 000), cell
      // side = radius, the LEFT side exploded to its 3×3 neighbor cells
      // and equi-joined on the cell key, then the exact squared-distance
      // filter. Each unordered pair survives exactly once (b's cell is
      // hit once by a's expansion; a_id < b_id keeps one orientation).
      // The scale story: candidate pairs are O(n · local density), an
      // EQUI-join on cell keys the planner can shuffle-partition — vs the
      // oracle's O(n²) all-pairs scan, the brute-force DEFINITION this
      // query is hash-checked against (same pattern as ppjoin vs
      // brute-force Jaccard). At 100 TB the cell key partitions the
      // world; skewed cells are ordinary AQE skew-join territory.
      (s, d) => {
        val pts = tbl(s, d, "customer").select(col("c_custkey").as("id"))
          .withColumn("x", pmod(graft.analytics.Sketch.hashPoint32(
            concat(lit("gx#"), col("id").cast("string"))), lit(10000L)))
          .withColumn("y", pmod(graft.analytics.Sketch.hashPoint32(
            concat(lit("gy#"), col("id").cast("string"))), lit(10000L)))
          .select("id", "x", "y")
        graft.analytics.Spatial.gridRadiusJoin(pts, radius = 150L)
          .orderBy("a_id", "b_id")
      },
      Some {
        val gx = graft.queries.OracleShared.hx("md5('gx#' || CAST(c_custkey AS VARCHAR))")
        val gy = graft.queries.OracleShared.hx("md5('gy#' || CAST(c_custkey AS VARCHAR))")
        s"""WITH pts AS (SELECT c_custkey AS id,
           |    ($gx) % 10000 AS x,
           |    ($gy) % 10000 AS y
           |  FROM customer)
           |SELECT a.id AS a_id, b.id AS b_id,
           |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
           |FROM pts a JOIN pts b ON b.id > a.id
           |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500
           |ORDER BY a_id, b_id""".stripMargin
      },
      bench = true),

    Q("join_spatial_grid_clustered",
      // the SKEWED twin of join_spatial_grid: every 20th point lands in
      // the single 150×150 hot cell (a dense city / clustered corpus),
      // the rest stay uniform — so one cell key carries ~5% of all points
      // while the median cell holds ~0-3, the zipf-shaped reality the
      // uniform row cannot exercise. The cell join is MERGE-PINNED (the
      // join_skew_stress convention: auto-broadcast of the small side at
      // test SF would erase the shuffle whose skew is being measured);
      // AqeSkewSpec drives this exact operator shape with shrunk
      // thresholds and pins AQE splitting the hot cell (skew=true), so
      // "skewed cells are ordinary AQE skew-join territory" is a measured
      // property. Same brute-force O(n²) oracle definition.
      (s, d) => {
        val hx = graft.analytics.Sketch.hashPoint32(
          concat(lit("gcx#"), col("id").cast("string")))
        val hy = graft.analytics.Sketch.hashPoint32(
          concat(lit("gcy#"), col("id").cast("string")))
        val pts = tbl(s, d, "customer").select(col("c_custkey").as("id"))
          .withColumn("x", when(pmod(col("id"), lit(20)) === 0,
            pmod(hx, lit(150L))).otherwise(pmod(hx, lit(10000L))))
          .withColumn("y", when(pmod(col("id"), lit(20)) === 0,
            pmod(hy, lit(150L))).otherwise(pmod(hy, lit(10000L))))
          .select("id", "x", "y")
        graft.analytics.Spatial.gridRadiusJoin(pts, radius = 150L,
            pinMerge = true)
          .orderBy("a_id", "b_id")
      },
      Some {
        val gx = graft.queries.OracleShared.hx("md5('gcx#' || CAST(c_custkey AS VARCHAR))")
        val gy = graft.queries.OracleShared.hx("md5('gcy#' || CAST(c_custkey AS VARCHAR))")
        s"""WITH cgp AS (SELECT c_custkey AS id,
           |    CASE WHEN c_custkey % 20 = 0 THEN ($gx) % 150
           |         ELSE ($gx) % 10000 END AS x,
           |    CASE WHEN c_custkey % 20 = 0 THEN ($gy) % 150
           |         ELSE ($gy) % 10000 END AS y
           |  FROM customer)
           |SELECT a.id AS a_id, b.id AS b_id,
           |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
           |FROM cgp a JOIN cgp b ON b.id > a.id
           |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500
           |ORDER BY a_id, b_id""".stripMargin
      },
      bench = true),

    Q("join_dbscan_grid",
      // density clustering (DBSCAN) as a composition of two operators the
      // engine already scales: the grid-bucketed radius join for the
      // ε-neighborhood pairs and min-label connected components for the
      // cluster closure. The fixture is DENSITY-INVARIANT in SF: with
      // r = ⌈√n⌉ the uniform field spans (100r)² — ≈ 1 ε-neighbor per
      // field point at EVERY SF — and each of the three diagonal blobs
      // (every 20th customer, blob = (id DIV 20) % 3) spans (2r+1)²,
      // ≈ 46 ε-neighbors at ε = 60, so blob interiors are core
      // (minPts = 5), the field is noise, fringes are border, and the
      // phase structure / CC round count / per-grid-cell load all stay
      // fixed as n grows. (A fixed extent would percolate the field
      // into one SF-spanning core component past ~150k points and the
      // min-label closure would not converge; below ~1k points no blob
      // reaches minPts and everything is deterministically noise.)
      // Semantics made deterministic where textbook DBSCAN is
      // scan-order-dependent: a core's cluster is the min core id of its
      // core-connected component; a border point (non-core with ≥ 1 core
      // neighbor) joins the MIN cluster among its core neighbors; noise
      // is cluster −1. Scale shape: ε-pairs are an equi-join on cell keys
      // (O(n · local density), never all-pairs) materialized ONCE (lazy
      // localCheckpoint — pairs feed degree, core edges, AND border
      // resolution; without it the dominant join re-executes per branch),
      // degree is one count, the closure iterates only over core-core
      // edges — vs the oracle's O(n²) pair scan + recursive transitive
      // closure, the brute-force DEFINITION this is hash-checked against.
      (s, d) => {
        val hxC = graft.analytics.Sketch.hashPoint32(
          concat(lit("dbx#"), col("id").cast("string")))
        val hyC = graft.analytics.Sketch.hashPoint32(
          concat(lit("dby#"), col("id").cast("string")))
        val rr = tbl(s, d, "customer")
          .agg(ceil(sqrt(count(lit(1)))).cast("long").as("r"))
        val blobC = (lit(20L) + expr("(id DIV 20) % 3") * 30L) * col("r")
        def coord(h: Column): Column =
          when(pmod(col("id"), lit(20)) === 0,
              blobC + pmod(h, lit(2L) * col("r") + lit(1L)) - col("r"))
            .otherwise(pmod(h, lit(100L) * col("r")))
        val pts = tbl(s, d, "customer").select(col("c_custkey").as("id"))
          .crossJoin(broadcast(rr))
          .withColumn("x", coord(hxC))
          .withColumn("y", coord(hyC))
          .select("id", "x", "y")
        val pairs = graft.analytics.Spatial.gridRadiusJoin(pts, radius = 60L)
          .truncateLineage()
        val sym = pairs.select(col("a_id").as("id"), col("b_id").as("nb"))
          .union(pairs.select(col("b_id").as("id"), col("a_id").as("nb")))
        val core = sym.groupBy("id").agg(count(lit(1)).as("nbrs"))
          .filter(col("nbrs") >= 5).select("id").truncateLineage()
        val ce = pairs
          .join(core.select(col("id").as("a_id")), "a_id")
          .join(core.select(col("id").as("b_id")), "b_id")
          .select("a_id", "b_id")
        val cc = Dedup.connectedComponents(core, ce)
          .select(col("id"), col("component").as("ccluster"))
        val border = sym
          .join(core, Seq("id"), "left_anti")
          .join(cc.select(col("id").as("nb"), col("ccluster")), "nb")
          .groupBy("id").agg(min(col("ccluster")).as("bcluster"))
        pts.select("id")
          .join(cc, Seq("id"), "left")
          .join(border, Seq("id"), "left")
          .select(col("id"),
            when(col("ccluster").isNotNull, lit("core"))
              .when(col("bcluster").isNotNull, lit("border"))
              .otherwise(lit("noise")).as("role"),
            coalesce(col("ccluster"), col("bcluster"), lit(-1L)).as("cluster"))
          .orderBy("id")
      },
      Some {
        val dx = graft.queries.OracleShared.hx("md5('dbx#' || CAST(c_custkey AS VARCHAR))")
        val dy = graft.queries.OracleShared.hx("md5('dby#' || CAST(c_custkey AS VARCHAR))")
        s"""WITH RECURSIVE drr AS (
           |  SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS r FROM customer),
           |dbp AS (SELECT c_custkey AS id,
           |    CASE WHEN c_custkey % 20 = 0
           |      THEN (20 + ((c_custkey // 20) % 3) * 30) * r + ($dx) % (2*r+1) - r
           |      ELSE ($dx) % (100*r) END AS x,
           |    CASE WHEN c_custkey % 20 = 0
           |      THEN (20 + ((c_custkey // 20) % 3) * 30) * r + ($dy) % (2*r+1) - r
           |      ELSE ($dy) % (100*r) END AS y
           |  FROM customer CROSS JOIN drr),
           |dprs AS (SELECT a.id AS a, b.id AS b
           |  FROM dbp a JOIN dbp b ON b.id > a.id
           |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 3600),
           |dsym AS (SELECT a AS id, b AS nb FROM dprs
           |         UNION ALL SELECT b, a FROM dprs),
           |dcore AS (SELECT id FROM (SELECT id, count(*) AS nbrs
           |          FROM dsym GROUP BY id) WHERE nbrs >= 5),
           |dce AS (SELECT p.a, p.b FROM dprs p
           |        JOIN dcore c1 ON c1.id = p.a JOIN dcore c2 ON c2.id = p.b),
           |dedges AS (SELECT a, b FROM dce UNION SELECT b, a FROM dce),
           |dreach(a, b) AS (
           |  SELECT a, b FROM dedges
           |  UNION
           |  SELECT r.a, e.b FROM dreach r JOIN dedges e ON r.b = e.a),
           |dlbl AS (SELECT a AS id, least(a, min(b)) AS component
           |         FROM dreach GROUP BY a),
           |dcc AS (SELECT c.id, COALESCE(l.component, c.id) AS ccluster
           |        FROM dcore c LEFT JOIN dlbl l ON l.id = c.id),
           |dbord AS (SELECT s.id, min(z.ccluster) AS bcluster
           |  FROM dsym s JOIN dcc z ON z.id = s.nb
           |  WHERE s.id NOT IN (SELECT id FROM dcore)
           |  GROUP BY s.id)
           |SELECT p.id,
           |  CASE WHEN z.ccluster IS NOT NULL THEN 'core'
           |       WHEN b.bcluster IS NOT NULL THEN 'border'
           |       ELSE 'noise' END AS role,
           |  CAST(COALESCE(z.ccluster, b.bcluster, -1) AS BIGINT) AS cluster
           |FROM dbp p LEFT JOIN dcc z ON z.id = p.id
           |  LEFT JOIN dbord b ON b.id = p.id
           |ORDER BY p.id""".stripMargin
      },
      bench = true),

    Q("join_tpch_q22_shape",
      // the TPC-H Q22 global-sales-opportunity shape: customers with
      // above-average positive balance and no recent orders (nationkey
      // stands in for the phone country code; "no orders at all" is empty
      // on the generated data, so recency bounds the NOT EXISTS), grouped
      // by country. The above-average threshold is exact integer
      // cross-multiplication (bal·n_pos > sum_pos) so neither engine ever
      // divides; the NOT EXISTS decorrelates to a LeftAnti on custkey and
      // the 1-row positive-balance aggregate broadcasts.
      (s, d) => {
        tbl(s, d, "customer").createOrReplaceTempView("q22_customer")
        tbl(s, d, "orders").createOrReplaceTempView("q22_orders")
        s.sql(
          """WITH pool AS (
            |  SELECT c_nationkey, c_custkey,
            |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
            |  FROM q22_customer),
            |pos AS (SELECT count(*) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS sum_pos
            |        FROM pool WHERE bal_c > 0)
            |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
            |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
            |FROM pool, pos
            |WHERE bal_c * n_pos > sum_pos
            |  AND NOT EXISTS (SELECT 1 FROM q22_orders
            |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01')
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
      },
      Some(
        """WITH pool AS (
          |  SELECT c_nationkey, c_custkey,
          |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
          |  FROM customer),
          |pos AS (SELECT count(*) AS n_pos, CAST(sum(bal_c) AS BIGINT) AS sum_pos
          |        FROM pool WHERE bal_c > 0)
          |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
          |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
          |FROM pool, pos
          |WHERE bal_c * n_pos > sum_pos
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-01-01')
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    Q("join_tpch_q4_shape",
      // the TPC-H Q4 order-priority-checking shape: orders in one quarter
      // having at least one flagged line (l_returnflag = 'R' stands in
      // for receiptdate > commitdate), counted by priority. The EXISTS is
      // written as an explicit LeftSemi join — the decorrelated plan Q21's
      // SQL form proves Catalyst produces; here the DataFrame face states
      // it directly. Date filter pushes to the orders scan; the semi join
      // probes only flagged lineitem rows.
      (s, d) => tbl(s, d, "orders")
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate").cast("date") < lit("1996-04-01").cast("date"))
        .join(tbl(s, d, "lineitem").filter(col("l_returnflag") === "R")
            .select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("join_tpch_q7_shape",
      // the TPC-H Q7 volume-shipping shape: bilateral trade between two
      // nations by ship year — supplier and customer each resolve their
      // nation (bounded 25-row dims, broadcast), the DISJUNCTIVE nation
      // pair predicate ((A,B) OR (B,A)) is a residual on the joined row,
      // and revenue aggregates per (supp_nation, cust_nation, year).
      // The OR across two different dimension columns is the predicate
      // shape no single-scan pushdown can absorb — it must survive as a
      // post-join filter without degrading the join into a product.
      (s, d) => {
        val n1 = tbl(s, d, "nation")
          .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
        val n2 = tbl(s, d, "nation")
          .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
        tbl(s, d, "lineitem")
          .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date"))
          .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("nk1"))
          .join(broadcast(n2), col("c_nationkey") === col("nk2"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_9") ||
            (col("supp_nation") === "NATION_9" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .multiply(10000).cast("long").as("revenue_e4"),
            count(lit(1)).as("n"))
          .orderBy("supp_nation", "cust_nation", "yr")
      },
      Some(
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |  year(l_shipdate) AS yr,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4,
          |  count(*) AS n
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
          |    OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      bench = true),

    Q("join_tpch_q15_shape",
      // the TPC-H Q15 top-supplier shape: the quarter's per-supplier
      // revenue view is compared against ITS OWN maximum — an
      // uncorrelated scalar subquery over the same aggregate, the
      // view-reuse face. Ties all surface (WHERE =, not LIMIT 1).
      // Exact-decimal totals make the max comparison engine-stable.
      (s, d) => {
        tbl(s, d, "lineitem").createOrReplaceTempView("q15_lineitem")
        tbl(s, d, "supplier").createOrReplaceTempView("q15_supplier")
        s.sql(
          """WITH rev AS (
            |  SELECT l_suppkey AS supplier_no,
            |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
            |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS total_e4
            |  FROM q15_lineitem
            |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
            |  GROUP BY 1)
            |SELECT s_suppkey, s_name, total_e4
            |FROM q15_supplier JOIN rev ON s_suppkey = supplier_no
            |WHERE total_e4 = (SELECT max(total_e4) FROM rev)
            |ORDER BY s_suppkey""".stripMargin)
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey AS supplier_no,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS total_e4
          |  FROM lineitem
          |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, total_e4
          |FROM supplier JOIN rev ON s_suppkey = supplier_no
          |WHERE total_e4 = (SELECT max(total_e4) FROM rev)
          |ORDER BY s_suppkey""".stripMargin)),

    Q("join_tpch_q17_shape",
      // the TPC-H Q17 small-quantity-order shape: revenue from lines of
      // one brand whose quantity is under 30% of that part's average —
      // the correlated per-group average rewritten as one aggregate +
      // one join (never a re-scan per row), with the threshold as exact
      // integer cross-multiplication: qty·cnt·10 < 3·sumq on both sides
      // of the ×100 fixed point, so neither engine divides or rounds.
      (s, d) => {
        val agg = tbl(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .multiply(100).cast("long").as("sumq_c"))
        tbl(s, d, "lineitem")
          .join(tbl(s, d, "part").filter(col("p_brand") === "Brand#3")
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .join(agg, col("pk") === col("l_partkey"))
          .filter(col("l_quantity").cast("decimal(18,2)").multiply(100)
            .cast("long") * col("cnt") * 10 < col("sumq_c") * 3)
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,2)").multiply(100)
              .cast("long")).as("sum_price_c"))
          .orderBy("n_lines")
      },
      Some(
        """WITH agg AS (
          |  SELECT l_partkey AS pk, count(*) AS cnt,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sumq_c
          |  FROM lineitem GROUP BY 1)
          |SELECT count(*) AS n_lines,
          |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_price_c
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN agg ON pk = l_partkey
          |WHERE p_brand = 'Brand#3'
          |  AND CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * cnt * 10 < sumq_c * 3
          |ORDER BY n_lines""".stripMargin)),

    Q("join_tpch_q2_shape",
      // the TPC-H Q2 minimum-cost-supplier shape: for each part in a size
      // class, the European supplier(s) offering its minimum cost — the
      // correlated MIN subquery face (cost proxy: min line price per
      // (part, supplier); the test tables carry no partsupp). Written in
      // SQL so Catalyst decorrelates the per-part MIN into one aggregate
      // + one join; ties all surface. The region spine broadcasts
      // (region→nation bounded), supplier/part joins left to the planner.
      (s, d) => {
        tbl(s, d, "lineitem").createOrReplaceTempView("q2_lineitem")
        tbl(s, d, "supplier").createOrReplaceTempView("q2_supplier")
        tbl(s, d, "nation").createOrReplaceTempView("q2_nation")
        tbl(s, d, "region").createOrReplaceTempView("q2_region")
        tbl(s, d, "part").createOrReplaceTempView("q2_part")
        s.sql(
          """WITH ps AS (
            |  SELECT l_partkey AS pk, l_suppkey AS sk,
            |    CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cost_c
            |  FROM q2_lineitem GROUP BY 1, 2),
            |eu AS (SELECT s_suppkey, s_name FROM q2_supplier
            |       JOIN q2_nation ON s_nationkey = n_nationkey
            |       JOIN q2_region ON n_regionkey = r_regionkey
            |       WHERE r_name = 'EUROPE'),
            |cand AS (SELECT p_partkey, p_type, ps.cost_c, eu.s_suppkey, eu.s_name
            |         FROM q2_part JOIN ps ON p_partkey = pk
            |         JOIN eu ON sk = s_suppkey
            |         WHERE p_size = 15)
            |SELECT p_partkey, p_type, s_suppkey, s_name, cost_c
            |FROM cand c
            |WHERE cost_c = (SELECT min(cost_c) FROM cand c2
            |                WHERE c2.p_partkey = c.p_partkey)
            |ORDER BY p_partkey, s_suppkey""".stripMargin)
      },
      Some(
        """WITH ps AS (
          |  SELECT l_partkey AS pk, l_suppkey AS sk,
          |    CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cost_c
          |  FROM lineitem GROUP BY 1, 2),
          |eu AS (SELECT s_suppkey, s_name FROM supplier
          |       JOIN nation ON s_nationkey = n_nationkey
          |       JOIN region ON n_regionkey = r_regionkey
          |       WHERE r_name = 'EUROPE'),
          |cand AS (SELECT p_partkey, p_type, ps.cost_c, eu.s_suppkey, eu.s_name
          |         FROM part JOIN ps ON p_partkey = pk
          |         JOIN eu ON sk = s_suppkey
          |         WHERE p_size = 15)
          |SELECT p_partkey, p_type, s_suppkey, s_name, cost_c
          |FROM cand c
          |WHERE cost_c = (SELECT min(cost_c) FROM cand c2
          |                WHERE c2.p_partkey = c.p_partkey)
          |ORDER BY p_partkey, s_suppkey""".stripMargin)),

    Q("join_tpch_q8_shape",
      // the TPC-H Q8 national-market-share shape: of everything European
      // customers spent on one part type, what e6 share came from one
      // nation's suppliers, by order year — the conditional-numerator /
      // unconditional-denominator ratio aggregate over a 7-table star.
      // Share is exact: e4-integer sums (the 2dp×2dp product is
      // integral at x10000, so the BIGINT cast cannot round-vs-truncate
      // across engines) cross-multiplied in
      // DECIMAL(38,0) (HUGEINT in the oracle), never a double divide.
      (s, d) => {
        val n1 = tbl(s, d, "nation")
          .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nat"))
        val custEu = tbl(s, d, "customer")
          .join(broadcast(tbl(s, d, "nation")
            .join(tbl(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
            .filter(col("r_name") === "EUROPE").select(col("n_nationkey").as("nk2"))),
            col("c_nationkey") === col("nk2"))
          .select("c_custkey")
        val rev = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        tbl(s, d, "lineitem")
          .join(tbl(s, d, "part").filter(col("p_type") === "ECONOMY")
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(custEu, col("o_custkey") === col("c_custkey"))
          .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("nk1"))
          .select(year(col("o_orderdate")).cast("long").as("yr"),
            col("supp_nat"),
            (rev * 10000).cast("long").as("rev_e4"))
          .groupBy("yr")
          .agg(
            sum(when(col("supp_nat") === "NATION_5", col("rev_e4"))
              .otherwise(0L)).as("nat_e4"),
            sum(col("rev_e4")).as("total_e4"))
          .selectExpr("yr",
            """CAST(CAST(nat_e4 AS DECIMAL(38,0)) * 1000000
              | DIV CAST(total_e4 AS DECIMAL(38,0)) AS BIGINT) AS share_e6""".stripMargin,
            "total_e4")
          .orderBy("yr")
      },
      Some(
        """SELECT yr,
          |  CAST(CAST(nat_e4 AS HUGEINT) * 1000000 // CAST(total_e4 AS HUGEINT) AS BIGINT) AS share_e6,
          |  total_e4
          |FROM (
          |  SELECT year(o_orderdate) AS yr,
          |    CAST(sum(CASE WHEN n1.n_name = 'NATION_5' THEN
          |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
          |      ELSE 0 END) AS BIGINT) AS nat_e4,
          |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS BIGINT) AS total_e4
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
          |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
          |  JOIN region ON n2.n_regionkey = r_regionkey
          |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          |  GROUP BY yr)
          |ORDER BY yr""".stripMargin),
      bench = true),

    Q("join_tpch_q11_shape",
      // the TPC-H Q11 important-stock shape: parts whose total line value
      // exceeds 1.5× the average part's share of the global total — the
      // HAVING-vs-global-scalar face, with a SCALE-INVARIANT threshold
      // (val·np·2 > tot·3) instead of Q11's fixed fraction, so the row
      // set stays meaningful at any SF. Both scalar subqueries reduce the
      // same per-part view; comparisons cross-multiply in DECIMAL(38,0) /
      // HUGEINT — no division anywhere.
      (s, d) => {
        tbl(s, d, "lineitem").createOrReplaceTempView("q11_lineitem")
        s.sql(
          """WITH pv AS (
            |  SELECT l_partkey,
            |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS val_c
            |  FROM q11_lineitem GROUP BY 1)
            |SELECT l_partkey, val_c FROM pv
            |WHERE CAST(val_c AS DECIMAL(38,0)) * (SELECT count(*) FROM pv) * 2
            |    > (SELECT CAST(sum(CAST(val_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) FROM pv) * 3
            |ORDER BY val_c DESC, l_partkey""".stripMargin)
      },
      Some(
        """WITH pv AS (
          |  SELECT l_partkey,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS val_c
          |  FROM lineitem GROUP BY 1)
          |SELECT l_partkey, val_c FROM pv
          |WHERE CAST(val_c AS HUGEINT) * (SELECT count(*) FROM pv) * 2
          |    > (SELECT CAST(sum(val_c) AS HUGEINT) FROM pv) * 3
          |ORDER BY val_c DESC, l_partkey""".stripMargin)),

    Q("join_tpch_q20_shape",
      // the TPC-H Q20 excess-stock shape — nested semi-joins: suppliers
      // (in two nations) who shipped more than 15% of some red part's
      // total quantity (share stands in for availqty > ½ demand; no
      // partsupp table). Inner layer: part-family filter semi-joins the
      // (part, supplier) quantity table against its per-part totals;
      // outer layer: the supplier list semi-joins the distinct excess
      // suppliers. Exact integer cross-multiplication for the share.
      (s, d) => {
        val psq = tbl(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)"))
            .multiply(100).cast("long").as("q_c"))
        val ptot = psq.groupBy("pk")
          .agg(sum(col("q_c")).as("tot_c"))
        val redParts = tbl(s, d, "part")
          .filter(col("p_name").like("%red%")).select("p_partkey")
        val excess = psq
          .join(ptot, Seq("pk"))
          .join(redParts, col("pk") === col("p_partkey"))
          .filter(col("q_c") * 20 > col("tot_c") * 3)
          .select(col("sk")).distinct()
        tbl(s, d, "supplier")
          .join(broadcast(tbl(s, d, "nation")
            .filter(col("n_name").isin("NATION_2", "NATION_11"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(excess, col("s_suppkey") === col("sk"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy("s_suppkey")
      },
      Some(
        """WITH psq AS (
          |  SELECT l_partkey AS pk, l_suppkey AS sk,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS q_c
          |  FROM lineitem GROUP BY 1, 2),
          |ptot AS (SELECT pk, CAST(sum(q_c) AS BIGINT) AS tot_c FROM psq GROUP BY 1),
          |excess AS (
          |  SELECT DISTINCT sk FROM psq
          |  JOIN ptot USING (pk)
          |  JOIN part ON pk = p_partkey
          |  WHERE p_name LIKE '%red%' AND q_c * 20 > tot_c * 3)
          |SELECT s_suppkey, s_name, n_name
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE n_name IN ('NATION_2', 'NATION_11')
          |  AND EXISTS (SELECT 1 FROM excess WHERE sk = s_suppkey)
          |ORDER BY s_suppkey""".stripMargin)),

    Q("join_tpch_q12_shape",
      // the TPC-H Q12 shipping-priority-count shape: the conditional
      // twin-counter aggregate over a fact-fact join (l_returnflag stands
      // in for l_shipmode — the test tables carry none), one ship-year
      // window pushed to the lineitem scan, urgent/non-urgent CASE
      // counters per category. The join strategy is the planner's.
      (s, d) => tbl(s, d, "orders")
        .join(tbl(s, d, "lineitem")
            .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
              col("l_shipdate").cast("date") < lit("1998-01-01").cast("date"))
            .select("l_orderkey", "l_returnflag"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("join_tpch_q9_shape",
      // the TPC-H Q9 product-profit shape: profit by (supplier nation,
      // order year) over the part-name-filtered five-table star. Cost
      // stands in as 60% of retailprice×quantity (no ps_supplycost in
      // the test tables); profit lives in e5 fixed point so BOTH the
      // revenue term (4-decimal product ×1e5) and the 60% cost term
      // ((retail·qty ×1e4) ×6) are integral before any BIGINT cast —
      // the round-vs-truncate divergence cannot occur.
      (s, d) => {
        val revE5 = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,4)").multiply(100000).cast("long")
        val costE5 = (col("p_retailprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(28,4)").multiply(10000).cast("long") * 6
        tbl(s, d, "lineitem")
          .join(tbl(s, d, "part").filter(col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(revE5 - costE5).as("profit_e5"), count(lit(1)).as("n"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(
        """SELECT n_name AS nation, year(o_orderdate) AS o_year,
          |  CAST(sum(
          |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * 100000 AS BIGINT)
          |    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
          |      CAST(l_quantity AS DECIMAL(18,2)) * 10000 AS BIGINT) * 6
          |  ) AS BIGINT) AS profit_e5, count(*) AS n
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%red%'
          |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
      bench = true),

    Q("join_tpch_q19_shape",
      // the TPC-H Q19 disjunctive-bracket shape: revenue from three OR'd
      // conjunctive brackets spanning BOTH join sides (brand+size on
      // part, quantity on lineitem — containers/shipmodes don't exist in
      // the test tables), so no single bracket can push whole to either
      // scan and the disjunction survives as a residual on the joined
      // row without degrading the equi-join.
      (s, d) => {
        val q = col("l_quantity")
        val bracket1 = col("p_brand") === "Brand#3" &&
          col("p_size").between(1, 5) && q.between(1, 11)
        val bracket2 = col("p_brand") === "Brand#13" &&
          col("p_size").between(1, 10) && q.between(10, 20)
        val bracket3 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 15) && q.between(20, 30)
        tbl(s, d, "lineitem")
          .join(tbl(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .filter(bracket1 || bracket2 || bracket3)
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(28,4)").multiply(10000).cast("long").as("revenue_e4"))
          .orderBy("n_lines")
      },
      Some(
        """SELECT count(*) AS n_lines,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
          |ORDER BY n_lines""".stripMargin)),

    Q("join_scd2_pointintime",
      // point-in-time (temporal) dimension join: each order joins the
      // customer-dimension VERSION valid at its order date — v1 before
      // 1996-07-01, v2 (open-ended) after. The equi-key carries the join;
      // the validity range is a residual predicate on the joined row, so
      // there is no interval explosion: versions per KEY are few and
      // bounded, which keeps SCD2 lookups cheap at fact-table scale. The
      // dim itself is 2× the full customer table — fact-sized — so the
      // join strategy is left to the planner (shuffle equi-join at
      // 100 TB, auto-broadcast at test SF). Complements join_asof
      // (event-to-event) with the dimension-history flavor.
      (s, d) => {
        val c = tbl(s, d, "customer")
        val dim = c.select(col("c_custkey").as("dkey"),
            concat(col("c_mktsegment"), lit("@v1")).as("seg"),
            lit("1992-01-01").cast("date").as("vf"),
            lit("1996-07-01").cast("date").as("vt"))
          .unionByName(c.select(col("c_custkey").as("dkey"),
            concat(col("c_mktsegment"), lit("@v2")).as("seg"),
            lit("1996-07-01").cast("date").as("vf"),
            lit(null).cast("date").as("vt")))
        tbl(s, d, "orders")
          .select(col("o_custkey").as("fkey"),
            col("o_orderdate").cast("date").as("day"),
            (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
          .join(dim, col("fkey") === col("dkey") &&
            col("day") >= col("vf") && (col("vt").isNull || col("day") < col("vt")))
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_c"))
          .orderBy("seg")
      },
      Some(
        """WITH dim AS (
          |  SELECT c_custkey AS dkey, c_mktsegment || '@v1' AS seg,
          |    DATE '1992-01-01' AS vf, DATE '1996-07-01' AS vt FROM customer
          |  UNION ALL
          |  SELECT c_custkey, c_mktsegment || '@v2', DATE '1996-07-01', NULL FROM customer)
          |SELECT seg, count(*) AS n,
          |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
          |FROM orders JOIN dim ON o_custkey = dkey
          |  AND CAST(o_orderdate AS DATE) >= vf
          |  AND (vt IS NULL OR CAST(o_orderdate AS DATE) < vt)
          |GROUP BY seg ORDER BY seg""".stripMargin),
      bench = true),

    // ---- §2.10 events / time windows (batch forms) ---------------------------

    Q("join_bloom_prune",
      // Bloom-pruned fact-dim join: the dim side (European suppliers)
      // builds an md5-deterministic Bloom filter (analytics/Bloom.scala);
      // the fact scan is pruned by the codegen'd SortedSetContainsAll
      // binary search BEFORE any exchange — the explicit, engine-portable
      // form of Spark's runtime row-level filtering. False positives are
      // swallowed by the exact join that follows, so the oracle is the
      // PLAIN join SQL: the bloom may only ever change the plan, never
      // the answer. The Bloom BITS are bounded (BLOOM_JOIN_M); the
      // supplier dim itself is fact-sized, so the exact join's strategy
      // is left to the planner.
      (s, d) => {
        val dim = tbl(s, d, "supplier")
          .join(broadcast(tbl(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(tbl(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("n_name"))
        val packed = Bloom.packSorted(
          Bloom.bits(dim, col("s_suppkey"), BLOOM_JOIN_M, BLOOM_K))
        val pruned = Bloom.prune(
          tbl(s, d, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount"),
          col("l_suppkey"), packed, BLOOM_JOIN_M, BLOOM_K)
        pruned.join(dim, col("l_suppkey") === col("s_suppkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(28,4)").multiply(10000).cast("long").as("revenue_e4"))
          .orderBy("n_name")
      },
      Some(
        """SELECT n_name, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue_e4
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'EUROPE'
          |GROUP BY n_name ORDER BY n_name""".stripMargin),
      bench = true),

    Q("join_skew_stress_salted",
      // skew-STRESS measurement, salted arm: a deliberately zipf-extreme
      // key (~90% of lineitem lands on key 1) joined against supplier
      // through Skew.saltedJoin — the hot key spreads over 16 tasks while
      // the build side replicates ×16 (16k rows at sf0.1: noise). The
      // merge hint pins the SHUFFLE join both arms would get at 100 TB,
      // so the sf0.1 timing measures the skew discipline, not an
      // auto-broadcast that hides it. Row-for-row equal to the plain
      // join — the oracle IS the plain join — and the AQE twin below
      // runs the identical plan unsalted; the bench rows side by side
      // are the measured justification (or veto) for explicit salting.
      (s, d) => {
        val li = tbl(s, d, "lineitem")
          .select(when(col("l_orderkey") % 10 < 9, lit(1L))
              .otherwise(col("l_suppkey")).as("k"),
            col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val supp = tbl(s, d, "supplier")
          .select(col("s_suppkey").as("k"), col("s_nationkey")).hint("merge")
        graft.plans.Skew.saltedJoin(li, supp, Seq("k"),
            col("l_orderkey"), salts = 16)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
          .orderBy("s_nationkey")
      },
      Some(SKEW_STRESS_SQL),
      bench = true),

    Q("join_skew_stress_aqe",
      // skew-stress twin, AQE-only arm: the identical zipf-extreme join
      // with NO salting — the merge hint pins the same shuffle path and
      // AQE's skew-join split (spark.sql.adaptive.skewJoin) is left to
      // re-split the hot partition at runtime. Identical output by
      // construction; the bench delta against the salted arm is the
      // engine-measured answer to "does explicit salting still pay when
      // AQE can re-split this join?" (saltedJoin's remit is the shapes
      // AQE can NOT reach — exact per-key distinct counts, downstream
      // stateful ops — but the claim deserves a number on the shape AQE
      // CAN reach).
      (s, d) => {
        val li = tbl(s, d, "lineitem")
          .select(when(col("l_orderkey") % 10 < 9, lit(1L))
              .otherwise(col("l_suppkey")).as("k"),
            col("l_quantity").cast("long").as("qty"))
        val supp = tbl(s, d, "supplier")
          .select(col("s_suppkey").as("k"), col("s_nationkey")).hint("merge")
        li.join(supp, "k")
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
          .orderBy("s_nationkey")
      },
      Some(SKEW_STRESS_SQL),
      bench = true)
  )

  /** Shared oracle for both skew-stress arms: the PLAIN join of the
    * skewed key against supplier — salting and AQE splits may only ever
    * change the plan, never the answer.
    */
  private lazy val SKEW_STRESS_SQL: String =
    """WITH sk AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1
      |                        ELSE l_suppkey END AS k,
      |              CAST(l_quantity AS BIGINT) AS qty
      |            FROM lineitem)
      |SELECT s_nationkey, count(*) AS n_items,
      |  CAST(sum(qty) AS BIGINT) AS sum_qty
      |FROM sk JOIN supplier ON k = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
}
