package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Graph
import graft.queries.Fixtures._
import graft.queries.OracleShared.hx
import graft.util.Lineage._

/** Graph-analytics family: PageRank over the customer→part purchase
  * graph, a-priori-pruned co-purchase pair mining, and degree-ordered
  * triangle counting over the resulting co-purchase graph. All three are
  * edge-list-shaped (equi-joins + aggregations, never adjacency
  * matrices), the only graph representation that survives 100 TB.
  */
private[graft] object GraphQueries {

  /** Unrolled integer-exact PageRank oracle — the SAME fixed-point
    * recurrence as [[Graph.pageRank]] (e12 mass, truncating division;
    * all operands positive so DuckDB's floor `//` == Spark's DIV).
    * Dangling mass (parts have no out-edges in the directed purchase
    * graph) is redistributed uniformly each round, exercising the
    * dangling path of the implementation, not just the join.
    */
  private def pagerankSql(iters: Int): String = {
    val head =
      """WITH raw AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM raw),
        |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |consts AS (SELECT COUNT(*) AS n, 1000000000000 // COUNT(*) AS rinit,
        |  ((1000000000000 // COUNT(*)) * 15) // 100 AS bconst FROM nodes),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT id, (SELECT rinit FROM consts) AS r FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang
         |  FROM r${k - 1} WHERE id NOT IN (SELECT src FROM edges)),
         |r$k AS (SELECT n.id,
         |    (SELECT bconst FROM consts)
         |      + (85 * (COALESCE(i.s, 0)
         |               + ((SELECT dang FROM d$k) // (SELECT n FROM consts)))) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(r.r // o.outdeg) AS BIGINT) AS s
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.id
         |    JOIN outdeg o ON e.src = o.src
         |    GROUP BY e.dst) i ON n.id = i.id)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds\nSELECT id, r AS rank_e12 FROM r$iters ORDER BY rank_e12 DESC, id LIMIT 20"
  }

  /** Unrolled personalized-PageRank oracle: same graph CTEs, seed set =
    * every 100th customer node, teleport/base mass only on seeds, dangling
    * mass returned to the seeds — the exact mirror of
    * [[Graph.personalizedPageRank]]'s CASE recurrence.
    */
  private def pprSql(iters: Int): String = {
    val head =
      """WITH raw AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM raw),
        |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
        |sd AS (SELECT id FROM nodes WHERE id % 2 = 0 AND (id // 2) % 100 = 0),
        |consts AS (SELECT COUNT(*) AS ns, 1000000000000 // COUNT(*) AS rinit,
        |  ((1000000000000 // COUNT(*)) * 15) // 100 AS bconst FROM sd),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT n.id,
        |         CASE WHEN s.id IS NOT NULL THEN (SELECT rinit FROM consts) ELSE 0 END AS r
        |       FROM nodes n LEFT JOIN sd s ON n.id = s.id)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""d$k AS (SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang
         |  FROM r${k - 1} WHERE id NOT IN (SELECT src FROM edges)),
         |r$k AS (SELECT n.id,
         |    CASE WHEN s.id IS NOT NULL
         |      THEN (SELECT bconst FROM consts)
         |        + (85 * (COALESCE(i.s, 0)
         |                 + ((SELECT dang FROM d$k) // (SELECT ns FROM consts)))) // 100
         |      ELSE (85 * COALESCE(i.s, 0)) // 100 END AS r
         |  FROM nodes n LEFT JOIN sd s ON n.id = s.id
         |  LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(r.r // o.outdeg) AS BIGINT) AS s
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.id
         |    JOIN outdeg o ON e.src = o.src
         |    GROUP BY e.dst) i ON n.id = i.id)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds\nSELECT id, r AS rank_e12 FROM r$iters WHERE r > 0 ORDER BY rank_e12 DESC, id LIMIT 20"
  }

  /** Shared co-purchase SQL: distinct (order, part) items, a-priori
    * document-frequency prune, canonical a<b pair counts.
    */
  private val copurchaseCte =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ord, l_partkey AS item FROM lineitem),
      |freq AS (SELECT item FROM items GROUP BY item HAVING COUNT(*) >= 25),
      |fi AS (SELECT ord, item FROM items WHERE item IN (SELECT item FROM freq)),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n
      |  FROM fi a JOIN fi b ON a.ord = b.ord AND a.item < b.item
      |  GROUP BY 1, 2)""".stripMargin

  /** The co-purchase edge list (canonical a < b part pairs seen in ≥ 2
    * baskets, both parts in ≥ 25 baskets) published ONCE per dataset via
    * the model store and served to every downstream graph query —
    * at corpus scale the edge build is the expensive join, and
    * triangles / link prediction / communities all read the same
    * artifact instead of re-running it. Deterministic content, so
    * serving the artifact is pure memoization and every oracle keeps
    * replaying the construction inline.
    */
  private def coEdges(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s,
      "copurchase_edges_n2_df25_v1_" + d.replaceAll("[^A-Za-z0-9]+", "_")) {
      val items = tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"))
        .distinct()
      val freq = items.groupBy("item").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 25).select("item")
      val fi = items.join(freq, Seq("item"), "left_semi")
      fi.as("a")
        .join(fi.as("b"),
          col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(col("item_a").as("a"), col("item_b").as("b"))
    }

  val qs: Vector[Q] = Vector(

    Q("graph_pagerank",
      // Directed purchase graph customer→part (node id = 2·key + type
      // bit so the two key spaces cannot collide). 3 fixed iterations —
      // no convergence probe, so Spark runs zero mid-loop actions and
      // the oracle unrolls the identical horizon.
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        Graph.pageRank(raw, iterations = 3)
          .orderBy(col("rank_e12").desc, col("id"))
          .limit(20)
      },
      Some(pagerankSql(3)),
      bench = true),

    Q("graph_ppr",
      // personalized PageRank from every-100th-customer seeds over the
      // same purchase graph — the "expand a crawl frontier / find
      // entities like these" query; mass teleports only to seeds, so the
      // top ranks are the seed neighborhood, not the global hubs
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val seeds = raw.select(col("src").as("id")).distinct()
          .filter(expr("(id DIV 2) % 100 = 0"))
        Graph.personalizedPageRank(raw, seeds, iterations = 3)
          .filter(col("rank_e12") > 0)
          .orderBy(col("rank_e12").desc, col("id"))
          .limit(20)
      },
      Some(pprSql(3))),

    Q("graph_copurchase_pairs",
      // Market-basket pair mining, a-priori pruned (Agrawal & Srikant,
      // VLDB'94): items below min-support cannot appear in a frequent
      // pair, so the per-basket quadratic join runs on the PRUNED item
      // set only. The frequent set is item-cardinality-bounded — fact-
      // sized at scale — so its join strategy is left to the planner:
      // auto-broadcast at test SF, shuffle semi-join at 100 TB. The
      // self-join shuffles the pruned items by basket once; both sides
      // share the exchange.
      (s, d) => {
        val items = tbl(s, d, "lineitem")
          .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"))
          .distinct()
        val freq = items.groupBy("item").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 25).select("item")
        val fi = items.join(freq, Seq("item"), "left_semi")
        fi.as("a")
          .join(fi.as("b"),
            col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
          .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("item_a"), col("item_b"))
          .limit(50)
      },
      Some(copurchaseCte +
        "\nSELECT item_a, item_b, n FROM pairs ORDER BY n DESC, item_a, item_b LIMIT 50"),
      bench = true),

    Q("graph_hits",
      // HITS on the bipartite purchase graph: top-20 authority parts.
      // Max-rescaled integer half-steps — the ranking L2 normalization
      // would give, with arithmetic the oracle replays bit-for-bit.
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        Graph.hits(raw, iterations = 2)
          .filter(col("kind") === "auth")
          .select(col("id"), col("score_e6").as("auth_e6"))
          .orderBy(col("auth_e6").desc, col("id"))
          .limit(20)
      },
      Some(
        """WITH raw AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |edges AS (SELECT src, dst FROM raw),
          |h0 AS (SELECT DISTINCT src AS id, 1000000 AS h FROM edges),
          |a1r AS (SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS ar
          |        FROM edges e JOIN h0 h ON e.src = h.id GROUP BY e.dst),
          |a1 AS (SELECT id, (ar * 1000000) // (SELECT MAX(ar) FROM a1r) AS a FROM a1r),
          |h1r AS (SELECT e.src AS id, CAST(SUM(a.a) AS BIGINT) AS hr
          |        FROM edges e JOIN a1 a ON e.dst = a.id GROUP BY e.src),
          |h1 AS (SELECT id, (hr * 1000000) // (SELECT MAX(hr) FROM h1r) AS h FROM h1r),
          |a2r AS (SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS ar
          |        FROM edges e JOIN h1 h ON e.src = h.id GROUP BY e.dst),
          |a2 AS (SELECT id, (ar * 1000000) // (SELECT MAX(ar) FROM a2r) AS a FROM a2r)
          |SELECT id, a AS auth_e6 FROM a2
          |ORDER BY auth_e6 DESC, id LIMIT 20""".stripMargin)),

    Q("graph_pair_lift",
      // association mining on top of the co-purchase pairs: exact
      // rational lift (N·c_ab / c_a·c_b, e6) and directional confidence
      // — support alone ranks ubiquitous items; lift finds pairs bought
      // together MORE than their popularity predicts
      (s, d) => {
        val items = tbl(s, d, "lineitem")
          .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"))
          .distinct()
        val nB = items.select(countDistinct(col("ord")).as("nb"))
        val freq = items.groupBy("item").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 25)
        val fi = items.join(freq, Seq("item"), "left_semi")
        val pairs = fi.as("a")
          .join(fi.as("b"),
            col("a.ord") === col("b.ord") && col("a.item") < col("b.item"))
          .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
        pairs
          .join(freq.select(col("item").as("item_a"), col("df").as("ca")), Seq("item_a"))
          .join(freq.select(col("item").as("item_b"), col("df").as("cb")), Seq("item_b"))
          .crossJoin(broadcast(nB))
          .select(col("item_a"), col("item_b"), col("n"),
            expr("(n * nb * 1000000L) DIV (ca * cb)").as("lift_e6"),
            expr("(n * 1000000L) DIV ca").as("conf_ab_e6"),
            expr("(n * 1000000L) DIV cb").as("conf_ba_e6"))
          .orderBy(col("lift_e6").desc, col("item_a"), col("item_b"))
          .limit(30)
      },
      Some(copurchaseCte + """,
        |nb AS (SELECT COUNT(DISTINCT ord) AS nb FROM items),
        |fq AS (SELECT item, COUNT(*) AS df FROM items GROUP BY item HAVING COUNT(*) >= 25),
        |l AS (SELECT p.item_a, p.item_b, p.n,
        |        (p.n * (SELECT nb FROM nb) * 1000000) // (fa.df * fb.df) AS lift_e6,
        |        (p.n * 1000000) // fa.df AS conf_ab_e6,
        |        (p.n * 1000000) // fb.df AS conf_ba_e6
        |      FROM pairs p JOIN fq fa ON p.item_a = fa.item
        |      JOIN fq fb ON p.item_b = fb.item
        |      WHERE p.n >= 2)
        |SELECT * FROM l ORDER BY lift_e6 DESC, item_a, item_b LIMIT 30""".stripMargin)),

    Q("graph_hier_resolve",
      // root + depth for every node of a parent-pointer hierarchy via
      // Graph.resolveRoots' pointer doubling — the org-chart / category-
      // tree resolve at scale. The forest is arithmetic (parent =
      // custkey DIV 10, roots 1..9, depth ≤ ⌈log₁₀ n⌉) so the oracle can
      // walk it with a recursive CTE; the Spark side deliberately treats
      // the parent pointer as OPAQUE — 5 doubling rounds (one equi-join
      // each) cover depth 32, where the CTE's per-hop walk needs `depth`
      // sequential joins. The contrast with graph_bfs_hops: BFS expands a
      // frontier from ONE seed set per-hop; doubling resolves EVERY
      // node's full chain in log rounds.
      (s, d) => {
        val nodes = tbl(s, d, "customer").select(col("c_custkey").as("id"),
          when(col("c_custkey") >= 10, expr("c_custkey DIV 10"))
            .otherwise(col("c_custkey")).as("parent"))
        Graph.resolveRoots(nodes, rounds = 5).orderBy("id")
      },
      Some(
        """WITH RECURSIVE hw AS (
          |  SELECT c_custkey AS id, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
          |  FROM customer
          |  UNION ALL
          |  SELECT id, cur // 10, depth + 1 FROM hw WHERE cur >= 10
          |)
          |SELECT id, cur AS root, depth FROM hw WHERE cur < 10 ORDER BY id""".stripMargin),
      bench = true),

    Q("graph_hier_rollup",
      // subtree aggregation up the same hierarchy: every customer's order
      // revenue contributes to ALL its ancestors (the org-rollup /
      // category-total face). Ancestors enumerate in closed form here
      // (ck DIV 10^j for j = 0..12 while 10^j ≤ ck), so the plan is one
      // bounded explode (≤ 13 rows per key, the depth of the key domain —
      // never data-sized) + one groupBy — no iteration at all; an
      // arbitrary parent-pointer table would compose resolveRoots'
      // doubled closure instead. n_members counts order-holding
      // descendants, self included.
      (s, d) => {
        val powers = (0 to 12).map(j => lit(BigInt(10).pow(j).toLong))
        tbl(s, d, "orders")
          .groupBy(col("o_custkey").as("ck"))
          .agg(graft.util.Num.cents(col("o_totalprice")).as("rev_c"))
          .withColumn("p", explode(array(powers: _*)))
          .filter(col("p") <= col("ck"))
          .select(expr("ck DIV p").as("node"), col("rev_c"))
          .groupBy("node")
          .agg(sum(col("rev_c")).as("subtree_rev_c"),
            count(lit(1)).as("n_members"))
          .orderBy("node")
      },
      Some(
        """WITH hr AS (SELECT o_custkey AS ck,
          |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
          |  FROM orders GROUP BY 1),
          |hp AS (SELECT unnest([1, 10, 100, 1000, 10000, 100000, 1000000,
          |    10000000, 100000000, 1000000000, 10000000000, 100000000000,
          |    1000000000000]) AS p),
          |ha AS (SELECT ck // p AS node, rev_c FROM hr CROSS JOIN hp WHERE p <= ck)
          |SELECT node, CAST(sum(rev_c) AS BIGINT) AS subtree_rev_c,
          |  count(*) AS n_members
          |FROM ha GROUP BY 1 ORDER BY node""".stripMargin)),

    Q("graph_bfs_hops",
      // hop-bounded BFS over the SYMMETRIZED purchase graph from the
      // lowest customer node: hop 1 = parts they bought, hop 2 = other
      // customers of those parts, hop 3 = those customers' parts — the
      // collaborative-expansion frontier. The oracle is a recursive CTE
      // bounded by the same hop cap; min(hop) is the BFS distance.
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        val seed = raw.agg(min(col("src")).as("id"))
        Graph.bfsHops(sym, seed, maxHops = 3)
          .orderBy("hop", "id")
      },
      Some(
        """WITH RECURSIVE raw AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |edges AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
          |seed AS (SELECT min(src) AS id FROM raw),
          |reach(id, hop) AS (
          |  SELECT id, 0 FROM seed
          |  UNION
          |  SELECT e.dst, r.hop + 1
          |  FROM reach r JOIN edges e ON e.src = r.id WHERE r.hop < 3
          |)
          |SELECT id, CAST(min(hop) AS BIGINT) AS hop
          |FROM reach GROUP BY id ORDER BY hop, id""".stripMargin),
      bench = true),

    Q("graph_closeness_landmarks",
      // landmark closeness centrality (Potamias CIKM'09) over the same
      // symmetrized purchase graph as graph_bfs_hops: hop-bounded BFS from
      // the 4 lowest node ids AT ONCE (frontier keyed (lm, id) — one join
      // + one min-aggregate per round regardless of k), then per NODE the
      // landmark count reached, hop sum, and the closeness estimate
      // k_reached·1e6 DIV Σhops. The scale contract: exact closeness is
      // all-pairs (n BFS sources); landmarks cap state at k·|V| — the k
      // is the dial, the per-round plan shape never changes.
      // WHERE THE TIME GOES (r12 sf0.1 probe): ~1.1 s builds the
      // distinct symmetrized edge list (1.20M edges), the bulk runs the
      // 4 frontier-incremental BFS rounds (frontier × avg-degree ≈ 5M
      // expansion rows in total — data-bound work, not re-agg: the
      // per-round anti-join shape is pinned in PlanShapeSpec), ~0.6 s
      // the final aggregate + sort. The r10/r11 "3.7-4.1 s band" came
      // from contaminated records of the PRE-frontier-fix code and is
      // not a valid baseline; clean-canary standalone measurements vary
      // 3.6-5.5 s across days on this box (5.05/5.09/5.51 s on the r12
      // record's day, 3.6 s warm on the prior probe's day) — the
      // machine-load floor moves more than the plan does, so cross-day
      // per-query deltas under ~1.5x are not evidence of regression.
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = sym.select(col("src")).distinct().orderBy("src").limit(4)
          .select(col("src").as("lm"), col("src").as("id"))
        Graph.multiSourceBfs(sym, seeds, maxHops = 4)
          .groupBy("id")
          .agg(count(lit(1)).as("n_reached"), sum(col("hop")).as("sum_hops"))
          .selectExpr("id", "n_reached", "sum_hops",
            "n_reached * 1000000L DIV greatest(sum_hops, 1L) AS closeness_e6")
          .orderBy("id")
      },
      Some(
        """WITH RECURSIVE raw AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |edges AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
          |lms AS (SELECT src AS lm FROM (
          |  SELECT DISTINCT src FROM edges ORDER BY src LIMIT 4)),
          |reach(lm, id, hop) AS (
          |  SELECT lm, lm, 0 FROM lms
          |  UNION
          |  SELECT r.lm, e.dst, r.hop + 1
          |  FROM reach r JOIN edges e ON e.src = r.id WHERE r.hop < 4
          |),
          |dm AS (SELECT lm, id, min(hop) AS hop FROM reach GROUP BY 1, 2)
          |SELECT id, count(*) AS n_reached, CAST(sum(hop) AS BIGINT) AS sum_hops,
          |  CAST(count(*) * 1000000 // greatest(sum(hop), 1) AS BIGINT) AS closeness_e6
          |FROM dm GROUP BY id ORDER BY id""".stripMargin),
      bench = true),

    Q("graph_communities",
      // label-propagation communities over the co-purchase graph, 4
      // deterministic synchronous rounds (self-vote damping, min-label
      // ties) — the oracle unrolls identical rounds with a per-node
      // ranking window. Output: every node's community plus the
      // community size it landed in.
      (s, d) => {
        val lab = Graph.labelPropagation(coEdges(s, d), rounds = 4)
        val sizes = lab.groupBy("community").agg(count(lit(1)).as("community_size"))
        lab.join(sizes, "community")
          .select(col("id"), col("community"), col("community_size"))
          .orderBy("id")
      },
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |se AS MATERIALIZED (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM se),
        |""".stripMargin + (1 to 4).map { i =>
          s"""u$i AS (SELECT e.a AS id, l.lbl FROM se e JOIN l${i - 1} l ON l.id = e.b
             |      UNION ALL SELECT id, lbl FROM l${i - 1}),
             |c$i AS (SELECT id, lbl, count(*) AS c FROM u$i GROUP BY 1, 2),
             |l$i AS MATERIALIZED (SELECT id, lbl FROM (
             |    SELECT id, lbl, row_number() OVER (PARTITION BY id
             |      ORDER BY c DESC, lbl) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
        }.mkString(",\n") + """,
        |sz AS (SELECT lbl AS community, count(*) AS community_size FROM l4 GROUP BY 1)
        |SELECT l4.id, l4.lbl AS community, CAST(sz.community_size AS BIGINT) AS community_size
        |FROM l4 JOIN sz ON sz.community = l4.lbl
        |ORDER BY id""".stripMargin),
      bench = true),

    Q("graph_link_predict",
      // link prediction over the co-purchase graph (pairs in ≥2 baskets):
      // top-30 NON-adjacent part pairs by neighborhood Jaccard — "bought
      // together with the same things but never together yet", the
      // recommendation candidate list. Wedge enumeration with the hub
      // cap, existing edges anti-joined away, exact e6 Jaccard.
      (s, d) => Graph.linkPredict(coEdges(s, d), k = 30, maxDegree = 10000),
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |adj AS (SELECT a AS c, b AS nb FROM pe UNION ALL SELECT b, a FROM pe),
        |dg AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
        |ca AS (SELECT c, nb FROM adj
        |       WHERE c IN (SELECT c FROM dg WHERE deg <= 10000)),
        |wd AS (SELECT x.nb AS item_a, y.nb AS item_b, count(*) AS cn
        |       FROM ca x JOIN ca y ON x.c = y.c AND x.nb < y.nb GROUP BY 1, 2),
        |op AS (SELECT * FROM wd WHERE NOT EXISTS (
        |         SELECT 1 FROM pe WHERE pe.a = wd.item_a AND pe.b = wd.item_b))
        |SELECT op.item_a, op.item_b, CAST(op.cn AS BIGINT) AS cn,
        |  CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
        |  CAST((cn * 1000000) // (da.deg + db.deg - cn) AS BIGINT) AS jaccard_e6
        |FROM op JOIN dg da ON da.c = op.item_a JOIN dg db ON db.c = op.item_b
        |ORDER BY jaccard_e6 DESC, item_a, item_b LIMIT 30""".stripMargin),
      bench = true),

    Q("graph_link_predict_ra",
      // resource-allocation link prediction beside graph_link_predict's
      // Jaccard: common neighbors weighted 1/deg(z), so a niche shared
      // neighbor outranks a hub — the predictor that wins on co-purchase
      // graphs where hubs co-occur with everything. 1/deg is rational →
      // exact ra_e6 = Σ (1e6 DIV deg(z)); same hub-capped wedge
      // enumeration, same anti-join against existing edges.
      (s, d) => Graph.linkPredictRA(coEdges(s, d), k = 30, maxDegree = 10000),
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |adj AS (SELECT a AS c, b AS nb FROM pe UNION ALL SELECT b, a FROM pe),
        |dg AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
        |cw AS (SELECT adj.c, adj.nb, dg.deg FROM adj JOIN dg USING (c)
        |       WHERE dg.deg <= 10000),
        |wd AS (SELECT x.nb AS item_a, y.nb AS item_b, count(*) AS cn,
        |         CAST(sum(1000000 // x.deg) AS BIGINT) AS ra_e6
        |       FROM cw x JOIN cw y ON x.c = y.c AND x.nb < y.nb GROUP BY 1, 2),
        |op AS (SELECT * FROM wd WHERE NOT EXISTS (
        |         SELECT 1 FROM pe WHERE pe.a = wd.item_a AND pe.b = wd.item_b))
        |SELECT item_a, item_b, CAST(cn AS BIGINT) AS cn, ra_e6
        |FROM op ORDER BY ra_e6 DESC, item_a, item_b LIMIT 30""".stripMargin)),

    Q("graph_neighbor_features",
      // GraphSAGE-style mean-aggregator features over the published
      // co-purchase edges: per part its degree and the min/mean/max of
      // neighbor degrees — the structural feature vector graph ML trains
      // on, top-50 hubs for a bounded output
      (s, d) => Graph.neighborFeatures(coEdges(s, d))
        .orderBy(col("deg").desc, col("id")).limit(50),
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |adj AS (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
        |dg AS (SELECT a, count(*) AS deg FROM adj GROUP BY a)
        |SELECT adj.a AS id, count(*) AS deg,
        |  CAST(min(nd.deg) AS BIGINT) AS nbr_min_deg,
        |  CAST((sum(nd.deg) * 1000000) // count(*) AS BIGINT) AS nbr_mean_deg_e6,
        |  CAST(max(nd.deg) AS BIGINT) AS nbr_max_deg
        |FROM adj JOIN dg nd ON nd.a = adj.b
        |GROUP BY adj.a ORDER BY deg DESC, id LIMIT 50""".stripMargin)),

    Q("graph_triangles",
      // Triangle count over the co-purchase graph (pairs seen in ≥2
      // baskets), via degree-ordered orientation — the oracle counts the
      // same triangles with the naive canonical x<y<z 3-way join, which
      // is fine for DuckDB at test scale but is exactly the skew-fragile
      // plan the oriented form exists to replace.
      (s, d) => Graph.triangleCount(coEdges(s, d)),
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        |FROM pe e1 JOIN pe e2 ON e2.a = e1.b
        |JOIN pe e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY triangles""".stripMargin)),

    Q("graph_clustering_coeff",
      // local clustering coefficient per node (Watts–Strogatz '98): the
      // fraction of a node's neighbor pairs that are themselves connected,
      // cc(v) = 2·T(v) / deg(v)(deg(v)−1) — the "how clique-ish is this
      // node's neighborhood" dial that separates hub-of-strangers from
      // community-core, per node where graph_triangles reports one global
      // count. T(v) rides the SAME degree-ordered machinery: edgeSupport
      // counts each edge's triangles with wedge fan-out bounded by
      // out-degree ≤ √2m, and Σ support over v's incident edges counts
      // every triangle at v exactly twice (its two incident edges), so
      // cc_e6 = Σsupport·10⁶ DIV deg(deg−1) with no extra pass. Exact
      // BIGINT throughout (Σsupport ≤ 2·deg² and the e6 product holds to
      // deg ~ 10⁵). The oracle counts per-node triangles by the naive
      // wedge-closure join — definition-level, the skew-fragile plan the
      // oriented form replaces.
      (s, d) => {
        val e = coEdges(s, d).truncateLineage()
        val sup = Graph.edgeSupport(e)
        val supAll = e.join(sup, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            coalesce(col("support"), lit(0L)).as("support"))
        supAll.select(col("a").as("id"), col("support"))
          .unionAll(supAll.select(col("b").as("id"), col("support")))
          .groupBy("id")
          .agg(count(lit(1)).as("deg"), sum(col("support")).as("sup2"))
          .filter(col("deg") >= 2)
          .selectExpr("id", "deg", "sup2 DIV 2 AS triangles",
            "sup2 * 1000000 DIV (deg * (deg - 1)) AS cc_e6")
          .orderBy("id")
      },
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |se AS (SELECT a AS u, b AS w FROM pe UNION ALL SELECT b, a FROM pe),
        |tr AS (SELECT s1.u AS id, count(*) AS t
        |  FROM se s1 JOIN se s2 ON s2.u = s1.u AND s1.w < s2.w
        |  JOIN pe e ON e.a = s1.w AND e.b = s2.w
        |  GROUP BY 1),
        |dg AS (SELECT u AS id, count(*) AS deg FROM se GROUP BY 1)
        |SELECT d.id, d.deg, CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
        |  CAST(2 * coalesce(t.t, 0) * 1000000 // (d.deg * (d.deg - 1))
        |    AS BIGINT) AS cc_e6
        |FROM dg d LEFT JOIN tr t USING (id)
        |WHERE d.deg >= 2 ORDER BY d.id""".stripMargin),
      bench = true),

    Q("graph_kcore",
      // 3-round k-core peel (k = 3) of the co-purchase graph: the dense
      // "stable market" subgraph after shaving low-degree fringe nodes —
      // a fixed synchronous horizon (like graph_pagerank's 3 iterations)
      // so Spark plans one action and the oracle unrolls the identical
      // rounds as chained CTEs. Output: surviving nodes with their
      // induced degrees.
      (s, d) => Graph.kCorePeel(coEdges(s, d), k = 3, rounds = 3)
        .orderBy("id"),
      Some {
        val peel = (1 to 3).map { r =>
          s"""d$r AS (SELECT id, count(*) AS deg FROM (
             |  SELECT a AS id FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
             |k$r AS (SELECT id FROM d$r WHERE deg >= 3),
             |e$r AS (SELECT a, b FROM e${r - 1}
             |  WHERE a IN (SELECT id FROM k$r) AND b IN (SELECT id FROM k$r))""".stripMargin
        }.mkString(",\n")
        copurchaseCte + s""",
          |e0 AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
          |$peel
          |SELECT id, count(*) AS deg FROM (
          |  SELECT a AS id FROM e3 UNION ALL SELECT b FROM e3)
          |GROUP BY 1 ORDER BY id""".stripMargin
      }),

    Q("graph_mis_luby",
      // Luby maximal-independent-set over the co-purchase graph — the
      // distributed symmetry-breaking primitive behind conflict-free
      // scheduling and clustering seeds. Determinized: one md5 priority
      // per node packed above the id (ids < 2^31 here, so the pack is
      // collision-free), strict-local-minimum selection, select/remove
      // rounds on a shrinking edge list, fixed 4-round horizon; the
      // oracle unrolls the identical rounds as chained CTEs. Output:
      // chosen nodes with the round that chose them.
      (s, d) => Graph.lubyMis(coEdges(s, d), rounds = 4).orderBy("id"),
      Some {
        val rounds = (1 to 4).map { r =>
          s"""m$r AS (SELECT e.a AS id, MIN(p.pk) AS mn
             |  FROM e${r - 1} e JOIN a${r - 1} p ON p.id = e.b GROUP BY e.a),
             |s$r AS (SELECT a.id FROM a${r - 1} a LEFT JOIN m$r m ON m.id = a.id
             |  WHERE a.pk < COALESCE(m.mn, 9223372036854775807)),
             |rm$r AS (SELECT id FROM s$r
             |  UNION SELECT e.b AS id FROM e${r - 1} e JOIN s$r s ON s.id = e.a),
             |a$r AS MATERIALIZED (SELECT * FROM a${r - 1}
             |  WHERE id NOT IN (SELECT id FROM rm$r)),
             |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
             |  WHERE a NOT IN (SELECT id FROM rm$r)
             |    AND b NOT IN (SELECT id FROM rm$r))""".stripMargin
        }.mkString(",\n")
        val emit = (1 to 4)
          .map(r => s"SELECT id, CAST($r AS INT) AS mis_round FROM s$r")
          .mkString("\n  UNION ALL ")
        copurchaseCte + s""",
          |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
          |e0 AS MATERIALIZED (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
          |a0 AS MATERIALIZED (SELECT id, (${hx("mh")}) * 2147483648 + id AS pk
          |  FROM (SELECT id, md5('mis#' || CAST(id AS VARCHAR)) AS mh
          |        FROM (SELECT DISTINCT a AS id FROM e0))),
          |$rounds
          |$emit
          |ORDER BY id""".stripMargin
      },
      bench = true),

    Q("graph_ktruss",
      // 2-round k-truss peel (k = 4) — the EDGE-cohesion sibling of
      // graph_kcore: survive only edges in ≥ 2 triangles, recursively
      // (a clique nucleus that degree alone can't certify; every
      // 4-truss edge is in the 3-core but not vice versa). Fixture:
      // planted clique nuclei on customer keys, the graph_scc
      // convention — the measured co-purchase graph is TRIANGLE-SPARSE
      // (3 edges in any triangle at sf0.1; its baskets rarely overlap
      // twice on three items), so per 10-key block: a K6 nucleus
      // (support 4 everywhere — survives) plus two pendant triangles
      // sharing the spoke (b, b+6) — their outer edges carry support 1
      // and peel in round 1, which strands the spoke (support 2 at peel
      // time, 0 after) for round 2: the registered fixture itself
      // exercises the cascade, not just the unit tests. Per-round
      // support comes from the degree-ordered oriented wedge join
      // (Graph.edgeSupport — fan-out bounded by out-degree ≤ √2m, the
      // triangleCount machinery with per-edge attribution), then a
      // semi-join peel; fixed synchronous horizon so the plan is one
      // action and the oracle unrolls identical rounds as chained CTEs
      // (naive per-edge common-neighbor counts — fine at test scale,
      // and exactly the skew-fragile plan the oriented form replaces).
      (s, d) => {
        val c = tbl(s, d, "customer")
          .select(col("c_custkey").cast("long").as("ck"))
        val nmx = c.agg((floor((max(col("ck")) + 1) / 10) * 10)
          .cast("long").as("n"))
        val nodes = c.crossJoin(broadcast(nmx)).filter(col("ck") < col("n"))
          .select(col("ck"), expr("ck DIV 10").as("blk"),
            expr("ck % 10").as("pos"))
        val k6 = nodes.filter(col("pos") <= 5).as("x")
          .join(nodes.filter(col("pos") <= 5).as("y"),
            col("x.blk") === col("y.blk") && col("x.ck") < col("y.ck"))
          .select(col("x.ck").as("a"), col("y.ck").as("b"))
        val base = nodes.filter(col("pos") === 0)
          .select(col("ck").as("b0"))
        val pend = base.select(col("b0").as("a"), (col("b0") + 6).as("b"))
          .unionAll(base.select((col("b0") + 1).as("a"), (col("b0") + 6).as("b")))
          .unionAll(base.select(col("b0").as("a"), (col("b0") + 7).as("b")))
          .unionAll(base.select((col("b0") + 6).as("a"), (col("b0") + 7).as("b")))
        Graph.kTrussPeel(k6.unionAll(pend), k = 4, rounds = 2)
          .orderBy("a", "b")
      },
      Some {
        val peel = (1 to 2).map { r =>
          s"""y$r AS (SELECT a AS u, b AS v FROM t${r - 1}
             |  UNION ALL SELECT b, a FROM t${r - 1}),
             |s$r AS (SELECT e.a, e.b, count(*) AS sup
             |  FROM t${r - 1} e
             |  JOIN y$r n1 ON n1.u = e.a
             |  JOIN y$r n2 ON n2.u = e.b AND n2.v = n1.v
             |  GROUP BY e.a, e.b),
             |t$r AS (SELECT s.a, s.b FROM s$r s WHERE s.sup >= 2)""".stripMargin
        }.mkString(",\n")
        s"""WITH knmax AS (SELECT ((max(c_custkey) + 1) // 10) * 10 AS n
          |  FROM customer),
          |knn AS (SELECT c_custkey AS ck, c_custkey // 10 AS blk,
          |    c_custkey % 10 AS pos
          |  FROM customer CROSS JOIN knmax WHERE c_custkey < n),
          |k6 AS (SELECT x.ck AS a, y.ck AS b FROM knn x JOIN knn y
          |  ON x.blk = y.blk AND x.ck < y.ck
          |  WHERE x.pos <= 5 AND y.pos <= 5),
          |kb AS (SELECT ck AS b0 FROM knn WHERE pos = 0),
          |pend AS (SELECT b0 AS a, b0 + 6 AS b FROM kb
          |  UNION ALL SELECT b0 + 1, b0 + 6 FROM kb
          |  UNION ALL SELECT b0, b0 + 7 FROM kb
          |  UNION ALL SELECT b0 + 6, b0 + 7 FROM kb),
          |t0 AS (SELECT a, b FROM k6 UNION ALL SELECT a, b FROM pend),
          |$peel,
          |yf AS (SELECT a AS u, b AS v FROM t2 UNION ALL SELECT b, a FROM t2),
          |sf AS (SELECT e.a, e.b, count(*) AS sup
          |  FROM t2 e
          |  JOIN yf n1 ON n1.u = e.a
          |  JOIN yf n2 ON n2.u = e.b AND n2.v = n1.v
          |  GROUP BY e.a, e.b)
          |SELECT a, b, CAST(sup AS BIGINT) AS support
          |FROM sf ORDER BY a, b""".stripMargin
      },
      bench = true),

    Q("graph_modularity",
      // partition-quality metric for the label-propagation communities:
      // per-community Newman modularity contribution Q_c = e_c/m −
      // (deg_c/2m)², in exact fixed point — the fraction deg_c/2m
      // quantizes to e6 FIRST and is then squared (bounded at e12), so
      // no n²-sized intermediate can overflow. The number that says
      // whether a community structure is real or noise, computed from
      // the same 4-round labels graph_communities publishes.
      (s, d) => {
        val pe = coEdges(s, d)
        val lab = Graph.labelPropagation(pe, rounds = 4)
        val se = pe.select(col("a"), col("b"))
          .unionAll(pe.select(col("b").as("a"), col("a").as("b")))
        val mDf = pe.agg(count(lit(1)).as("m"))
        val el = pe
          .join(lab.withColumnsRenamed(Map("id" -> "a", "community" -> "ca")), Seq("a"))
          .join(lab.withColumnsRenamed(Map("id" -> "b", "community" -> "cb")), Seq("b"))
          .filter(col("ca") === col("cb"))
          .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
        val dg = se.join(lab.withColumnRenamed("id", "a"), Seq("a"))
          .groupBy("community").agg(count(lit(1)).as("deg_sum"))
        dg.join(el, Seq("community"), "left")
          .na.fill(0L, Seq("e_in"))
          .crossJoin(broadcast(mDf))
          .selectExpr("community",
            "CAST(e_in AS BIGINT) AS e_in",
            "CAST(deg_sum AS BIGINT) AS deg_sum",
            """e_in * 1000000000000L DIV m
              | - ((deg_sum * 1000000L) DIV (2 * m))
              |   * ((deg_sum * 1000000L) DIV (2 * m)) AS q_contrib_e12""".stripMargin)
          .orderBy("community")
      },
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |se AS MATERIALIZED (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM se),
        |""".stripMargin + (1 to 4).map { i =>
          s"""u$i AS (SELECT e.a AS id, l.lbl FROM se e JOIN l${i - 1} l ON l.id = e.b
             |      UNION ALL SELECT id, lbl FROM l${i - 1}),
             |c$i AS (SELECT id, lbl, count(*) AS c FROM u$i GROUP BY 1, 2),
             |l$i AS MATERIALIZED (SELECT id, lbl FROM (
             |    SELECT id, lbl, row_number() OVER (PARTITION BY id
             |      ORDER BY c DESC, lbl) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
        }.mkString(",\n") + """,
        |mm AS (SELECT count(*) AS m FROM pe),
        |el AS (SELECT la.lbl AS community, count(*) AS e_in
        |       FROM pe JOIN l4 la ON la.id = pe.a JOIN l4 lb ON lb.id = pe.b
        |       WHERE la.lbl = lb.lbl GROUP BY 1),
        |dg AS (SELECT l4.lbl AS community, count(*) AS deg_sum
        |       FROM se JOIN l4 ON l4.id = se.a GROUP BY 1)
        |SELECT dg.community, CAST(COALESCE(el.e_in, 0) AS BIGINT) AS e_in,
        |  CAST(dg.deg_sum AS BIGINT) AS deg_sum,
        |  CAST(COALESCE(el.e_in, 0) * 1000000000000 // m
        |    - ((dg.deg_sum * 1000000) // (2 * m))
        |      * ((dg.deg_sum * 1000000) // (2 * m)) AS BIGINT) AS q_contrib_e12
        |FROM dg LEFT JOIN el ON el.community = dg.community CROSS JOIN mm
        |ORDER BY dg.community""".stripMargin)),

    Q("graph_degree_spectrum",
      // degree distribution of the co-purchase graph in power-of-two
      // bands (band = bit-length − 1, the text_freq_spectrum convention)
      // — the scale-free-or-not diagnostic read before choosing hub caps
      // and skew strategies for the graph ops.
      (s, d) => {
        val pe = coEdges(s, d)
        pe.select(col("a").as("id")).unionAll(pe.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
          .select((length(conv(col("deg"), 10, 2)) - 1).cast("long").as("band"))
          .groupBy("band").agg(count(lit(1)).as("n_nodes"))
          .orderBy("band")
      },
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |dg AS (SELECT id, count(*) AS deg FROM (
        |  SELECT a AS id FROM pe UNION ALL SELECT b FROM pe) GROUP BY 1)
        |SELECT CAST(length(to_base(deg, 2)) - 1 AS BIGINT) AS band,
        |  count(*) AS n_nodes
        |FROM dg GROUP BY 1 ORDER BY band""".stripMargin)),

    Q("graph_assortativity",
      // degree assortativity (Newman 2002): the Pearson correlation of
      // endpoint degrees over the symmetrized edge list — positive means
      // hubs prefer hubs, negative means hub-and-spoke. Exact integer
      // moments (n·Σxy − Sx², n·Σx² − Sx²), the final e6 ratio computed
      // by pre-scaling the denominator (num DIV (den DIV 1e6)) so no
      // intermediate leaves 64 bits; by edge symmetry Sx = Sy and
      // Σx² = Σy², so one moment pass covers both axes.
      (s, d) => {
        val pe = coEdges(s, d)
        val se = pe.select(col("a"), col("b"))
          .unionAll(pe.select(col("b").as("a"), col("a").as("b")))
        val deg = se.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
        se.join(deg.withColumnsRenamed(Map("id" -> "a", "deg" -> "da")), Seq("a"))
          .join(deg.withColumnsRenamed(Map("id" -> "b", "deg" -> "db")), Seq("b"))
          .agg(count(lit(1)).as("n"), sum(col("da")).as("sx"),
            sum(col("da") * col("db")).as("sxy"),
            sum(col("da") * col("da")).as("sxx"))
          // ×1e6 BEFORE the divide, in 38-digit decimal (Spark) / HUGEINT
          // (DuckDB) so small-variance graphs keep full e6 precision —
          // pre-truncating the denominator to 1e6 units lost up to ~100%
          // relative accuracy whenever the variance term was below ~1e7.
          // Both engines truncate integer division toward zero, and the
          // denominator (a variance) is ≥ 0, so greatest(·, 1) only
          // guards the zero-variance graph.
          .selectExpr("n", "sx", "sxy", "sxx",
            """CAST(CAST(n * sxy - sx * sx AS DECIMAL(38,0)) * 1000000
              | DIV greatest(CAST(n * sxx - sx * sx AS DECIMAL(38,0)),
              |   CAST(1 AS DECIMAL(38,0))) AS BIGINT) AS assortativity_e6""".stripMargin)
          .orderBy("n")
      },
      Some(copurchaseCte + """,
        |pe AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE n >= 2),
        |se AS (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
        |dg AS (SELECT a AS id, count(*) AS deg FROM se GROUP BY 1),
        |m AS (SELECT count(*) AS n, CAST(sum(x.deg) AS BIGINT) AS sx,
        |    CAST(sum(x.deg * y.deg) AS BIGINT) AS sxy,
        |    CAST(sum(x.deg * x.deg) AS BIGINT) AS sxx
        |  FROM se JOIN dg x ON x.id = se.a JOIN dg y ON y.id = se.b)
        |SELECT n, sx, sxy, sxx,
        |  CAST(CAST(n * sxy - sx * sx AS HUGEINT) * 1000000
        |    // greatest(CAST(n * sxx - sx * sx AS HUGEINT), 1) AS BIGINT) AS assortativity_e6
        |FROM m ORDER BY n""".stripMargin)),

    Q("graph_mst_boruvka",
      // minimum spanning tree the distributed way (Borůvka: per-component
      // min-outgoing-edge hash aggregations + log-round star CC merges —
      // no sequential union-find anywhere), hash-checked against a
      // sequential Prim's algorithm replayed in the oracle's recursive
      // CTE: one frontier edge per recursion step, the visited set
      // carried as a list. Two INDEPENDENT constructions agreeing on the
      // exact edge set is the point — the (w, a, b) lexicographic total
      // order makes the MST unique (perturbation argument), so ANY
      // correct algorithm must return these rows. Fixture: every 5th
      // customer, a chain (id, id+5) guaranteeing connectivity, plus one
      // hash-derived skip edge per node (id + 5·(2 + h%16)) and md5
      // weights — every endpoint is a multiple of 5 ≤ max, i.e. a node,
      // satisfying boruvkaMst's endpoints ⊆ nodes contract (it drops
      // dangling edges; Prim would visit them). Not benched: the
      // oracle's Prim is deliberately sequential and O(n²·|E|) from the
      // growing list_contains scans — fine at the gate's 300 nodes,
      // hours at 3000; the Spark side's rounds are all equi-join/agg
      // shapes proven on the other graph queries.
      (s, d) => {
        val nodes = tbl(s, d, "customer")
          .filter(pmod(col("c_custkey"), lit(5)) === 0)
          .select(col("c_custkey").as("id"))
        val mx = nodes.agg(max(col("id")).as("mx"))
        val nm = nodes.crossJoin(broadcast(mx))
        val chain = nm.filter(col("id") + 5 <= col("mx"))
          .select(col("id").as("a"), (col("id") + 5).as("b"))
        val hop = pmod(graft.analytics.Sketch.hashPoint32(
          concat(lit("e#"), col("id").cast("string"))), lit(16L))
        val extra = nm
          .select(col("id").as("a"),
            (col("id") + lit(5L) * (lit(2L) + hop)).as("b"), col("mx"))
          .filter(col("b") <= col("mx"))
          .select("a", "b")
        val w = pmod(graft.analytics.Sketch.hashPoint32(
          concat(lit("w#"), col("a").cast("string"),
            lit("#"), col("b").cast("string"))), lit(1000000L))
        val wedges = chain.union(extra).distinct()
          .select(col("a"), col("b"), w.as("w"))
        Graph.boruvkaMst(nodes, wedges).orderBy("a", "b")
      },
      Some(MST_SQL)),

    Q("graph_sssp",
      // single-source shortest paths by Δ-stepping (Graph.deltaStepSssp:
      // bucketed relaxation, light edges loop inside the open bucket,
      // heavy edges relax once per settled node) — the weighted
      // companion to graph_bfs_hops and the primitive the graph family
      // lacked after MST landed. Fixture: a directed "expressway" graph
      // on every 5th customer — from each node, power-of-two skips
      // id → id + 5·2^j (j = 0..16, clipped to the id range) with
      // md5-derived weights in [0, 1e6) — the binary-skip structure keeps
      // the shortest-path hop diameter logarithmic in n, so the distance
      // RANGE (and with it Δ-stepping's bucket count, i.e. its round
      // count) stays flat as the node count grows. Δ = 2^19: measured
      // 7.8 s vs 9.6 s at 2^18 and 16.5 s at 2^17 on the sf0.1 probe —
      // the distance range is ~1.35e6, so 2^19 runs ~3 bucket phases
      // instead of ~6 while ~52% of edges stay light, so both relaxation
      // paths still execute (the RESULT is Δ-independent; only the round
      // count changes, which is what the bench pays for). Oracle:
      // sequential DIJKSTRA replayed in a recursive CTE — one settled
      // node per step, the (visited, dist) state carried as zipped
      // lists, the next node picked by a LATERAL min over crossing
      // edges. A genuinely independent construction (the Spark side
      // never orders globally; the oracle never buckets); they must
      // agree because min-path weights are unique values regardless of
      // algorithm. Benched for the Spark side; the oracle's O(n²·|E|)
      // list scans hit oracle_bench's 120 s cap at sf0.1 — measured
      // UNCAPPED offline at 1993.26 s (tools/oracle_uncapped.json, min
      // of 2 passes, the dedup_ppjoin convention) vs Spark's 7.8-9.9 s:
      // a ~200× algorithmic win, the widest on the board.
      (s, d) => {
        val (nm, edges) = expressway(s, d)
        val sources = nm.filter(col("id") === col("mn")).select("id")
        Graph.deltaStepSssp(edges, sources, delta = 524288L)
          .orderBy("id")
      },
      Some(SSSP_SQL),
      bench = true),

    Q("graph_closeness_weighted",
      // WEIGHTED landmark closeness — the weighted companion to
      // graph_closeness_landmarks, now that SSSP exists: the same
      // expressway fixture, TWO landmarks (the min node and the middle
      // node), all Δ-stepping state keyed (lm, id) so every round is
      // still one join + one min-aggregate regardless of landmark count
      // (Graph.deltaStepSsspLandmarks — the Potamias landmark scheme,
      // with edge weights instead of hops). Output is the raw
      // (lm, id, dist) landmark-distance table — the artifact closeness /
      // routing estimates are served from. Oracle: one independent
      // sequential Dijkstra PER landmark (two recursive CTEs), unioned.
      // Not benched: two O(n²·|E|) sequential oracle recursions would
      // burn 2×120 s of the bench's oracle budget for a path already
      // covered by graph_sssp; the Spark side's machinery is identical.
      (s, d) => {
        val (nm, edges) = expressway(s, d)
        val mid = col("mn") + lit(5L) * expr("((mx - mn) DIV 5) DIV 2")
        val seeds = nm.filter(col("id") === col("mn") || col("id") === mid)
          .select(col("id").as("lm"), col("id"))
        Graph.deltaStepSsspLandmarks(edges, seeds, delta = 262144L)
          .orderBy("lm", "id")
      },
      Some(CLOSENESS_W_SQL)),

    Q("graph_stress_landmarks",
      // hop-bounded stress centrality (Shimbel '53) from the same 4
      // landmarks as graph_closeness_landmarks — Brandes' two-phase
      // scheme in its integer-exact member: forward layer-synchronous
      // BFS carries σ (shortest-path counts), a backward descending-
      // layer pass carries P (DAG walks leaving each node), and
      // stress(v) = Σ_lm σ·P counts the shortest paths THROUGH v.
      // Closeness ranks nodes by how near they are; stress ranks them
      // by how much traffic routes over them — the complementary
      // centrality, and the one betweenness approximates with ratios
      // this integer form avoids (σ-ratio nesting can't hash-match an
      // oracle; path counts can). Both phases are one join + one
      // aggregate per layer regardless of k, so the landmark dial from
      // closeness carries over unchanged. Oracle: the recursive-CTE
      // distance table plus the σ and P recurrences UNROLLED per layer
      // (maxHops is a constant, so the layer chain is plain SQL) —
      // never a walk enumeration, which would be path-count-sized.
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = sym.select(col("src")).distinct().orderBy("src").limit(4)
          .select(col("src").as("lm"), col("src").as("id"))
        // σ and P multiply in DECIMAL(20,0) inside brandesStress (path
        // counts explode combinatorially), but the registry boundary is
        // BIGINT (raw decimal outputs were the r12 reds): the guarded cast
        // raises on a graph dense enough to overflow rather than NULLing.
        Graph.brandesStress(sym, seeds, maxHops = 3)
          .selectExpr("id", "n_lm", decimalBoundaryToLong("sigma_sum"),
            decimalBoundaryToLong("stress"))
          .orderBy("id")
      },
      Some(STRESS_SQL),
      bench = true),

    Q("graph_scc",
      // strongly connected components of a DIRECTED graph — the directed
      // sibling of dedup_cc_labels, by min-label coloring with peeling
      // (Graph.sccColor; the FW-BW/Multistep family). Fixture: customers
      // partitioned into 6-rings (ck → next in its block's directed
      // ring — each full block is one SCC) plus a one-way star from node
      // 0 to every block head — reachability that must NOT merge
      // components, and exactly the interference the peel exists for:
      // in peel 1 every non-zero block sees B = 0 ≠ F and only block 0
      // settles; peeling it isolates the rings, which then certify
      // F = B = their own head. The worst label walk is 6 steps (star hop
      // + 5 ring steps); rounds = 12 doubles it per sccColor's own sizing
      // guidance (extra rounds are idempotent) so a fixture tweak can't
      // silently under-run and split SCCs. peels = 2 the interference depth.
      // Everything is 0-based and non-negative ON PURPOSE: customer key
      // 0 exists, and on negatives Spark's DIV (truncating) and
      // DuckDB's // (floor) disagree. Oracle: reachability closure via
      // a recursive CTE, scc(u) = min{v : u→v AND v→u} —
      // definition-level, never a replay of the coloring. The closure
      // is oracle-only by design (star fan-out keeps it ~12 rows per
      // node HERE; in general it is output-sized quadratic) — the Spark
      // side holds one (id, F, B) row per node.
      (s, d) => {
        val c = tbl(s, d, "customer")
          .select(col("c_custkey").cast("long").as("ck"))
        val nmx = c.agg((floor((max(col("ck")) + 1) / 6) * 6)
          .cast("long").as("n"))
        val nodes = c.crossJoin(broadcast(nmx)).filter(col("ck") < col("n"))
        val ring = nodes.select(col("ck").as("src"),
          expr("(ck DIV 6) * 6 + (ck % 6 + 1) % 6").as("dst"))
        val star = nodes.filter(col("ck") % 6 === 0 && col("ck") =!= 0)
          .select(lit(0L).as("src"), col("ck").as("dst"))
        Graph.sccColor(ring.unionAll(star), peels = 2, rounds = 12)
          .orderBy("id")
      },
      Some(
        """WITH RECURSIVE
          |nmax AS (SELECT ((max(c_custkey) + 1) // 6) * 6 AS n FROM customer),
          |nn AS (SELECT c_custkey AS ck FROM customer CROSS JOIN nmax
          |       WHERE c_custkey < n),
          |ring AS (SELECT ck AS src,
          |  (ck // 6) * 6 + (ck % 6 + 1) % 6 AS dst FROM nn),
          |star AS (SELECT 0 AS src, ck AS dst FROM nn
          |         WHERE ck % 6 = 0 AND ck <> 0),
          |ed AS (SELECT src, dst FROM ring UNION SELECT src, dst FROM star),
          |reach(src, id) AS (
          |  SELECT ck, ck FROM nn
          |  UNION
          |  SELECT r.src, e.dst FROM reach r JOIN ed e ON e.src = r.id
          |)
          |SELECT a.src AS id, CAST(min(a.id) AS BIGINT) AS scc
          |FROM reach a JOIN reach b ON a.src = b.id AND a.id = b.src
          |GROUP BY a.src ORDER BY id""".stripMargin),
      bench = true),

    Q("graph_diameter_doublesweep",
      // approximate graph diameter by the double-sweep heuristic (Magnien/
      // Latapy/Habib '09): BFS from an arbitrary node (the min id — any
      // choice works, this one is deterministic), hop to its FARTHEST node
      // v (ties to min id), BFS again from v — sweep 2's eccentricity is a
      // LOWER bound on the diameter, exact on trees and empirically tight
      // on real graphs, at the cost of exactly TWO BFS passes instead of
      // all-pairs (the n-source exact computation no 100 TB graph affords).
      // Fixture: the SCC rings-plus-star graph SYMMETRIZED — undirected
      // diameter 8 (ring tail → head ≤ 3, head → 0 → head' ≤ 2, head' →
      // tail' ≤ 3), comfortably inside the hop-12 cap, so the lower bound
      // here is the true diameter and the gate certifies the full
      // argmax→reseed→argmax chain, not just one BFS. Both argmax
      // selections stay IN the dataflow (TakeOrdered limit(1) frames seed
      // the next BFS — no driver-side collect between sweeps). The hop cap
      // is the honesty dial at scale: eccentricity-within-h for a fixed
      // horizon h, like graph_bfs_hops.
      (s, d) => {
        val c = tbl(s, d, "customer")
          .select(col("c_custkey").cast("long").as("ck"))
        val nmx = c.agg((floor((max(col("ck")) + 1) / 6) * 6)
          .cast("long").as("n"))
        val nodes = c.crossJoin(broadcast(nmx)).filter(col("ck") < col("n"))
        val ring = nodes.select(col("ck").as("src"),
          expr("(ck DIV 6) * 6 + (ck % 6 + 1) % 6").as("dst"))
        val star = nodes.filter(col("ck") % 6 === 0 && col("ck") =!= 0)
          .select(lit(0L).as("src"), col("ck").as("dst"))
        val e = ring.unionAll(star)
        val sym = e.unionAll(e.select(col("dst").as("src"),
          col("src").as("dst"))).distinct()
        val seed0 = sym.agg(min(col("src")).as("id"))
        val far1 = Graph.bfsHops(sym, seed0, maxHops = 12)
          .orderBy(col("hop").desc, col("id").asc).limit(1)
        val far2 = Graph.bfsHops(sym, far1.select("id"), maxHops = 12)
          .orderBy(col("hop").desc, col("id").asc).limit(1)
        far1.select(lit("sweep1").as("phase"), col("id"), col("hop"))
          .unionAll(far2.select(lit("sweep2").as("phase"), col("id"),
            col("hop")))
          .orderBy("phase")
      },
      Some(
        """WITH RECURSIVE
          |nmax AS (SELECT ((max(c_custkey) + 1) // 6) * 6 AS n FROM customer),
          |nn AS (SELECT c_custkey AS ck FROM customer CROSS JOIN nmax
          |       WHERE c_custkey < n),
          |ring AS (SELECT ck AS src,
          |  (ck // 6) * 6 + (ck % 6 + 1) % 6 AS dst FROM nn),
          |star AS (SELECT 0 AS src, ck AS dst FROM nn
          |         WHERE ck % 6 = 0 AND ck <> 0),
          |e0 AS (SELECT src, dst FROM ring UNION SELECT src, dst FROM star),
          |ed AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          |s0 AS (SELECT min(src) AS id FROM ed),
          |r1(id, hop) AS (
          |  SELECT id, 0 FROM s0
          |  UNION
          |  SELECT e.dst, r.hop + 1 FROM r1 r JOIN ed e ON e.src = r.id
          |  WHERE r.hop < 12),
          |d1 AS (SELECT id, min(hop) AS hop FROM r1 GROUP BY 1),
          |f1 AS (SELECT id, hop FROM d1 ORDER BY hop DESC, id LIMIT 1),
          |r2(id, hop) AS (
          |  SELECT id, 0 FROM f1
          |  UNION
          |  SELECT e.dst, r.hop + 1 FROM r2 r JOIN ed e ON e.src = r.id
          |  WHERE r.hop < 12),
          |d2 AS (SELECT id, min(hop) AS hop FROM r2 GROUP BY 1),
          |f2 AS (SELECT id, hop FROM d2 ORDER BY hop DESC, id LIMIT 1)
          |SELECT 'sweep1' AS phase, id, CAST(hop AS BIGINT) AS hop FROM f1
          |UNION ALL
          |SELECT 'sweep2', id, CAST(hop AS BIGINT) FROM f2
          |ORDER BY phase""".stripMargin),
      bench = true),

    Q("graph_harmonic_landmarks",
      // harmonic centrality (Marchiori/Latora '00; Boldi/Vigna's preferred
      // closeness) from the 4 stress landmarks — Σ 1/d instead of 1/Σd,
      // which handles DISCONNECTED reachability gracefully: an unreachable
      // landmark contributes 0 instead of poisoning the whole sum with an
      // infinite distance, so the ranking stays meaningful on the
      // fragmented graphs real corpora produce. Exact integers by
      // construction: each term is the truncating division 10⁶ DIV hop
      // (both engines truncate positives identically), summed per node —
      // no reciprocal floats. Per-landmark distances come from one keyed
      // layer-synchronous BFS: the frontier is (lm, id)-keyed, so 4 (or
      // 400) landmarks still cost one join + one anti-join per layer, and
      // per-layer work is O(frontier × degree), never O(nodes).
      (s, d) => {
        val raw = tbl(s, d, "orders")
          .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val sym = raw.union(raw.select(col("dst").as("src"),
          col("src").as("dst"))).truncateLineage()
        val seeds = sym.select(col("src")).distinct().orderBy("src").limit(4)
          .select(col("src").as("lm"), col("src").as("id"))
        var dist = seeds.withColumn("hop", lit(0L)).truncateLineage()
        var frontier = dist.select("lm", "id")
        for (h <- 1 to 3) {
          val nxt = frontier.join(sym, frontier("id") === sym("src"))
            .select(frontier("lm"), sym("dst").as("id")).distinct()
            .join(dist.select("lm", "id"), Seq("lm", "id"), "left_anti")
            .withColumn("hop", lit(h.toLong))
            .truncateLineage()
          dist = dist.union(nxt)
          frontier = nxt.select("lm", "id")
        }
        dist.filter(col("hop") >= 1)
          .groupBy("id")
          .agg(count(lit(1)).as("n_lm"),
            sum(expr("1000000 DIV hop")).as("harmonic_e6"))
          .orderBy("id")
      },
      Some(
        """WITH RECURSIVE raw AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |edges AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
          |lms AS (SELECT src AS lm FROM (
          |  SELECT DISTINCT src FROM edges ORDER BY src LIMIT 4)),
          |reach(lm, id, hop) AS (
          |  SELECT lm, lm, 0 FROM lms
          |  UNION
          |  SELECT r.lm, e.dst, r.hop + 1
          |  FROM reach r JOIN edges e ON e.src = r.id WHERE r.hop < 3),
          |d AS (SELECT lm, id, min(hop) AS hop FROM reach GROUP BY 1, 2)
          |SELECT id, count(*) AS n_lm,
          |  CAST(sum(1000000 // hop) AS BIGINT) AS harmonic_e6
          |FROM d WHERE hop >= 1 GROUP BY id ORDER BY id""".stripMargin),
      bench = true),

    Q("graph_walk_corpus",
      // random-walk corpus generation (DeepWalk/node2vec's phase 1): k-step
      // walks from a seed set over the co-purchase graph, emitted as
      // (walk_id, step, node) rows — the "sentences" a skip-gram embedding
      // trainer consumes, and the piece that turns a 100 TB graph into
      // trainable sequence data. The walk is DETERMINISTIC by construction
      // (the md5 trick every sampled query here uses): step t of walk w
      // draws neighbor index md5(w # t) mod degree, so both engines replay
      // the identical corpus and the gate checks it row for row — swap the
      // md5 draw for a true RNG in production and nothing else changes.
      // Scale shape: neighbors are pre-ranked ONCE (r = 1..deg per node,
      // the two-pass range-partitioned running count — no per-node sort
      // window), then each step is ONE equi-join of the walk frontier
      // against the ranked edge list on the node key with the drawn-rank
      // residual selecting the single outgoing edge. k steps = k keyed
      // joins, per-step cost O(walks × avg degree), never edges × walks.
      (s, d) => walkCorpus(s, d).orderBy("walk_id", "step"),
      Some(
        s"""WITH $WALK_SQL
           |SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM wall
           |ORDER BY walk_id, step""".stripMargin),
      bench = true),

    Q("graph_walk_skipgram",
      // phase 2 of the embedding pipeline: skip-gram (center, context)
      // co-occurrence counts within a ±2 window over the walk corpus —
      // the EXACT training input a word2vec/node2vec trainer consumes
      // (each count is a positive example's weight; negatives come from
      // the degree distribution the trainer already has). Window pairing
      // is a self-equi-join on walk_id with the |Δstep| ≤ 2 residual —
      // per-walk fan-out is the constant window size times walk length,
      // never corpus-sized — followed by one map-side-combinable count.
      // The walk corpus itself is the shared deterministic builder, so
      // this query's gate transitively re-checks the walks too.
      (s, d) => {
        val w = walkCorpus(s, d).truncateLineage()
        val a = w.select(col("walk_id"), col("step").as("sa"),
          col("node").as("center"))
        val b = w.select(col("walk_id"), col("step").as("sb"),
          col("node").as("context"))
        a.join(b, "walk_id")
          .filter(abs(col("sa") - col("sb")) <= 2 &&
            col("sa") =!= col("sb"))
          .groupBy("center", "context")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("center", "context")
      },
      Some(
        s"""WITH $WALK_SQL,
           |prs AS (SELECT a.node AS center, b.node AS context
           |  FROM wall a JOIN wall b ON b.walk_id = a.walk_id
           |  WHERE abs(a.step - b.step) <= 2 AND a.step <> b.step)
           |SELECT center, context, count(*) AS cnt
           |FROM prs GROUP BY 1, 2 ORDER BY center, context""".stripMargin),
      bench = true),

    Q("graph_walk_node2vec",
      // SECOND-ORDER biased walks (node2vec, Grover & Leskovec KDD'16) —
      // the dial graph_walk_corpus lacks: step t's draw depends on where
      // the walk CAME from. Candidate x from current v with previous u
      // weighs S/p if x = u (return), S if x is adjacent to u (stay
      // local / BFS-like), S/q otherwise (push outward / DFS-like); here
      // p = 2, q = 4, S = 4 → integer weights 2 / 4 / 1, so the weighted
      // draw is md5(n2v # walk # t) mod Σw against the cumulative-weight
      // ladder and both engines replay it exactly. Per step: one
      // frontier×edges equi-join (fan-out = degree), one WALK-keyed left
      // join for the u-adjacency flag, one per-walk cumulative-weight
      // window (PARTITIONED BY walk_id — group size is one node's degree,
      // never global), one min_by pick.
      //
      // The adjacency probe costs nothing extra: step t needs
      // adj(prev, x) = "x ∈ N(prev)", and N(prev) per walk IS the
      // candidate set step t−1 already enumerated when it fanned out from
      // prev — so the previous step's (walk_id, dst) frame is carried
      // forward as the adjacency witness instead of re-joining the FULL
      // edge list every step (the r13 shape paid that second edge-sized
      // shuffle ×5; VERDICT r13 next #8). This beats the textbook
      // node2vec precompute (per-edge alias tables are O(Σ deg²) state —
      // prohibitive on skewed 100 TB graphs) by exploiting that a walk
      // only ever needs the one ladder it is standing on, which the walk
      // itself just computed.
      (s, d) => {
        val ranked = walkEdges(s, d).truncateLineage()
        val sym = ranked.select("src", "dst")
        // seeds from the artifact's r = 1 slice, degree attached — no
        // per-query DISTINCT aggregation (the walkCorpus seed shape)
        val seeds = ranked
          .filter(col("r") === 1 && col("src") % 100 === 0)
          .select(col("src").as("walk_id"), col("deg").as("sdeg"))
        // step 1: uniform (no previous node yet) — the walk_corpus draw
        // under the n2v salt. The full N(seed) enumeration materializes
        // (truncateLineage): the rank pick reads it now, and step 2's
        // adjacency probe replays it as N(prev). The md5 draw is hoisted
        // to a per-WALK frame (deg from the r = 1 slice of the ranked
        // artifact) and enters the pick as a second equi-key — the
        // walkCorpus hoist (guide §1.2/§4): one hash per walk instead of
        // one per enumerated neighbor row.
        // name-based joins/refs throughout: every frame here descends from
        // the ranked artifact, and dataset-tagged column refs would trip
        // the ambiguous-self-join check. The draw (one md5 per walk, off
        // the seed's attached degree) joins back on r itself, so the pick
        // is a two-key hash probe emitting exactly one row per walk.
        val draw1 = seeds.select(col("walk_id"),
          (pmod(graft.analytics.Sketch.hashPoint32(
            concat(lit("n2v#"), col("walk_id").cast("string"),
              lit("#1"))), col("sdeg")) + 1).as("r"))
        var prevCand = seeds.select(col("walk_id"),
            col("walk_id").as("from"))
          .join(ranked, col("from") === col("src"))
          .select(col("walk_id"), col("from"), col("dst"), col("r"),
            col("deg"))
          .truncateLineage()
        // checkpointed like every later step's frontier (= nxt): the pick
        // join's subtree contains the seeds distinct and a ranked scan via
        // draw1, and the frontier feeds BOTH the walks union and step 2's
        // fan-out — uncheckpointed it would recompute that subtree per
        // consumer (measured +4 s Σtask), and its sym lineage would trip
        // the ambiguous-self-join check in the step-2 join
        var frontier = prevCand.join(draw1, Seq("walk_id", "r"))
          .select(col("walk_id"), col("from").as("prev"),
            col("dst").as("cur"))
          .truncateLineage()
        var walks = seeds.select(col("walk_id"),
            lit(0L).as("step"), col("walk_id").as("node"))
          .union(frontier.select(col("walk_id"), lit(1L).as("step"),
            col("cur").as("node")))
        val byWalk = Window.partitionBy("walk_id").orderBy("dst")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("walk_id")
        for (t <- 2 to 6) {
          // one edge-keyed join per step (the same one walk_corpus pays):
          // fan out from cur; materialized once — the pick reads it now,
          // step t+1's adjacency probe reads it again as N(prev). The
          // step's md5 hash depends ONLY on walk_id, so it is computed on
          // the per-walk frontier and carried through the fan-out as a
          // column (__h): the draw filter below then evaluates a plain
          // integer pmod per candidate instead of md5 + string concat +
          // base-16 conv per candidate (the c32 JobProbe's dominant Σtask).
          val fh = frontier.withColumn("__h",
            graft.analytics.Sketch.hashPoint32(concat(lit("n2v#"),
              col("walk_id").cast("string"), lit(s"#$t"))))
          // name-based refs only: the frontier's lineage now reaches the
          // seeds/sym subtree through draw1, so dataset-tagged fh(...) /
          // sym(...) refs would trip the ambiguous-self-join check; the
          // column names are disjoint across the two sides
          val cand = fh.join(sym, col("cur") === col("src"))
            .select(col("walk_id"), col("prev"), col("cur"), col("dst"),
              col("__h"))
            .truncateLineage()
          // explicit renames on the witness side: cand and prevCand share
          // lineage (prevCand is last round's cand), so unrenamed columns
          // would resolve to the SAME attribute and the join degenerates
          val adjPrev = prevCand
            .select(col("walk_id").as("p_wid"), col("dst").as("p_dst"),
              lit(1).as("adj"))
          val weighted = cand
            .join(adjPrev, col("walk_id") === col("p_wid") &&
              col("dst") === col("p_dst"), "left")
            .select(col("walk_id"), col("cur"), col("dst"), col("__h"),
              when(col("dst") === col("prev"), 2L)
                .when(col("adj").isNotNull, 4L)
                .otherwise(1L).as("w"))
            .withColumn("cumw", sum(col("w")).over(byWalk))
            .withColumn("tw", sum(col("w")).over(tot))
          // identical draw value: pmod(md5-head-32(n2v#walk#t), tw) — the
          // hash now arrives as the carried __h column
          val nxt = weighted.filter(col("cumw") > pmod(col("__h"), col("tw")))
            .groupBy("walk_id")
            .agg(min_by(col("dst"), col("cumw")).as("nxt"),
              min(col("cur")).as("prev"))
            .select(col("walk_id"), col("prev"), col("nxt").as("cur"))
            .truncateLineage()
          walks = walks.union(nxt.select(col("walk_id"),
            lit(t.toLong).as("step"), col("cur").as("node")))
          frontier = nxt
          prevCand = cand
        }
        walks.orderBy("walk_id", "step")
      },
      Some {
        def h(t: Int): String = OracleShared.hx(
          s"md5('n2v#' || CAST(walk_id AS VARCHAR) || '#$t')")
        def step(t: Int): String =
          s"""c$t AS (SELECT f.walk_id, f.cur, e.dst,
             |    CASE WHEN e.dst = f.prev THEN 2
             |         WHEN pe.src IS NOT NULL THEN 4 ELSE 1 END AS w
             |  FROM f${t - 1} f JOIN sym e ON e.src = f.cur
             |  LEFT JOIN sym pe ON pe.src = f.prev AND pe.dst = e.dst),
             |u$t AS (SELECT walk_id, cur, dst, w,
             |    sum(w) OVER (PARTITION BY walk_id ORDER BY dst
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             |    sum(w) OVER (PARTITION BY walk_id) AS tw
             |  FROM c$t),
             |f$t AS (SELECT walk_id, cur AS prev, dst AS cur FROM (
             |  SELECT walk_id, cur, dst,
             |    row_number() OVER (PARTITION BY walk_id ORDER BY cumw) AS rn
             |  FROM u$t WHERE cumw > (${h(t)}) % tw) WHERE rn = 1)""".stripMargin
        s"""WITH raw AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |sym AS (SELECT src, dst FROM raw
           |        UNION ALL SELECT dst, src FROM raw),
           |rk AS (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY dst) AS r,
           |    count(*) OVER (PARTITION BY src) AS deg
           |  FROM sym),
           |s0 AS (SELECT src AS walk_id FROM
           |  (SELECT DISTINCT src FROM sym) WHERE src % 100 = 0),
           |f1 AS (SELECT s.walk_id, s.walk_id AS prev, e.dst AS cur
           |  FROM s0 s JOIN rk e ON e.src = s.walk_id
           |   AND e.r = (${h(1)}) % e.deg + 1),
           |${(2 to 6).map(step).mkString(",\n")}
           |SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM (
           |  SELECT walk_id, 0 AS step, walk_id AS node FROM s0
           |  UNION ALL SELECT walk_id, 1, cur FROM f1
           |  ${(2 to 6).map(t => s"UNION ALL SELECT walk_id, $t, cur FROM f$t")
              .mkString("\n  ")}
           |) ORDER BY walk_id, step""".stripMargin
      },
      bench = true)
  )

  /** Shared deterministic walk builder for graph_walk_corpus /
    * graph_walk_skipgram: 6-step walks from every 100th node of the
    * symmetric co-purchase graph, neighbor index drawn as
    * md5(walk_id # step) mod degree over the once-ranked edge list (r =
    * 1..deg per node by the range-partitioned running count — no per-node
    * window). Returns (walk_id, step, node), step 0..6.
    */
  /** The ranked symmetric co-purchase edge list (src, dst, r = 1..deg,
    * deg) published ONCE per dataset via the model store — the
    * coEdges discipline: the rank build (a two-pass range-partitioned
    * running count over the full edge list) is the expensive shared
    * stage, and all three walk queries serve from the artifact instead
    * of re-ranking. `sym` is recoverable as the (src, dst) projection.
    */
  private def walkEdges(s: SparkSession, d: String): DataFrame =
    graft.llm.ModelStore.getOrTrain(s,
      "walk_ranked_edges_v2_" + d.replaceAll("[^A-Za-z0-9]+", "_")) {
      val raw = tbl(s, d, "orders")
        .join(tbl(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      val sym = raw.union(raw.select(col("dst").as("src"),
        col("src").as("dst")))
      val rk = graft.etl.Ids.groupedRunningSum(
        sym.withColumn("one", lit(1L)), Seq("src"), Seq(col("dst")),
        "one", cumCol = "r", totCol = "deg")
        .select("src", "dst", "r", "deg")
      // v2: append ddeg = deg(dst), so a walk step that lands on dst
      // already knows the degree its NEXT draw needs — the consumers'
      // per-step degree joins (and their broadcast-build jobs) disappear.
      // The r = 1 slice is one row per node (r spans 1..deg, deg ≥ 1),
      // and the graph is symmetric, so every dst occurs as a src and the
      // inner join is total. Train-once cost inside the published
      // artifact, like the rank build itself.
      val dd = rk.filter(col("r") === 1)
        .select(col("src").as("dst"), col("deg").as("ddeg"))
      rk.join(broadcast(dd), "dst").select("src", "dst", "r", "deg", "ddeg")
    }

  private def walkCorpus(s: SparkSession, d: String): DataFrame = {
    val ranked = walkEdges(s, d).truncateLineage()
    // seeds from the r = 1 slice (one row per node, deg attached): the
    // former sym-projection + DISTINCT aggregation re-derived per query
    // what the artifact already states
    val seeds = ranked.filter(col("r") === 1 && col("src") % 100 === 0)
      .select(col("src").as("walk_id"), col("src").as("node"),
        col("deg").as("cdeg"))
    var walks = seeds.select(col("walk_id"), lit(0L).as("step"), col("node"))
    var cur = seeds
    for (t <- 1 to 6) {
      // The md5 draw is hoisted to the WALK frame (one hash per walk per
      // step) instead of living in the edge-join filter, where it was
      // evaluated once per CANDIDATE row — Σ deg(cur) md5+conv evaluations
      // per step on the streamed edge list (JobProbe r15: 35 s Σtask at
      // c32 for a 450-walk corpus; guide §1.2 "per-task work"/§4 — put
      // expensive expressions on the small side). The drawn rank then
      // enters the join as a SECOND equi-key, so the hash probe emits
      // exactly one row per walk instead of filtering deg candidates; the
      // artifact's ddeg column hands the landing node's degree to the
      // next step with no degree join at all.
      val drawn = cur.select(col("walk_id"), col("node"),
        (pmod(graft.analytics.Sketch.hashPoint32(
          concat(col("walk_id").cast("string"), lit(s"#$t"))),
          col("cdeg")) + 1).as("draw"))
      val nxt = drawn.join(ranked,
          col("node") === col("src") && col("draw") === col("r"))
        .select(col("walk_id"), col("dst").as("node"),
          col("ddeg").as("cdeg"))
        .truncateLineage()
      walks = walks.union(nxt.select(col("walk_id"),
        lit(t.toLong).as("step"), col("node")))
      cur = nxt
    }
    walks
  }

  /** Shared WITH-body of the walk oracles: the ranked edge list, the six
    * unrolled md5-draw steps, and `wall(walk_id, step, node)`.
    */
  private lazy val WALK_SQL: String = {
    def step(t: Int): String = {
      val h = OracleShared.hx(
        s"md5(CAST(w.walk_id AS VARCHAR) || '#$t')")
      s"""w$t AS (SELECT w.walk_id, e.dst AS node
         |  FROM w${t - 1} w JOIN rk e ON e.src = w.node
         |   AND e.r = ($h) % e.deg + 1)""".stripMargin
    }
    s"""raw AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |sym AS (SELECT src, dst FROM raw
       |        UNION ALL SELECT dst, src FROM raw),
       |rk AS (SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst) AS r,
       |    count(*) OVER (PARTITION BY src) AS deg
       |  FROM sym),
       |w0 AS (SELECT src AS walk_id, src AS node FROM
       |  (SELECT DISTINCT src FROM sym) WHERE src % 100 = 0),
       |${(1 to 6).map(step).mkString(",\n")},
       |wall AS (
       |  SELECT walk_id, 0 AS step, node FROM w0
       |  ${(1 to 6).map(t => s"UNION ALL SELECT walk_id, $t, node FROM w$t")
          .mkString("\n  ")})""".stripMargin
  }

  /** Shared SSSP fixture: the directed "expressway" graph on every 5th
    * customer — power-of-two skips id → id + 5·2^j (j = 0..16, clipped)
    * with md5 weights in [0, 1e6). Returns (nm, edges) where nm carries
    * (id, mx, mn) for seed selection. Binary skips keep the hop diameter
    * logarithmic, so the distance range — and Δ-stepping's round count —
    * stays flat as the node count grows.
    */
  private def expressway(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val nodes = tbl(s, d, "customer")
      .filter(pmod(col("c_custkey"), lit(5)) === 0)
      .select(col("c_custkey").cast("long").as("id"))
    val ext = nodes.agg(max(col("id")).as("mx"), min(col("id")).as("mn"))
    val nm = nodes.crossJoin(broadcast(ext))
    val js = s.range(0, 17).select(col("id").cast("int").as("j"))
    val hops = nm.crossJoin(broadcast(js))
      .withColumn("dst", expr("id + 5L * shiftleft(1L, j)"))
      .filter(col("dst") <= col("mx"))
    val w = pmod(graft.analytics.Sketch.hashPoint32(
      concat(lit("sw#"), col("id").cast("string"),
        lit("#"), col("dst").cast("string"))), lit(1000000L))
    (nm, hops.select(col("id").as("src"), col("dst"), w.as("w")))
  }

  /** Oracle for graph_stress_landmarks: the distance table is the same
    * recursive CTE as closeness; σ and P are the Brandes recurrences
    * unrolled one CTE per layer (the hop bound is a constant). Every
    * value is a path count in HUGEINT — exact, so the final DECIMAL(38,0)
    * casts hash-match Spark's decimal aggregation bit for bit.
    */
  private lazy val STRESS_SQL: String = {
    def sLayer(cur: String, prev: String, h: Int): String =
      s"""$cur AS (SELECT s.lm, dd.id, sum(s.sigma) AS sigma
         |  FROM $prev s JOIN edges e ON e.src = s.id
         |  JOIN d dd ON dd.lm = s.lm AND dd.id = e.dst AND dd.hop = $h
         |  GROUP BY 1, 2)""".stripMargin
    def pLayer(cur: String, deeper: String, h: Int): String =
      s"""$cur AS (SELECT d.lm, d.id, coalesce(x.p, CAST(0 AS HUGEINT)) AS p
         |  FROM d LEFT JOIN (
         |    SELECT c.lm, c.id, sum(w.p + 1) AS p
         |    FROM d c JOIN edges e ON e.src = c.id
         |    JOIN $deeper w ON w.lm = c.lm AND w.id = e.dst
         |    WHERE c.hop = $h GROUP BY 1, 2) x ON x.lm = d.lm AND x.id = d.id
         |  WHERE d.hop = $h)""".stripMargin
    s"""WITH RECURSIVE raw AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
       |lms AS (SELECT src AS lm FROM (
       |  SELECT DISTINCT src FROM edges ORDER BY src LIMIT 4)),
       |reach(lm, id, hop) AS (
       |  SELECT lm, lm, 0 FROM lms
       |  UNION
       |  SELECT r.lm, e.dst, r.hop + 1
       |  FROM reach r JOIN edges e ON e.src = r.id WHERE r.hop < 3),
       |d AS (SELECT lm, id, min(hop) AS hop FROM reach GROUP BY 1, 2),
       |s0 AS (SELECT lm, lm AS id, CAST(1 AS HUGEINT) AS sigma FROM lms),
       |${sLayer("s1", "s0", 1)},
       |${sLayer("s2", "s1", 2)},
       |${sLayer("s3", "s2", 3)},
       |sig AS (SELECT lm, id, 1 AS hop, sigma FROM s1
       |  UNION ALL SELECT lm, id, 2, sigma FROM s2
       |  UNION ALL SELECT lm, id, 3, sigma FROM s3),
       |p3 AS (SELECT lm, id, CAST(0 AS HUGEINT) AS p FROM d WHERE hop = 3),
       |${pLayer("p2", "p3", 2)},
       |${pLayer("p1", "p2", 1)},
       |pp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
       |  UNION ALL SELECT * FROM p3)
       |SELECT g.id, count(*) AS n_lm,
       |  CAST(sum(g.sigma) AS BIGINT) AS sigma_sum,
       |  CAST(sum(g.sigma * pp.p) AS BIGINT) AS stress
       |FROM sig g JOIN pp ON pp.lm = g.lm AND pp.id = g.id
       |GROUP BY g.id ORDER BY g.id""".stripMargin
  }

  /** Oracle for graph_mst_boruvka: sequential Prim from the minimum node,
    * one edge per recursive-CTE step, visited set carried as a list —
    * an independent DEFINITION-level construction (never a replay of the
    * Borůvka rounds), valid because the lexicographic (w, a, b) total
    * order makes the spanning tree unique.
    */
  private lazy val MST_SQL: String = {
    val he = OracleShared.hx("md5('e#' || CAST(id AS VARCHAR))")
    val hw = OracleShared.hx(
      "md5('w#' || CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR))")
    s"""WITH RECURSIVE
       |mn AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 5 = 0),
       |mmx AS (SELECT max(id) AS mx FROM mn),
       |me0 AS (
       |  SELECT id AS a, id + 5 AS b FROM mn CROSS JOIN mmx
       |  WHERE id + 5 <= mx
       |  UNION
       |  SELECT id AS a, id + 5 * (2 + ($he) % 16) AS b
       |  FROM mn CROSS JOIN mmx
       |  WHERE id + 5 * (2 + ($he) % 16) <= mx),
       |me AS (SELECT a, b, ($hw) % 1000000 AS w FROM me0),
       |msym AS (SELECT a, b, w FROM me UNION ALL SELECT b, a, w FROM me),
       |mroot AS (SELECT min(id) AS r FROM mn),
       |prim AS (
       |  SELECT [r] AS vs, CAST([] AS BIGINT[]) AS ea,
       |         CAST([] AS BIGINT[]) AS eb, 0 AS step
       |  FROM mroot
       |  UNION ALL
       |  SELECT list_append(p.vs, pk.b), list_append(p.ea, pk.a),
       |         list_append(p.eb, pk.b), p.step + 1
       |  FROM prim p, LATERAL (
       |    SELECT e.a, e.b FROM msym e
       |    WHERE list_contains(p.vs, e.a) AND NOT list_contains(p.vs, e.b)
       |    ORDER BY e.w, least(e.a, e.b), greatest(e.a, e.b) LIMIT 1
       |  ) pk),
       |mlast AS (SELECT ea, eb FROM prim ORDER BY step DESC LIMIT 1),
       |mtree AS (SELECT least(a, b) AS a, greatest(a, b) AS b
       |          FROM (SELECT unnest(ea) AS a, unnest(eb) AS b FROM mlast))
       |SELECT t.a, t.b, e.w FROM mtree t JOIN me e ON e.a = t.a AND e.b = t.b
       |ORDER BY t.a, t.b""".stripMargin
  }

  /** Oracle for graph_sssp: textbook sequential Dijkstra, one settled
    * node per recursive-CTE step — the visited set and its distances
    * carried as position-zipped lists, the pick a LATERAL min over
    * crossing edges. Independent of the Spark side's Δ-stepping: the
    * shortest-path WEIGHTS are unique values, so any correct algorithm
    * returns these rows (no tie-break needed — ties in the pick order
    * can't change the distance labels).
    */
  /** The expressway fixture's CTE block (mirror of [[expressway]]). */
  private lazy val XW_CTES: String = {
    val hw = OracleShared.hx(
      "md5('sw#' || CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR))")
    s"""sn AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |       WHERE c_custkey % 5 = 0),
       |sx AS (SELECT max(id) AS mx, min(id) AS mn FROM sn),
       |sj AS (SELECT unnest(range(0, 17)) AS j),
       |se0 AS (SELECT id AS src, id + 5 * (CAST(1 AS BIGINT) << j) AS dst
       |        FROM sn CROSS JOIN sj CROSS JOIN sx
       |        WHERE id + 5 * (CAST(1 AS BIGINT) << j) <= mx),
       |se AS (SELECT src, dst, ($hw) % 1000000 AS w FROM se0)""".stripMargin
  }

  /** One sequential-Dijkstra recursion from seed expression `seedSql`,
    * named `name` — the (visited, dist) lists + LATERAL min-pick body
    * shared by the SSSP and weighted-closeness oracles.
    */
  private def dijCte(name: String, seedSql: String): String =
    s"""$name AS (
       |  SELECT [$seedSql] AS vs, [CAST(0 AS BIGINT)] AS ds, 0 AS step FROM sx
       |  UNION ALL
       |  SELECT list_append(p.vs, pk.u), list_append(p.ds, pk.d), p.step + 1
       |  FROM $name p, LATERAL (
       |    SELECT e.dst AS u, p.ds[list_position(p.vs, e.src)] + e.w AS d
       |    FROM se e
       |    WHERE list_contains(p.vs, e.src) AND NOT list_contains(p.vs, e.dst)
       |    ORDER BY d, e.dst LIMIT 1
       |  ) pk)""".stripMargin

  private lazy val SSSP_SQL: String =
    s"""WITH RECURSIVE
       |$XW_CTES,
       |${dijCte("dij", "mn")},
       |slast AS (SELECT vs, ds FROM dij ORDER BY step DESC LIMIT 1)
       |SELECT unnest(vs) AS id, unnest(ds) AS dist FROM slast ORDER BY id"""
      .stripMargin

  /** Oracle for graph_closeness_weighted: one independent Dijkstra per
    * landmark (min node; middle node), unioned with the landmark id.
    */
  private lazy val CLOSENESS_W_SQL: String =
    s"""WITH RECURSIVE
       |$XW_CTES,
       |${dijCte("dijA", "mn")},
       |${dijCte("dijB", "mn + 5 * (((mx - mn) // 5) // 2)")},
       |lA AS (SELECT vs, ds FROM dijA ORDER BY step DESC LIMIT 1),
       |lB AS (SELECT vs, ds FROM dijB ORDER BY step DESC LIMIT 1),
       |u AS (
       |  SELECT (SELECT mn FROM sx) AS lm, unnest(vs) AS id,
       |         unnest(ds) AS dist FROM lA
       |  UNION ALL
       |  SELECT (SELECT mn + 5 * (((mx - mn) // 5) // 2) FROM sx),
       |         unnest(vs), unnest(ds) FROM lB)
       |SELECT lm, id, dist FROM u ORDER BY lm, id""".stripMargin
}
