package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression guards: the scale properties documented in
  * README/Scaladoc (bounded exchanges, broadcast dimension joins) are
  * asserted against the actual physical plans so a future edit can't
  * silently reintroduce an extra shuffle or a shuffled dim join.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  // hint audit shares PlanScale's STRICT bounded semantics (a KEYED
  // aggregate over a fact table is NOT bounded) with the registry lint
  private def factHintedSubtrees(df: DataFrame): Seq[String] =
    PlanScale.factHintedSubtrees(df)

  test("transform chain: at most 4 exchanges (distinct, dedup, sort + AQE reuse)") {
    val p = plan(Queries.transformChain(spark, sf))
    val n = countOccurrences(p, "Exchange ")
    assert(n <= 4, s"chain grew to $n exchanges:\n${p.take(2000)}")
  }

  test("fact-fact joins carry no explicit broadcast hint (planner decides)") {
    // customer and part grow with SF: a forced broadcast() OOMs at 100 TB.
    // Pin the LOGICAL plan's hint absence, not the physical join choice —
    // auto-broadcast at test SF is fine and expected.
    for (q <- Seq("join_orders_customer", "join_revenue_by_brand",
        "join_tpch_q3_shape", "join_tpch_q10_shape", "join_tpch_q18_shape",
        "agg_tpch_q14_shape", "agg_string_agg")) {
      val bad = factHintedSubtrees(Queries.queryMap(q)(spark, sf))
      assert(bad.isEmpty,
        s"$q hints a broadcast of a fact-sized table:\n${bad.mkString("\n").take(1500)}")
    }
  }

  test("skew-stress arms: shuffle join pinned, no broadcast — the 100 TB plan") {
    // the merge hint exists exactly so the sf-small bench measures the
    // shuffle-join skew behavior both arms would have at scale; an
    // auto-broadcast here would silently turn the measurement into noise
    for (q <- Seq("join_skew_stress_salted", "join_skew_stress_aqe",
        "join_spatial_grid_clustered")) {
      val df = Queries.queryMap(q)(spark, sf)
      val p = plan(df)
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        s"$q lost its pinned shuffle join — the skew measurement is void:\n${p.take(1200)}")
      assert(p.contains("SortMergeJoin"), s"$q is not a sort-merge join")
      assert(factHintedSubtrees(df).isEmpty,
        s"$q must pin via merge, never broadcast")
    }
    // and the salted arm really salts: the join keys include the salt col
    val salted = plan(Queries.queryMap("join_skew_stress_salted")(spark, sf))
    assert(salted.contains("__salt"), "salted arm joins without the salt key")
  }

  test("top-k window rides WindowGroupLimit partial pushdown") {
    val p = plan(Queries.queryMap("dash_topk_per_group")(spark, sf))
    assert(p.contains("WindowGroupLimit"), "top-k lost the partial group limit")
  }

  test("as-of join plans as window carry-forward, not a nested loop") {
    val p = plan(Queries.queryMap("join_asof")(spark, sf))
    assert(!p.contains("NestedLoop"), "as-of join degenerated to a nested loop")
    assert(p.contains("Window"), "as-of join lost its window carry-forward")
  }

  test("join strategy hints are honored: broadcast, shuffle_hash, merge") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val cond = col("o_custkey") === col("c_custkey")
    assert(plan(orders.join(broadcast(cust), cond)).contains("BroadcastHashJoin"))
    assert(plan(orders.join(cust.hint("shuffle_hash"), cond)).contains("ShuffledHashJoin"),
      "shuffle_hash hint ignored")
    assert(plan(orders.join(cust.hint("merge"), cond)).contains("SortMergeJoin"),
      "merge hint ignored")
  }

  test("correlated scalar subqueries decorrelate to aggregate+join, no re-scan per row") {
    val p = plan(Queries.queryMap("join_correlated_subquery")(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "correlated subquery planned a per-row re-scan")
    assert(!p.contains("Subquery"),
      "scalar subquery survived decorrelation (would re-execute per row)")
    assert(p.contains("HashAggregate"), "decorrelated aggregate missing")
  }

  test("range join is an equi-join on bucket keys, not a nested loop") {
    val p = plan(Queries.queryMap("join_range_events")(spark, sf))
    assert(!p.contains("NestedLoop"), "range join degenerated to a nested loop")
  }

  test("minhash dedup never plans a cartesian/nested-loop product") {
    val p = plan(Queries.queryMap("dedup_minhash_pairs")(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "minhash candidate join must stay a bucket equi-join")
  }

  test("scan prunes columns: daily-avg reads only the two columns it uses") {
    val p = plan(Queries.queryMap("dash_daily_avg_orders")(spark, sf))
    assert(p.contains("ReadSchema"), "no file scan in plan?")
    assert(!p.contains("o_comment") && !p.contains("o_custkey"),
      "scan reads columns the query never touches — pruning regressed")
  }

  test("filter pushdown reaches the events parquet scan") {
    val p = plan(Queries.queryMap("join_range_events")(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("event_type"),
      "event_type predicate no longer pushed to the scan")
  }

  test("semi/anti/full-outer queries plan their declared join types") {
    val p1 = plan(Queries.queryMap("join_semi_anti")(spark, sf))
    assert(p1.contains("LeftSemi") && p1.contains("LeftAnti"),
      "semi/anti query lost its semi or anti join")
    val p2 = plan(Queries.queryMap("join_full_outer")(spark, sf))
    assert(p2.contains("FullOuter"), "full-outer query lost its join type")
    assert(!p2.contains("Cartesian") && !p2.contains("NestedLoop"),
      "full-outer degenerated to a product join")
  }

  test("minhash pair path has no interpreted HOFs (SigAgreement fused loop)") {
    val p = plan(Queries.queryMap("dedup_minhash_pairs")(spark, sf))
    assert(!p.contains("zip_with") && !p.contains("lambdafunction"),
      "per-pair agreement regressed to interpreted higher-order functions")
    assert(p.contains("sig_agreement"), "SigAgreement expression missing from plan")
  }

  test("multiway star join: filters pushed to every scan, no fact hint, no product") {
    val df = Queries.queryMap("join_multiway_revenue")(spark, sf)
    val bad = factHintedSubtrees(df)
    assert(bad.isEmpty,
      s"star join hints a broadcast of a fact-sized table:\n${bad.mkString("\n").take(1500)}")
    val p = plan(df)
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "star join degenerated to a product")
    // each selective predicate reaches its parquet scan
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"),
      "customer segment filter not pushed to the scan")
    assert(p.contains("o_orderdate") && p.contains("l_shipdate"),
      "date range filters missing from the scans")
  }

  test("weighted median has no region-partitioned window (two-pass ranks)") {
    // a window PARTITION BY region caps parallelism at the 14 regions;
    // the query must ride Ids.groupedRunningSum's two-pass offsets instead
    val p = plan(Queries.queryMap("dash_weighted_median")(spark, sf))
    // (the final ≤14-row groupBy("region") exchange of partial aggregates
    // is fine — the pin is on the data-sized cumulative-sum stage)
    assert(!p.contains("Window"),
      "weighted median regressed to a window-based cumulative sum")
    assert(!p.contains("Join"),
      "weighted median regressed to a groupBy+join total-weight form")
  }

  test("winsorized mean / batch padding / pack sequences: two-pass ranks, no window") {
    // all three ran low-cardinality-partitioned windows (pri / lang) over
    // fact tables in r8 — one task sorting 1/k of the data at any scale;
    // they must stay on Ids.groupedRunningSum's offset scheme
    for (q <- Seq("dash_winsorized_mean", "text_batch_padding",
        "text_pack_sequences")) {
      val p = plan(Queries.queryMap(q)(spark, sf))
      assert(!p.contains("Window"),
        s"$q regressed to a window-based rank/cumsum")
    }
  }

  test("funnel keeps every join/agg on user_id (no product, no global window)") {
    val p = plan(Queries.queryMap("ev_funnel")(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "funnel degenerated to a product join")
    assert(!p.contains("Window"), "funnel should be aggregation-only, no window")
  }

  test("PQ path: every codebook/LUT join broadcasts, no product or shuffle join") {
    val p = plan(Queries.queryMap("sim_pq_topk")(spark, sf))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "PQ degenerated to a product join")
    assert(!p.contains("SortMergeJoin"),
      "codebook/LUT join lost its broadcast — a shuffle join of the corpus")
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in PQ plan?")
    assert(p.contains("long_dot"), "LongDot kernel missing from the PQ plan")
  }

  test("IVF-PQ path: probes/LUT broadcast, no product join anywhere") {
    val p = plan(Queries.queryMap("sim_ivfpq_topk")(spark, sf))
    // the centroid fanout is a BROADCAST nested loop over numCells rows by
    // design; what must never appear is an unhinted product of big sides
    assert(!p.contains("Cartesian"), "IVF-PQ degenerated to a cartesian join")
    assert(countOccurrences(p, "NestedLoopJoin") ==
      countOccurrences(p, "BroadcastNestedLoopJoin"),
      "a nested-loop join lost its broadcast hint")
    assert(p.contains("BroadcastHashJoin"),
      "probe/LUT joins lost their broadcast hints")
    assert(p.contains("long_dot"), "LongDot kernel missing from the ADC stage")
    // the codes ⋈ cells build join (both corpus-derived, keyed by id) is
    // the ONLY stage allowed to shuffle-join; anything more means a LUT or
    // probe join fell off its broadcast
    assert(countOccurrences(p, "SortMergeJoin") <= 1,
      s"unexpected shuffle joins in IVF-PQ plan:\n${p.take(2000)}")
  }

  test("snapshot diff and SCD2 merge plan single full-outer joins") {
    Seq("etl_snapshot_diff", "etl_scd2_merge").foreach { q =>
      val p = plan(Queries.queryMap(q)(spark, sf))
      assert(p.contains("FullOuter"), s"$q lost its full-outer join")
      assert(countOccurrences(p, "FullOuter") == 1,
        s"$q should join exactly once:\n${p.take(1500)}")
    }
  }

  test("co-purchase mining: a-priori prune broadcasts, no cartesian pair stage") {
    val p = plan(Queries.queryMap("graph_copurchase_pairs")(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "frequent-item prune lost its broadcast semi-join")
    assert(!p.contains("Cartesian"),
      "pair generation degenerated to a cartesian product")
    // final ordering is top-50: must plan as the k-row heap, not a global sort
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 lost its TakeOrderedAndProject heap")
  }

  test("pagerank: no cartesian beyond the 1-row broadcast dangling scalar") {
    val df = Queries.queryMap("graph_pagerank")(spark, sf)
    val p = plan(df)
    assert(countOccurrences(p, "NestedLoopJoin") ==
      countOccurrences(p, "BroadcastNestedLoopJoin"),
      "the dangling-mass scalar join lost its broadcast hint")
    assert(!p.contains("CartesianProduct"),
      "pagerank planned an unhinted product join")
    // top-20 by rank must be the heap, not a global sort of all nodes
    assert(p.contains("TakeOrderedAndProject"),
      "rank top-20 lost its TakeOrderedAndProject heap")
  }

  test("tpcds q67 shape: rollup lattice is ONE Expand+aggregate, no per-level scan") {
    val p = plan(Queries.queryMap("join_tpcds_q67_shape")(spark, sf))
    assert(p.contains("Expand"),
      "rollup lost its Expand encoding — lattice now costs a scan per level?")
    // 3 scans (lineitem, orders, part) — the 5 lattice levels must NOT
    // multiply them
    assert(countOccurrences(p, "Scan parquet") == 3,
      s"expected exactly 3 scans:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpcds q35 shape: EXISTS disjunction plans as ExistenceJoin, conjunct as semi") {
    val p = plan(Queries.queryMap("join_tpcds_q35_shape")(spark, sf))
    assert(p.contains("ExistenceJoin"),
      s"OR of EXISTS did not decorrelate to ExistenceJoin:\n${p.take(1500)}")
    assert(p.contains("LeftSemi"),
      "the conjunctive EXISTS should still be a plain semi-join")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpcds q88 full form: ONE orders scan serves all 8 banded counts") {
    val p = plan(Queries.queryMap("dash_multiband_q88_full")(spark, sf))
    assert(countOccurrences(p, "Scan parquet") == 1,
      s"the 8-band rewrite regressed to per-band self-scans:\n${p.take(1500)}")
    assert(!p.contains("Exchange hashpartitioning"),
      "a global 8-counter reduce needs no hash exchange")
  }

  test("BFS round: frontier-incremental — anti-join vs settled, no full-table min re-agg") {
    // A hop is final at first discovery: each round must expand only the
    // frontier and anti-join the settled set. A min(hop) aggregate in the
    // round plan means the whole accumulated k·|V| distance table is being
    // re-shuffled + re-aggregated every round — the O(k·|V|)-per-round
    // shape this pin exists to keep out. The loop's localCheckpoints hide
    // round lineage from the final query plan, so the pin targets the
    // exposed per-round builder Graph.bfsStep.
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    for (lmKeyed <- Seq(false, true)) {
      val frontier =
        if (lmKeyed) Seq((1L, 1L)).toDF("lm", "id").withColumn("hop", lit(0L))
        else Seq(Tuple1(1L)).toDF("id").withColumn("hop", lit(0L))
      val settled = frontier
      val p = plan(graft.analytics.Graph.bfsStep(
        frontier, settled, e.select(col("src"), col("dst")), 1, lmKeyed))
      assert(!p.contains("min(hop"),
        s"bfsStep(lmKeyed=$lmKeyed) re-aggregates the full distance table")
      assert(p.contains("LeftAnti"),
        s"bfsStep(lmKeyed=$lmKeyed) lost the settled-set anti-join")
    }
  }

  test("priority sample: top-(k+1) plans as TakeOrderedAndProject heap") {
    val p = plan(Queries.queryMap("text_priority_sample")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "priority top-k lost its per-partition heap plan")
    assert(countOccurrences(p, "NestedLoopJoin") ==
      countOccurrences(p, "BroadcastNestedLoopJoin"),
      "a 1-row scalar join (τ or total) lost its broadcast hint")
  }

  test("link prediction: wedge join is an equi-join, final top-k is a heap") {
    val p = plan(Queries.queryMap("graph_link_predict")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "wedge enumeration degenerated to a cartesian product")
    assert(p.contains("TakeOrderedAndProject"),
      "link-predict top-k lost its heap plan")
  }

  test("hybrid RRF: query-token and df tables broadcast, no product join") {
    val p = plan(Queries.queryMap("sim_hybrid_rrf")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "hybrid retrieval planned a cartesian product")
    assert(countOccurrences(p, "NestedLoopJoin") ==
      countOccurrences(p, "BroadcastNestedLoopJoin"),
      "a scalar/corpus-totals join lost its broadcast hint")
    assert(p.contains("TopKPerGroup"),
      "per-query top-k lost the heap exec")
  }

  test("incremental dedup: batch-vs-base joins only, no cartesian anywhere") {
    val p = plan(Queries.queryMap("dedup_incremental")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "incremental dedup planned a product join")
  }

  test("tpch q1 shape: one scan, one exchange, hash aggregation") {
    val p = plan(Queries.queryMap("agg_tpch_q1_shape")(spark, sf))
    assert(countOccurrences(p, "Exchange ") <= 2,
      s"q1 grew extra shuffles:\n${p.take(1500)}")
    assert(p.contains("HashAggregate"), "q1 lost hash aggregation")
    assert(countOccurrences(p, "FileScan") == 1,
      "q1 must be a single lineitem scan")
  }

  test("tpch q19 shape: per-side OR bounds derived and pushed to both scans") {
    // Catalyst factors the disjunctive brackets into per-side implied
    // predicates: the quantity-range OR reaches the lineitem scan and the
    // brand/size OR reaches the part scan, while the full cross-side
    // bracket stays a post-join residual — the Q19 plan feature
    val p = plan(Queries.queryMap("join_tpch_q19_shape")(spark, sf))
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      "derived quantity OR-bound not pushed to the lineitem scan")
    assert(p.contains("Or(Or(And(EqualTo(p_brand"),
      "derived brand/size OR-bound not pushed to the part scan")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      "q19 degenerated to a product join")
  }

  test("tpch q21 shape: EXISTS/NOT EXISTS decorrelate to semi+anti joins") {
    val p = plan(Queries.queryMap("join_tpch_q21_shape")(spark, sf))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      "correlated self-subqueries did not decorrelate to semi/anti joins")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "q21 degenerated to a per-row re-scan/product")
  }

  test("tpch q13 shape: ON-clause predicate pushed to scan, outer join kept") {
    val p = plan(Queries.queryMap("join_tpch_q13_shape")(spark, sf))
    assert(p.contains("LeftOuter"), "q13 lost its outer join (zero-order customers)")
    assert(p.contains("Not(In(o_orderpriority"),
      "ON-clause order predicate not pushed to the orders scan")
  }

  test("tpch q16 shape: excluded suppliers anti-join, part filters pushed") {
    val p = plan(Queries.queryMap("join_tpch_q16_shape")(spark, sf))
    assert(p.contains("LeftAnti"), "q16 lost its supplier anti-join")
    // (the PushedFilters list is truncated in toString, so pin the first
    // pushed part predicate — the rest ride the same scan)
    assert(p.contains("Not(EqualTo(p_brand"),
      "part predicates not pushed to the scan")
  }

  test("tpch q22 shape: NOT EXISTS decorrelates, only the 1-row threshold crosses") {
    val p = plan(Queries.queryMap("join_tpch_q22_shape")(spark, sf))
    assert(p.contains("LeftAnti"), "q22 lost its recent-orders anti-join")
    assert(!p.contains("Cartesian"), "q22 planned a cartesian product")
    // the only nested-loop is the 1-row positive-balance aggregate broadcast
    assert(countOccurrences(p, "BroadcastNestedLoopJoin") <= 1,
      "q22 grew a second nested-loop beyond the 1-row threshold broadcast")
  }

  test("dashboard suite: ONE chain materialization serves all five charts") {
    // the suite's whole point (VERDICT r11 task #4): the transform chain
    // materializes once (lazy localCheckpoint at the chain boundary) and
    // every chart branch reads the cached RDD — so the physical plan must
    // contain ZERO parquet scans (the chain's file scan lives inside the
    // checkpoint RDD's lineage, executed once) and five ExistingRDD reads
    // of the same checkpoint.
    val p = plan(Queries.queryMap("dash_dashboard_suite")(spark, sf))
    assert(countOccurrences(p, "Scan parquet") == 0,
      s"a chart branch re-reads the raw table — the one-scan claim broke:\n${p.take(1500)}")
    // 7 cached reads: 5 chart aggregations + the two share charts' 1-row
    // totals — every one over the SAME checkpoint RDD (one materialization)
    assert(countOccurrences(p, "Scan ExistingRDD") == 7,
      s"expected the 7 branches over the checkpointed chain:\n${p.take(1500)}")
  }

  test("tpcds q64 shape: the star aggregate materializes once for both passes") {
    val p = plan(Queries.queryMap("join_tpcds_q64_shape")(spark, sf))
    assert(countOccurrences(p, "Scan parquet") == 0,
      s"a self-join side re-scans the star:\n${p.take(1500)}")
    assert(countOccurrences(p, "Scan ExistingRDD") == 2,
      s"expected exactly the two year slices over the checkpointed star:\n${p.take(1500)}")
  }

  test("tpcds q72 shape: fact-fact residual join, no fact hint, no product") {
    val df = Queries.queryMap("join_tpcds_q72_shape")(spark, sf)
    assert(factHintedSubtrees(df).isEmpty,
      "q72 hints a broadcast of a fact-sized table")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q72's residuals must ride the orderkey equi-join, not a product:\n${p.take(1500)}")
  }

  test("knn graph: bucketed seeding, no cartesian anywhere") {
    val p = plan(Queries.queryMap("sim_knn_graph")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "knn graph planned an all-pairs product")
  }

  test("power iteration: explode-join-agg dataflow, v joins broadcast") {
    val p = plan(Queries.queryMap("sim_power_iteration")(spark, sf))
    assert(!p.contains("CartesianProduct"), "power iteration planned a product")
    assert(p.contains("BroadcastHashJoin"),
      "the 64-row v vector lost its broadcast join")
  }

  test("stress sigma round: frontier-incremental — sum over expansion, anti-join, no settled re-agg") {
    // same contract as bfsStep: the round aggregates ONLY the one-hop
    // expansion (sum of predecessor sigmas), never the settled table,
    // and the settled set enters solely through a LeftAnti.
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val prev = Seq((1L, 1L)).toDF("lm", "id")
      .withColumn("hop", lit(0))
      .withColumn("sigma", lit(1L).cast("decimal(20,0)"))
    val p = plan(graft.analytics.Graph.sigmaStep(prev, prev, e, 1))
    assert(p.contains("LeftAnti"), "sigmaStep lost the settled anti-join")
    assert(countOccurrences(p, "sum(sigma") >= 1 &&
      !p.contains("min(hop"),
      s"sigmaStep must sum the expansion only:\n${p.take(1200)}")
  }

  test("scc round: both label waves in ONE join + ONE aggregate") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val lab = Seq((1L, 1L, 0), (1L, 1L, 1)).toDF("id", "lab", "dir")
    val ebi = Seq((1L, 1L, 0), (1L, 1L, 1)).toDF("from", "to", "dir")
    val p = plan(graft.analytics.Graph.sccRound(lab, ebi))
    val joins = countOccurrences(p, "HashJoin") +
      countOccurrences(p, "SortMergeJoin") +
      countOccurrences(p, "NestedLoopJoin")
    assert(joins == 1, s"scc round must be one join, got $joins:\n${p.take(1200)}")
    // one aggregate = one partial/final pair
    assert(countOccurrences(p, "HashAggregate") <= 2,
      s"scc round grew extra aggregates:\n${p.take(1200)}")
  }
}
