package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative self-tests for the scale lint: a guard that has never been
  * seen to fire is not a guard (the r8 lint matched parquet paths against
  * LogicalPlan.toString — which never contains them for V1 relations — so
  * its product-join and fact-broadcast checks could not fire on ANY
  * input). Each test here builds a deliberately bad plan and asserts the
  * lint flags it, plus a matching good plan it must NOT flag.
  */
class PlanScaleSelfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sf/$name.parquet")

  test("scanPaths resolves V1 parquet paths structurally") {
    val paths = PlanScale.scanPaths(
      t("orders").filter(col("o_totalprice") > 0)
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .queryExecution.analyzed)
    assert(paths.exists(_.contains("/orders.parquet")), s"orders scan missing: $paths")
    assert(paths.exists(_.contains("/customer.parquet")), s"customer scan missing: $paths")
    // and the r8 failure mode really is a failure mode: toString has no path
    val plan = t("customer").queryExecution.analyzed
    assert(!plan.toString.contains("/customer.parquet"),
      "LogicalPlan.toString now prints paths — the self-test premise changed")
  }

  test("lint FIRES on a broadcast-hinted fact table (the r7/r8 violation class)") {
    val bad = PlanScale.factHintedSubtrees(
      t("orders").join(broadcast(t("customer")),
        col("o_custkey") === col("c_custkey")))
    assert(bad.nonEmpty, "broadcast(customer) under orders join not flagged")
    assert(bad.head.contains("customer.parquet"), s"flag names no path: $bad")
    // the filtered-supplier variant (join_tpch_q5_shape's exact shape)
    val sup = PlanScale.factHintedSubtrees(
      t("lineitem").join(
        broadcast(t("supplier").filter(col("s_nationkey") < 10)),
        col("l_suppkey") === col("s_suppkey")))
    assert(sup.nonEmpty, "broadcast(filtered supplier) not flagged — " +
      "supplier grows 10×/SF step and must be in factPaths")
  }

  test("lint stays SILENT on merge/shuffle_hash hints over fact data") {
    // pinning the shuffle path on a fact join is the scale-CORRECT
    // discipline (the skew-stress rows do exactly this) — only the
    // broadcast strategy may fire
    assert(PlanScale.factHintedSubtrees(
      t("lineitem").join(t("supplier").hint("merge"),
        col("l_suppkey") === col("s_suppkey"))).isEmpty,
      "merge hint over fact data wrongly flagged as a broadcast")
    assert(PlanScale.factHintedSubtrees(
      t("orders").join(t("customer").hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))).isEmpty,
      "shuffle_hash hint over fact data wrongly flagged as a broadcast")
  }

  test("lint stays SILENT on bounded build sides (dims, 1-row aggs, limits)") {
    // nation is geography-bounded — not a fact path
    assert(PlanScale.factHintedSubtrees(
      t("supplier").join(broadcast(t("nation")),
        col("s_nationkey") === col("n_nationkey"))).isEmpty)
    // a no-grouping aggregate of a fact table is 1 row — bounded
    assert(PlanScale.factHintedSubtrees(
      t("orders").crossJoin(broadcast(
        t("lineitem").agg(sum("l_quantity").as("tq"))))).isEmpty)
    // an explicit limit is bounded
    assert(PlanScale.factHintedSubtrees(
      t("orders").join(broadcast(t("customer").limit(100)),
        col("o_custkey") === col("c_custkey"))).isEmpty)
  }

  test("a bound in ONE join branch does not bless the other (no collectFirst hole)") {
    // broadcast(lineitem ⋈ supplier.limit(100)): the limit bounds only the
    // supplier branch; the hint's build side is still lineitem-sized
    val bad = PlanScale.factHintedSubtrees(
      t("orders").join(
        broadcast(t("lineitem").join(t("supplier").limit(100),
          col("l_suppkey") === col("s_suppkey"))),
        col("o_orderkey") === col("l_orderkey")))
    assert(bad.nonEmpty,
      "broadcast over fact-join-limited-dim not flagged — a bounding node " +
        "in one branch must not mark the whole join bounded")
    // the same shape with BOTH branches bounded stays silent
    assert(PlanScale.factHintedSubtrees(
      t("orders").join(
        broadcast(t("customer").limit(50).join(t("supplier").limit(100),
          col("c_nationkey") === col("s_nationkey"))),
        col("o_custkey") === col("c_custkey"))).isEmpty,
      "join of two limited sides wrongly flagged")
  }

  test("outer/anti joins do not bound the retained side's key") {
    // anti-join: the output keys are exactly the NON-matching ones — a
    // bounded right side says nothing about their cardinality
    val anti = t("orders").join(t("customer").limit(10),
      col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(PlanScale.factUnbounded(anti.queryExecution.analyzed),
      "aggregate keyed by an anti-join key wrongly classified bounded")
    // the inner twin IS bounded: matched keys take ≤ 10 distinct values
    val inner = t("orders").join(t("customer").limit(10),
      col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(!PlanScale.factUnbounded(inner.queryExecution.analyzed),
      "aggregate keyed by an inner-join-against-limit key should be bounded")
  }

  test("a date manufactured from a scale-growing key is not calendar-bounded") {
    // date-TYPE alone proves nothing: date_add(epoch, key) has one
    // distinct value per key — only date-typed PROVENANCE (real time
    // inputs) earns the calendar bound
    val laundered = t("orders")
      .withColumn("d",
        expr("date_add(DATE'1970-01-01', CAST(o_orderkey % 100000 AS INT))"))
      .groupBy("d").agg(count(lit(1)).as("n"))
    assert(PlanScale.factUnbounded(laundered.queryExecution.analyzed),
      "id-manufactured date key wrongly classified calendar-bounded")
    // while a genuine per-day reduce IS bounded
    val daily = t("orders").groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    assert(!PlanScale.factUnbounded(daily.queryExecution.analyzed),
      "per-day aggregate over a real timestamp wrongly classified unbounded")
  }

  test("factUnbounded FIRES on both sides of a non-equi fact-fact join") {
    val j = t("orders").as("a").join(t("orders").as("b"),
      col("a.o_totalprice") < col("b.o_totalprice"))
    val plan = j.queryExecution.optimizedPlan
    val joins = plan.collect {
      case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn }
    assert(joins.nonEmpty)
    assert(joins.exists(jn =>
      PlanScale.factUnbounded(jn.left) && PlanScale.factUnbounded(jn.right)),
      "non-equi fact-fact product join not classified fact-unbounded")
  }

  test("an uncapped fraction sample does not bound a fact scan") {
    // Sample output scales with input: sample-of-fact must stay a fact
    // (the pre-r11 lint blessed EVERY Sample node as bounded-rows, so an
    // uncapped broadcast(fact.sample(0.1)) passed the registry lint)
    assert(!PlanScale.bounded(
      t("orders").sample(0.1).queryExecution.analyzed),
      "fraction sample of a fact scan wrongly classified bounded")
    val hinted = PlanScale.factHintedSubtrees(
      t("lineitem").join(broadcast(t("orders").sample(0.1)),
        col("l_orderkey") === col("o_orderkey")))
    assert(hinted.nonEmpty, "broadcast(fact.sample) not flagged")
    // while a sample of a bounded input is itself bounded
    assert(PlanScale.bounded(
      t("orders").limit(100).sample(0.5).queryExecution.analyzed),
      "sample of a limited input wrongly classified unbounded")
  }

  test("lint FIRES on a low-cardinality window over fact input, not on a keyed one") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    val bad = PlanScale.lowCardFactWindows(
      t("orders").withColumn("rn", row_number().over(w))
        .queryExecution.optimizedPlan)
    assert(bad.nonEmpty, "priority-partitioned window over raw orders not flagged")
    // keyed by a scale-growing column → partitions fine, must not flag
    val wk = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    assert(PlanScale.lowCardFactWindows(
      t("orders").withColumn("rn", row_number().over(wk))
        .queryExecution.optimizedPlan).isEmpty,
      "custkey-partitioned window wrongly flagged")
  }
}
