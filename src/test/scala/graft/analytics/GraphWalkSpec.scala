package graft.analytics

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Queries, SparkSpec}

/** Structural properties of the walk-corpus family that the hash gate
  * implies but never states: every consecutive (node, next) pair must be a
  * real edge of the co-purchase graph, walks must have the full fixed
  * length, and the first-order and second-order (node2vec) corpora must
  * genuinely differ (the bias dial does something).
  */
class GraphWalkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def edges() = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val raw = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst"))
      .distinct()
    raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def stepPairs(name: String) = {
    val w = Queries.queryMap(name)(spark, sf)
    w.alias("a").join(w.alias("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("b.step") === col("a.step") + 1)
      .select(col("a.node").as("src"), col("b.node").as("dst"))
  }

  for (q <- Seq("graph_walk_corpus", "graph_walk_node2vec")) {
    test(s"$q: every step follows a real edge and walks run full length") {
      assume(Files.exists(Paths.get(s"$sf/lineitem.parquet")))
      val pairs = stepPairs(q)
      val offEdge = pairs.join(edges(), Seq("src", "dst"), "left_anti").count()
      assert(offEdge == 0, s"$q contains $offEdge non-edge steps")
      val lengths = Queries.queryMap(q)(spark, sf)
        .groupBy("walk_id").agg(count(lit(1)).as("n"))
        .filter(col("n") =!= 7).count()
      assert(lengths == 0, s"$q has walks shorter/longer than 7 rows")
    }
  }

  test("node2vec bias changes the corpus relative to first-order walks") {
    assume(Files.exists(Paths.get(s"$sf/lineitem.parquet")))
    val a = Queries.queryMap("graph_walk_corpus")(spark, sf)
    val b = Queries.queryMap("graph_walk_node2vec")(spark, sf)
    // same seeds, same length...
    assert(a.count() == b.count())
    // ...different paths: the draws are salted differently AND weighted
    // differently, so at least some (walk, step) nodes must diverge
    val diff = a.alias("a").join(b.alias("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("a.step") === col("b.step") &&
          col("a.node") =!= col("b.node"))
      .count()
    assert(diff > 0, "biased and uniform walks are identical — bias inert")
  }
}
