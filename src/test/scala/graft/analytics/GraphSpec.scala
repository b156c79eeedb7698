package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Graph module's claims on graphs small enough to check by
  * hand: PageRank's mass conservation + known orderings, and triangle
  * counting against enumerable truths (including a hub-skewed graph
  * where the degree-ordered orientation is doing the work).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star graph ranks the hub highest, leaves equal") {
    // 5 leaves all point at node 100 and 100 points back at each —
    // symmetric star: hub gets 5 contributions, leaves 1/5 each
    val edges = (1L to 5L).flatMap(l => Seq((l, 100L), (100L, l))).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(100L) > r(1L))
    assert((1L to 5L).map(r).distinct.size == 1, "leaves must tie exactly")
  }

  test("pageRank: dangling mass is redistributed, not lost") {
    // chain 1→2→3: node 3 is dangling; without redistribution total mass
    // shrinks every round. With it, total stays within N rounding units
    // of E12 (each node's update truncates at most 2 divisions).
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val total = Graph.pageRank(edges, iterations = 4)
      .agg(sum("rank_e12")).as[Long].head()
    assert(math.abs(total - 1000000000000L) < 1000L,
      s"mass not conserved: $total")
  }

  test("pageRank: equal-structure nodes tie bit-exactly") {
    // 4-cycle: every node is structurally identical → identical ranks
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rs = Graph.pageRank(edges, iterations = 5)
      .select("rank_e12").as[Long].collect().toSet
    assert(rs.size == 1, s"cycle nodes diverged: $rs")
  }

  test("personalizedPageRank: mass stays in the seed component and is conserved") {
    // two disconnected chains: 1→2→3 and 10→11; seed = {1}.
    // The 10/11 component must hold exactly ZERO mass; total stays within
    // rounding units of E12 (dangling node 3 teleports back to the seed).
    // (On a 1-out-degree chain the seed does NOT outrank its successor —
    // it forwards ALL its mass each round and keeps only the teleport —
    // so the ordering claims are down-chain decay and off-component zero.)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, iterations = 4)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(10L) == 0L && r(11L) == 0L, s"mass leaked off-component: $r")
    assert(r(2L) > r(3L), s"mass must decay down-chain past the funnel: $r")
    assert(r(1L) > 0L)
    val total = r.values.sum
    assert(math.abs(total - 1000000000000L) < 1000L, s"mass not conserved: $total")
  }

  test("hits: hand-computed bipartite hubs and authorities") {
    // customers {1,2}, parts {101,103}: 1 buys both, 2 buys only 103.
    // Round 1: a(101)=1e6→rescale .5e6, a(103)=2e6→1e6; h(1)=1.5e6→1e6,
    // h(2)=1e6→666666. Round 2: a(101)=1e6→600000, a(103)=1666666→1e6;
    // h(1)=1.6e6→1e6, h(2)=1e6→625000. The shared part is the authority;
    // the two-part buyer is the stronger hub.
    val edges = Seq((1L, 101L), (1L, 103L), (2L, 103L)).toDF("src", "dst")
    val out = Graph.hits(edges, iterations = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((103L, "auth")) == 1000000L)
    assert(out((101L, "auth")) == 600000L)
    assert(out((1L, "hub")) == 1000000L)
    assert(out((2L, "hub")) == 625000L)
  }

  test("triangleCount: K4 has 4 triangles, square has 0") {
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    assert(Graph.triangleCount(k4).as[Long].head() == 4L)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    assert(Graph.triangleCount(square).as[Long].head() == 0L)
  }

  test("bfsHops: min hop distance on a known graph, cap respected") {
    // path 1→2→3→4→5 plus shortcut 1→4: node 4 is 1 hop (shortcut), not 3;
    // node 5 is 2; with maxHops=2 node 5 is reached but nothing deeper.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val d = Graph.bfsHops(edges, seeds, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("bfsHops: unreachable nodes are absent; revisits never raise a hop") {
    // cycle 1→2→2→1 with an off-component edge 10→11: BFS from 1 must
    // never include 10/11, and looping back to 1 keeps hop 0
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L)).toDF("src", "dst")
    val d = Graph.bfsHops(edges, Seq(1L).toDF("id"), maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L))
  }

  test("resolveRoots: chain deeper than 2^(rounds-1) still converges; extra rounds idempotent") {
    // chain 0←1←2←…←20 (parent = i−1, root 0): depth 20 needs ⌈log₂20⌉=5
    // doubling rounds — 4 would leave the tail at horizon 16. A second
    // forest {100} (self-root) rides along to pin the depth-0 case.
    val nodes = ((1 to 20).map(i => (i.toLong, (i - 1).toLong))
      :+ (0L, 0L) :+ (100L, 100L)).toDF("id", "parent")
    def asMap(rounds: Int) = Graph.resolveRoots(nodes, rounds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val r5 = asMap(5)
    assert(r5(20L) == ((0L, 20L)))
    assert(r5(1L) == ((0L, 1L)))
    assert(r5(0L) == ((0L, 0L)))
    assert(r5(100L) == ((100L, 0L)))
    assert(r5.size == 22)
    // 4 rounds = horizon 16: node 20 must NOT yet have resolved to the root
    assert(asMap(4)(20L) != ((0L, 20L)))
    // idempotence: a 6th round changes nothing once converged
    assert(asMap(6) == r5)
  }

  test("neighborFeatures: star graph degrees, exact e6 means") {
    // star 0—{1,2,3}: hub sees three degree-1 leaves; each leaf sees the
    // degree-3 hub.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val out = Graph.neighborFeatures(star).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(0L) == ((3L, 1L, 1000000L, 1L)))
    assert(out(1L) == ((1L, 3L, 3000000L, 3L)))
    assert(out.size == 4)
  }

  test("labelPropagation: two triangles over a bridge settle into two communities") {
    // triangles {1,2,3} and {10,11,12} joined by bridge 3-10: min-label
    // ties collapse each triangle to its least id in round 1, and the
    // self-vote + neighbor majority keep the bridge from merging them.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("linkPredict: non-adjacent pair with shared neighbors, exact jaccard") {
    // square 1-2-3-4 with diagonal 2-3: the only non-adjacent pair is
    // (1,4), common neighbors {2,3}, deg(1)=deg(4)=2 → jaccard = 2/2 = 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = Graph.linkPredict(edges, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 1000000L)))
  }

  test("linkPredictRA: niche shared neighbor outranks a hub shared neighbor") {
    // (1,2) share only niche z=10 (deg 2); (3,4) share only hub z=20
    // (deg 4, also tied to 5 and 6). Jaccard scores every pair equally
    // (1 common, leaf degs 1 → 1/1); RA separates them:
    // ra(1,2) = 1e6/2 = 500000, ra(3,4) = 1e6/4 = 250000.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L),
      (5L, 20L), (6L, 20L)).toDF("a", "b")
    val out = Graph.linkPredictRA(edges, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head == (1L, 2L, 1L, 500000L))
    assert(out(1)._4 == 250000L)
  }

  test("linkPredictRA: multi-neighbor sums and the hub cap") {
    // square 1-2-3-4 with diagonal 2-3: pair (1,4) shares {2,3}, each of
    // degree 3 → ra = 2 · (1e6 DIV 3) = 666666
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = Graph.linkPredictRA(edges, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L, 2L, 666666L)))
    // capping below the star center's degree removes every prediction
    val star = (1 to 5).map(i => (0L, i.toLong)).toDF("a", "b")
    assert(Graph.linkPredictRA(star, k = 10, maxDegree = 4).count() == 0L)
  }

  test("linkPredict: hub cap drops super-hub wedge centers") {
    // star: center 0 connected to 1..5. All predictions go through the
    // center; capping maxDegree below 5 removes them all.
    val star = (1 to 5).map(i => (0L, i.toLong)).toDF("a", "b")
    assert(Graph.linkPredict(star, k = 10).count() == 10L) // C(5,2) capped at k
    assert(Graph.linkPredict(star, k = 10, maxDegree = 4).count() == 0L)
  }

  test("triangleCount: hub-skewed graph matches naive enumeration") {
    // hub 0 connected to 1..20, plus a sparse ring among the leaves —
    // triangles are exactly the (0, i, i+1) closures the ring creates.
    // The degree orientation points every leaf at the hub; correctness
    // must not depend on which endpoint is the apex.
    val ring = (1L to 19L).map(i => (i, i + 1))
    val spokes = (1L to 20L).map(i => (0L, i))
    val edges = (spokes ++ ring).toDF("a", "b")
    val expected = ring.size.toLong // each ring edge closes with the hub
    assert(Graph.triangleCount(edges).as[Long].head() == expected)
  }

  test("boruvkaMst: hand-computed tree, duplicate-weight tie-break, forest") {
    // Component {1,2,3,4}: a 4-cycle where BOTH (1,2) and (3,4) weigh 5 —
    // the (w, a, b) total order must drop (3,4) (the lexicographically
    // larger of the two tied heaviest edges) and keep everything else.
    // Component {10,11}: a single edge — a DISCONNECTED second tree, so
    // the result is a forest (4 edges total, never a bridge between the
    // components). Node 99 is isolated and must simply not appear.
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 5L), (4L, 1L, 2L),
      (10L, 11L, 7L)).toDF("a", "b", "w")
    val got = Graph.boruvkaMst(nodes, edges)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 4L, 2L),
      (10L, 11L, 7L)).sorted,
      s"unexpected forest: $got")
  }

  test("boruvkaMst: parallel edges keep min weight; dangling edges drop") {
    // (1,2) appears three times — the min weight must survive; (2, 50)
    // references a node absent from `nodes` and is dropped per the
    // documented endpoints-subset contract.
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq(
      (1L, 2L, 9L), (2L, 1L, 3L), (1L, 2L, 7L),
      (2L, 3L, 4L), (2L, 50L, 1L)).toDF("a", "b", "w")
    val got = Graph.boruvkaMst(nodes, edges)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L), (2L, 3L, 4L)), s"unexpected: $got")
  }

  test("deltaStepSssp: hand-computed distances; heavy edge beaten by light chain") {
    // Δ = 10. From source 1: the direct HEAVY edge 1→4 (w=25) must lose
    // to the light chain 1→2→3→4 (3+4+5 = 12) even though the chain
    // crosses a bucket boundary; 5 is reached only via the heavy edge
    // 4→5 (12+30 = 42); 99 has only an OUTGOING edge to the component,
    // so it stays unreachable (directed semantics); a worse later
    // candidate (2→4 w=50) never overwrites.
    val edges = Seq(
      (1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 5L), (1L, 4L, 25L),
      (2L, 4L, 50L), (4L, 5L, 30L), (99L, 1L, 1L)).toDF("src", "dst", "w")
    val got = Graph.deltaStepSssp(edges, Seq(1L).toDF("id"), delta = 10L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 3L), (3L, 7L), (4L, 12L), (5L, 42L)),
      s"unexpected distances: $got")
  }

  test("deltaStepSssp: in-bucket light re-relaxation and zero-weight edges") {
    // Δ = 100 (everything light, single bucket): 1→3 (9) is first set via
    // the direct edge, then improved IN the same bucket by 1→2→3 (2+3=5),
    // and the improvement must propagate on to 4 (5+0=5 via a zero-weight
    // edge). Multiple seeds: node 7 is its own source at distance 0 and
    // relaxes 7→8 (1).
    val edges = Seq(
      (1L, 3L, 9L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 0L),
      (7L, 8L, 1L)).toDF("src", "dst", "w")
    val got = Graph.deltaStepSssp(edges, Seq(1L, 7L).toDF("id"), delta = 100L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 2L), (3L, 5L), (4L, 5L),
      (7L, 0L), (8L, 1L)), s"unexpected distances: $got")
  }

  test("brandesStress: diamond-with-tail, hand-computed sigma and stress") {
    // Symmetrized diamond 1-{2,3}-4 plus tail 4-5, landmark 1, hops 3:
    //   σ(2)=σ(3)=1, σ(4)=2, σ(5)=2
    //   P(5)=0; P(4)=1 (walk 4→5); P(2)=P(3)=1+P(4)+... = 2 (4, 4→5)
    //   stress = σ·P: through-2 paths {1-2-4, 1-2-4-5} = 2; same for 3;
    //   through-4 {1-2-4-5, 1-3-4-5} = 2; 5 is a leaf → 0.
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq((1L, 1L)).toDF("lm", "id")
    val got = Graph.brandesStress(edges, seeds, maxHops = 3)
      .selectExpr("id", "n_lm", "CAST(sigma_sum AS LONG)", "CAST(stress AS LONG)")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L, 1L, 2L), (3L, 1L, 1L, 2L),
      (4L, 1L, 2L, 2L), (5L, 1L, 2L, 0L)), s"unexpected stress rows: $got")
  }

  test("brandesStress: two landmarks sum; equal-length multipaths multiply sigma") {
    // 4-cycle 1-2-4-3-1: from lm 1, σ(4)=2 (via 2 and via 3), P(2)=P(3)=1
    // (the walk on to 4), P(4)=0 → stress(2)=stress(3)=1, stress(4)=0.
    // Adding lm 4 mirrors the roles: stress(2)=stress(3)=2 total, and
    // nodes 1,4 each carry 0 (never interior on the cycle). n_lm counts
    // hop ≥ 1 rows only, so each landmark sees itself dropped: 1 and 4
    // land at n_lm = 1 (reached by the OTHER landmark at hop 2).
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq((1L, 1L), (4L, 4L)).toDF("lm", "id")
    val got = Graph.brandesStress(edges, seeds, maxHops = 3)
      .selectExpr("id", "n_lm", "CAST(stress AS LONG)")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 2L, 2L), (3L, 2L, 2L),
      (4L, 1L, 0L)), s"unexpected stress rows: $got")
  }

  test("sccColor: 2-cycle, 3-ring, one-way bridges, and a DAG singleton") {
    // SCCs: {1,2} (2-cycle), {3,4,5} (directed ring), {6} (sink reached
    // one-way). The one-way bridge 2→3 must not merge; in peel 1 only
    // {1,2} certifies F=B (the ring sees B=1 through the bridge), the
    // ring settles in peel 2, the stripped singleton in peel 3.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.sccColor(edges, peels = 3, rounds = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 3L),
      (6L, 6L)), s"unexpected scc rows: $got")
  }

  test("kTrussPeel: pendant triangle peels, K4 survives with support 2") {
    // K4 on {1,2,3,4}: every edge in exactly 2 triangles → survives k=4.
    // Pendant triangle {4,5,6}: each of its edges has support 1 → all
    // three peel in round 1 (the triangle dies as a unit).
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("a", "b")
    val got = Graph.kTrussPeel(edges, k = 4, rounds = 2)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    assert(got == k4.map { case (a, b) => (a, b, 2L) },
      s"unexpected truss edges: $got")
  }

  test("kTrussPeel: cascading unravel needs the second round") {
    // K4 plus 5-{3,4} and 6-{4,5}: round 1 peels (5,6),(4,6),(3,5)
    // (support 1 each) but (4,5) still sees common neighbors {3,6} =
    // support 2 at peel time; only after the round-1 peel does it drop
    // to 0 — round 2 (or the final zero-support straggler drop) takes
    // it, and the K4 nucleus must come through untouched either way.
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)))
      .toDF("a", "b")
    for (rounds <- Seq(1, 2)) {
      val got = Graph.kTrussPeel(edges, k = 4, rounds = rounds)
        .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
      assert(got == k4.map { case (a, b) => (a, b, 2L) },
        s"unexpected truss edges at rounds=$rounds: $got")
    }
  }

  test("sccColor: extra peels and rounds are idempotent; pure DAG is all singletons") {
    val dag = Seq((10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val got = Graph.sccColor(dag, peels = 4, rounds = 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 10L), (11L, 11L), (12L, 12L)),
      s"unexpected scc rows: $got")
  }
}
