package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks of the round-12 graph primitives against
  * independent in-JVM reference implementations — definition-level, not
  * replays: stress against explicit shortest-path ENUMERATION, SCC
  * against Tarjan, k-truss against a set-based peel. Seeded Random (the
  * SigAgreementSpec convention) keeps every run identical.
  */
class GraphPropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("brandesStress matches explicit shortest-path enumeration on random graphs") {
    for (sample <- 1 to 6) {
      val n = 7
      val und = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toVector
      if (und.nonEmpty) {
        val sym = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val maxHops = 3
        val lms = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted.take(2)
        // reference: hop-bounded BFS dist, then enumerate EVERY shortest
        // path (= every DAG walk from the landmark); each prefix is
        // itself a shortest path to its endpoint
        val stress = collection.mutable.Map.empty[Long, Long]
        val sigmaSum = collection.mutable.Map.empty[Long, Long]
        val nLm = collection.mutable.Map.empty[Long, Long]
        for (lm <- lms) {
          val dist = collection.mutable.Map(lm -> 0)
          var frontier = Vector(lm)
          for (h <- 1 to maxHops) {
            frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
              .distinct.filterNot(dist.contains)
            frontier.foreach(v => dist(v) = h)
          }
          dist.iterator.filter { case (_, d) => d >= 1 }.foreach { case (v, _) =>
            nLm(v) = nLm.getOrElse(v, 0L) + 1
          }
          def walks(path: Vector[Long]): Vector[Vector[Long]] = {
            val u = path.last
            val nexts = adj.getOrElse(u, Vector.empty)
              .filter(w => dist.get(w).contains(dist(u) + 1))
            val ext = nexts.toVector.flatMap(w => walks(path :+ w))
            (if (path.size > 1) Vector(path) else Vector.empty) ++ ext
          }
          for (p <- walks(Vector(lm))) {
            sigmaSum(p.last) = sigmaSum.getOrElse(p.last, 0L) + 1
            p.drop(1).dropRight(1).foreach { v =>
              stress(v) = stress.getOrElse(v, 0L) + 1
            }
          }
        }
        val got = Graph.brandesStress(sym.toDF("src", "dst"),
            lms.map(l => (l, l)).toDF("lm", "id"), maxHops)
          .selectExpr("id", "n_lm", "CAST(sigma_sum AS LONG)",
            "CAST(stress AS LONG)")
          .as[(Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
        val want = nLm.keys.map(v =>
          v -> ((nLm(v), sigmaSum.getOrElse(v, 0L),
            stress.getOrElse(v, 0L)))).toMap
        assert(got == want, s"sample $sample: got $got want $want edges $und")
      }
    }
  }

  test("sccColor matches Tarjan on random digraphs and the ascending 2-cycle chain") {
    def tarjan(nodes: Seq[Long], adj: Map[Long, Seq[Long]]): Map[Long, Long] = {
      var idx = 0
      val index = collection.mutable.Map.empty[Long, Int]
      val low = collection.mutable.Map.empty[Long, Int]
      val onStack = collection.mutable.Set.empty[Long]
      val stack = collection.mutable.Stack.empty[Long]
      val comp = collection.mutable.Map.empty[Long, Long]
      def strong(v: Long): Unit = {
        index(v) = idx; low(v) = idx; idx += 1
        stack.push(v); onStack += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!index.contains(w)) { strong(w); low(v) = math.min(low(v), low(w)) }
          else if (onStack(w)) low(v) = math.min(low(v), index(w))
        }
        if (low(v) == index(v)) {
          val members = collection.mutable.Buffer.empty[Long]
          var w = 0L
          do { w = stack.pop(); onStack -= w; members += w } while (w != v)
          val m = members.min
          members.foreach(comp(_) = m)
        }
      }
      nodes.foreach(v => if (!index.contains(v)) strong(v))
      comp.toMap
    }
    val cases = (1 to 4).map { _ =>
      val n = 5
      (for { a <- 1L to n; b <- 1L to n
        if a != b && rnd.nextDouble() < 0.35 } yield (a, b)).toVector
    } :+ // ascending 2-cycle chain: each link hides the next component's
      // min behind a one-way edge — needs the full peel depth
      Vector((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L), (4L, 5L),
        (5L, 6L), (6L, 5L))
    for ((edges, i) <- cases.zipWithIndex if edges.nonEmpty) {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val want = tarjan(nodes, adj.map { case (k, v) => k -> v.toSeq })
      val got = Graph.sccColor(edges.toDF("src", "dst"),
          peels = nodes.size, rounds = nodes.size)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"case $i: got $got want $want edges $edges")
    }
  }

  test("kTrussPeel matches the set-based peel on random graphs") {
    def supports(e: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val nb = collection.mutable.Map.empty[Long, Set[Long]]
        .withDefaultValue(Set.empty)
      e.foreach { case (a, b) => nb(a) = nb(a) + b; nb(b) = nb(b) + a }
      e.iterator.map { case (a, b) =>
        (a, b) -> (nb(a) & nb(b)).size.toLong
      }.filter(_._2 > 0).toMap
    }
    for (sample <- 1 to 4) {
      val n = 7
      val edges = (for { a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.45 } yield (a, b)).toSet
      if (edges.nonEmpty) {
        val rounds = 4
        var e = edges
        for (_ <- 1 to rounds) {
          val s = supports(e)
          e = e.filter(x => s.getOrElse(x, 0L) >= 2)
        }
        val want = supports(e) // final inner join drops support-0 stragglers
        val got = Graph.kTrussPeel(edges.toSeq.toDF("a", "b"), k = 4,
            rounds = rounds)
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == want, s"sample $sample: got $got want $want edges $edges")
      }
    }
  }
}
