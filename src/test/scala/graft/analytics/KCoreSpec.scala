package graft.analytics

import graft.SparkSpec

/** Hand-checkable pins for the bounded k-core peel: a triangle survives
  * k=2 while its pendant tail is shaved, and a chain dissolves entirely
  * because each peel re-exposes new degree-1 ends.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("kCorePeel k=2: triangle survives, pendant tail is shaved") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Graph.kCorePeel(edges, k = 2, rounds = 3).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L), s"core must be the triangle: $r")
    assert(r.values.forall(_ == 2L), s"induced degrees must all be 2: $r")
  }

  test("kCorePeel k=2: a chain dissolves — each round exposes new ends") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    // round 1 drops 1 and 5, round 2 drops 2 and 4, round 3 drops 3
    assert(Graph.kCorePeel(chain, k = 2, rounds = 3).count() == 0L)
    // but a single round only shaves the outermost ends
    val after1 = Graph.kCorePeel(chain, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(after1 == Set(2L, 3L, 4L), s"one round shaves only the ends: $after1")
  }

  test("kCorePeel is idempotent on its own core") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val core = Graph.kCorePeel(edges, k = 2, rounds = 4)
    val coreIds = core.collect().map(_.getLong(0)).toSet
    val coreEdges = edges.filter($"a".isin(coreIds.toSeq: _*) &&
      $"b".isin(coreIds.toSeq: _*))
    val again = Graph.kCorePeel(coreEdges, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }
}
