package graft

import java.nio.file.{Files, Paths}

class QueriesSpec extends SparkSpec {

  test("registry invariants: unique names, oracles ⊆ queries, bench set nonempty") {
    assert(Queries.all.map(_.name).distinct.size == Queries.all.size)
    assert(Queries.oracleMap.keySet.subsetOf(Queries.queryMap.keySet))
    assert(Queries.benchSet.nonEmpty)
  }

  test("entry() flagship returns rows on sf0.001 (driver smoke contract)") {
    assume(Files.exists(Paths.get("/root/testdata/sf0.001/lineitem.parquet")))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL never relies on nondeterministic output order (ORDER BY present)") {
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$n oracle lacks ORDER BY")
    }
  }
}
