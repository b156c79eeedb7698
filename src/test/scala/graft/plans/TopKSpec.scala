package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom per-group top-k operator: API parity with the ranking
  * window, plan shape (no Window/Sort, partial+final exec around one
  * exchange), the rewrite rule, and edge cases.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  // groups of varying size incl. a group smaller than k, duplicate order
  // values (tie-broken by id), negative values, and a null-free id key
  private lazy val df: DataFrame = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 50.0),
    ("a", 5L, -1.0), ("b", 6L, 5.0), ("b", 7L, 5.0),
    ("c", 8L, 100.0),
    ("d", 9L, 0.0), ("d", 10L, 0.0), ("d", 11L, 0.0), ("d", 12L, 0.0)
  ).toDF("g", "id", "v").repartition(5)

  private def windowTopK(in: DataFrame, k: Int): DataFrame = in
    .withColumn("rnk", row_number().over(
      Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
    .filter(col("rnk") <= k)

  private def collectSet(d: DataFrame): Set[(String, Long, Double, Int)] =
    d.select("g", "id", "v", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("perGroup matches the ranking-window result exactly (k=2)") {
    val got = TopK.perGroup(df, Seq("g"), col("v"), col("id"), 2)
    assert(collectSet(got) == collectSet(windowTopK(df, 2)))
  }

  test("perGroup: k larger than every group returns all rows ranked") {
    val got = TopK.perGroup(df, Seq("g"), col("v"), col("id"), 100)
    assert(collectSet(got) == collectSet(windowTopK(df, 100)))
    assert(got.count() == df.count())
  }

  test("perGroup: k=1 picks each group's maximum") {
    val got = TopK.perGroup(df, Seq("g"), col("v"), col("id"), 1)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 4L), ("b", 6L), ("c", 8L), ("d", 9L)))
  }

  test("perGroup: empty group list = global top-k (TakeOrdered shape)") {
    val got = TopK.perGroup(df, Seq.empty, col("v"), col("id"), 3)
      .select("id", "rnk").as[(Long, Int)].collect().toSet
    assert(got == Set((8L, 1), (4L, 2), (2L, 3)))
  }

  test("perGroup: empty input yields empty output") {
    val got = TopK.perGroup(df.filter(col("v") > 1e9), Seq("g"), col("v"), col("id"), 3)
    assert(got.count() == 0)
  }

  test("perGroup: null group keys and null order values match the window") {
    val ndf = Seq(
      (Option("a"), 1L, Option(5.0)), (None, 2L, Option(7.0)),
      (None, 3L, Option(3.0)), (Option("a"), 4L, Option.empty[Double]),
      (Option("b"), 5L, Option.empty[Double]), (Option("b"), 6L, Option(1.0))
    ).toDF("g", "id", "v").repartition(3)
    val got = TopK.perGroup(ndf, Seq("g"), col("v"), col("id"), 1)
      .select("id", "rnk").as[(Long, Int)].collect().toSet
    val want = windowTopK(ndf, 1)
      .select("id", "rnk").as[(Long, Int)].collect().toSet
    assert(got == want)
    assert(got == Set((1L, 1), (2L, 1), (6L, 1))) // desc = NULLS LAST
  }

  test("plan shape: partial + final exec, one exchange, no Window/Sort") {
    val got = TopK.perGroup(df, Seq("g"), col("v"), col("id"), 2)
    val plan = got.queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("SortExec"), plan)
  }

  test("RewriteWindowTopK rewrites the window+rank-filter pattern") {
    val exp = spark.experimental
    val (prevS, prevO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      TopK.install(spark)
      val q = windowTopK(df, 2)
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collect { case n: TopKPerGroupNode => n }.nonEmpty, opt)
      assert(opt.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty, opt)
      // and the rewritten plan still computes the window's exact result
      val noRule = windowTopK(df, 2) // plan it before install? same session —
      // compare against a literal recomputation via collect on raw data
      val expect = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          rows.sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
            .map { case ((g, id, v), i) => (g, id, v, i + 1) }.toSeq
        }.toSet
      assert(collectSet(q) == expect)
      assert(noRule != null)
    } finally {
      exp.extraStrategies = prevS
      exp.extraOptimizations = prevO
    }
  }

  test("RewriteWindowTopK keeps residual conjuncts and skips other windows") {
    val exp = spark.experimental
    val (prevS, prevO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      TopK.install(spark)
      // extra conjunct survives as a Filter above the rewritten node
      val q = df.withColumn("rnk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rnk") <= 2 && col("v") > 0)
      assert(q.queryExecution.optimizedPlan
        .collect { case n: TopKPerGroupNode => n }.nonEmpty)
      assert(collectSet(q) ==
        collectSet(windowTopK(df, 2).filter(col("v") > 0)))
      // a rank() window (not row_number) must NOT be rewritten
      val rk = df.withColumn("rnk", rank().over(
          Window.partitionBy("g").orderBy(col("v").desc)))
        .filter(col("rnk") <= 2)
      assert(rk.queryExecution.optimizedPlan
        .collect { case n: TopKPerGroupNode => n }.isEmpty)
      rk.collect() // still executes fine via the window path
    } finally {
      exp.extraStrategies = prevS
      exp.extraOptimizations = prevO
    }
  }

  test("GraftExtensions injects strategy + rule at session build time") {
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val d2 = s2.createDataFrame(df.collect().toSeq.asJava, df.schema)
      val q = d2.withColumn("rnk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rnk") <= 2)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan)
      assert(collectSet(q) == collectSet(windowTopK(df, 2)))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.length)
      s.foreach(l.add)
      l
    }
  }
}
