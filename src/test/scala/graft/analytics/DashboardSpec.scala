package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", "2026_08_10_080000", 100.0),
    ("a", "2026_08_10_090000", 200.0),
    ("b", "2026_08_11_080000", 300.0),
    ("b", "2026_08_11_080001", 400.0)
  ).toDF("dim", "dump_date", "m")

  test("shareByDim: percentages sum to 100") {
    val out = Dashboard.shareByDim(rows, "dim").collect()
    assert(out.map(_.getDouble(2)).sum == 100.0)
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 2L)))
  }

  test("dailyAvg parses the reference's yyyy_MM_dd_HHmmss string format") {
    val out = Dashboard.dailyAvg(rows, "dump_date", "m",
        tsFormat = Some("yyyy_MM_dd_HHmmss"))
      .select(col("day").cast("string"), col("avg_measure"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq == Seq(("2026-08-10", 150.0, 2L), ("2026-08-11", 350.0, 2L)))
  }

  test("topKPerGroup: deterministic ranks with tiebreak") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 9.0))
      .toDF("grp", "id", "m")
    val out = Dashboard.topKPerGroup(df, "grp", col("m"), col("id"), 2)
      .select("id", "rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((3L, 1), (1L, 2)))
  }

  test("TopKAggregator agrees with the ranking-window form") {
    val li = Seq(
      ("A", 10L, 1, 500.0), ("A", 20L, 2, 900.0), ("A", 30L, 1, 900.0),
      ("A", 40L, 3, 100.0), ("B", 50L, 1, 700.0))
      .toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val viaAgg = TopKAggregator.topLineitems(li, 2)
      .collect().map(_.toSeq).toSeq
    val viaWindow = Dashboard.topKPerGroup(li, "l_returnflag",
        col("l_extendedprice"), col("l_orderkey") * 10 + col("l_linenumber"), 2)
      .select(col("l_returnflag"), col("rnk").cast("long").as("rnk"),
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"))
      .collect().map(_.toSeq).toSeq
    assert(viaAgg == viaWindow)
    // ties broken by the packed (orderkey, linenumber) key: 900.0 rows →
    // orderkey 20 (tb 202) before orderkey 30 (tb 301)
    assert(viaAgg.head(2) == 20L)
  }

  test("approx_count_distinct stays within 10% of exact on the test corpus") {
    val rnd = new scala.util.Random(31)
    val df = (0 until 20000).map(_ => rnd.nextInt(5000).toLong).toDF("v")
    val Array(approx, exact) = df
      .agg(approx_count_distinct("v").as("a"), count_distinct(col("v")).as("e"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("linearFit recovers an exact line and nulls out degenerate variance") {
    val line = (1L to 100L).map(x => (x.toDouble, (2 * x + 3).toDouble)).toDF("x", "y")
    val Array(r) = Dashboard.linearFit(line, col("x"), col("y")).collect()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("corr_e6") == 1000000L) // perfectly correlated
    assert(r.getAs[Long]("slope_e6") == 2000000L)
    assert(r.getAs[Long]("intercept_e6") == 3000000L)
    // constant x: no variance, fit undefined → NULLs, not NaN crashes
    val flat = Seq((1.0, 5.0), (1.0, 7.0)).toDF("x", "y")
    val Array(f) = Dashboard.linearFit(flat, col("x"), col("y")).collect()
    assert(f.isNullAt(f.fieldIndex("corr_e6")) && f.isNullAt(f.fieldIndex("slope_e6")))
  }

  test("gapFillDaily densifies each key's span, zero-fills counts, forward-fills levels") {
    val df = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-01", 20L), // two rows same day
      ("a", "2024-01-04", 40L), // 2-day gap before this
      ("b", "2024-02-01", 7L)) // different span entirely
      .toDF("k", "day", "v")
      .select(col("k"), to_date(col("day")).as("day"), col("v"))
    val out = Dashboard.gapFillDaily(df, col("k"), col("day"),
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))), Seq("s"))
      .select(col("key"), col("day").cast("string"), col("n"), col("s"), col("s_ffill"))
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 2L, 30L, 30L),
      ("a", "2024-01-02", 0L, 0L, 30L), // gap day: count 0, level carried
      ("a", "2024-01-03", 0L, 0L, 30L),
      ("a", "2024-01-04", 1L, 40L, 40L),
      ("b", "2024-02-01", 1L, 7L, 7L))) // b's calendar never bleeds into a's span
  }

  test("corrMatrix: perfect, inverse, and degenerate pairs; listwise sample") {
    import spark.implicits._
    // y = 2x (corr 1), z = -x (corr -1 with x), c constant (null corr);
    // one row has a null c and must drop from EVERY pair's sample.
    val df = Seq((1.0, 2.0, -1.0, Some(5.0)), (2.0, 4.0, -2.0, Some(5.0)),
      (3.0, 6.0, -3.0, Some(5.0)), (4.0, 8.0, -4.0, None))
      .toDF("x", "y", "z", "c")
    val out = Dashboard.corrMatrix(df, Seq("x" -> col("x"), "y" -> col("y"),
        "z" -> col("z"), "c" -> col("c"))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), Option(r.get(3))))).toMap
    assert(out(("x", "y")) == ((3L, Some(1000000L))))
    assert(out(("x", "z")) == ((3L, Some(-1000000L))))
    assert(out(("x", "c")) == ((3L, None))) // zero variance → null
    assert(out.size == 6)
  }

  test("anomalyFlags: only the spike crosses 3 sigma, arithmetic is exact") {
    import spark.implicits._
    // A single outlier's z² is capped at n−1 (others equal), so a lone
    // spike needs n ≥ 11 days to ever exceed 3σ. 11 days of 10 plus one
    // 120-spike: n=12, S=230, Q=15500 → bound9 = 9·(12·15500 − 230²) =
    // 1197900; spike dev2 = (12·120 − 230)² = 1464100 > bound9;
    // steady-day dev2 = (12·10 − 230)² = 12100 < bound9.
    val days = (1 to 11).map(i => (f"2024-01-$i%02d", 10L)) :+ ("2024-01-12", 120L)
    val out = Dashboard.anomalyFlags(days.toDF("key", "x")).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("dev2"),
        r.getAs[Long]("bound9"), r.getAs[Boolean]("is_anomaly")))).toMap
    assert(out("2024-01-12") == ((1464100L, 1197900L, true)))
    assert(out("2024-01-01") == ((12100L, 1197900L, false)))
    assert(out.values.count(_._3) == 1)
  }
}
