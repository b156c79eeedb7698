package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's analytical query surface (SURVEY.md §2.11,
  * images/etl1_bi_dashboard.png) as reusable aggregation shapes.
  *
  * Scale notes (100 TB): every shape here is a single hash aggregation with
  * map-side partial aggregation — one shuffle on the grouping key. The
  * percent-of-total uses a scalar total (two-phase: partial per partition,
  * one tiny final reduce) broadcast back, NOT a global window over the
  * grouped result, so no single-partition window bottleneck.
  */
object Dashboard {

  /** Exact decimal sum of a double measure, returned as double.
    *
    * Summing raw doubles is order-dependent (shuffle order differs run to
    * run and engine to engine); casting to DECIMAL(18,2) first makes the
    * aggregation exact and associative, so results are bit-stable at any
    * parallelism — which is also what makes the DuckDB oracle hash-match.
    */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact mean of a double measure (decimal sum / count), as double. */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** "frequency in %" donut: share of rows per dimension value. */
  def shareByDim(df: DataFrame, dim: String): DataFrame = {
    val counts = df.groupBy(col(dim)).agg(count(lit(1)).as("n"))
    // total via cross-join of a 1-row aggregate: a broadcast nested-loop
    // join of a scalar — no global window, scales to any cardinality of
    // `dim`. The broadcast hint is explicit (not left to stats estimation)
    // so a misestimate can never pick a shuffle BNLJ, matching Bloom.prune
    // and TextStats.tfIdf.
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("pct", col("n") * 100.0 / col("total"))
      .drop("total")
      .orderBy(col(dim))
  }

  /** "count of ads by region" map: plain count per dimension. */
  def countByDim(df: DataFrame, dim: String): DataFrame =
    df.groupBy(col(dim)).agg(count(lit(1)).as("n")).orderBy(col(dim))

  /** "average price per m2 by region" sorted bars. */
  def avgByDim(df: DataFrame, dim: String, measure: String): DataFrame =
    df.groupBy(col(dim))
      .agg(exactAvg(col(measure)).as("avg_measure"), count(lit(1)).as("n"))
      .orderBy(col("avg_measure").desc, col(dim))

  /** "average price per m2 daily" line: time-series mean per day.
    *
    * @param tsFormat when the time column is the reference's
    *                 "yyyy_MM_dd_HHmmss" STRING `dump_date`
    *                 (scripts/transform.py:106-111; README.md:130 notes
    *                 Looker re-parses it), pass Some("yyyy_MM_dd_HHmmss");
    *                 None for a real timestamp/date column.
    */
  def dailyAvg(df: DataFrame, ts: String, measure: String,
      tsFormat: Option[String] = None): DataFrame = {
    val day = tsFormat match {
      case Some(fmt) => to_date(to_timestamp(col(ts), fmt))
      case None      => to_date(col(ts))
    }
    df.groupBy(day.as("day"))
      .agg(exactAvg(col(measure)).as("avg_measure"), count(lit(1)).as("n"))
      .orderBy(col("day"))
  }

  /** Pearson correlation + least-squares fit from EXACT integer moments:
    * one aggregation computes n, Σx, Σy, Σx², Σy², Σxy over floor()-ed
    * long inputs (bit-exact in any engine), and the closed-form
    * r/slope/intercept epilogue is a fixed sequence of IEEE double ops
    * spelled identically in the SQL oracle — so even the statistical
    * outputs hash-match cross-engine, where a builtin corr()/regr_slope()
    * is order-of-aggregation-dependent and never reproducible.
    *
    * Scale shape: ONE map-side-combinable aggregation over the table; the
    * epilogue is scalar. Integer-overflow bound: Σy² must fit a long —
    * |y| ≤ 10⁵ holds to ~10⁸ rows per group; larger scales pre-bucket y.
    * Degenerate inputs (zero variance) yield NULL fit columns rather than
    * NaN/Infinity (which ANSI long casts would refuse).
    */
  def linearFit(df: DataFrame, x: Column, y: Column): DataFrame = {
    val m = df.filter(x.isNotNull && y.isNotNull)
      .select(floor(x).cast("long").as("x"), floor(y).cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val cov = nd * d("sxy") - d("sx") * d("sy")
    val varx = nd * d("sxx") - d("sx") * d("sx")
    val vary = nd * d("syy") - d("sy") * d("sy")
    val e6 = (c: Column) => floor(c * 1e6).cast("long")
    val slope = cov / varx
    m.select(col("n"),
      when(varx > 0 && vary > 0, e6(cov / sqrt(varx * vary)))
        .otherwise(lit(null).cast("long")).as("corr_e6"),
      when(varx > 0, e6(slope)).otherwise(lit(null).cast("long")).as("slope_e6"),
      when(varx > 0, e6((d("sy") - slope * d("sx")) / nd))
        .otherwise(lit(null).cast("long")).as("intercept_e6"))
  }

  /** Pairwise Pearson correlation matrix over floored numeric columns —
    * [[linearFit]]'s exact-integer-moments recipe generalized to every
    * column pair in ONE combinable aggregation (all sums and cross sums
    * ride a single map-side-partial pass; at 100 TB that is one scan and
    * one 1-row reduce, not C(k,2) jobs — structurally: the moments row is
    * collected to the driver and the pair rows are emitted as literals,
    * so the single scan does not depend on exchange reuse deduping C(k,2)
    * identical agg subtrees). Rows with a null in ANY listed
    * column are excluded so every pair shares one sample (the listwise
    * convention, which is what makes a matrix consistent). The epilogue
    * is the identical IEEE double sequence in both engines.
    *
    * @return one row per unordered pair: (col_a, col_b, n, corr_e6),
    *         corr_e6 null when either variance is 0
    */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val filtered = df.filter(cols.map(_._2.isNotNull).reduce(_ && _))
      .select(cols.map { case (n, c) => floor(c).cast("long").as(n) }: _*)
    val names = cols.map(_._1)
    val aggs = Seq(count(lit(1)).as("n")) ++
      names.map(n => sum(col(n)).as(s"s_$n")) ++
      (for { i <- names.indices; j <- i until names.length } yield
        sum(col(names(i)) * col(names(j))).as(s"s_${names(i)}_${names(j)}"))
    val m = filtered.agg(aggs.head, aggs.tail: _*)
    // collect the ONE moments row to the driver and emit the C(k,2) pair
    // rows as literals: the single-scan property is then structural — the
    // union-of-selects form only scanned once if exchange reuse happened
    // to dedup the identical agg subtree across every branch
    val row = m.collect()(0)
    def l(c: String): Long = {
      val i = row.fieldIndex(c)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }
    val n = l("n")
    val nd = n.toDouble
    val pairs = for { i <- names.indices; j <- (i + 1) until names.length } yield {
      val (a, b) = (names(i), names(j))
      val cov = nd * l(s"s_${a}_$b") - l(s"s_$a").toDouble * l(s"s_$b")
      val va = nd * l(s"s_${a}_$a") - l(s"s_$a").toDouble * l(s"s_$a")
      val vb = nd * l(s"s_${b}_$b") - l(s"s_$b").toDouble * l(s"s_$b")
      val corr = if (va > 0 && vb > 0)
        Some(math.floor(cov / math.sqrt(va * vb) * 1e6).toLong) else None
      (a, b, n, corr)
    }
    val spark = df.sparkSession
    import spark.implicits._
    pairs.toSeq.toDF("col_a", "col_b", "n", "corr_e6")
  }

  /** Calendar densification + fill: turn a sparse per-(key, day) series
    * into a gapless daily one. Dashboards and window features (deltas,
    * moving averages) silently mis-compute over missing days — a
    * day-over-day delta across a 3-day gap isn't a daily delta — so the
    * series is re-gridded first: each key's observed [min(day), max(day)]
    * span is exploded from a `sequence()` of dates, observations are
    * left-joined back, counts/sums zero-fill, and `lastCols` carry the
    * last observed value forward (`last(_, ignoreNulls)` over the key's
    * timeline).
    *
    * Scale shape: the per-key bounds ride the SAME aggregation shuffle as
    * the daily rollup; the calendar explode is narrow (dates are generated,
    * not shuffled); the forward-fill window partitions BY KEY, so no
    * global-sort bottleneck — per-key days are bounded (a decade is ~3.7k
    * rows) even when keys number in the millions.
    *
    * @param aggs     (outName, aggregate-expression) computed per (key, day);
    *                 missing days get 0 (coalesce) for these.
    * @param lastCols subset of agg outNames to ALSO expose forward-filled
    *                 as `<name>_ffill` (level-style measures; leave count-
    *                 style measures to their zero fill).
    */
  def gapFillDaily(df: DataFrame, key: Column, day: Column,
      aggs: Seq[(String, Column)], lastCols: Seq[String]): DataFrame = {
    require(aggs.nonEmpty, "gapFillDaily needs at least one aggregate")
    require(lastCols.forall(aggs.map(_._1).contains),
      s"lastCols must name agg outputs: $lastCols vs ${aggs.map(_._1)}")
    val daily = df.groupBy(key.as("key"), day.as("day"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val bounds = daily.groupBy("key")
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val calendar = bounds.select(col("key"),
      explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as("day"))
    val dense = calendar.join(daily, Seq("key", "day"), "left")
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = aggs.map { case (n, _) => coalesce(col(n), lit(0L)).as(n) }
    val ffills = lastCols.map(n => last(col(n), ignoreNulls = true).over(w).as(s"${n}_ffill"))
    dense.select(Seq(col("key"), col("day")) ++ filled ++ ffills: _*)
  }

  /** Top-k rows per group by a measure — ranking window, one shuffle on the
    * group key; ties broken deterministically by `tieBreak`.
    */
  def topKPerGroup(df: DataFrame, group: String, measure: Column,
      tieBreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(measure.desc, tieBreak)
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col(group), col("rnk"))
  }

  /** 3σ anomaly flags over a series of per-key counts, with ZERO floating
    * point: |x − μ| > 3σ (population σ over the series) restated by
    * multiplying through by n², which makes both sides integers —
    *
    *   dev2   = (n·x − S)²          (n² · squared deviation from μ)
    *   bound9 = 9·(n·Q − S²)        (n² · 9σ², since σ² = (nQ − S²)/n²)
    *
    * with S = Σx, Q = Σx². The flag replays bit-for-bit in any engine —
    * no sqrt, no epsilon. Overflow bound: bound9 is the binding term —
    * 9·(n·Q − S²) can reach ~9·(n·max(x))², so the series needs
    * n·max(x) < ~10⁹ to fit a long (dev2 alone would allow ~3·10⁹; e.g.
    * 10⁵ days of 10⁴-count days is 10⁹ — at the boundary for daily
    * monitoring; shard the series before the billions).
    *
    * Scale shape: one count aggregation on the key, a broadcast 1-row
    * totals join — the same two-phase scalar pattern as [[shareByDim]].
    *
    * @param counts (key, x) series, e.g. per-day event counts
    * @return (key, x, dev2, bound9, is_anomaly)
    */
  def anomalyFlags(counts: DataFrame): DataFrame = {
    val c = counts.toDF("key", "x")
      .select(col("key"), col("x").cast("long"))
    val tot = c.agg(count(lit(1)).as("__n"), sum(col("x")).as("__s"),
      sum(col("x") * col("x")).as("__q"))
    c.crossJoin(broadcast(tot))
      .select(col("key"), col("x"),
        expr("(__n * x - __s) * (__n * x - __s)").as("dev2"),
        expr("9 * (__n * __q - __s * __s)").as("bound9"))
      .withColumn("is_anomaly", col("dev2") > col("bound9"))
  }
}
