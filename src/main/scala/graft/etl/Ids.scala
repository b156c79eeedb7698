package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import graft.util.Lineage._

/** Global contiguous id assignment — the operation behind "number every
  * row of a 100 TB table in key order".
  *
  * The naive form, `row_number() OVER (ORDER BY key)` with no partition
  * clause, collapses the whole table into ONE partition (Spark plans an
  * Exchange SinglePartition) — the canonical does-not-survive-scale-up
  * plan. `monotonically_increasing_id` scales but its ids are neither
  * contiguous nor order-correlated.
  *
  * The scale shape used here is the two-pass offset scheme:
  *
  *   1. range-repartition by the sort key + sort within partitions — the
  *      same exchange a global sort needs anyway, so partition p holds
  *      keys strictly below partition p+1;
  *   2. count rows per partition (one map-side-combinable aggregation on
  *      `spark_partition_id()` — #partitions rows to the driver, nothing
  *      data-sized);
  *   3. prefix-sum those counts into per-partition start offsets, then a
  *      single `mapPartitionsWithIndex` emits offset + local index.
  *
  * Ids are 0-based, contiguous, and follow the sort order. When the sort
  * key is a total order (unique), the assignment is deterministic
  * regardless of where the range partitioner happens to cut boundaries —
  * which is what lets a DuckDB `row_number() - 1` oracle reproduce it
  * bit-for-bit. (RDD mapPartitions is justified here: genuinely
  * per-partition imperative logic — Spark has no declarative local-index
  * operator.)
  */
object Ids {

  /** @param numPartitions explicit range-partition count; None lets AQE
    *        size (and coalesce) the exchange — the default you want at
    *        scale, where partition count should track data volume.
    */
  def contiguousIds(df: DataFrame, sortCols: Seq[Column],
      idCol: String = "id", numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, sortCols: _*)
      case None => df.repartitionByRange(sortCols: _*)
    }
    val sorted = ranged.sortWithinPartitions(sortCols: _*)

    // pass 1: per-partition counts → start offsets (tiny driver array)
    val counts = sorted.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nPart = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nPart)
    var acc = 0L
    var p = 0
    while (p < nPart) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }

    // pass 2: local index + broadcast offset; schema = input + id column
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bcOffsets.value(pid)
      it.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (off + i))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** EXCLUSIVE global prefix-minimum at scale — the primitive behind a
    * distributed 2-D skyline ("did any earlier row in sort order carry a
    * smaller value?"). The naive form, `min(v) OVER (ORDER BY key ROWS
    * BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` with no partition
    * clause, plans an Exchange SinglePartition — one task scans the
    * world. The scale shape is the same two-pass offset scheme as
    * [[contiguousIds]] with min in place of sum:
    *
    *   1. range-repartition by the sort key + sort within partitions;
    *   2. per-partition minima — O(partitions) rows to the driver;
    *   3. exclusive prefix-min across partitions, then one
    *      `mapPartitionsWithIndex` threads the running minimum, emitting
    *      each row's prefix BEFORE folding the row's own value in.
    *
    * Rows with no preceding row emit Long.MaxValue (the fold's neutral
    * element): callers compare with `<`, for which it reads as "no bound
    * yet". Deterministic whenever sortCols is a total order. `valueCol`
    * must be integral and non-null.
    */
  def runningMinExclusive(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, outCol: String = "prevmin",
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, sortCols: _*)
      case None => df.repartitionByRange(sortCols: _*)
    }
    val sorted = ranged.sortWithinPartitions(sortCols: _*).truncateLineage(eager = true)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    sorted.schema(vIdx).dataType match {
      case LongType | IntegerType => ()
      case t => throw new IllegalArgumentException(
        s"$valueCol must be an integral column (INT/BIGINT), got $t")
    }

    // pass 1: per-partition minima (O(partitions) driver rows) →
    // exclusive prefix-min per partition. min() over an all-NULL
    // partition returns NULL — surface the contract violation here
    // rather than as a pass-2 NPE mid-job.
    val mins = sorted
      .groupBy(spark_partition_id().as("pid"))
      .agg(min(col(valueCol).cast("long")).as("m"))
      .collect().map { r =>
        if (r.isNullAt(1)) throw new IllegalArgumentException(
          s"$valueCol must not be NULL (filter or coalesce upstream); " +
            s"partition ${r.getInt(0)} has an all-NULL run")
        (r.getInt(0), r.getLong(1))
      }.toMap
    val nPart = sorted.rdd.getNumPartitions
    val prefix = new Array[Long](nPart)
    var acc = Long.MaxValue
    var p = 0
    while (p < nPart) {
      prefix(p) = acc
      acc = math.min(acc, mins.getOrElse(p, Long.MaxValue))
      p += 1
    }

    // pass 2: thread the exclusive running min through each partition
    val bcPrefix = spark.sparkContext.broadcast(prefix)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcPrefix.value(pid)
      it.map { r =>
        if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
          s"$valueCol must not be NULL (filter or coalesce upstream)")
        val v = r.get(vIdx) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        }
        val out = Row.fromSeq(r.toSeq :+ run)
        run = math.min(run, v)
        out
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Grouped running (prefix) sum at scale — the shape behind "cumulative
    * weight per region over 100 TB of listings".
    *
    * The naive form, `sum(w) OVER (PARTITION BY group ORDER BY key)`, caps
    * parallelism at the number of distinct groups (14 regions → 14 tasks,
    * one task sorts an entire region at any scale). The scale shape is the
    * same two-pass offset scheme as [[contiguousIds]], generalized from
    * counts to weights:
    *
    *   1. range-repartition by (group, sortKeys) + sort within partitions,
    *      then localCheckpoint so the (possibly expensive) upstream plan is
    *      evaluated exactly once;
    *   2. per-(partition, group) weight sums — O(partitions × groups) rows
    *      to the driver, nothing data-sized;
    *   3. prefix-sum per group across partitions into start offsets (and
    *      per-group totals for free), then one `mapPartitionsWithIndex`
    *      emits the inclusive running sum + group total.
    *
    * Deterministic whenever (group, sortKeys) is a total order — boundary
    * cuts of the range partitioner then cannot change any prefix.
    * `weightCol` must be integral (LongType after any cast by the caller).
    */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], weightCol: String, cumCol: String = "cumw",
      totCol: String = "totw", numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val keys = groupCols.map(col) ++ sortCols
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None => df.repartitionByRange(keys: _*)
    }
    val sorted = ranged.sortWithinPartitions(keys: _*).truncateLineage(eager = true)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    // validate the weight column ONCE, up front: a non-integral type (or
    // a NULL weight at runtime) would silently desynchronize pass 1's
    // sum() (which skips nulls) from pass 2's running sum — fail with the
    // diagnostic instead of a mid-job ClassCastException/NPE
    sorted.schema(wIdx).dataType match {
      case LongType | IntegerType => ()
      case t => throw new IllegalArgumentException(
        s"$weightCol must be an integral column (INT/BIGINT), got $t")
    }

    // pass 1: per-(partition, group) weight sums (tiny driver map)
    val perPart = sorted
      .groupBy((spark_partition_id().as("__pid") +: groupCols.map(col)): _*)
      .agg(sum(col(weightCol)).as("__w"))
      .collect()
      .map { r =>
        val g = (1 to groupCols.size).map(r.get).toList
        // sum() over an all-NULL run returns NULL: surface the same
        // diagnostic pass 2 gives for a lone NULL weight, instead of a
        // context-free NPE from getLong
        if (r.isNullAt(1 + groupCols.size)) throw new IllegalArgumentException(
          s"$weightCol must not be NULL (filter or coalesce upstream); " +
            s"group $g has an all-NULL weight run in partition ${r.getInt(0)}")
        ((r.getInt(0), g), r.getLong(1 + groupCols.size))
      }.toMap
    val nPart = sorted.rdd.getNumPartitions
    val offsets = scala.collection.mutable.Map.empty[(Int, List[Any]), Long]
    val totals = scala.collection.mutable.Map.empty[List[Any], Long]
    for (g <- perPart.keysIterator.map(_._2).toSet[List[Any]]) {
      var acc = 0L
      var p = 0
      while (p < nPart) {
        perPart.get((p, g)).foreach { w => offsets((p, g)) = acc; acc += w }
        p += 1
      }
      totals(g) = acc
    }

    // pass 2: inclusive local running sum + broadcast offset/total
    val bcOff = spark.sparkContext.broadcast(offsets.toMap)
    val bcTot = spark.sparkContext.broadcast(totals.toMap)
    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField(cumCol, LongType, nullable = false),
      StructField(totCol, LongType, nullable = false)))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bcOff.value
      val tot = bcTot.value
      var curG: List[Any] = null
      var run = 0L
      it.map { r =>
        val g = gIdx.map(r.get).toList
        if (g != curG) { curG = g; run = off.getOrElse((pid, g), 0L) }
        if (r.isNullAt(wIdx)) throw new IllegalArgumentException(
          s"$weightCol must not be NULL (filter or coalesce upstream); " +
            s"pass 1's per-partition sums skip NULLs, so a NULL here would " +
            s"silently corrupt every later offset in group $g")
        run += (r.get(wIdx) match {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        })
        Row.fromSeq(r.toSeq ++ Seq(run, tot(g)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Exact SQL `ntile(k)` bucket as pure integer arithmetic over a 1-based
    * rank expression `r` and a row-count expression `n` — the companion
    * that turns [[contiguousIds]]/[[groupedRunningSum]] ranks into
    * equal-height buckets WITHOUT the `ntile() OVER (ORDER BY …)` window
    * (an Exchange SinglePartition, the canonical does-not-scale shape).
    *
    * Implements the ANSI remainder convention both Spark and DuckDB use:
    * the first `n mod k` buckets hold `floor(n/k)+1` rows, the rest
    * `floor(n/k)`. With b = n DIV k and x = n mod k, rank r lands in
    * bucket (r+b) DIV (b+1) inside the first x·(b+1) rows and
    * x + (r − x·(b+1) + b − 1) DIV b after them. When n < k the ELSE
    * branch (a division by b = 0) is unreachable: every r ≤ n = x·1
    * satisfies the WHEN, matching ntile's one-row-per-bucket behavior.
    * Verified against the engine's own ntile exhaustively in IdsSpec.
    *
    * @param r SQL expression for the 1-based rank within the ordering
    * @param n SQL expression for the total row count being quartiled
    * @param k bucket count (4 = quartiles, 10 = deciles, …)
    */
  def exactNtileSql(r: String, n: String, k: Int): String = {
    require(k >= 1, s"k must be >= 1, got $k")
    val b = s"(($n) DIV $k)"
    val x = s"(($n) % $k)"
    s"""CASE WHEN ($r) <= ($b + 1) * $x
       |  THEN (($r) + $b) DIV ($b + 1)
       |  ELSE $x + ((($r) - ($b + 1) * $x) + $b - 1) DIV $b END""".stripMargin
  }
}
