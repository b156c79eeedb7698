package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
}
