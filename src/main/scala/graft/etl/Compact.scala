package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet landing-zone maintenance.
  *
  * A continuously-ingesting pipeline (Pipeline.startStream at a daily
  * cadence, Ingest at a streaming one) accretes one-file-per-batch parquet:
  * at 100 TB that becomes the small-files problem — scan parallelism
  * shaped by file count instead of data size, and a NameNode/listing tax
  * per query. Periodic compaction is the standard fix; the reference's
  * single-CSV-a-day world never meets it, but any Spark user of this
  * library at scale will.
  */
object Compact {

  /** Count and total bytes of parquet data files directly under `dir`. */
  def parquetFootprint(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0, 0L)
    else {
      val files = fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (files.length, files.map(_.getLen).sum)
    }
  }

  /** Rewrite `dir` into ceil(totalBytes / targetFileBytes) files when it
    * currently holds more; no-op (and no data pass) when already compact.
    * Returns the resulting file count.
    *
    * The rewrite is read → repartition → write-to-sibling → swap. The swap
    * (delete + rename) is NOT transactional — callers pause writers for
    * the duration, exactly as any non-table-format compactor must; ACID
    * table formats own this problem transactionally and are the right
    * tool above this layer. Readers mid-swap see a missing directory, not
    * corrupt data.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val (nFiles, totalBytes) = parquetFootprint(spark, dir)
    val targetFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (nFiles <= targetFiles) nFiles
    else {
      val tmp = dir.stripSuffix("/") + ".compacting"
      spark.read.parquet(dir)
        .repartition(targetFiles)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new Path(dir)
      val fs = dst.getFileSystem(conf)
      fs.delete(dst, true)
      fs.rename(new Path(tmp), dst)
      targetFiles
    }
  }

  /** Data-skipping layout: directory partitioning on low-cardinality
    * `partitionCols` (partition pruning skips whole directories) plus
    * sortWithinPartitions on `sortCols` (parquet min/max row-group stats
    * skip within files). The repartition keeps one task — thus one output
    * file — per partition value instead of tasks × partitions fragments.
    */
  def writeClustered(df: DataFrame, dir: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writeClustered needs partition columns")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }
}
