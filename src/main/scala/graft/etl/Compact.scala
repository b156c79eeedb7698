package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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
  *
  * Visibility model: a compacted dataset is a directory of immutable
  * version subdirs (`v=N/`) plus a tiny `_CURRENT` pointer file naming the
  * live one. [[compact]] writes the NEXT version fully, then swaps the
  * pointer with an ATOMIC overwrite-rename — so a [[read]]/[[resolve]]
  * reader sees the old version or the new version, never a missing or
  * half-written directory (the delete-then-rename swap this replaces had a
  * reader-visible hole). The previous version is retained one cycle as an
  * in-flight-reader grace period; older versions are garbage-collected.
  * This is the minimal pointer-swap core of what ACID table formats do —
  * they remain the right tool when concurrent WRITERS also need
  * transactions.
  */
object Compact {

  private val Pointer = "_CURRENT"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def currentVersion(fs: FileSystem, dir: String): Option[Long] = {
    val p = new Path(dir, Pointer)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Path of the live data: `dir/v=N` when a `_CURRENT` pointer exists,
    * `dir` itself for a plain (never-compacted) directory.
    */
  def resolve(spark: SparkSession, dir: String): String =
    currentVersion(fsOf(spark, dir), dir) match {
      case Some(n) => s"${dir.stripSuffix("/")}/v=$n"
      case None => dir
    }

  /** Read the live version of a (possibly compacted) dataset. The resolved
    * path is refreshed first: Spark's session file-status cache may hold a
    * pre-swap listing for it, and a versioned read must reflect the
    * CURRENT pointer, not a cached directory snapshot.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val p = resolve(spark, dir)
    spark.catalog.refreshByPath(p)
    spark.read.parquet(p)
  }

  /** Publish `version` as live: write the pointer to a temp file, then
    * atomically overwrite-rename it onto `_CURRENT` (FileContext.rename
    * with OVERWRITE — atomic on posix and HDFS). The data directory is
    * fully written BEFORE this runs, so the pointer only ever names
    * complete data.
    */
  private[etl] def publish(spark: SparkSession, dir: String, version: Long): Unit = {
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, s"$Pointer.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(dir, Pointer), Options.Rename.OVERWRITE)
  }

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

  /** Rewrite the live version into ceil(totalBytes / targetFileBytes)
    * files when it currently holds more; no-op (and no data pass) when
    * already compact. Returns the resulting file count.
    *
    * Write-then-publish: the next `v=N+1/` directory is written COMPLETELY,
    * then the `_CURRENT` pointer is swapped atomically ([[publish]]) —
    * readers at ANY instant resolve to a complete directory (old or new,
    * never missing or half-written). Superseded data (the previous version
    * directory, or a migrated plain directory's loose files) is NOT
    * deleted in the same cycle: it is garbage-collected at the START of
    * the NEXT compact invocation, giving in-flight readers a full cycle
    * of grace. Concurrent readers are safe; concurrent compactors/writers
    * still need external coordination (the table-format layer's job).
    *
    * A plain directory is migrated on its first compaction: the compacted
    * copy lands in `v=1/` and the pointer is published; the loose
    * top-level files (version "0" for retention purposes) remain until
    * GC supersedes them — same guarantee.
    *
    * @param retainPriorVersions how many superseded versions to keep on
    *        disk besides the live one — the in-flight-reader grace window,
    *        measured in compaction cycles (the same retention knob ACID
    *        table formats expose). 1 is right for infrequent maintenance
    *        compaction; raise it when compaction runs at a cadence
    *        comparable to the longest reader.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      retainPriorVersions: Int = 1): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    require(retainPriorVersions >= 0,
      s"retainPriorVersions must be >= 0: $retainPriorVersions")
    val fs = fsOf(spark, dir)
    val base = dir.stripSuffix("/")
    val curV = currentVersion(fs, dir)
    // GC of versions older than the retention window (current version v,
    // keep v-retain..v; the migrated plain directory's loose files count
    // as version 0)
    curV.foreach { v =>
      if (v > retainPriorVersions) {
        fs.listStatus(new Path(dir))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .foreach(s => fs.delete(s.getPath, false))
      }
      (1L until v - retainPriorVersions).foreach(old =>
        fs.delete(new Path(s"$base/v=$old"), true))
    }
    val cur = resolve(spark, dir)
    val (nFiles, totalBytes) = parquetFootprint(spark, cur)
    val targetFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (nFiles <= targetFiles) nFiles
    else {
      val nextV = curV.getOrElse(0L) + 1
      spark.catalog.refreshByPath(cur)
      spark.read.parquet(cur)
        .repartition(targetFiles)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/v=$nextV")
      publish(spark, dir, nextV)
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
