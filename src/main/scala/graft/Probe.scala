package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe: `runMain graft.Probe <sfDir> <q1,q2,...>`
  * runs the named registry queries standalone under the Bench session
  * config (local[32], AQE, 32 shuffle partitions), one sf0.001 warm-up
  * pass then three timed reps each, printing `[probe] repN name T s`
  * lines. For isolating ONE query's cost from full-bench interference
  * (leaked localCheckpoint blocks, JIT order, load windows) when a bench
  * delta needs attribution — the r7/r12 probes behind the in-code
  * timing commentary were exactly this loop.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Queries.all.map(q => q.name -> q).toMap
    // Warm-up against the smallest SIBLING scale factor of the probed dir
    // (same derivation as Bench's warm-up) — never a hardcoded absolute
    // path, which breaks on any other layout. If no sibling exists, warm
    // on the probed dir itself: a slightly-warm first rep beats a crash.
    val warmDir = {
      val sib = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
      if (sib != sfDir && new java.io.File(sib).isDirectory) sib else sfDir
    }
    names.foreach { n =>
      qs(n).fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
    }
    for (rep <- 1 to 3; n <- names) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      qs(n).fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] rep$rep $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
