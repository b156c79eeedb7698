package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of one registered
  * query (or all of them) without executing it.
  *
  *   sbt "runMain graft.Explain transform_chain [sfDir]"
  *   sbt "runMain graft.Explain ALL"
  *
  * The audit checklist (SURVEY §3 / the 100 TB directives): filters reach
  * the scan (PushedFilters), projections prune (ReadSchema), joins
  * broadcast where a side is small, WholeStageCodegen spans are wide, and
  * no unexpected Exchange appears.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName|ALL> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args(0) == "ALL") Queries.all.map(_.name)
      else {
        require(Queries.all.exists(_.name == args(0)),
          s"unknown query ${args(0)}; known: ${Queries.all.map(_.name).mkString(", ")}")
        Seq(args(0))
      }
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Queries.all.find(_.name == n).get.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
