package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subtree attribution probe (round-15 companion to [[JobProbe]]):
  * `runMain graft.SubProbe <sfDir> <probe1,probe2,...>` times NAMED
  * SUB-dataflows of the expensive queries — the halves a registry-level
  * probe cannot separate — under the Bench session shape (GRAFT_CPUS
  * cores, matching shuffle partitions), printing wall and summed task
  * time per rep. Measurement infrastructure only; never on a query path.
  */
object SubProbe {

  /** (parts, pairScores) of moreLikeThis's bm25 pipeline, replicated from
    * TextStats' private internals for stage-by-stage attribution.
    */
  private def mltPieces(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val docs = tbl("documents")
    val q2 = tbl("embeddings")
      .filter(pmod(col("vec_id"), lit(50)) === 0).orderBy("vec_id").limit(64)
      .select(col("vec_id").as("query_id"))
    val qdocs = docs.join(broadcast(q2),
      col("doc_id") === col("query_id"), "left_semi")
    val qt = graft.llm.TextStats.tokens(qdocs, "text", "doc_id")
      .select(col("doc_id").as("query_id"), col("tok")).distinct()
    val toks = graft.llm.TextStats.tokens(docs, "text", "doc_id")
    val lens = graft.llm.TextStats.docLens(docs, "text", "doc_id")
    val tots = lens.agg(count(lit(1)).as("__n"), sum(col("len")).as("__l"))
    val tf = toks.join(broadcast(qt.select("tok")), Seq("tok"), "left_semi")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val part = tf.join(broadcast(dfc), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(tots))
      .select(col("doc_id"), col("tok"),
        expr("(((__n * 1000000) DIV df) * 22 * tf * __l) DIV " +
          "(10 * tf * __l + 3 * __l + 9 * len * __n)").as("part_e6"))
    val fan = part.repartition(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt, col("doc_id"))
    val scores = fan.join(broadcast(qt), "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("part_e6"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("part_e6")).as("score_e6"))
    (part, scores)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskMs += te.taskInfo.duration
    })
    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def qv = tbl("embeddings")
      .filter(pmod(col("vec_id"), lit(50)) === 0).orderBy("vec_id").limit(64)

    val probes: Map[String, () => DataFrame] = Map(
      "rrf_dense" -> (() =>
        graft.llm.Similarity.bruteForceTopK(tbl("embeddings"), qv, k = 10)),
      "rrf_sparse" -> (() =>
        graft.llm.TextStats.moreLikeThis(tbl("documents"),
          qv.select(col("vec_id").as("doc_id")), k = 10)),
      "mlt_qt_count" -> { () =>
        val docs = tbl("documents")
        val q2 = qv.select(col("vec_id").as("query_id"))
        val qdocs = docs.join(broadcast(q2),
          col("doc_id") === col("query_id"), "left_semi")
        graft.llm.TextStats.tokens(qdocs, "text", "doc_id")
          .select(col("doc_id").as("query_id"), col("tok")).distinct()
          .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("ntok"))
      },
      "corpus_tokens_count" -> (() =>
        graft.llm.TextStats.tokens(tbl("documents"), "text", "doc_id")
          .agg(count(lit(1)).as("n"), countDistinct(col("tok")).as("ntok"))),
      // bm25PairScores replicated stage by stage (it is private): parts
      // only, pair scores collapsed to one row, pair scores materialized
      // in full, then scores + heap top-k (the full moreLikeThis shape)
      "mlt_parts" -> { () => mltPieces(spark, sfDir)._1
        .agg(count(lit(1)).as("n"), sum(col("part_e6")).as("s")) },
      "mlt_scores_agg" -> { () => mltPieces(spark, sfDir)._2
        .agg(count(lit(1)).as("n"), sum(col("score_e6")).as("s")) },
      "mlt_scores_full" -> { () => mltPieces(spark, sfDir)._2 },
      "mlt_topk" -> { () =>
        graft.plans.TopK.perGroup(mltPieces(spark, sfDir)._2,
          Seq("query_id"), col("score_e6"), col("doc_id"), 10,
          rankName = "rnk") }
    )

    names.foreach { n =>
      probes(n)().write.format("noop").mode("overwrite").save() // warm
    }
    for (rep <- 1 to 3; n <- names) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      taskMs = 0L
      val t0 = System.nanoTime()
      val df = probes(n)()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[sub] rep$rep $n wall=$wall%.2fs sumTask=${taskMs / 1e3}%.2fs")
      if (rep == 1 && n.endsWith("_count"))
        df.collect().foreach(r => println(s"[sub] $n -> $r"))
    }
    spark.stop()
  }
}
