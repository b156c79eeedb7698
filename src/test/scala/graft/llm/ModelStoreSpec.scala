package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Compact

class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-modelstore").toString

  test("getOrTrain trains exactly once and serves the published artifact") {
    val root = tmpRoot()
    var trained = 0
    def model() = {
      trained += 1
      Seq((0L, 10L), (1L, 20L)).toDF("cell", "c")
    }
    val first = ModelStore.getOrTrain(spark, "m_v1", root)(model())
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val second = ModelStore.getOrTrain(spark, "m_v1", root)(model())
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(trained == 1, "second call must serve the artifact, not retrain")
    assert(first == second && first == Seq((0L, 10L), (1L, 20L)))
  }

  test("a published model survives a 'restart': fresh reader, no training") {
    // cross-process serve-many: the artifact lives on disk under the
    // store root, so a reader that NEVER saw the trainer (a new process
    // after restart — here simulated by a reader whose train thunk would
    // fail loudly) resolves the same published version from disk
    val root = tmpRoot()
    ModelStore.getOrTrain(spark, "pq_demo_v1", root)(
      Seq((0L, 0L, Seq(1L, 2L))).toDF("sub", "code", "ce"))
    spark.catalog.clearCache()
    val served = ModelStore.getOrTrain(spark, "pq_demo_v1", root)(
      sys.error("restart reader must not retrain"))
    assert(served.count() == 1)
    // and the raw Compact.read of the store dir sees the same version
    assert(Compact.read(spark, s"$root/pq_demo_v1").count() == 1)
  }

  test("publishVersion is versioned: a second publish supersedes the first") {
    val root = tmpRoot()
    val dir = s"$root/versions"
    val v1 = Compact.publishVersion(spark, Seq(1L).toDF("x"), dir)
    assert(v1 == 1L && Compact.read(spark, dir).count() == 1)
    val v2 = Compact.publishVersion(spark, Seq(1L, 2L).toDF("x"), dir)
    assert(v2 == 2L, "versions must increase")
    assert(Compact.read(spark, dir).count() == 2, "reader sees the new version")
  }

  test("unsafe keys are rejected before touching the filesystem") {
    intercept[IllegalArgumentException] {
      ModelStore.getOrTrain(spark, "../escape", tmpRoot())(Seq(1L).toDF("x"))
    }
    intercept[IllegalArgumentException] {
      ModelStore.getOrTrain(spark, "a b", tmpRoot())(Seq(1L).toDF("x"))
    }
  }

  test("a trained PQ codebook round-trips through the store bit-exactly") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val direct = Similarity.pqCodebooksE6(corpus, numSub = 2, kSub = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val served = ModelStore.getOrTrain(spark, "pq_rt_v1", tmpRoot())(
        Similarity.pqCodebooksE6(corpus, numSub = 2, kSub = 4, iters = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(direct == served)
  }
}
