package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Drives the reference DAG's retry/alert policy (dag.py:13-22) through an
  * injected failing micro-batch: attempt 1 throws inside foreachBatch,
  * the retry resumes from the SAME checkpoint and lands the batch
  * exactly-once; alerts fire at the policy-correct moments and nowhere
  * else.
  */
class AlertingSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft_alerting").toString

  /** One AvailableNow pass over a parquet source dir; foreachBatch throws
    * until `okMarker` exists (the injected transient failure), then
    * appends to `out`.
    */
  private def startPass(src: String, ckpt: String, out: String,
      okMarker: String, name: String) = {
    val schema = Seq.empty[(Long, String)].toDF("id", "s").schema
    spark.readStream.schema(schema).parquet(src)
      .writeStream
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!Files.exists(Paths.get(okMarker)))
          throw new RuntimeException("injected transient batch failure")
        df.write.mode("append").parquet(out)
      }
      .start()
  }

  test("transient failure: retry resumes from checkpoint, exactly-once, no alert") {
    val root = newRoot()
    val src = s"$root/src"; val out = s"$root/out"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(src)
    val sink = new Alerting.CollectingSink
    var attempts = 0
    val errors = Alerting.runWithRetries(
      Alerting.FailurePolicy(retries = 1, retryDelayMs = 50L), sink) { () =>
      attempts += 1
      // the failure heals itself before the retry (marker appears after
      // attempt 1 starts) — the Airflow "flaky task" shape
      if (attempts == 2) Files.createFile(Paths.get(s"$root/ok"))
      startPass(src, s"$root/ckpt", out, s"$root/ok", "alerting_t1")
    }
    assert(errors.size == 1 && errors.head.contains("injected"))
    assert(attempts == 2)
    // exactly-once despite the replay: the failed batch never committed
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted
      .toSeq == Seq((1L, "a"), (2L, "b")))
    // reference policy: email_on_retry = False, and the retry SUCCEEDED so
    // there is no terminal failure either — zero alerts
    assert(sink.drain().collect {
      case a: Alerting.RetryAlert => a
      case a: Alerting.FailureAlert => a
    }.isEmpty)
  }

  test("alertOnRetry = true surfaces the retry; exhaustion raises FailureAlert") {
    val root = newRoot()
    val src = s"$root/src"; val out = s"$root/out"
    Seq((1L, "a")).toDF("id", "s").write.parquet(src)
    val sink = new Alerting.CollectingSink
    // marker never created → every attempt fails → budget exhausts
    val errors = Alerting.runWithRetries(
      Alerting.FailurePolicy(retries = 1, retryDelayMs = 50L,
        alertOnFailure = true, alertOnRetry = true), sink) { () =>
      startPass(src, s"$root/ckpt", out, s"$root/never", "alerting_t2")
    }
    assert(errors.size == 2)
    val alerts = sink.drain()
    val retries = alerts.collect { case a: Alerting.RetryAlert => a }
    val failures = alerts.collect { case a: Alerting.FailureAlert => a }
    assert(retries.map(_.attempt) == Seq(1))
    assert(failures.map(_.attempts) == Seq(2))
    assert(failures.head.error.contains("injected"))
  }

  test("reference defaults (retries=0): first failure is terminal and alerts") {
    val root = newRoot()
    val src = s"$root/src"
    Seq((1L, "a")).toDF("id", "s").write.parquet(src)
    val sink = new Alerting.CollectingSink
    val errors = Alerting.runWithRetries(
      Alerting.FailurePolicy(retryDelayMs = 50L), sink) { () =>
      startPass(src, s"$root/ckpt", s"$root/out", s"$root/never",
        "alerting_t3")
    }
    assert(errors.size == 1)
    assert(sink.drain().collect { case a: Alerting.FailureAlert => a }
      .map(_.attempts) == Seq(1))
  }

  test("listener heartbeats: one per micro-batch for watched queries") {
    val root = newRoot()
    val src = s"$root/src"; val out = s"$root/out"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").write.parquet(src)
    Files.createFile(Paths.get(s"$root/ok")) // healthy from the start
    val sink = new Alerting.CollectingSink
    val listener = Alerting.register(spark, Alerting.FailurePolicy(), sink,
      watch = Some(Set("alerting_hb")))
    try {
      val q = startPass(src, s"$root/ckpt", out, s"$root/ok", "alerting_hb")
      q.awaitTermination()
      // listener delivery is async — poll briefly for the heartbeat
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var beats = Seq.empty[Alerting.Heartbeat]
      while (beats.isEmpty && System.nanoTime() < deadline) {
        beats = sink.drain().collect { case h: Alerting.Heartbeat => h }
        if (beats.isEmpty) Thread.sleep(50)
      }
      assert(beats.nonEmpty, "no heartbeat within 10 s")
      assert(beats.map(_.numInputRows).sum == 3)
      assert(beats.forall(_.queryName == "alerting_hb"))
    } finally spark.streams.removeListener(listener)
  }
}
