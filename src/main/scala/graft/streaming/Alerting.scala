package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Scheduler-level failure/alerting semantics re-expressed on Structured
  * Streaming — the last §2.10 row of the reference surface.
  *
  * The reference's Airflow DAG declares a per-task policy
  * (/root/reference/scripts/dag.py:13-22): `email_on_failure: True`,
  * `email_on_retry: False`, `retries: 0`, `retry_delay: 5 minutes`.
  * Spark's native mapping is a [[StreamingQueryListener]] (failure +
  * progress callbacks arrive on the driver for EVERY query, regardless of
  * cluster size — listener traffic is metadata, never data-sized) plus a
  * restart loop around `query.awaitTermination()` (a streaming query that
  * dies with an exception does not restart itself; the scheduler's retry
  * budget lives OUTSIDE the query, exactly like Airflow's).
  *
  * The alert channel is an injected callback, not an SMTP client: what an
  * alert IS (email, pager, log line) is deployment-specific; what this
  * engine owes is firing the callback at the policy-correct moments.
  */
object Alerting {

  /** Mirror of the reference DAG's retry/alert knobs
    * (dag.py:13-22). `retries = 0` + `alertOnFailure = true` +
    * `alertOnRetry = false` reproduces the reference's exact policy; the
    * defaults here are those values.
    */
  final case class FailurePolicy(
      retries: Int = 0,
      retryDelayMs: Long = 5L * 60L * 1000L,
      alertOnFailure: Boolean = true,
      alertOnRetry: Boolean = false)

  sealed trait Alert { def queryName: String }
  /** Terminal failure: the retry budget is exhausted (or zero). */
  final case class FailureAlert(queryName: String, error: String,
      attempts: Int) extends Alert
  /** A retry is about to start (suppressed when `alertOnRetry` is false —
    * the reference's `email_on_retry: False`).
    */
  final case class RetryAlert(queryName: String, error: String,
      attempt: Int) extends Alert
  /** Progress heartbeat — one per micro-batch, the liveness signal an
    * external monitor consumes in place of Airflow's task heartbeat.
    */
  final case class Heartbeat(queryName: String, batchId: Long,
      numInputRows: Long) extends Alert

  /** Listener translating Spark's query lifecycle events into the policy's
    * alert stream. Register once per session; it observes every query but
    * only reports on those whose name is in `watch` (None = all).
    */
  final class AlertingListener(policy: FailurePolicy, alert: Alert => Unit,
      watch: Option[Set[String]] = None) extends StreamingQueryListener {
    private def watched(name: String): Boolean =
      name != null && watch.forall(_.contains(name))

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (watched(p.name))
        alert(Heartbeat(p.name, p.batchId, p.numInputRows))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    // terminal failure alerts are raised by runWithRetries, which alone
    // knows whether a termination is final or about to be retried — the
    // listener's QueryTerminatedEvent carries no retry context
  }

  /** Run a streaming query under the retry policy: start it, await
    * termination, and on an exceptional exit restart up to
    * `policy.retries` times with `policy.retryDelayMs` between attempts
    * (Airflow's `retry_delay`), alerting per the policy. A clean stop()
    * exits immediately with no alert. Returns the per-attempt error
    * messages (empty = first attempt succeeded).
    *
    * `start` must build a FRESH query each call (same checkpoint dir for
    * exactly-once resumption — the restarted attempt picks up from the
    * last committed offset, which is what makes retry SAFE here, unlike a
    * side-effecting Airflow task).
    */
  def runWithRetries(policy: FailurePolicy, alert: Alert => Unit)(
      start: () => StreamingQuery): Seq[String] = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    var attempt = 0
    var done = false
    while (!done) {
      val q = start()
      val failed =
        try { q.awaitTermination(); None }
        catch { case scala.util.control.NonFatal(e) =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      failed match {
        case None => done = true
        case Some(msg) =>
          errors += msg
          attempt += 1
          if (attempt > policy.retries) {
            if (policy.alertOnFailure)
              alert(FailureAlert(Option(q.name).getOrElse(""), msg, attempt))
            done = true
          } else {
            if (policy.alertOnRetry)
              alert(RetryAlert(Option(q.name).getOrElse(""), msg, attempt))
            Thread.sleep(policy.retryDelayMs)
          }
      }
    }
    errors.toSeq
  }

  /** Convenience: a thread-safe collecting alert sink for tests/monitors
    * that want to poll rather than push.
    */
  final class CollectingSink extends (Alert => Unit) {
    private val q = new ConcurrentLinkedQueue[Alert]()
    override def apply(a: Alert): Unit = q.add(a)
    def drain(): Seq[Alert] = q.iterator().asScala.toSeq
  }

  /** Register an [[AlertingListener]] on the session; returns it so the
    * caller can remove it (`spark.streams.removeListener`).
    */
  def register(spark: SparkSession, policy: FailurePolicy,
      alert: Alert => Unit,
      watch: Option[Set[String]] = None): AlertingListener = {
    val l = new AlertingListener(policy, alert, watch)
    spark.streams.addListener(l)
    l
  }
}
