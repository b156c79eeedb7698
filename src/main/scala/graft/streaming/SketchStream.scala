package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.analytics.Sketch

/** Streaming cardinality sketching: the md5-register HyperLogLog
  * ([[Sketch.hllDistinct]]) carried as flatMapGroupsWithState state.
  *
  * Why it exists: "distinct users per window" over an unbounded stream
  * with exact count-distinct means state proportional to the DISTINCT SET
  * of every open window — the classic unbounded-state failure at 100 TB.
  * The HLL register array is O(m) BYTES per (window, key) regardless of
  * stream length, mergeable, and — because the registers are md5-derived,
  * the same construction as the batch form — the streaming answer equals
  * the batch answer on the same rows EXACTLY ([[SketchStreamSpec]] pins
  * streaming-JVM == batch-Catalyst parity, and the batch form is itself
  * DuckDB-oracled as agg_approx_distinct).
  *
  * Emission: append-mode, one final row per (window, key) when the
  * watermark passes the window end (event-time timeout) — the same
  * close-by-timeout shape as [[Events.streamingSessionizeCustom]].
  */
object SketchStream {

  /** Final per-window estimate row. */
  final case class WindowDistinct(
      window_start: java.sql.Timestamp,
      event_type: String,
      n_distinct_e6: Long)

  /** HLL state: registers(j) = max rho seen in bucket j (0 = empty).
    * rho <= rhoCap <= 53 fits a byte with room to spare.
    */
  final case class HllRegisters(regs: Array[Byte])

  /** (bucket, rho) of a value — the JVM mirror of the Catalyst expressions
    * in [[Sketch.hllDistinct]]: bucket = first b md5 hex chars, rho = 1 +
    * leading zero bits of the next t hex chars, capped on an all-zero
    * tail. Same md5-of-UTF8 input, same hex surgery, so identical output.
    */
  private[streaming] def bucketAndRho(value: String, p: Sketch.HllParams): (Int, Int) = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(value.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val bucket = Integer.parseInt(hex.substring(0, p.bucketHexChars), 16)
    val tail = hex.substring(p.bucketHexChars, p.bucketHexChars + p.tailHexChars)
    val stripped = tail.dropWhile(_ == '0')
    val rho =
      if (stripped.isEmpty) p.rhoCap
      else {
        val z = 4 * (tail.length - stripped.length)
        val extra = stripped.head match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        z + extra + 1
      }
    (bucket, rho)
  }

  /** Raw-HLL estimate from a register array, identical arithmetic to the
    * batch form: integer-space harmonic sum (exact, order-independent),
    * one int->double cast, one division by the shared literal numerator,
    * floor to e6 fixed point.
    */
  private[streaming] def estimateE6(regs: Array[Byte], p: Sketch.HllParams): Long = {
    var nb = 0L
    var si = 0L
    var i = 0
    while (i < regs.length) {
      val r = regs(i) & 0xff
      if (r > 0) { nb += 1; si += 1L << (p.rhoCap - r) }
      i += 1
    }
    val denom = ((p.m.toLong - nb) << p.rhoCap) + si
    math.floor(p.numerator / denom.toDouble * 1e6).toLong
  }

  /** Approximate distinct `valueCol` per (tumbling window, event_type)
    * over an unbounded event stream. NULL values are ignored
    * (count-distinct semantics). One emitted row per closed window —
    * state is m bytes per open (window, key), dropped on emission.
    */
  def streamingWindowDistinct(events: DataFrame, valueCol: String = "user_id",
      windowMinutes: Int = 60, watermark: String = "1 hour",
      params: Sketch.HllParams = Sketch.HllParams()): Dataset[WindowDistinct] = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1, got $windowMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    val windowMillis = windowMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .filter(col(valueCol).isNotNull)
      // keep the WHOLE window struct: it carries the watermark-delay tag
      // the stateful operator's analysis requires (projecting out .start
      // would strip it and fail the event-time-timeout check)
      .select(window(col("ts"), s"$windowMinutes minutes").as("win"),
        col("event_type"), col(valueCol).cast("string").as("v"))
      .as[((java.sql.Timestamp, java.sql.Timestamp), String, String)]
      .groupByKey { case (win, et, _) => (win._1.getTime, et) }
      .flatMapGroupsWithState[HllRegisters, WindowDistinct](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((wsMillis, et), rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(WindowDistinct(
              new java.sql.Timestamp(wsMillis), et, estimateE6(s.regs, params)))
          } else {
            val regs = state.getOption.map(_.regs)
              .getOrElse(new Array[Byte](params.m))
            rows.foreach { case (_, _, v) =>
              val (b, r) = bucketAndRho(v, params)
              if (r > (regs(b) & 0xff)) regs(b) = r.toByte
            }
            state.update(HllRegisters(regs))
            // close when the watermark passes the window end
            state.setTimeoutTimestamp(wsMillis + windowMillis)
            Iterator.empty
          }
      }
  }
}
