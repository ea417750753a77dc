package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CUSUM drift monitor — the ONLINE sibling of the batch
  * `q_cusum_changepoint` (which locates the level shift offline by
  * argmax): the classic two-sided Page CUSUM recurrence
  *
  *   sPos' = max(0, sPos + (x - mu0 - slack))
  *   sNeg' = max(0, sNeg + (mu0 - x - slack))
  *
  * alerting the first time either side exceeds `threshold`, then
  * resetting that side to 0 and re-arming (so a sustained shift raises
  * one alert per crossing, not one per row). All arithmetic is in CENTS
  * (longs): the 2-decimal inputs are scaled by 100 with half-up
  * rounding before the fold, so replay produces bit-identical alerts —
  * the same decimal-exactness stance as the batch query.
  *
  * State per key is three longs (O(1), stream-length-independent); rows
  * are batch-sorted by (ts, event_id) before folding (the recurrence is
  * order-sensitive and arrival order within a micro-batch is not event
  * order — same stance as EwmaTws/D1). Cross-batch late rows must be
  * watermark-dropped upstream: an online recurrence cannot be repaired
  * retroactively, which is why the offline batch form exists.
  */
object StreamingCusum {

  final case class CusumEvent(event_type: String, ts: Timestamp,
      event_id: Long, value: Double)
  final case class DriftAlert(event_type: String, event_id: Long,
      ts: Timestamp, side: String, stat: Long)

  /** (sPos, sNeg) carried across batches. */
  final case class CusumState(sPos: Long, sNeg: Long)

  /** @param mu0Cents    reference level in cents
    * @param slackCents  per-observation allowance k in cents
    * @param threshold   alert level h in cents
    */
  class Processor(mu0Cents: Long, slackCents: Long, threshold: Long)
      extends StatefulProcessor[String, CusumEvent, DriftAlert] {

    @transient private var state: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[DriftAlert] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var st = if (state.exists()) state.get() else CusumState(0L, 0L)
      val out = Seq.newBuilder[DriftAlert]
      sorted.foreach { e =>
        val cents = Math.round(e.value * 100.0)
        val sPos = Math.max(0L, st.sPos + (cents - mu0Cents - slackCents))
        val sNeg = Math.max(0L, st.sNeg + (mu0Cents - cents - slackCents))
        var (nPos, nNeg) = (sPos, sNeg)
        if (sPos > threshold) {
          out += DriftAlert(key, e.event_id, e.ts, "up", sPos)
          nPos = 0L // reset-and-re-arm: next alert needs a fresh climb
        }
        if (sNeg > threshold) {
          out += DriftAlert(key, e.event_id, e.ts, "down", sNeg)
          nNeg = 0L
        }
        st = CusumState(nPos, nNeg)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def apply(events: Dataset[CusumEvent], mu0: Double, slack: Double,
      threshold: Double): Dataset[DriftAlert] = {
    implicit val enc: Encoder[DriftAlert] = Encoders.product[DriftAlert]
    events
      .groupByKey(_.event_type)(Encoders.STRING)
      .transformWithState(
        new Processor(Math.round(mu0 * 100.0), Math.round(slack * 100.0),
          Math.round(threshold * 100.0)),
        TimeMode.None(), OutputMode.Append())
  }
}
