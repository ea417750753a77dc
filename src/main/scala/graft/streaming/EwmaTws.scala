package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exponentially-weighted moving average — the UNBOUNDED
  * recurrence ewma' = alpha*v + (1-alpha)*ewma that a window function
  * cannot express (q_ewma's batch form truncates to a fixed tap count
  * precisely because a window has no carried state; here the carry IS
  * the state). One Double per key, exact recurrence, no approximation.
  *
  * Rows are batch-sorted by (ts, event_id) before folding (same per-key
  * batch-sort stance as D1/O1): the recurrence is order-sensitive, and
  * arrival order within a micro-batch is not event order. Cross-batch
  * late rows are watermark-dropped upstream — a recurrence cannot be
  * retroactively repaired, which is WHY the batch analog exists for
  * reprocessing-style corrections.
  */
object EwmaTws {

  final case class EwmaEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  final case class EwmaPoint(user_id: Long, event_id: Long, ewma: Double)

  class Processor(alpha: Double)
      extends StatefulProcessor[Long, EwmaEvent, EwmaPoint] {

    @transient private var state: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Double]("ewma",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EwmaEvent],
        timerValues: TimerValues): Iterator[EwmaPoint] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur: Option[Double] = if (state.exists()) Some(state.get()) else None
      val out = sorted.map { e =>
        val next = cur match {
          case Some(prev) => alpha * e.value + (1.0 - alpha) * prev
          case None => e.value // seed: first observation is the mean
        }
        cur = Some(next)
        EwmaPoint(userId, e.event_id, next)
      }
      cur.foreach(state.update)
      out.iterator
    }
  }

  def apply(events: Dataset[EwmaEvent], alpha: Double): Dataset[EwmaPoint] = {
    implicit val enc: Encoder[EwmaPoint] = Encoders.product[EwmaPoint]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(alpha),
        TimeMode.None(), OutputMode.Append())
  }
}
