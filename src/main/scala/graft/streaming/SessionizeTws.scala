package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming gap-based sessionization on transformWithState with
  * EVENT-TIME TIMERS — the stateful pattern `session_window` aggregation
  * cannot express when the per-session output needs custom shape (here:
  * span + count + exact sum) and the close must happen exactly when the
  * event-time watermark passes session_end + gap.
  *
  * Mechanics per key (user):
  *  - input rows merge into the open session while they fall within
  *    `gapMs` of it; a row beyond the gap closes the open session
  *    IN-BATCH (emitted immediately — no need to wait for a timer the
  *    watermark has already implied) and starts a fresh one;
  *  - every batch re-arms one event-time timer at session_end + gap; the
  *    previously armed expiry is stored IN the session state so a stale
  *    timer (superseded by a later extension) is recognized and ignored
  *    when it fires — O(1) state, no timer-list scans;
  *  - when the watermark passes the armed expiry, handleExpiredTimer
  *    emits the session and clears state — the trailing open session of
  *    a quiet key closes without any further input for that key.
  *
  * Scale: state is one fixed-width record per ACTIVE key (RocksDB-backed,
  * checkpointed); emission is append-mode and replay-deterministic. The
  * reference has no session concept — this is NS pipeline surface (user
  * activity sessions over the events table's streaming twin; the batch
  * analog is q_sessionize, same gap semantics, oracled).
  */
object SessionizeTws {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session state: span, aggregates, and the armed timer's expiry
    * (so stale timers self-identify — see handleExpiredTimer).
    */
  final case class SessionAgg(
      start_ms: Long, end_ms: Long, n: Long, sum_value: Double, timer_ms: Long)

  final case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def finish(userId: Long, s: SessionAgg): UserSession =
    UserSession(userId, new Timestamp(s.start_ms), new Timestamp(s.end_ms),
      s.n, s.sum_value)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, UserSession] {

    @transient private var sess: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionAgg]("session",
        Encoders.product[SessionAgg], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[UserSession] = {
      // batch-sort by event time: in-batch order is arrival order, and
      // gap decisions must follow the time axis (same per-key batch-sort
      // stance as O1/D1)
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur: Option[SessionAgg] = if (sess.exists()) Some(sess.get()) else None
      val armed = cur.map(_.timer_ms).getOrElse(0L)
      val closed = Seq.newBuilder[UserSession]
      sorted.foreach { e =>
        val ms = e.ts.getTime
        cur match {
          case Some(c) if ms <= c.end_ms + gapMs =>
            // extends (or lands inside) the open session; out-of-order
            // rows within the gap widen the span from either side
            cur = Some(c.copy(
              start_ms = math.min(c.start_ms, ms),
              end_ms = math.max(c.end_ms, ms),
              n = c.n + 1, sum_value = c.sum_value + e.value))
          case Some(c) =>
            closed += finish(userId, c)
            cur = Some(SessionAgg(ms, ms, 1L, e.value, 0L))
          case None =>
            cur = Some(SessionAgg(ms, ms, 1L, e.value, 0L))
        }
      }
      cur.foreach { c =>
        val expiry = c.end_ms + gapMs
        if (armed != 0L && armed != expiry) getHandle.deleteTimer(armed)
        if (armed != expiry) getHandle.registerTimer(expiry)
        sess.update(c.copy(timer_ms = expiry))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
      // only the CURRENTLY armed expiry may close the session; a stale
      // timer (session was extended after it was armed) is a no-op
      if (sess.exists() && sess.get().timer_ms == expiredTimerInfo.getExpiryTimeInMs) {
        val out = finish(userId, sess.get())
        sess.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  /** events (already watermarked on `ts`) -> closed sessions, append mode. */
  def apply(events: Dataset[SessionEvent], gapMs: Long): Dataset[UserSession] = {
    implicit val enc: Encoder[UserSession] = Encoders.product[UserSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
