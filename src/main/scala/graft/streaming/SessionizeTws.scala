package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming gap-based sessionization on transformWithState with
  * EVENT-TIME TIMERS — the stateful pattern `session_window` aggregation
  * cannot express when the per-session output needs custom shape (here:
  * span + count + exact sum).
  *
  * Correctness stance: a session may only EMIT once the event-time
  * watermark has passed session_end + gap — that, and nothing weaker, is
  * the proof that no admissible late row can still join or bridge it.
  * In particular a same-key row jumping the gap does NOT close the
  * previous session early (when the watermark delay exceeds the gap, a
  * later batch can legally deliver a row that lands INSIDE the old
  * session's span, or bridges two open sessions). So the state is a
  * LIST of open sessions per key:
  *
  *  - input rows merge interval-style: a row within [start - gap,
  *    end + gap] of a session extends it; a row bridging two sessions
  *    merges them; anything else opens a new session;
  *  - one event-time timer per key is armed at the EARLIEST open
  *    session's end + gap (re-armed as sessions extend/merge — the
  *    previously armed expiry is tracked in value state so the stale
  *    timer is deleted, not raced);
  *  - when the timer fires, every session with end + gap <= expiry is
  *    watermark-proven closed: emitted (ordered by start) and dropped;
  *    the timer re-arms for the remaining earliest session.
  *
  * Scale: state is O(open sessions per key) — bounded by the watermark
  * (a session older than end + gap always leaves on the next timer), not
  * by stream length. RocksDB-backed, checkpointed; append-mode and
  * replay-deterministic. The reference has no session concept — this is
  * NS pipeline surface; the batch analog is q_sessionize (same gap
  * semantics, oracled).
  */
object SessionizeTws {

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionAgg(start_ms: Long, end_ms: Long, n: Long, sum_value: Double)

  final case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def finish(userId: Long, s: SessionAgg): UserSession =
    UserSession(userId, new Timestamp(s.start_ms), new Timestamp(s.end_ms),
      s.n, s.sum_value)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, UserSession] {

    @transient private var sessions: ListState[SessionAgg] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sessions = getHandle.getListState[SessionAgg]("sessions",
        Encoders.product[SessionAgg], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Interval-merge `all` under the gap: sorted by start, adjacent
      * sessions closer than the gap coalesce (sum/count add, span unions).
      */
    private def coalesce(all: Seq[SessionAgg]): Seq[SessionAgg] =
      all.sortBy(s => (s.start_ms, s.end_ms)).foldLeft(List.empty[SessionAgg]) {
        case (acc @ (prev :: rest), s) if s.start_ms <= prev.end_ms + gapMs =>
          prev.copy(end_ms = math.max(prev.end_ms, s.end_ms),
            n = prev.n + s.n, sum_value = prev.sum_value + s.sum_value) :: rest
        case (acc, s) => s :: acc
      }.reverse

    private def rearm(open: Seq[SessionAgg]): Unit = {
      // armed.exists() is the SOLE "a timer is registered" signal — no 0L
      // sentinel, so an expiry that legitimately computes to epoch 0 (or
      // any upstream clock bug producing 0) can't be conflated with
      // "nothing armed" and left with its timer never deleted (ADVICE r5).
      val prev: Option[Long] = if (armed.exists()) Some(armed.get()) else None
      if (open.isEmpty) {
        prev.foreach { p => getHandle.deleteTimer(p); armed.clear() }
      } else {
        val next = open.map(_.end_ms).min + gapMs
        if (!prev.contains(next)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(next)
          armed.update(next)
        }
      }
    }

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[UserSession] = {
      val existing = if (sessions.exists()) sessions.get().toSeq else Seq.empty
      val incoming = rows.map(e =>
        SessionAgg(e.ts.getTime, e.ts.getTime, 1L, e.value)).toSeq
      val merged = coalesce(existing ++ incoming)
      sessions.put(merged.toArray)
      rearm(merged)
      Iterator.empty // emission is the timer's job — watermark-proven only
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs
      // drain everything the CURRENT watermark proves, not only the armed
      // expiry — several sessions can become closeable between firings,
      // and a re-armed timer already below the watermark would otherwise
      // wait for the next input batch to fire
      val cutoff = math.max(expiry, timerValues.getCurrentWatermarkInMs)
      val all = if (sessions.exists()) sessions.get().toSeq else Seq.empty
      val (closed, open) = all.partition(_.end_ms + gapMs <= cutoff)
      if (open.isEmpty) sessions.clear() else sessions.put(open.toArray)
      // this timer is consumed; forget it before re-arming for the rest
      if (armed.exists() && armed.get() == expiry) armed.clear()
      rearm(open)
      closed.sortBy(_.start_ms).map(finish(userId, _)).iterator
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
