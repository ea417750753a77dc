package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import SessionizeTws.{SessionEvent, UserSession}

/** Event-time-timer sessionization: a session closes ONLY when the
  * watermark passes session_end + gap (a same-key row jumping the gap
  * opens a second session but must not emit the first early — with
  * watermark delay > gap, later batches can legally land rows inside or
  * before the old span), and a session extension must re-arm the timer.
  */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(u: Long, hhmm: String, v: Double) =
    SessionEvent(u, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), v)
  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("sessions close when the watermark passes end + gap, for jumped and quiet keys alike") {
    withRocksDBStateStore {
      val in = MemoryStream[SessionEvent]
      val sessions = SessionizeTws(
        in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
        gapMs = 10 * 60 * 1000L)
      val q = sessions.writeStream.format("memory").queryName("sess_out")
        .outputMode(OutputMode.Append).start()

      // open u1 (two events within the gap) and u2 (one event)
      in.addData(ev(1, "10:00", 1.5), ev(1, "10:05", 2.5), ev(2, "10:00", 4.0))
      q.processAllAvailable() // watermark after this batch: 10:05
      assert(spark.table("sess_out").count() == 0, "no session may close yet")

      // u1 jumps the gap (second open session); the watermark advance to
      // 11:00 triggers a follow-up batch whose timers close u1's first
      // session (10:15 expiry) AND quiet u2's (10:10) — no early emission
      in.addData(ev(1, "11:00", 8.0))
      q.processAllAvailable() // watermark: 11:00 (+ timer follow-up batch)
      val afterJump = spark.table("sess_out").as[UserSession].collect()
        .sortBy(s => (s.session_start.getTime, s.user_id)).toSeq
      assert(afterJump == Seq(
        UserSession(1, t("10:00"), t("10:05"), 2, 4.0),
        UserSession(2, t("10:00"), t("10:00"), 1, 4.0)),
        s"got $afterJump")

      // u1 jumps the gap again; the 11:00 session closes via its 11:10
      // timer once the watermark reaches 12:00 — exactly once
      in.addData(ev(1, "12:00", 16.0))
      q.processAllAvailable()
      val afterTimer = spark.table("sess_out").as[UserSession].collect()
        .sortBy(s => (s.session_start.getTime, s.user_id)).toSeq
      q.stop()
      assert(afterTimer == Seq(
        UserSession(1, t("10:00"), t("10:05"), 2, 4.0),
        UserSession(2, t("10:00"), t("10:00"), 1, 4.0),
        UserSession(1, t("11:00"), t("11:00"), 1, 8.0)),
        s"got $afterTimer")
      // the 12:00 session is still open (no watermark past 12:10) — three
      // closed sessions total, no duplicates from re-armed timers
    }
  }

  test("out-of-order rows inside the gap widen the open session, not split it") {
    withRocksDBStateStore {
      val in = MemoryStream[SessionEvent]
      val sessions = SessionizeTws(
        in.toDS().withWatermark("ts", "10 minutes").as[SessionEvent],
        gapMs = 10 * 60 * 1000L)
      val q = sessions.writeStream.format("memory").queryName("sess_ooo")
        .outputMode(OutputMode.Append).start()
      in.addData(ev(7, "10:10", 1.0))
      q.processAllAvailable()
      // arrives late (before the open session's start) but within the gap:
      // widens the span backwards
      in.addData(ev(7, "10:03", 2.0))
      q.processAllAvailable()
      // gap jump closes it: one session spanning 10:03-10:10 with both rows
      in.addData(ev(7, "11:00", 4.0))
      q.processAllAvailable()
      val got = spark.table("sess_ooo").as[UserSession].collect().toSeq
      q.stop()
      assert(got == Seq(UserSession(7, t("10:03"), t("10:10"), 2, 3.0)), s"got $got")
    }
  }

  test("watermark delay longer than the gap: late rows land in the RIGHT session") {
    // The failure this pins: closing a session the moment a same-key row
    // jumps the gap would emit [12:00] early, and the late 12:05 row —
    // still admissible under the 60-minute watermark delay — would then
    // glue onto the WRONG (12:30) session across a 25-minute silence.
    withRocksDBStateStore {
      val in = MemoryStream[SessionEvent]
      val sessions = SessionizeTws(
        in.toDS().withWatermark("ts", "60 minutes").as[SessionEvent],
        gapMs = 10 * 60 * 1000L)
      val q = sessions.writeStream.format("memory").queryName("sess_late")
        .outputMode(OutputMode.Append).start()
      in.addData(ev(9, "12:00", 1.0), ev(9, "12:30", 2.0)) // two open sessions
      q.processAllAvailable() // watermark: 11:30 — nothing may emit
      assert(spark.table("sess_late").count() == 0)
      // late rows: 12:05 extends [12:00] (inside its gap window); 11:35 is
      // outside every session's window -> its own session
      in.addData(ev(9, "12:05", 4.0), ev(9, "11:35", 8.0))
      q.processAllAvailable()
      assert(spark.table("sess_late").count() == 0, "still nothing provable")
      // advance the watermark past every end + gap
      in.addData(ev(9, "14:00", 16.0))
      q.processAllAvailable() // watermark: 13:00
      val got = spark.table("sess_late").as[UserSession].collect()
        .sortBy(_.session_start.getTime).toSeq
      q.stop()
      assert(got == Seq(
        UserSession(9, t("11:35"), t("11:35"), 1, 8.0),
        UserSession(9, t("12:00"), t("12:05"), 2, 5.0),
        UserSession(9, t("12:30"), t("12:30"), 1, 2.0)),
        s"got $got")
    }
  }
}
