package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import SessionizeTws.{SessionEvent, UserSession}

/** Event-time-timer sessionization: sessions must close BOTH ways — by a
  * same-key row jumping the gap (in-batch close) and by the watermark
  * passing session_end + gap on a quiet key (timer close) — and a session
  * extension must disarm the stale timer.
  */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(u: Long, hhmm: String, v: Double) =
    SessionEvent(u, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), v)
  private def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("sessions close by in-batch gap jump AND by watermark-driven timers") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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

      // u1 jumps the gap -> its first session closes IN-BATCH, and the
      // watermark advance to 11:00 triggers a follow-up batch that fires
      // u2's 10:10 timer (quiet-key close) with no further u2 input
      in.addData(ev(1, "11:00", 8.0))
      q.processAllAvailable() // watermark: 11:00 (+ timer follow-up batch)
      val afterJump = spark.table("sess_out").as[UserSession].collect()
        .sortBy(s => (s.session_start.getTime, s.user_id)).toSeq
      assert(afterJump == Seq(
        UserSession(1, t("10:00"), t("10:05"), 2, 4.0),
        UserSession(2, t("10:00"), t("10:00"), 1, 4.0)),
        s"got $afterJump")

      // u1's 11:00 session jumps the gap in-batch; its 11:10 timer — now
      // stale — must NOT double-fire
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
      // closed sessions total, no duplicates from the stale 11:10 timer
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("out-of-order rows inside the gap widen the open session, not split it") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
