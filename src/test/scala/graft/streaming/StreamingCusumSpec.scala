package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingCusum.{CusumEvent, DriftAlert}

/** Online CUSUM drift alerts: fire on the first threshold crossing,
  * reset-and-re-arm afterwards, integer-exact in cents, and — the
  * property that matters for exactly-once lake jobs — the alert set is
  * invariant to how the same event sequence is sliced into micro-batches.
  */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(k: String, i: Long, v: Double) =
    CusumEvent(k, new Timestamp(1700000000000L + i * 1000L), i, v)

  /** Run the same events through the monitor in the given batch slices. */
  private def run(name: String, slices: Seq[Seq[CusumEvent]]): Seq[DriftAlert] = {
    var got: Seq[DriftAlert] = Nil
    withRocksDBStateStore {
      val in = MemoryStream[CusumEvent]
      val alerts = StreamingCusum(in.toDS(), mu0 = 10.0, slack = 1.0,
        threshold = 20.0)
      val q = alerts.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { s => in.addData(s: _*); q.processAllAvailable() }
        got = spark.table(name).as[DriftAlert].collect().toSeq
          .sortBy(a => (a.event_type, a.event_id))
      } finally q.stop()
    }
    got
  }

  // 10.0 is the reference level; five 17.0s climb sPos by 6.00 each
  // (17 - 10 - 1), crossing h=20.00 on the 4th (24.00)
  private val drifting = (1L to 5L).map(i => ev("a", i, 17.0))
  // stays within the allowance — never alerts
  private val steady = (1L to 5L).map(i => ev("b", i + 10, 10.5))
  // drops to 2.0: sNeg climbs 7.00 each (10 - 2 - 1), crossing on the 3rd
  private val falling = (1L to 4L).map(i => ev("c", i + 20, 2.0))

  test("alerts at the first crossing, correct side and integer stat") {
    val got = run("cusum_basic", Seq(drifting ++ steady ++ falling))
    assert(got.map(a => (a.event_type, a.event_id, a.side, a.stat)) == Seq(
      ("a", 4L, "up", 2400L),     // 4 * 6.00 cents over threshold 20.00
      ("c", 23L, "down", 2100L))) // 3 * 7.00
  }

  test("reset-and-re-arm: a sustained shift alerts once per fresh climb") {
    // after the reset at event 4, events 5..8 climb 6.00 each again ->
    // second alert at event 8
    val sustained = (1L to 8L).map(i => ev("a", i, 17.0))
    val got = run("cusum_rearm", Seq(sustained))
    assert(got.map(_.event_id) == Seq(4L, 8L))
    assert(got.map(_.stat).forall(_ == 2400L))
  }

  test("alert set is invariant to micro-batch slicing (replay determinism)") {
    val all = drifting ++ steady ++ falling
    val oneBatch = run("cusum_one", Seq(all))
    val perEvent = run("cusum_many", all.map(Seq(_)))
    val uneven = run("cusum_uneven", Seq(all.take(3), all.slice(3, 4), all.drop(4)))
    assert(oneBatch == perEvent)
    assert(oneBatch == uneven)
  }
}
