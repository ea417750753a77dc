package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import EwmaTws.{EwmaEvent, EwmaPoint}

class EwmaTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(u: Long, sec: Int, id: Long, v: Double) =
    EwmaEvent(u, new Timestamp(1700000000000L + sec * 1000L), id, v)

  test("unbounded recurrence carries across batches; per-key; batch-sorted by event time") {
    withRocksDBStateStore {
      val in = MemoryStream[EwmaEvent]
      val q = EwmaTws(in.toDS(), alpha = 0.5)
        .writeStream.format("memory").queryName("ewma_out")
        .outputMode(OutputMode.Append).start()
      // batch 1 arrives OUT of event order: must fold as id 1 then 2
      in.addData(ev(1, 20, 2L, 8.0), ev(1, 10, 1L, 4.0), ev(9, 10, 3L, 100.0))
      q.processAllAvailable()
      // batch 2 continues from the carried state (6.0), not from scratch
      in.addData(ev(1, 30, 4L, 10.0))
      q.processAllAvailable()
      val got = spark.table("ewma_out").as[EwmaPoint].collect()
        .sortBy(_.event_id).toSeq
      q.stop()
      // u1: seed 4.0; then .5*8+.5*4 = 6.0; then .5*10+.5*6 = 8.0
      // u9: independent seed 100.0
      assert(got == Seq(
        EwmaPoint(1, 1L, 4.0), EwmaPoint(1, 2L, 6.0), EwmaPoint(9, 3L, 100.0),
        EwmaPoint(1, 4L, 8.0)),
        s"got $got")
    }
  }
}
