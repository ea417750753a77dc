package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamingTopK.{TopKEvent, TopKEstimate}

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("space-saving summary: capacity bound, overestimates within err <= N/m, heavy hitters never lost") {
    withRocksDBStateStore {
      val capacity = 5
      val in = MemoryStream[TopKEvent]
      val q = StreamingTopK(in.toDS(), capacity)
        .writeStream.format("memory").queryName("sstopk_out")
        .outputMode(OutputMode.Append).start()

      // skewed stream: a=50, b=30, c=20 + 20 distinct singletons, split
      // across two micro-batches so the summary must carry state
      def occ(item: String, k: Int) = Seq.fill(k)(TopKEvent("g", item))
      val noise1 = (1 to 10).map(i => TopKEvent("g", s"n$i"))
      val noise2 = (11 to 20).map(i => TopKEvent("g", s"n$i"))
      in.addData(occ("a", 30) ++ occ("b", 10) ++ noise1 ++ occ("c", 5): _*)
      q.processAllAvailable()
      in.addData(occ("a", 20) ++ occ("b", 20) ++ noise2 ++ occ("c", 15): _*)
      q.processAllAvailable()
      val all = spark.table("sstopk_out").as[TopKEstimate].collect()
      q.stop()

      // the key's LATEST summary = rows tagged with the max n_seen
      val nTotal = all.map(_.n_seen).max
      assert(nTotal == 120L, s"expected 120 rows folded, got $nTotal")
      val last = all.filter(_.n_seen == nTotal)
      val truth = Map("a" -> 50L, "b" -> 30L, "c" -> 20L) ++
        (1 to 20).map(i => s"n$i" -> 1L)

      // capacity bound: never more than m tracked counters
      assert(last.length <= capacity, s"summary exceeded capacity: ${last.toSeq}")
      // space-saving guarantee: true <= est <= true + err, err <= N/m
      val maxErr = nTotal / capacity
      last.foreach { e =>
        val t = truth.getOrElse(e.item, 0L)
        assert(e.est >= t && e.est <= t + e.err, s"estimate out of range: $e (true=$t)")
        assert(e.err <= maxErr, s"err above N/m bound: $e")
      }
      // any item with true frequency > N/m (=24) must be tracked
      truth.filter(_._2 > maxErr).keys.foreach { hh =>
        assert(last.exists(_.item == hh), s"heavy hitter $hh lost: ${last.toSeq}")
      }
      // and the top-2 by estimate are the two genuine heavy hitters
      val top2 = last.sortBy(e => (-e.est, e.item)).take(2).map(_.item).toSet
      assert(top2 == Set("a", "b"), s"top-2 wrong: ${last.toSeq}")
    }
  }

  test("summaries are independent per group key") {
    withRocksDBStateStore {
      val in = MemoryStream[TopKEvent]
      val q = StreamingTopK(in.toDS(), 3)
        .writeStream.format("memory").queryName("sstopk_groups")
        .outputMode(OutputMode.Append).start()
      in.addData(TopKEvent("x", "i"), TopKEvent("x", "i"), TopKEvent("y", "j"))
      q.processAllAvailable()
      val got = spark.table("sstopk_groups").as[TopKEstimate].collect()
      q.stop()
      assert(got.toSet == Set(
        TopKEstimate("x", "i", 2L, 0L, 2L), TopKEstimate("y", "j", 1L, 0L, 1L)),
        s"got ${got.toSeq}")
    }
  }
}
