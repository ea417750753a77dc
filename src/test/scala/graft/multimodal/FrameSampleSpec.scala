package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrameSampleSpec extends SparkSpec {

  test("frame sampling explodes each video into 4 deterministic frames") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val frames = Multimodal.frameSampleBatched(m, batchSize = 16)
    val nVideos = m.filter(col("kind") === "video" && octet_length(col("bytes")) > 0).count()
    assert(frames.count() == nVideos * 4)
    // schedule matches the stub decode: ts = idx * 10 * n_bytes
    val joined = frames.join(
      m.select(col("media_id"), octet_length(col("bytes")).cast("long").as("nb")), "media_id")
    assert(joined.filter(col("frame_ts_ms") =!= col("frame_idx") * col("nb") * 10).count() == 0)
    // frame payloads partition the source bytes (stub slices are disjoint and cover)
    val sums = joined.groupBy(col("media_id"), col("nb"))
      .agg(sum(octet_length(col("frame_bytes"))).as("fb"))
    assert(sums.filter(col("fb") =!= col("nb")).count() == 0)
    // deterministic across runs
    val again = Multimodal.frameSampleBatched(m, batchSize = 7)
    assert(frames.exceptAll(again).count() == 0 && again.exceptAll(frames).count() == 0)
  }
}
