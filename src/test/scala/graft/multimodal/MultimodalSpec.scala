package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table keeps payloads as binary with typed kind column") {
    val m = Multimodal.mediaTable(spark, sf0001)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("batched decode produces one typed meta row per media row") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val metas = Multimodal.decodeBatched(m, batchSize = 32)
    assert(metas.count() == m.count())
    val sample = metas.filter(_.kind == "video").head()
    assert(sample.frames.nonEmpty && sample.frames.size <= 4)
    assert(sample.width >= 16 && sample.duration_ms == sample.n_bytes * 40)
  }

  test("batched resize transforms binary payloads to the target budget") {
    val m = Multimodal.mediaTable(spark, sf0001)
    val resized = Multimodal.resizeBatched(m, w = 64, h = 32)
    assert(resized.count() == m.count())
    import org.apache.spark.sql.functions._
    val sizes = resized.select(octet_length(col("bytes"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(64 * 32 / 8))
  }

  test("decode is deterministic (stub contract for the oracle)") {
    val a = Multimodal.decodeStub(1L, "image", "hello".getBytes)
    val b = Multimodal.decodeStub(1L, "image", "hello".getBytes)
    assert(a == b && a.n_bytes == 5 && a.width == 21)
  }
}
