package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** The learned-tokenizer SHIPPING seam: a training job persists its merge
  * table (the merges.txt equivalent) and every downstream encode job
  * reloads it — so the persisted artifact must reproduce the in-memory
  * table and the encodings exactly.
  */
class BpeStoreSpec extends SparkSpec {

  test("learned merge table survives a store-and-reload round trip, encodings identical") {
    val hist = Tables.load(spark, sf001, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = BpeTrainer.train(hist, 12)
    assert(merges.size == 12)

    val dir = graft.sources.Scratch.tempDir("graft_bpe_store")
    BpeTrainer.writeMerges(spark, s"$dir/merges", merges)
    val reloaded = BpeTrainer.loadMerges(spark, s"$dir/merges")
    assert(reloaded == merges.map(m => (m._2, m._3)).toIndexedSeq,
      "reloaded table must be rank-identical to the trained one")

    // encoding through the reloaded table is bit-identical to the
    // in-memory one on every training word
    val c1 = new BpeCodec(merges.map(m => (m._2, m._3)).toIndexedSeq)
    val c2 = new BpeCodec(reloaded)
    hist.map(_._1).distinct.foreach { w =>
      val (o1, o2) = (ArrayBuffer.empty[String], ArrayBuffer.empty[String])
      c1.encodeWord(w, o1); c2.encodeWord(w, o2)
      assert(o1 == o2, s"encode mismatch for '$w'")
    }
  }

  test("BYTE-LEVEL learned table ships: byte/digit merges survive the round trip") {
    // the round-11 trainer's alphabet includes <0xNN> byte tokens and
    // digits — the shipping seam must carry THOSE merges too, and the
    // reloaded table must reproduce full-charset encodings exactly
    def unitToks(u: String): IndexedSeq[String] =
      if (u.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        u.map(String.valueOf)
      else u.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"<0x${b & 0xff}%02X>").toIndexedSeq
    val hist: Seq[(IndexedSeq[String], Long)] = Seq(
      ("42", 50L), ("100", 50L), ("é", 50L), ("—", 50L),
      ("qty", 30L), ("table", 8L)
    ).map { case (u, c) => (unitToks(u), c) }
    val merges = BpeTrainer.trainUnits(hist, 8)
    assert(merges.exists(m => !(m._2 + m._3).forall(c => c >= 'a' && c <= 'z')),
      "fixture must learn a non-letter merge")
    val dir = graft.sources.Scratch.tempDir("graft_bpe_store_full")
    BpeTrainer.writeMerges(spark, s"$dir/merges", merges)
    val reloaded = BpeTrainer.loadMerges(spark, s"$dir/merges")
    assert(reloaded == merges.map(m => (m._2, m._3)).toIndexedSeq)
    val c1 = new BpeCodec(merges.map(m => (m._2, m._3)).toIndexedSeq)
    val c2 = new BpeCodec(reloaded)
    for (text <- Seq("Qty:42, 100% — é", "naïve café", "table 42")) {
      val (o1, o2) = (ArrayBuffer.empty[String], ArrayBuffer.empty[String])
      c1.encodeDocFull(text, o1); c2.encodeDocFull(text, o2)
      assert(o1 == o2, s"full-charset encode mismatch for '$text'")
    }
  }
}
