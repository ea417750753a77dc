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
}
