package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The batch-computed CCNet artifact → streaming perplexity gate seam:
  * a streamed document's avg_nll must be BIT-EQUAL to the batch
  * q_unigram_logprob value (fixed-point nanos lattice, no accumulation
  * order), and its value-threshold bucket must reproduce the batch
  * q_ccnet_buckets rank bucket everywhere except the replayed
  * boundary-tie set — under any micro-batch slicing.
  */
class StreamingCcnetFilterSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed avg_nll bit-equals batch; value buckets match rank buckets off the tie set") {
    val docsDf = Tables.load(spark, sf001, "documents")
    val (nll, cuts) = graft.ops.PipelineOps.ccnetArtifactNanos(spark, docsDf)
    assert(nll.nonEmpty && cuts.byLang.nonEmpty)

    val batchScore = graft.ops.PipelineOps.unigramLogprob(docsDf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batchBucket = graft.ops.PipelineOps.ccnetBuckets(docsDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3),
        r.getString(5))).map(t => t._1 -> t).toMap

    val docs = docsDf.select(col("doc_id"), col("text"), col("lang"))
      .as[StreamingCcnetFilter.LangDoc].collect().toSeq

    val in = MemoryStream[StreamingCcnetFilter.LangDoc]
    val out = StreamingCcnetFilter(in.toDS(), nll, cuts)
    val q = out.writeStream.format("memory").queryName("ccnet_stream")
      .outputMode("append").start()
    in.addData(docs.take(77): _*); q.processAllAvailable()
    in.addData(docs.slice(77, 300): _*); q.processAllAvailable()
    in.addData(docs.drop(300): _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("ccnet_stream").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toMap
    assert(got.size == docs.size)

    // 1. scores bit-equal the batch relation (every fixture doc scores)
    for ((id, (nTok, avg)) <- batchScore) {
      val (_, n, a, _) = got(id)
      assert(n == nTok && a == avg, s"doc $id: stream ($n, $a) vs batch ($nTok, $avg)")
    }

    // 2. buckets: the stream's value-threshold bucket must equal the
    // batch rank bucket except where a doc TIES a boundary value from
    // the wrong side of the rank line — replay that set exactly
    var ties = 0; var agree = 0
    for ((id, (lang, _, avg, b)) <- got) {
      val (q33, q66) = cuts.byLang(lang)
      val expectedValueBucket =
        if (avg <= q33) "head" else if (avg <= q66) "middle" else "tail"
      assert(b == expectedValueBucket, s"doc $id bucket replay")
      val rankB = batchBucket(id)._4
      if (b == rankB) agree += 1
      else {
        // only a boundary tie can disagree, and only toward the better bucket
        assert(avg == q33 || avg == q66, s"doc $id: $b vs rank $rankB at $avg")
        ties += 1
      }
    }
    assert(agree + ties == docs.size && agree > ties * 10,
      s"agree=$agree ties=$ties")

    // 3. an unknown-language / unknown-vocab doc takes the conservative path
    val alien = StreamingCcnetFilter.score("zzz qqq", nll)
    assert(alien._1 == 0L)
    assert(StreamingCcnetFilter.bucketOf(1.0, None) == "tail")
  }
}
