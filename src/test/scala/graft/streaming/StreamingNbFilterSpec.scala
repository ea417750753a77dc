package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The batch-trained-model → streaming-scorer seam: a document scored at
  * ingest must get EXACTLY the score the batch q_nb_score assigns it —
  * fixed-point nanos on the model's DECIMAL(24,9) lattice, so there is
  * no accumulation-order tolerance to hide behind — under any
  * micro-batch slicing.
  */
class StreamingNbFilterSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed scores bit-equal batch q_nb_score; slicing-invariant; gate keeps pred set") {
    val (llr, prior) = graft.ops.CorpusOps.nbModelNanos(spark, sf001)
    assert(llr.nonEmpty && llr.values.exists(_ != 0L))

    // batch truth: q_nb_score on the same corpus (score is the DOUBLE
    // image of the decimal; rebuild the exact nanos from the same lattice)
    val batch = graft.SparkEntry.queries("q_nb_score")(spark, sf001)
      .select(col("doc_id"), col("score"), col("pred_curated"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap

    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[CurationIngestJob.IncomingDoc].collect().toSeq

    // streaming, sliced three arbitrary ways
    val in = MemoryStream[CurationIngestJob.IncomingDoc]
    val scored = StreamingNbFilter(in.toDS(), llr, prior,
      thresholdNanos = Long.MinValue) // keep all: we compare scores first
    val q = scored.writeStream.format("memory").queryName("nb_scored")
      .outputMode("append").start()
    in.addData(docs.take(100): _*); q.processAllAvailable()
    in.addData(docs.slice(100, 350): _*); q.processAllAvailable()
    in.addData(docs.drop(350): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("nb_scored")
      .as[StreamingNbFilter.ScoredDoc].collect()
    assert(streamed.length == docs.length, "keep-all threshold must pass every doc")
    streamed.foreach { d =>
      val (bScore, bPred) = batch(d.doc_id)
      // nanos -> the same double the batch decimal cast produces
      val asDouble = BigDecimal(d.score_nanos, 9).toDouble
      assert(asDouble == bScore,
        s"doc ${d.doc_id}: streamed ${asDouble} != batch $bScore")
      assert((d.score_nanos > 0L) == bPred,
        s"doc ${d.doc_id}: decision rule diverged")
    }

    // and the default gate keeps exactly the batch pred_curated set
    val kept = StreamingNbFilter(docs.toDS(), llr, prior)
      .collect().map(_.doc_id).toSet
    val expected = batch.collect { case (id, (_, true)) => id }.toSet
    assert(kept == expected, s"gate kept ${kept.size}, batch predicted ${expected.size}")
  }
}
