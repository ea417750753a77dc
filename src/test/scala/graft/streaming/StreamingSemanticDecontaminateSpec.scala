package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The batch-built-artifact → streaming-gate seam for SEMANTIC eval
  * decontamination: a vector scored at ingest must get EXACTLY the row
  * the batch q_decontaminate_semantic assigns it — same best eval id,
  * bitwise-same best cosine — under any micro-batch slicing (the gate
  * is stateless), with null/zero-norm vectors never flagged.
  */
class StreamingSemanticDecontaminateSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed flags bit-equal batch semanticDecontaminate; slicing-invariant; NaN guard holds") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val idx = StreamingSemanticDecontaminate.evalIndex(emb)
    assert(idx.nonEmpty && idx.map(_._1).toSeq == idx.map(_._1).toSeq.sorted)

    val batch = graft.ops.Similarity.semanticDecontaminate(spark, emb, 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(batch.nonEmpty)

    val train = emb.filter(col("vec_id") % 97 =!= 0 && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
      .as[StreamingSemanticDecontaminate.IncomingVec].collect().toSeq

    val in = MemoryStream[StreamingSemanticDecontaminate.IncomingVec]
    val scored = StreamingSemanticDecontaminate(in.toDS(), idx, minCos = 0.3)
    val q = scored.writeStream.format("memory").queryName("sem_gated")
      .outputMode("append").start()
    // three uneven slices — stateless, so slicing must not matter
    in.addData(train.take(37): _*); q.processAllAvailable()
    in.addData(train.slice(37, 301): _*); q.processAllAvailable()
    in.addData(train.drop(301): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sem_gated")
      .as[StreamingSemanticDecontaminate.ScoredVec].collect()
    assert(streamed.length == train.length, "one verdict per vector")
    streamed.foreach { s =>
      batch.get(s.vec_id) match {
        case Some((eid, c)) =>
          assert(s.flagged, s"vec ${s.vec_id} flagged by batch but not streamed")
          assert(s.best_eval_id == eid && s.best_cosine == c,
            s"vec ${s.vec_id}: streamed (${s.best_eval_id}, ${s.best_cosine}) != batch ($eid, $c)")
        case None =>
          assert(!s.flagged, s"vec ${s.vec_id} not flagged by batch but streamed flags it")
      }
    }
    // the evidence rides even below threshold: every scorable vector
    // names its nearest eval point
    assert(streamed.forall(s => s.best_eval_id >= 0))
  }

  test("null and zero-norm vectors pass the gate unflagged") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val idx = StreamingSemanticDecontaminate.evalIndex(emb)
    val weird = Seq(
      StreamingSemanticDecontaminate.IncomingVec(1L, null),
      StreamingSemanticDecontaminate.IncomingVec(2L, Array.fill(64)(0f)))
    val in = MemoryStream[StreamingSemanticDecontaminate.IncomingVec]
    val q = StreamingSemanticDecontaminate(in.toDS(), idx, minCos = 0.3)
      .writeStream.format("memory").queryName("sem_weird")
      .outputMode("append").start()
    in.addData(weird: _*); q.processAllAvailable(); q.stop()
    val out = spark.table("sem_weird")
      .as[StreamingSemanticDecontaminate.ScoredVec].collect()
    assert(out.length == 2 && out.forall(s => !s.flagged && s.best_eval_id == -1L))
  }

  test("empty eval index: every vector is unscorable (NaN convention), never -Infinity") {
    val empty = Array.empty[(Long, Array[Float], Double)]
    val vecs = Seq(
      StreamingSemanticDecontaminate.IncomingVec(1L, Array.fill(64)(1f)),
      StreamingSemanticDecontaminate.IncomingVec(2L, Array.fill(64)(0.5f)))
    val in = MemoryStream[StreamingSemanticDecontaminate.IncomingVec]
    val q = StreamingSemanticDecontaminate(in.toDS(), empty, minCos = 0.3)
      .writeStream.format("memory").queryName("sem_empty")
      .outputMode("append").start()
    in.addData(vecs: _*); q.processAllAvailable(); q.stop()
    val out = spark.table("sem_empty")
      .as[StreamingSemanticDecontaminate.ScoredVec].collect()
    assert(out.length == 2 && out.forall(s =>
      !s.flagged && s.best_eval_id == -1L && s.best_cosine.isNaN),
      s"empty index must use the unscorable convention: ${out.toSeq}")
  }
}
