package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Streaming SEMANTIC decontamination — the ingest-side deployment of
  * ops.Similarity.semanticDecontaminate (q_decontaminate_semantic), in
  * the StreamingDecontaminate shape: the eval suite's embeddings are
  * collected OFFLINE into a tiny artifact ((eval_id, vector, norm)
  * rows, eval sets are thousands of vectors — MBs against a 100 TB
  * stream), ship to the stream in the closure (a Spark broadcast under
  * the hood), and every incoming vector is scored by a pure per-row
  * map — no stream-static join, no streaming aggregate, no state, so
  * the gate runs at input bandwidth and composes in front of the
  * curation/ingest jobs exactly where a lab screens paraphrased eval
  * leakage that the n-gram gate (StreamingDecontaminate) cannot see.
  *
  * Exactness: the per-row fold is the SAME index-ordered
  * double-promoted dot product as the batch side's codegen
  * FloatDotProduct (IEEE multiplication is commutative, summation
  * order is index order on both sides), norms divide in the same
  * (eval_norm * train_norm) order, and the argmax scans eval vectors
  * in ascending id order with a strict `>` — the batch
  * max(struct(cosine, -eval_id)) lower-id tie rule. A streamed
  * vector's verdict is therefore BIT-EQUAL to the batch query's row
  * under any micro-batch slicing (no state means slicing can't
  * matter; StreamingSemanticDecontaminateSpec pins corpus-wide
  * equality and the slicing invariance). Null and zero-norm vectors
  * are never flagged (cosine against a zero vector is NaN — the same
  * guard as the batch legs). For a FAT eval suite the stored-IVF form
  * (sources.VectorIndexStore.semanticDecontaminate) is the batch-side
  * scale path; the streaming artifact stays the broadcast form because
  * the stream touches each vector once either way.
  */
object StreamingSemanticDecontaminate {

  final case class IncomingVec(vec_id: Long, embedding: Array[Float])
  final case class ScoredVec(vec_id: Long, best_eval_id: Long,
      best_cosine: Double, flagged: Boolean)

  /** The batch side's FloatDotProduct fold, verbatim: index-ordered,
    * each float pair promoted to double before the multiply.
    */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Build the shippable eval artifact batch-side: the eval split
    * (vec_id % 97 == 0, the family convention), nulls and zero-norm
    * vectors excluded, sorted by id so the stream-side argmax scan's
    * first-max rule IS the lower-id tie rule.
    */
  def evalIndex(emb: DataFrame): Array[(Long, Array[Float], Double)] =
    emb.filter(col("vec_id") % 97 === 0 && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
      .filter(_._3 > 0)
      .sortBy(_._1)

  /** Score a stream (or batch) of vectors: flagged = cosine to SOME
    * eval vector reaches `minCos`, with the best-matching eval id and
    * cosine as evidence (the batch row's exact columns). Unscorable
    * vectors (null / zero-norm) emit best_eval_id = -1, unflagged.
    */
  def apply(vecs: Dataset[IncomingVec],
      index: Array[(Long, Array[Float], Double)],
      minCos: Double): Dataset[ScoredVec] = {
    implicit val enc = Encoders.product[ScoredVec]
    vecs.map { v =>
      if (v.embedding == null) ScoredVec(v.vec_id, -1L, Double.NaN, flagged = false)
      else {
        val n = math.sqrt(dot(v.embedding, v.embedding))
        // an empty eval index scores nothing: same unscorable convention
        // as null/zero-norm rows (NOT -Infinity/-1 from an empty scan),
        // so "every scorable vector names its nearest eval point" holds
        if (!(n > 0) || index.isEmpty)
          ScoredVec(v.vec_id, -1L, Double.NaN, flagged = false)
        else {
          var bestC = Double.NegativeInfinity
          var bestId = -1L
          var i = 0
          while (i < index.length) {
            val (eid, ev, en) = index(i)
            val c = dot(ev, v.embedding) / (en * n)
            if (c > bestC) { bestC = c; bestId = eid }
            i += 1
          }
          ScoredVec(v.vec_id, bestId, bestC, flagged = bestC >= minCos)
        }
      }
    }
  }
}
