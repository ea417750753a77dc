package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Streaming eval-set decontamination — the ingest-side deployment of
  * ops.PipelineOps.decontaminate (q_decontaminate), in the
  * StreamingNbFilter shape: the eval benchmark set is shingled OFFLINE
  * into a tiny inverted artifact (shingle hash → eval doc ids), ships to
  * the stream in the closure (a Spark broadcast under the hood), and
  * every incoming document is gated by a pure per-row map — no
  * stream-static join, no streaming aggregate, no state, so the filter
  * runs at input bandwidth and composes in front of
  * CurationIngestJob.curate exactly where a lab runs its test-set-leak
  * check (before any training artifact is cut).
  *
  * Exactness: the per-row shingler IS the batch side's
  * functions.WordShingleHashes.compute (same distinct 3-word windows,
  * same whole-text fallback for short docs, same seed-42 XXH64 over the
  * same byte slices), and the overlap statistic is the same
  * max-over-eval-docs distinct-shingle count q_decontaminate computes —
  * so a streamed document's verdict is BIT-EQUAL to the batch query's
  * under any micro-batch slicing (no state means slicing can't matter;
  * StreamingDecontaminateSpec pins the corpus-wide equality).
  *
  * Scale: the artifact is O(eval shingles) — eval sets are thousands of
  * docs, so the index is MBs against a 100 TB stream; the stream side
  * touches each document once, in one codegen-comparable tight loop.
  */
object StreamingDecontaminate {

  final case class GatedDoc(doc_id: Long, text: String, source: String,
      max_overlap: Long, n_eval_hits: Long, admitted: Boolean)

  /** Build the shippable eval artifact batch-side: distinct
    * (shingle hash → sorted eval doc ids). Runs ops.TextDedup.shingled
    * (the codegen expression), so stream and batch hash identically by
    * construction.
    */
  def evalIndex(evalDocs: DataFrame): Map[Long, Array[Long]] =
    graft.ops.TextDedup.shingled(evalDocs)
      .select(explode(col("hs")).as("sh"), col("doc_id"))
      .distinct()
      .collect()
      .groupBy(_.getLong(0))
      .map { case (h, rows) => h -> rows.map(_.getLong(1)).sorted }

  /** Gate a stream (or batch) of documents: admitted = no single eval
    * doc shares >= `minOverlap` distinct shingles with the document.
    * Emits the verdict AND the evidence (max overlap, how many eval docs
    * hit at all) so a downstream lake keeps the audit trail.
    */
  def apply(docs: Dataset[CurationIngestJob.IncomingDoc],
      index: Map[Long, Array[Long]],
      minOverlap: Long): Dataset[GatedDoc] = {
    implicit val enc = Encoders.product[GatedDoc]
    docs.map { d =>
      val hs = graft.functions.WordShingleHashes
        .compute(UTF8String.fromString(d.text), 3, 42L).toLongArray()
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      var i = 0
      while (i < hs.length) {
        val evs = index.getOrElse(hs(i), null)
        if (evs != null) {
          var j = 0
          while (j < evs.length) {
            counts.merge(evs(j), java.lang.Long.valueOf(1L),
              (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
            j += 1
          }
        }
        i += 1
      }
      var maxC = 0L
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next().longValue; if (c > maxC) maxC = c }
      GatedDoc(d.doc_id, d.text, d.source, maxC, counts.size().toLong,
        admitted = maxC < minOverlap)
    }
  }
}
