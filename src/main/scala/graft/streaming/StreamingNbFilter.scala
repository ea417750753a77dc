package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming application of the batch-trained Naive-Bayes quality filter
  * (ops.CorpusOps q_nb_train) — the production CCNet/fastText deployment
  * shape: the model trains OFFLINE on a labeled snapshot, then ships to
  * the ingest stream as an in-memory artifact and scores every incoming
  * document as a pure per-row map. No stream-static join, no streaming
  * aggregate, no state: the vocab-sized llr table rides the closure to
  * executors (a Spark broadcast under the hood), so the filter streams
  * at input bandwidth and composes in front of CurationIngestJob.curate
  * exactly where its fixed-weight linear gate sits.
  *
  * Exactness: scoring runs in FIXED-POINT NANOS — the model's
  * DECIMAL(24,9) llr lattice as longs (CorpusOps.nbModelNanos), summed
  * per token occurrence in long arithmetic (Σ_occurrences llr(tok) ==
  * Σ_distinct tf·llr, and the exact-decimal batch sum is by construction
  * on the same lattice) — so a streamed document's score is BIT-EQUAL to
  * q_nb_score's, under any micro-batch slicing, with no double
  * accumulation order to worry about. StreamingNbFilterSpec pins the
  * equality corpus-wide.
  *
  * Tokenization mirrors the batch side's `split(text, ' ')` + drop-empty
  * (ops.CorpusOps.tokens): Java split with limit -1 on the same single
  * space, empties filtered.
  */
object StreamingNbFilter {

  final case class ScoredDoc(doc_id: Long, text: String, source: String,
      score_nanos: Long, pred_curated: Boolean)

  /** Score in nanos: prior + Σ tokens llr(token); unknown tokens carry 0
    * (the batch scorer's inner join drops them identically — a term
    * absent from the model contributes no llr on either path).
    */
  def scoreNanos(text: String, llrNanos: Map[String, Long],
      priorNanos: Long): Long = {
    var s = priorNanos
    val toks = text.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) s += llrNanos.getOrElse(toks(i), 0L)
      i += 1
    }
    s
  }

  /** The streaming transform: score each document, flag those STRICTLY
    * above `thresholdNanos` (default 0: `score > 0`, exactly q_nb_score's
    * pred_curated). One deliberate difference from the batch query's
    * shape: a document with zero model-vocabulary terms is scored
    * prior-only here (every token contributes 0), whereas q_nb_score's
    * inner join omits such documents from its output entirely — the
    * streaming filter must emit a verdict for every document. Pure
    * map+filter — works on batch and streaming Datasets alike.
    */
  def apply(docs: Dataset[CurationIngestJob.IncomingDoc],
      llrNanos: Map[String, Long], priorNanos: Long,
      thresholdNanos: Long = 0L): Dataset[ScoredDoc] = {
    implicit val enc = Encoders.product[ScoredDoc]
    docs.map { d =>
      val s = scoreNanos(d.text, llrNanos, priorNanos)
      ScoredDoc(d.doc_id, d.text, d.source, s, s > thresholdNanos)
    }.filter(_.score_nanos > thresholdNanos)
  }
}
