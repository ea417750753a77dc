package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming application of the batch CCNet perplexity gate
  * (ops.PipelineOps.ccnetBuckets / q_ccnet_buckets) — the deployment
  * shape CCNet itself ships: the LM and the per-language bucket CUTOFFS
  * are computed OFFLINE on a snapshot, then ride the closure to the
  * ingest stream, which scores and buckets every incoming document as a
  * pure per-row map. No stream-static join, no streaming aggregate, no
  * state — input-bandwidth, composes in front of
  * CurationIngestJob.curate next to StreamingNbFilter.
  *
  * Exactness: the vocab nll lattice is DECIMAL(24,9) shipped as
  * fixed-point NANOS longs (the StreamingNbFilter discipline); a doc's
  * sum is long arithmetic, and avgNll = (sumNanos / 1e9) / n — both
  * divisions correctly rounded on exact operands — is BIT-EQUAL to the
  * batch `sum(decimal).cast(double) / count`, under any micro-batch
  * slicing (spec-pinned corpus-wide).
  *
  * Bucketing: a stream cannot rank, so the artifact carries the batch
  * pass's per-language boundary VALUES (the worst head avg_nll and the
  * worst middle avg_nll); the stream assigns head iff avg ≤ q33 etc.
  * On the batch snapshot this reproduces the rank buckets exactly
  * except for documents that TIE a boundary value from below the rank
  * line (the stream assigns the better bucket on equality — the
  * conservative direction for a keep-head+middle gate); the spec
  * replays the tie set and pins agreement everywhere else. Tokens
  * absent from the LM vocabulary contribute nothing on either path
  * (the batch inner join drops them identically); a document with zero
  * known tokens is `unscorable` with avg_nll = NaN (the engine's
  * null/zero-norm convention).
  */
object StreamingCcnetFilter {

  final case class LangDoc(doc_id: Long, text: String, lang: String)
  final case class BucketedDoc(doc_id: Long, lang: String, n_known: Long,
      avg_nll: Double, bucket: String)

  /** Per-language (q33, q66) boundary values; a language missing from
    * the map (unseen at artifact-build time) buckets every doc `tail` —
    * the conservative gate for unknown languages.
    */
  final case class Cutoffs(byLang: Map[String, (Double, Double)])

  def score(text: String, nllNanos: Map[String, Long]): (Long, Long) = {
    var n = 0L; var s = 0L
    val toks = text.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) nllNanos.get(toks(i)).foreach { v => n += 1; s += v }
      i += 1
    }
    (n, s)
  }

  def bucketOf(avg: Double, c: Option[(Double, Double)]): String = c match {
    case None => "tail"
    case Some((q33, q66)) =>
      if (avg <= q33) "head" else if (avg <= q66) "middle" else "tail"
  }

  /** The streaming transform: score + bucket every incoming document.
    * Pure map — works on batch and streaming Datasets alike.
    */
  def apply(docs: Dataset[LangDoc], nllNanos: Map[String, Long],
      cutoffs: Cutoffs): Dataset[BucketedDoc] = {
    implicit val enc = Encoders.product[BucketedDoc]
    docs.map { d =>
      val (n, s) = score(d.text, nllNanos)
      if (n == 0L) BucketedDoc(d.doc_id, d.lang, 0L, Double.NaN, "unscorable")
      else {
        val avg = (s.toDouble / 1e9) / n
        BucketedDoc(d.doc_id, d.lang, n, avg,
          bucketOf(avg, cutoffs.byLang.get(d.lang)))
      }
    }
  }
}
