package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One per-source budget readout after a micro-batch folded in. */
case class TokenBudgetUpdate(
    source: String,
    batch_docs: Long,    // documents in this batch for this source
    batch_tokens: Long,  // subword tokens this batch contributed
    total_tokens: Long)  // running total since the stream began

/** Running SUBWORD-token budget per data source — the ingest-side
  * mixture governor: a training-data pipeline caps each source (web,
  * code, papers, ...) by TOKENS, not documents, and the budget must be
  * measured in the units the trainer consumes (the q_bpe_encode
  * rationale: whitespace counts misprice CJK/code/URL-heavy sources).
  *
  * Composition is the whole design: tokenization runs as the CODEGEN
  * BpeEncodeTokens expression upstream of the shuffle, so only
  * (source, n_tokens) longs reach the keyed state — the stream shuffles
  * 16 bytes per document, never text. State is ONE long per source
  * (O(sources), the smallest state in the engine); emission is one
  * update row per (source, batch), the feed a mixture controller (e.g.
  * PipelineOps' temperature mixing) reads to decide when a source's tap
  * closes. Totals are slicing-invariant (addition is associative) and
  * restart-exact (checkpointed state + replay overwrite) — both
  * spec-pinned in StreamingTokenBudgetSpec.
  */
class TokenBudgetProcessor
    extends StatefulProcessor[String, (String, Long), TokenBudgetUpdate] {

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[TokenBudgetUpdate] = {
    var docs = 0L
    var toks = 0L
    while (rows.hasNext) { val r = rows.next(); docs += 1L; toks += r._2 }
    val t = (if (total.exists()) total.get() else 0L) + toks
    total.update(t)
    Iterator.single(TokenBudgetUpdate(key, docs, toks, t))
  }
}

/** One admitted document (see StreamingTokenBudget.gate). */
case class AdmittedDoc(source: String, doc_id: Long, n_tokens: Long,
    total_after: Long)

/** The ENFORCEMENT half of the budget: admit documents while the
  * source's running subword total is under `cap`, drop everything after
  * — "admit while under", the standard budget-cap policy (the last
  * admitted doc may overshoot; a trainer clips, it never starves).
  * Admission order within a micro-batch is doc_id order, so the admitted
  * SET is a deterministic function of (arrival batching, state) — replay
  * of a batch re-admits exactly the same documents (checkpointed state +
  * the same fold order), which is what makes the gate exactly-once
  * against an idempotent sink. State: one long per source.
  */
class TokenBudgetGateProcessor(cap: Long)
    extends StatefulProcessor[String, (String, Long, Long), AdmittedDoc] {

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[AdmittedDoc] = {
    var t = if (total.exists()) total.get() else 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[AdmittedDoc]
    // deterministic within-batch order: doc_id (micro-batches are small
    // per key; the sort is in-memory over the group's rows only)
    for ((_, docId, n) <- rows.toArray.sortBy(_._2)) {
      if (t < cap) { t += n; out += AdmittedDoc(key, docId, n, t) }
    }
    total.update(t)
    out.iterator
  }
}

object StreamingTokenBudget {

  private def tokenCount(fullCharset: Boolean,
      exact: Boolean): org.apache.spark.sql.Column =
    (if (exact)
      size(graft.functions.BpeEncodeTokens.bpeTokensExact(col("text")))
    else if (fullCharset)
      size(graft.functions.BpeEncodeTokens.bpeTokensFull(col("text")))
    else
      size(graft.functions.BpeEncodeTokens.bpeTokens(col("text"))))
      .cast("long")

  /** Budget-gate a (source, doc_id, text) stream: emit only documents
    * admitted under the per-source subword cap. Tokenization is the
    * codegen expression upstream of the shuffle, as in apply().
    * `fullCharset = true` counts with the byte-fallback tokenizer
    * (BpeCodec.encodeDocFull) so digits/punctuation/non-Latin scripts
    * charge the budget instead of slipping past it — the production
    * setting for real web text; `exact = true` counts with the
    * ROUND-TRIP tokenizer (BpeCodec.encodeDocExact), the setting that
    * matches a pack built with bpeIdsExact (whitespace and case charge
    * the budget because they are in the shards).
    */
  def gate(docs: DataFrame, cap: Long,
      fullCharset: Boolean = false,
      exact: Boolean = false): Dataset[AdmittedDoc] = {
    implicit val tupleEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[AdmittedDoc]
    docs
      .select(col("source"), col("doc_id"),
        tokenCount(fullCharset, exact).as("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TokenBudgetGateProcessor(cap), TimeMode.None(),
        OutputMode.Append())
  }

  /** Wire a (source, text) document stream into per-source budget
    * tracking. Requires the RocksDB state store provider in production
    * (same contract as the other transformWithState jobs).
    * `fullCharset` / `exact` as in [[gate]].
    */
  def apply(docs: DataFrame,
      fullCharset: Boolean = false,
      exact: Boolean = false): Dataset[TokenBudgetUpdate] = {
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[TokenBudgetUpdate]
    docs
      .select(col("source"),
        tokenCount(fullCharset, exact).as("n"))
      .as[(String, Long)]
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TokenBudgetProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
