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

object StreamingTokenBudget {

  /** Wire a (source, text) document stream into per-source budget
    * tracking. Requires the RocksDB state store provider in production
    * (same contract as the other transformWithState jobs).
    */
  def apply(docs: DataFrame): Dataset[TokenBudgetUpdate] = {
    val s = docs.sparkSession
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[TokenBudgetUpdate]
    docs
      .select(col("source"),
        size(graft.functions.BpeEncodeTokens.bpeTokens(col("text")))
          .cast("long").as("n"))
      .as[(String, Long)]
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TokenBudgetProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
