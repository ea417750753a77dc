package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.model.NewsArticle

/** The D1 monotone high-watermark dedup on Spark 4's transformWithState —
  * the successor API to flatMapGroupsWithState (SPARK-46815): typed state
  * variables from a handle, explicit TimeMode, optional per-state TTL,
  * RocksDB-backed. Semantics are EXACTLY HighWatermarkDedup's (same
  * dedupBatch core, shared by both operators and their specs):
  * batch-sorted emit of ids above the per-symbol watermark, null-id
  * bypass, state advancing only at batch end.
  *
  * Why both operators exist: flatMapGroupsWithState is the stable classic
  * API; transformWithState adds per-state TTL, timers, and multiple state
  * variables per key — the features a production dedup grows into
  * (e.g. expiring a symbol's watermark after 30 idle days is ONE
  * TTLConfig argument here, vs manual timeout bookkeeping there).
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * ...RocksDBStateStoreProvider).
  */
class HighWatermarkDedupProcessor(initial: Long)
    extends StatefulProcessor[String, NewsArticle, NewsArticle] {

  @transient private var watermark: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    watermark = getHandle.getValueState[Long]("watermark",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(symbol: String, rows: Iterator[NewsArticle],
      timerValues: TimerValues): Iterator[NewsArticle] = {
    val lastSeen = if (watermark.exists()) watermark.get() else initial
    val (batchMax, out) = HighWatermarkDedup.dedupBatch(lastSeen, rows.toSeq)
    if (batchMax != lastSeen) watermark.update(batchMax)
    out.iterator
  }
}

object HighWatermarkDedupTws {

  def apply(articles: Dataset[NewsArticle],
      initialWatermark: Long = HighWatermarkDedup.DefaultInitialWatermark): Dataset[NewsArticle] = {
    implicit val enc: Encoder[NewsArticle] = Encoders.product[NewsArticle]
    articles
      .groupByKey(_.symbol)(Encoders.STRING)
      .transformWithState(new HighWatermarkDedupProcessor(initialWatermark),
        TimeMode.None(), OutputMode.Append())
  }
}
