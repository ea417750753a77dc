package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.NewsArticle

/** The reference's D1 operator: per-symbol monotone high-watermark dedup
  * (ref producer_company_news.py:57,122-141,169-171), as
  * flatMapGroupsWithState keyed state.
  *
  * Exact semantics replicated (SURVEY.md §7.4):
  *  - batch sorted by (published_ts, news_id) ascending before filtering
  *    (O1, ref :107-120; missing keys sort as 0);
  *  - an article is emitted iff news_id > the per-symbol max seen in any
  *    PREVIOUS batch — a late id below the watermark is dropped even if
  *    never seen (monotone max, not a set; ref :133);
  *  - within one batch, duplicates of an id already emitted this batch are
  *    still emitted (state only advances at batch end, ref :169-171 —
  *    intra-batch duplicates rely on upstream order, which we reproduce);
  *  - a null news_id bypasses dedup and does NOT advance state (ref
  *    :128-131,140-141).
  *
  * State per key is a single Long — bounded regardless of stream length,
  * which is what makes this safe at 100 TB/day: checkpointed keyed state
  * grows with |symbols|, not |articles|. (Also fixes the reference's
  * acknowledged restart state-loss, producer_company_news.py:56, via the
  * checkpoint dir.)
  */
object HighWatermarkDedup {

  def dedupBatch(lastSeen: Long, batch: Seq[NewsArticle]): (Long, Seq[NewsArticle]) = {
    val sorted = batch.sortBy(a => (a.published_ts.map(_.getTime).getOrElse(0L),
      a.news_id.getOrElse(0L)))
    var batchMax = lastSeen
    val out = sorted.filter { a =>
      a.news_id match {
        case Some(id) =>
          if (id > lastSeen) { if (id > batchMax) batchMax = id; true }
          else false
        case None => true // bypasses dedup, never advances state
      }
    }
    (batchMax, out)
  }

  /** Reference initial state: `last_seen_news_ids.get(symbol, 0)`
    * (producer_company_news.py:133) — the watermark starts at 0, so an id
    * <= 0 is dropped even on a key's very first batch.
    */
  val DefaultInitialWatermark = 0L

  private def fn(initial: Long)(symbol: String, it: Iterator[NewsArticle],
      state: GroupState[Long]): Iterator[NewsArticle] = {
    val lastSeen = state.getOption.getOrElse(initial)
    // O1's batch sort requires materializing the group iterator (it.toSeq).
    // Memory bound = ONE key's slice of ONE micro-batch — fine under the
    // reference's ≤100-record batches; for arbitrary streams, bound the
    // trigger (maxFilesPerTrigger / maxOffsetsPerTrigger) so a pathological
    // hot key cannot make a single group executor-memory-sized.
    val (batchMax, out) = dedupBatch(lastSeen, it.toSeq)
    if (batchMax != lastSeen) state.update(batchMax)
    out.iterator
  }

  /** Works on both streaming and batch Datasets (batch = one micro-batch).
    * `initialWatermark` defaults to the reference's implicit 0; pass
    * Long.MinValue for "emit any first-seen id" semantics instead.
    */
  def apply(articles: Dataset[NewsArticle],
      initialWatermark: Long = DefaultInitialWatermark): Dataset[NewsArticle] = {
    implicit val enc: Encoder[NewsArticle] = Encoders.product[NewsArticle]
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    articles
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn(initialWatermark))
  }
}
