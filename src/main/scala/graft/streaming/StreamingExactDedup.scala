package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming exact dedup for a corpus-ingest pipeline: keyed by a 64-bit
  * content hash, emit the FIRST occurrence of each key ever seen and drop
  * every later one — `dropDuplicates` semantics, but on the
  * transformWithState API where the state is an explicit, inspectable
  * variable with an optional per-state TTL (a crawl that may legitimately
  * re-admit a document after N idle days is ONE TTLConfig argument;
  * dropDuplicates state without a watermark never expires at all).
  *
  * Scale: state is one boolean per DISTINCT content hash — the same
  * footprint dropDuplicates keeps, RocksDB-backed so it spills past the
  * heap; the stream shuffles once on the 8-byte hash, never on the
  * document body (callers key by `xxhash64(text)` — collisions at 10^9
  * docs are ~1e-2 per corpus under the birthday bound, acceptable for
  * dedup where a false drop costs one document; chain two independent
  * hashes into the key if that is not).
  *
  * Within one micro-batch the first row of a key wins and the rest are
  * duplicates by definition (exact content equality), so emit order
  * inside the batch is irrelevant.
  */
class FirstSeenProcessor[K, T](ttl: TTLConfig)
    extends StatefulProcessor[K, T, T] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)

  override def handleInputRows(key: K, rows: Iterator[T],
      timerValues: TimerValues): Iterator[T] =
    if (seen.exists()) Iterator.empty
    else {
      seen.update(true)
      // first row only: the rest of the group is byte-identical content
      if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
    }
}

object StreamingExactDedup {

  /** Dedup `ds` on `contentKey` (first occurrence wins, forever — or for
    * the TTL, under TimeMode.ProcessingTime). Requires the RocksDB state
    * store provider for production state sizes.
    *
    * Operational note for the TTL path: a TimeMode.ProcessingTime query
    * schedules micro-batches to process expirations even with no input,
    * so run it under a real ProcessingTime trigger (not interval 0, and
    * don't wait on processAllAvailable — it never settles once a TTL
    * deadline is due). StateTelemetrySpec pins the contract: expired
    * keys leave numRowsTotal and their documents re-admit.
    */
  def apply[T: Encoder](ds: Dataset[T], contentKey: T => Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[T] = {
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(contentKey)(Encoders.scalaLong)
      .transformWithState(new FirstSeenProcessor[Long, T](ttl), timeMode,
        OutputMode.Append())
  }

  /** 128-bit-key variant: two independent-seed hashes as the state key.
    * At 10^10 documents the 64-bit key expects millions of birthday
    * collisions (each silently dropping a distinct document); a 128-bit
    * composite pushes the expected collision count to ~10^-18 — the
    * right default when the caller cannot afford ANY false drop and an
    * exact-verify pass (the q_dedup_incremental anti-join) is not in
    * the loop.
    */
  def apply128[T: Encoder](ds: Dataset[T], contentKey: T => (Long, Long),
      ttl: TTLConfig = TTLConfig.NONE): Dataset[T] = {
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(contentKey)(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .transformWithState(new FirstSeenProcessor[(Long, Long), T](ttl), timeMode,
        OutputMode.Append())
  }
}
