package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters via SPACE-SAVING (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT'05) —
  * the bounded-memory answer to "top items so far" over an unbounded
  * stream, where the exact groupBy(item).count() needs state linear in the
  * number of DISTINCT items ever seen. Per summary the state is a
  * fixed-capacity m counter table: a hit increments its counter; a miss on
  * a full table evicts the minimum counter and the newcomer INHERITS that
  * minimum as its overestimation error. Guarantees (per summary, N = rows
  * processed): every estimate ⊇ [true, true + err], err <= N/m, and any
  * item with true frequency > N/m is tracked — so the batch sibling
  * q_approx_topk's contract (exact when capacity >= domain) holds here
  * per micro-batch-stream.
  *
  * Scale shape: the stream shuffles ONCE on the summary key (e.g. a metric
  * domain, or a fixed shard id for a global top-k: space-saving summaries
  * merge, so S shards + a tiny batch merge give a global answer); state
  * per key is O(m) regardless of stream length or item cardinality —
  * RocksDB-backed, replay-deterministic (the fold order within a batch is
  * the batch iterator's order, and eviction ties break on item id).
  *
  * After each micro-batch every updated summary emits its current tracked
  * set tagged with `n_seen` (rows folded so far) — monotone per key, so a
  * downstream consumer (or spec) selects each key's latest summary as the
  * rows with max n_seen.
  */
object StreamingTopK {

  /** One observed item occurrence, keyed into a summary by `group`. */
  case class TopKEvent(group: String, item: String)

  /** One tracked counter of a summary: est ∈ [true, true+err]. */
  case class TopKEstimate(group: String, item: String, est: Long, err: Long,
      n_seen: Long)

  // NOT private: the state encoder's generated serializer calls these
  // accessors from emitted Java — `private` tripped a CompileException
  // ("No applicable constructor/method found ... Summary.n()") and dropped
  // the RocksDB state serde to Spark's interpreted fallback on every batch
  case class Entry(item: String, est: Long, err: Long)
  case class Summary(n: Long, entries: Seq[Entry])

  class SpaceSavingProcessor(capacity: Int)
      extends StatefulProcessor[String, TopKEvent, TopKEstimate] {

    @transient private var state: ValueState[Summary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Summary]("ss", Encoders.product[Summary],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TopKEvent],
        timerValues: TimerValues): Iterator[TopKEstimate] = {
      val prev = if (state.exists()) state.get() else Summary(0L, Nil)
      var n = prev.n
      // capacity is small (hundreds): a mutable map + linear min scan per
      // eviction keeps the fold simple and allocation-light
      val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      prev.entries.foreach(e => m(e.item) = (e.est, e.err))
      rows.foreach { r =>
        n += 1
        m.get(r.item) match {
          case Some((est, err)) => m(r.item) = (est + 1, err)
          case None if m.size < capacity => m(r.item) = (1L, 0L)
          case None =>
            // evict the minimum counter (ties: smallest item id, so the
            // fold is deterministic under replay); newcomer inherits it
            val (evictItem, (minEst, _)) =
              m.minBy { case (item, (est, _)) => (est, item) }
            m.remove(evictItem)
            m(r.item) = (minEst + 1, minEst)
        }
      }
      val entries = m.iterator.map { case (i, (est, err)) => Entry(i, est, err) }.toSeq
      state.update(Summary(n, entries))
      entries.iterator.map(e => TopKEstimate(key, e.item, e.est, e.err, n))
    }
  }

  /** Space-saving top-k summaries of `ds`, one per `group`, capacity `m`
    * counters each. Requires the RocksDB state-store provider.
    */
  def apply(ds: Dataset[TopKEvent], capacity: Int): Dataset[TopKEstimate] =
    ds.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new SpaceSavingProcessor(capacity), TimeMode.None(),
        OutputMode.Append())(Encoders.product[TopKEstimate])
}
