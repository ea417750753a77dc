package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One document placed into a bin (see StreamingBinPack). */
case class BinAssignment(bucket: String, doc_id: Long, n_tokens: Long,
    bin: Long, fill_after: Long)

/** Open-bin state for one md5 bucket: the next bin id to issue and the
  * (id, fill) of every bin still accepting documents.
  */
case class BinPackState(nextBin: Long, binIds: List[Long], fills: List[Long])

/** ONLINE first-fit bin packing over a document stream — the streaming
  * twin of [[graft.ops.TrainerOps.packFirstFit]]. The batch form sorts
  * each bucket length-descending first (FFD); a stream cannot sort the
  * future, so the honest streaming form is classic ONLINE first-fit in
  * arrival order: place each document into the lowest-id open bin it
  * fits, else open a new bin. State is bounded by `maxOpen` open bins
  * per bucket (production default 64): when a new bin is needed at the
  * limit, the FULLEST open bin closes (deterministic tie-break: lowest
  * id) — it can only get harder to fill, so closing it first minimizes
  * stranded capacity. Closed bins never reopen, which is what keeps
  * state O(maxOpen) per bucket forever instead of O(stream).
  *
  * Determinism contract (spec-pinned): within a micro-batch documents
  * fold in doc_id order, so for a stream delivered in doc_id order the
  * assignment of every document depends only on the PREFIX before it —
  * any micro-batch slicing of the same ordered stream yields
  * bit-identical assignments, and a checkpoint replay re-derives the
  * same rows (exactly-once against an idempotent sink).
  */
class OnlineBinPackProcessor(cap: Long, maxOpen: Int)
    extends StatefulProcessor[String, (String, Long, Long), BinAssignment] {

  @transient private var st: ValueState[BinPackState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BinPackState]("bins",
      Encoders.product[BinPackState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: TimerValues): Iterator[BinAssignment] = {
    val s = if (st.exists()) st.get() else BinPackState(0L, Nil, Nil)
    val ids = s.binIds.toBuffer
    val fills = s.fills.toBuffer
    var next = s.nextBin
    val out = scala.collection.mutable.ArrayBuffer.empty[BinAssignment]
    // The per-batch sort is REQUIRED by the determinism contract (micro-
    // batch slicing must not reorder the fold), and it materializes this
    // bucket's slice of the micro-batch in executor memory: at the
    // default hexPrefix=1 one task holds ~1/16 of each batch. STATE stays
    // O(maxOpen) regardless; the transient batch footprint is bounded by
    // raising hexPrefix (more, smaller buckets — the same knob that
    // parallelizes the batch FFD) or capping micro-batch size
    // (maxOffsetsPerTrigger / maxFilesPerTrigger at the source).
    for ((_, docId, n0) <- rows.toArray.sortBy(_._2)) {
      val n = math.min(n0, cap)
      val i = fills.indexWhere(_ + n <= cap)
      if (i >= 0) {
        fills(i) += n
        out += BinAssignment(key, docId, n, ids(i), fills(i))
      } else {
        if (ids.size >= maxOpen) {
          val j = fills.indices.maxBy(k => (fills(k), -ids(k)))
          ids.remove(j); fills.remove(j)
        }
        ids += next; fills += n
        out += BinAssignment(key, docId, n, next, n)
        next += 1L
      }
    }
    st.update(BinPackState(next, ids.toList, fills.toList))
    out.iterator
  }
}

object StreamingBinPack {

  /** Wire a (doc_id, text) stream into online per-bucket bin packing.
    * Bucketing is the packFirstFit md5 convention (16^hexPrefix keys),
    * token counts are whitespace words capped at `cap` (same truncation
    * rule as the batch row). Requires the RocksDB state store provider
    * in production, like the other transformWithState jobs.
    */
  def apply(docs: DataFrame, cap: Long = 256L, hexPrefix: Int = 1,
      maxOpen: Int = 64): Dataset[BinAssignment] = {
    require(maxOpen > 0, s"maxOpen must be positive, got $maxOpen")
    implicit val tupleEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[BinAssignment]
    // the (bucket, doc_id, n) projection is SHARED with the batch twin
    // (TrainerOps.packBucketed) — one definition of the bucketing and
    // cap-truncation convention, and its cap/hexPrefix guards
    graft.ops.TrainerOps.packBucketed(docs, cap, hexPrefix)
      .as[(String, Long, Long)]
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new OnlineBinPackProcessor(cap, maxOpen),
        TimeMode.None(), OutputMode.Append())
  }
}
