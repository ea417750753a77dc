package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming (incrementally maintained) Naive-Bayes trainer — the
  * learnable-curation member of the incremental-index grid (text index /
  * vector index / signature store all have batch + stored + streaming
  * forms; this gives the NB quality model its streaming form). NB
  * training state is PURELY ADDITIVE — per-class token counts sum across
  * any partition of the corpus — so the maintainer is the layer pattern
  * (StreamingCms's shape, not stateful APIs): each micro-batch writes its
  * own (term, cnt_pos, cnt_neg) aggregate as a `batch_id=<id>` partition
  * via dynamic partition overwrite, which makes replays IDEMPOTENT (a
  * re-delivered batch overwrites its own layer, never double-counts).
  * The model is merge-on-read: sum the layers by term and apply the ONE
  * llr formula (ops.CorpusOps.nbLlr — shared with the batch trainer), so
  * streamed-then-merged == batch-trained bit-for-bit under any slicing —
  * add-one smoothing and the totals are functions of the SUMMED counts,
  * not of how they arrived. StreamingNbTrainSpec pins equality against
  * ops.CorpusOps's batch model, slicing-invariance, and replay
  * convergence; the merged model feeds StreamingNbFilter via llrNanos,
  * closing the loop: stream-train → ship → stream-score.
  *
  * At 100 TB: a layer is vocab-sized (one row per distinct term seen in
  * the batch), the merge shuffles O(vocab × layers) count rows — never
  * text — and a compaction (rewrite the summed counts as one layer) is
  * the same one-liner the other layer stores use.
  */
object StreamingNbTrain {

  /** One micro-batch's contribution, written as its own layer partition.
    * Exposed (not inlined in foreachBatch) so the replay-idempotence
    * property is directly testable: calling this twice with the same
    * `batchId` must leave the store unchanged.
    */
  def writeBatch(batch: DataFrame, batchId: Long, store: String): Unit = {
    val s = batch.sparkSession
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      graft.ops.CorpusOps.nbClassCounts(batch)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$store/counts")
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Start the maintainer over a streaming (text, source) document feed. */
  def start(docs: DataFrame, store: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, id, store)
      }
      .start()

  /** Merge-on-read model: layers sum by term, then the shared llr
    * formula. Bit-equal to batch training on the union of the batches.
    */
  def mergedModel(spark: SparkSession, store: String): DataFrame = {
    // a replayed batch OVERWRITES its own layer partition in place —
    // evict any cached file listing of the store or a reader planned
    // before the replay resolves the pre-overwrite file names
    spark.catalog.refreshByPath(s"$store/counts")
    graft.ops.CorpusOps.nbLlr(
      spark.read.parquet(s"$store/counts")
        .groupBy(col("term"))
        .agg(sum(col("cnt_pos")).as("cnt_pos"),
          sum(col("cnt_neg")).as("cnt_neg")))
  }

  /** Compact the layer store: rewrite the summed counts as ONE layer
    * (batch_id = -1, the compaction epoch) and drop the per-batch
    * layers — same merge-on-read result, O(vocab) files instead of
    * O(batches). The swap is staged-then-renamed (sources.StoreSwap) so
    * a concurrent reader never sees a half-store.
    */
  def compact(spark: SparkSession, store: String): Unit = {
    spark.catalog.refreshByPath(s"$store/counts")
    val summed = spark.read.parquet(s"$store/counts")
      .groupBy(col("term"))
      .agg(sum(col("cnt_pos")).as("cnt_pos"),
        sum(col("cnt_neg")).as("cnt_neg"))
      .withColumn("batch_id", lit(-1L))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$store/.compact-counts")
    summed.write.mode("overwrite").partitionBy("batch_id")
      .parquet(tmp.toString)
    graft.sources.StoreSwap.swapIn(fs, tmp,
      new org.apache.hadoop.fs.Path(s"$store/counts"))
    spark.catalog.refreshByPath(s"$store/counts")
  }

  /** The merged model in StreamingNbFilter's shipping form (llr nanos). */
  def llrNanos(model: DataFrame): Map[String, Long] =
    model.select(col("term"),
        (col("llr") * lit(1000000000L)).cast("long").as("nanos"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
