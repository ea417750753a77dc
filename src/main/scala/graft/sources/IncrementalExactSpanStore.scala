package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-maintained window-hash store — the MAINTENANCE half of
  * [[ExactSpanStore]] (the batch-build half), closing the last open
  * cell of the batch/incremental index grid (text retrieval, vector
  * ANN, MinHash signatures, perceptual media, and now exact
  * substrings). New documents keep arriving; the exact-substring
  * report → cut loop must stay runnable without re-hashing the corpus
  * windows.
  *
  * Same MERGE-ON-READ, strictly-per-batch-write design as
  * [[IncrementalSignatureStore]]:
  *
  *   wins/bucket=<0..63>/__batch_id=<M>/   (doc_id, pos, h)
  *
  * Every write is computed FROM THE BATCH ALONE (a document's windows
  * depend on no other document) and lands as that batch's own hive
  * partitions via dynamic partition overwrite: a crash-replayed batch
  * overwrites its own partitions with the same bytes, so the store
  * CONVERGES under replay; batches never contend. The probe is the
  * shared [[ExactSpanStore.spansFromWindows]] core over the union of
  * all layers — cross-layer repeats are found because the
  * duplicated-hash set groups over ALL layers, so incremental
  * maintenance changes bytes-read, never spans (ExactSpanStoreSpec
  * pins bit-identity against the batch-built store). Read cost grows
  * with batch COUNT (the LSM trade); [[compact]] folds committed
  * layers and is span-set-neutral.
  */
object IncrementalExactSpanStore {

  /** Index one document batch. Idempotent per (batchId, batch).
    * `bytes` selects the granularity (UTF-8 byte windows — the
    * repeatedSpansExactBytes convention — vs char windows); a store is
    * built and probed in ONE granularity.
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String, minLen: Int, bytes: Boolean = false): Unit = {
    ExactSpanStore.bucketedWindows(batch, minLen, bytes)
      .withColumn("__batch_id", lit(batchId))
      .transform(graft.Par.byKey(col("bucket")))
      .sortWithinPartitions(col("h"), col("doc_id"), col("pos"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "__batch_id")
      .parquet(s"$indexDir/wins")
    ()
  }

  /** Exact spans over the union of all appended layers — identical
    * semantics to [[ExactSpanStore.spans]] (the `__batch_id` partition
    * column is dropped on read).
    */
  def spans(spark: SparkSession, indexDir: String, docs: DataFrame,
      minLen: Int, crossDocOnly: Boolean = true,
      bytes: Boolean = false): DataFrame =
    ExactSpanStore.spansFromWindows(
      spark.read.parquet(s"$indexDir/wins").select("doc_id", "pos", "h"),
      docs, minLen, crossDocOnly, bytes)

  /** Run the maintainer as a streaming job: every micro-batch of
    * (doc_id, text) appends its own layer — foreachBatch + checkpoint
    * makes a replayed batch rewrite its own partitions (convergent),
    * the [[IncrementalSignatureStore.start]] wiring.
    */
  def start(docs: DataFrame, indexDir: String, checkpoint: String,
      minLen: Int,
      bytes: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch.sparkSession, batch, id, indexDir, minLen, bytes)
        ()
      }
      .start()

  /** Reserved layer id for compacted rows — negative, where no replayed
    * streaming batch can dynamic-overwrite it.
    */
  val CompactedLayer: Long = -1L

  /** Fold COMMITTED batch layers into `__batch_id = -1`, keeping the
    * newest layer as-is — bounds the LSM read tail while staying
    * replay-safe (a crash replays at most the LAST micro-batch, whose
    * layer is deliberately left unfolded). Probe-visible rows are
    * unchanged: compaction changes bytes-read, never spans. MUST run
    * with the maintaining query STOPPED — the
    * [[IncrementalSignatureStore.compact]] contract, same reasoning.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StoreSwap.sweepOrphans(f, new org.apache.hadoop.fs.Path(indexDir))
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$indexDir/wins"))) return
    // hive partition column reads back with an inferred numeric type —
    // normalize to long before comparing/folding
    val all = spark.read.parquet(s"$indexDir/wins")
      .withColumn("__batch_id", col("__batch_id").cast("long"))
    val maxRow = all.agg(max(col("__batch_id"))).head
    if (maxRow.isNullAt(0)) return
    val maxBatch = maxRow.getLong(0)
    val folded = all
      .withColumn("__batch_id",
        when(col("__batch_id") < maxBatch, lit(CompactedLayer))
          .otherwise(col("__batch_id")))
      .select("doc_id", "pos", "h", "bucket", "__batch_id")
      .transform(graft.Par.byKey(col("bucket")))
      .sortWithinPartitions(col("h"), col("doc_id"), col("pos"))
    val tmp = indexDir + ".compact-" + java.util.UUID.randomUUID().toString.take(8)
    folded.write.partitionBy("bucket", "__batch_id").parquet(s"$tmp/wins")
    StoreSwap.swapIn(f, new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(indexDir))
  }
}
