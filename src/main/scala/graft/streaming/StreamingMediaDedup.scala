package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming PERCEPTUAL media dedup — the image sibling of
  * [[StreamingNearDedup]] for a media-ingest stream: an image is dropped
  * when its aHash (multimodal.Multimodal.perceptualHashImagesBatched —
  * 8x8 mean hash over the decoded, downscaled luma grid) lies within
  * `maxHamming` of an earlier-ingested image's, so byte-different
  * re-encodes AND mild rescales/recompressions collapse at ingest time,
  * before payloads ever land in the lake.
  *
  * Same store discipline as the text form (foreachBatch + a
  * hive-partitioned band-bucket store, dynamic partition overwrite so a
  * replayed batch id converges), same banding as the batch query
  * (8 bands x 8 bits — lossless for Hamming <= 7 by pigeonhole): the
  * store holds only (band, key, media_id, ahash) longs — payload bytes
  * are decoded partition-locally for hashing and never enter the store
  * or any shuffle. Within a batch the greedy lower-id resolution of the
  * text form applies unchanged.
  */
object StreamingMediaDedup {

  private val BANDS = 8
  private val KeyBits = 64 / BANDS
  private val Mask = (1L << KeyBits) - 1

  private def hashed(media: DataFrame): DataFrame =
    graft.multimodal.Multimodal
      .perceptualHashImagesBatched(media.filter(col("kind") === "image"))
      .toDF().select(col("media_id"), col("ahash"))

  private def banded(fp: DataFrame): DataFrame =
    fp.select(col("media_id"), col("ahash"),
      explode(expr(
        s"transform(sequence(0, ${BANDS - 1}), b -> struct(b AS band, shiftright(ahash, b * $KeyBits) & $Mask AS key))"))
        .as("bb"))
      .select(col("media_id"), col("ahash"), col("bb.band"), col("bb.key"))

  /** Dedup one micro-batch of (media_id, kind, bytes) against the store;
    * admitted media go to `outDir/__batch_id=<id>`, their band rows to
    * the store — both dynamic-overwrite, so replays converge. Undecodable
    * images are dropped by the hasher (R2); non-image kinds pass through
    * untouched (this pass is image-scoped; exact byte dedup upstream
    * covers the rest).
    */
  def dedupBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String, maxHamming: Int): DataFrame = {
    require(maxHamming < BANDS,
      s"banding is lossless only for maxHamming < $BANDS, got $maxHamming")
    val fp = hashed(batch).persist()
    val bb = banded(fp)
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeExists = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(storePath)
    val store: DataFrame =
      if (storeExists)
        spark.read.parquet(storeDir)
          .select(col("band"), col("key"), col("media_id").as("old_id"),
            col("ahash").as("old_hash"))
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("band", IntegerType),
            StructField("key", LongType), StructField("old_id", LongType),
            StructField("old_hash", LongType))))
    val ham = expr("bit_count(ahash ^ old_hash)")
    val vsStore = bb.join(store, Seq("band", "key"))
      .filter(col("media_id") =!= col("old_id"))
      .select(col("media_id"), col("ahash"), col("old_hash")).distinct()
      .filter(ham <= maxHamming)
      .select(col("media_id")).distinct()
    val survivors = bb.join(vsStore.withColumnRenamed("media_id", "dead"),
        col("media_id") === col("dead"), "left_anti")
    val vsBatch = survivors.as("x").join(survivors.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.media_id") > col("y.media_id"))
      .select(col("x.media_id").as("media_id"), col("x.ahash").as("ahash"),
        col("y.ahash").as("old_hash"))
      .distinct()
      .filter(ham <= maxHamming)
      .select(col("media_id")).distinct()
    val dropped = vsStore.unionAll(vsBatch).distinct()
    val keptIds = fp.join(dropped, Seq("media_id"), "left_anti")
      .select(col("media_id"), col("ahash"))
      .localCheckpoint()
    fp.unpersist()
    banded(keptIds).select(col("band"), col("key"), col("media_id"),
        col("ahash"), lit(batchId).as("__batch_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(storeDir)
    // admitted payloads to the lake: non-images pass through; images only
    // if their id survived the perceptual pass
    val kept = batch
      .join(keptIds.select(col("media_id")), Seq("media_id"), "left_semi")
      .unionByName(batch.filter(col("kind") =!= "image"))
      .select(col("media_id"), col("kind"), col("bytes"),
        lit(batchId).as("__batch_id"))
    kept.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(outDir)
    kept
  }

  /** Wire a streaming media source (media_id, kind, bytes) through the
    * per-batch perceptual dedup into `outDir`, with the hash store at
    * `storeDir`.
    */
  def start(media: DataFrame, storeDir: String, outDir: String,
      checkpoint: String, maxHamming: Int = 7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupBatch(batch.sparkSession, batch, id, storeDir, outDir, maxHamming)
        ()
      }
      .start()
}
