package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-maintained MinHash signature store — the MAINTENANCE half
  * of [[SignatureStore]] (the batch-build half), completing the
  * batch/incremental grid across all three index modalities (text
  * retrieval, vector ANN, dedup signatures). New documents keep
  * arriving; the signature store must stay probe-able without ever
  * re-shingling the corpus.
  *
  * Same MERGE-ON-READ, strictly-per-batch-write design as
  * [[IncrementalTextIndex]]:
  *
  *   buckets/bucket=<0..63>/__batch_id=<M>/  (band, bh, doc_id)
  *   arrays/__batch_id=<M>/                  (doc_id, n_sh, hs sorted)
  *
  * Every write is computed FROM THE BATCH ALONE and lands as that
  * batch's own hive partitions (dynamic partition overwrite): a
  * crash-replayed batch overwrites its own partitions with the same
  * bytes, so the store CONVERGES under replay; batches never contend.
  * The probe path is the shared [[SignatureStore.matchAgainst]] core —
  * bucket partition pruning on the probes' bucket ids works unchanged
  * because `bucket` remains the leading hive partition level. Read cost
  * grows with batch COUNT (the LSM trade); `compact` folds all batch
  * partitions into one and is match-set-neutral (spec-pinned).
  */
object IncrementalSignatureStore {

  import SignatureStore.{Buckets, banded, sortedArrays}

  /** Index one document batch. Idempotent per (batchId, batch). */
  def appendBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String, bands: Int, rows: Int): Unit = {
    val arrays = sortedArrays(batch).persist()
    val buckets = banded(arrays, bands, rows)
      .withColumn("bucket", pmod(col("bh"), lit(Buckets.toLong)))
      .withColumn("__batch_id", lit(batchId))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("band"), col("bh"))
    buckets.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "__batch_id")
      .parquet(s"$indexDir/buckets")
    arrays.withColumn("__batch_id", lit(batchId))
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id")
      .parquet(s"$indexDir/arrays")
    arrays.unpersist()
    ()
  }

  /** Probe the maintained store: identical semantics to
    * [[SignatureStore.nearDupMatches]] over the union of all appended
    * batches (the `__batch_id` partition column is dropped on read).
    */
  def nearDupMatches(spark: SparkSession, indexDir: String, probes: DataFrame,
      minJaccard: Double, bands: Int, rows: Int,
      maxBucket: Int = 1000): DataFrame =
    SignatureStore.matchAgainst(spark, probes, minJaccard, bands, rows,
      maxBucket,
      bucketsFor = bs => spark.read.parquet(s"$indexDir/buckets")
        .filter(col("bucket").isin(bs: _*))
        .select("band", "bh", "doc_id", "bucket"),
      storeArrays = spark.read.parquet(s"$indexDir/arrays")
        .select("doc_id", "n_sh", "hs"))

  /** Fold all batch partitions into a single `__batch_id = 0` layer —
    * bounds the LSM read tail; the probe-visible row set is unchanged,
    * so compaction changes bytes-read, never matches. Staged into a
    * temp tree and atomically renamed (the SignatureStore build
    * contract: concurrent probes see a complete old tree or a complete
    * new one).
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = spark.read.parquet(s"$indexDir/buckets")
      .select("band", "bh", "doc_id", "bucket")
      .withColumn("__batch_id", lit(0L))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("band"), col("bh"))
      .persist()
    val arrays = spark.read.parquet(s"$indexDir/arrays")
      .select("doc_id", "n_sh", "hs")
      .withColumn("__batch_id", lit(0L))
      .repartition(1).sortWithinPartitions(col("doc_id"))
      .persist()
    val tmp = indexDir + ".compact-" + java.util.UUID.randomUUID().toString.take(8)
    buckets.write.partitionBy("bucket", "__batch_id").parquet(s"$tmp/buckets")
    arrays.write.partitionBy("__batch_id").parquet(s"$tmp/arrays")
    buckets.unpersist(); arrays.unpersist()
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    f.delete(root, true)
    if (!f.rename(tmpP, root)) f.delete(tmpP, true)
  }
}
