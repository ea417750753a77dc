package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming maintenance of a serving rollup table: each micro-batch's
  * PARTIAL aggregates combine into the stored per-(event_type, day)
  * rollup — counts and decimal sums ADD, min/max COMBINE — so the serving
  * table is always current without ever rescanning history (the streaming
  * form of q_rollup_incremental's merge algebra).
  *
  * Idempotency: additive merges are NOT naturally replay-safe (a retried
  * foreachBatch must not double-add its partials — unlike the key-REPLACE
  * convergence of Pipelines.mergingPartitionSink). Two mechanisms
  * compose into per-day exactly-once:
  *
  *  1. every stored row carries the `__batch_id` that last updated its
  *     day partition, so a replayed batch skips days it already applied;
  *  2. the merged days are STAGED to a side directory and only then
  *     swapped into place (delete old dir, move staged dir), with a
  *     `_STAGED` marker committed after the staging write completes.
  *     Without staging, a crash INSIDE a dynamic-overwrite commit can
  *     delete a day's old files before writing their replacement — the
  *     retry would then merge the batch's partials against an EMPTY
  *     day and silently drop its history. With it, recovery is total:
  *     crash before `_STAGED` → target untouched, recompute; crash
  *     after → finish the remaining moves (a staged day dir that no
  *     longer exists was already moved).
  *
  * On an object store the same protocol is a manifest pointer flip
  * (rename is not atomic there); on a file lake, per-day dir moves are.
  *
  * Scale: per batch the work is one partial aggregate of the batch (tiny),
  * one partition-pruned read of the touched days, and a dynamic overwrite
  * of those days. Driver-side data is the touched-day VALUE list only.
  */
object RollupMaintenance {

  val rollupSchema: StructType = StructType(Seq(
    StructField("day", StringType),
    StructField("event_type", StringType),
    StructField("n", LongType),
    StructField("sv", DecimalType(28, 2)),
    StructField("mn", DoubleType),
    StructField("mx", DoubleType),
    StructField("__batch_id", LongType)))

  /** Partial rollup of one batch of raw events (ts, event_type, value). */
  def partialOf(batch: DataFrame, batchId: Long): DataFrame =
    batch
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(28, 2)).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .withColumn("__batch_id", lit(batchId))

  /** Complete a staged batch: swap every remaining staged day dir into
    * the target. Idempotent — a staged day that is gone was already
    * moved by a previous attempt.
    */
  private def finishSwap(stageDir: java.io.File, target: java.io.File): Unit = {
    Option(stageDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .foreach { stagedDay =>
        val dest = new java.io.File(target, stagedDay.getName)
        if (dest.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
          }
          rm(dest)
        }
        java.nio.file.Files.move(stagedDay.toPath, dest.toPath)
      }
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll); f.delete()
    }
    rmAll(stageDir)
  }

  /** Merge one batch's partials into the rollup at `path`, exactly once
    * per day partition (replays of an applied batchId are no-ops; a
    * crash at ANY point either leaves the target untouched or leaves a
    * completed stage whose swap the retry finishes).
    */
  def applyBatch(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Long): Unit = {
    val stageDir = new java.io.File(s"$path/_staging/batch=$batchId")
    val marker = new java.io.File(stageDir, "_STAGED")
    if (marker.exists()) { // crashed between stage-commit and swap: finish
      finishSwap(stageDir, new java.io.File(path))
      return
    }
    val partial = partialOf(batch, batchId)
    val touched = partial.select(col("day")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) return
    val existing =
      try spark.read.schema(rollupSchema).parquet(path)
        .filter(col("day").isInCollection(touched))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rollupSchema)
      }
    // replay guard: a day whose stored __batch_id == batchId already took
    // this batch's partials — exclude it from both sides of the merge and
    // from the overwrite (bounded: one flag row per touched day)
    val applied = existing.filter(col("__batch_id") === batchId)
      .select(col("day")).distinct().collect().map(_.getString(0)).toSet
    val pending = touched.filterNot(applied)
    if (pending.isEmpty) return
    val merged = partial.filter(col("day").isInCollection(pending))
      .unionByName(existing.filter(col("day").isInCollection(pending)))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("sv")).cast(DecimalType(28, 2)).as("sv"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .withColumn("__batch_id", lit(batchId))
    // stage (target untouched), commit the stage, then swap day dirs in
    merged.write.mode("overwrite").partitionBy("day")
      .parquet(stageDir.getPath)
    java.nio.file.Files.createFile(marker.toPath)
    finishSwap(stageDir, new java.io.File(path))
  }

  /** The streaming wiring: checkpointed foreachBatch over raw events. */
  def rollupSink(events: DataFrame, path: String, checkpoint: String)
      : DataStreamWriter[Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, path, batch, batchId)
      }
}
