package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable lake jobs — the user-facing replacement for the reference's
  * producer->Kinesis->Lambda->S3 chains (SURVEY.md §3.1/§3.2). Each job is
  * one Structured Streaming query: a JSON-lines drop directory (swap for a
  * Kafka/Kinesis connector in production — the dataflow is source-
  * agnostic) through the pipeline stages into the hive-partitioned,
  * checkpointed (exactly-once) lake.
  *
  * Usage:
  *   runMain graft.streaming.QuotesLakeJob <srcDir> <lakeDir> <checkpointDir> [continuous]
  *   runMain graft.streaming.NewsLakeJob   <srcDir> <lakeDir> <checkpointDir> [continuous]
  *
  * Without "continuous" the job drains what's available and exits
  * (Trigger.AvailableNow) — the batch-catchup mode; with it, it polls like
  * the reference's 60 s / 15 min cycles (H1) via ProcessingTime triggers.
  */
object QuotesLakeJob {
  def main(args: Array[String]): Unit =
    LakeJobs.run(args, "quotes", "60 seconds")
}

object NewsLakeJob {
  def main(args: Array[String]): Unit =
    LakeJobs.run(args, "news", "15 minutes")
}

object LakeJobs {

  def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
    .appName("graft-lake-job")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def run(args: Array[String], kind: String, cadence: String): Unit = {
    require(args.length >= 3, "args: <srcDir> <lakeDir> <checkpointDir> [continuous]")
    val Array(src, lake, ckpt) = args.take(3)
    val continuous = args.length > 3 && args(3) == "continuous"
    implicit val spark: SparkSession = session()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.readStream.text(src).toDF("value")
    val trigger =
      if (continuous) Trigger.ProcessingTime(cadence) else Trigger.AvailableNow()
    val query = kind match {
      case "quotes" =>
        Pipelines.partitionedWriter(
          Pipelines.quotes(Pipelines.decodeQuotes(raw)),
          tsCol = "event_ts", path = lake, checkpoint = ckpt, trigger = trigger).start()
      case "news" =>
        Pipelines.partitionedWriter(
          Pipelines.news(raw).toDF(),
          tsCol = "published_ts", path = lake, checkpoint = ckpt, trigger = trigger).start()
    }
    query.awaitTermination()
  }
}
