package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Batch source/sink surface beyond parquet (SURVEY.md §2.2 "Sources"):
  * schema-explicit JSONL and CSV readers — no runtime inference in the
  * engine core (§1.3) — plus the hive-partitioned batch writer that
  * produces the reference's lake layout (W1/W2,
  * ref processor_stock_quotes.py:68-73), and the option-driven streaming
  * topic reader (the reference's broker stage, terraform/kinesis.tf:4-40).
  *
  * PERMISSIVE parsing + corrupt-record handling reproduces R2's
  * skip-and-log: malformed lines become null rows and are dropped (or
  * dead-lettered), never failures.
  */
object Sources {

  private val Corrupt = "_corrupt_record"

  /** JSON-Lines scan — the reference lake's at-rest format.
    *
    * Parsed as a text scan + from_json (not the json datasource): the
    * original line is then available as a real column, which (a) avoids
    * the datasource's corrupt-column restriction and its cache workaround
    * — nothing here pins executor memory — and (b) lets corrupt lines be
    * dead-lettered verbatim instead of silently dropped (the reference
    * logs every skipped record, processor_stock_quotes.py:56-62).
    *
    * @param deadLetterPath if set, corrupt source lines are appended to
    *        this directory as text, one line per bad record, at call time
    *        (an eager side output; the returned frame stays lazy).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      dropCorrupt: Boolean = true, deadLetterPath: Option[String] = None): DataFrame = {
    val withCorrupt = schema.add(Corrupt, StringType)
    // blank lines are not records: the json datasource skips them, and
    // from_json('') would otherwise surface them as phantom all-null rows
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)).as("r"))
      .select(col("r.*"))
    deadLetterPath.foreach { dl =>
      parsed.filter(col(Corrupt).isNotNull).select(col(Corrupt).as("value"))
        .write.mode("append").text(dl)
    }
    if (dropCorrupt) parsed.filter(col(Corrupt).isNull).drop(Corrupt)
    else parsed.drop(Corrupt) // caller's declared schema; corrupt rows null out
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("mode", "PERMISSIVE").csv(path)

  /** ORC scan — the second columnar at-rest format Spark ships natively;
    * predicate pushdown and column pruning behave as on parquet (the
    * SourcesSpec round-trip pins both). Schema explicit like every other
    * reader here (§1.3: no runtime inference in the engine core).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Option-driven streaming topic source — the configuration seam where a
    * deployment points the pipelines at a real broker (the reference's
    * Kinesis streams, terraform/kinesis.tf:4-40; event-source mapping
    * terraform/lambda.tf:46-54). Every variant normalizes to a single
    * `value: string` column, which is exactly what the decode stages
    * (Pipelines.decodeQuotes/decodeNews) consume — so switching transports
    * is config-only, the dataflow is untouched.
    *
    * conf("format"):
    *   - "kafka": the Structured Streaming Kafka connector; every
    *     "kafka.*" option is passed through (bootstrap servers, topic via
    *     "subscribe", security). Requires the spark-sql-kafka package on
    *     the cluster classpath.
    *   - "file": a drop-directory of JSONL files (the testable fallback;
    *     also the right bridge for S3-landed batches). Options: "path",
    *     optional "maxFilesPerTrigger".
    *   - "rate": the built-in rate source (smoke tests), value = "v<n>".
    */
  def readTopic(spark: SparkSession, conf: Map[String, String]): DataFrame =
    conf.getOrElse("format", "file") match {
      case "kafka" =>
        val opts = conf.filter { case (k, _) =>
          k.startsWith("kafka.") || Set("subscribe", "subscribePattern",
            "assign", "startingOffsets", "maxOffsetsPerTrigger").contains(k)
        }
        spark.readStream.format("kafka").options(opts).load()
          .select(col("value").cast(StringType).as("value"))
      case "kinesis" =>
        // the reference's actual transport (terraform/kinesis.tf:4-40);
        // requires the spark-sql-kinesis connector jar on the cluster
        // classpath (not present in this offline sandbox — the option
        // translation is the spec'd seam). Kinesis records arrive as a
        // binary `data` column; normalize to the one `value` column.
        spark.readStream.format("kinesis").options(kinesisOptions(conf)).load()
          .select(col("data").cast(StringType).as("value"))
      case "file" =>
        val reader = spark.readStream
        conf.get("maxFilesPerTrigger").foreach(n => reader.option("maxFilesPerTrigger", n))
        reader.text(conf("path")).select(col("value"))
      case "rate" =>
        spark.readStream.format("rate")
          .option("rowsPerSecond", conf.getOrElse("rowsPerSecond", "10")).load()
          .select(concat(lit("v"), col("value").cast(StringType)).as("value"))
      case other =>
        throw new IllegalArgumentException(s"unknown topic format: $other")
    }

  /** Topic conf -> spark-sql-kinesis reader options. `streamName` is
    * required; `endpointUrl` defaults from `regionName` (and vice versa —
    * a region is parsed out of a standard kinesis.<region>.amazonaws.com
    * endpoint); the starting position defaults to TRIM_HORIZON (read the
    * whole retained stream — the reference Lambda's event-source mapping
    * reads from the stream head the same way, terraform/lambda.tf:46-54).
    * All `kinesis.`-prefixed options pass through with the prefix
    * stripped (credentials, VPC endpoint overrides, ...).
    */
  def kinesisOptions(conf: Map[String, String]): Map[String, String] = {
    val stream = conf.getOrElse("streamName",
      throw new IllegalArgumentException("kinesis source requires streamName"))
    val regionFromEndpoint = conf.get("endpointUrl").flatMap(
      "kinesis\\.([a-z0-9-]+)\\.amazonaws\\.com".r.findFirstMatchIn(_).map(_.group(1)))
    val region = conf.get("regionName").orElse(regionFromEndpoint)
    val endpoint = conf.get("endpointUrl").orElse(
      region.map(r => s"https://kinesis.$r.amazonaws.com"))
    Map("streamName" -> stream,
      "startingposition" -> conf.getOrElse("startingposition", "TRIM_HORIZON")) ++
      endpoint.map("endpointUrl" -> _) ++
      region.map("regionName" -> _) ++
      conf.collect { case (k, v) if k.startsWith("kinesis.") =>
        k.stripPrefix("kinesis.") -> v
      }
  }

  /** Batch form of the W1/W2 lake write: year=/month=/day=/hour= from the
    * given timestamp column (event time by default; the reference used
    * processing time — SURVEY.md §7.4).
    */
  def writeHivePartitioned(df: DataFrame, tsCol: String, path: String,
      format: String = "parquet"): Unit =
    // one partition-scheme definition for batch AND streaming writers —
    // the layouts must never drift
    graft.streaming.Pipelines.withHivePartitions(df, tsCol)
      .write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour")
      .format(format).save(path)
}
