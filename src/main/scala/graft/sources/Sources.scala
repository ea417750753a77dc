package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet (SURVEY.md §2.2 "Sources"):
  * schema-explicit JSONL and CSV readers — no runtime inference in the
  * engine core (§1.3) — plus the hive-partitioned batch writer that
  * produces the reference's lake layout (W1/W2,
  * ref processor_stock_quotes.py:68-73).
  *
  * PERMISSIVE mode + corrupt-record drop reproduces R2's skip-and-log:
  * malformed lines become null rows and are filtered, never failures.
  */
object Sources {

  /** JSON-Lines scan — the reference lake's at-rest format. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      dropCorrupt: Boolean = true): DataFrame = {
    val withCorrupt = if (dropCorrupt) schema.add("_corrupt_record", "string") else schema
    val df = spark.read.schema(withCorrupt).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    // Spark disallows referencing only _corrupt_record straight off a raw
    // scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); materialize first — the
    // documented workaround.
    if (dropCorrupt)
      df.cache().filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    else df
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("mode", "PERMISSIVE").csv(path)

  /** Batch form of the W1/W2 lake write: year=/month=/day=/hour= from the
    * given timestamp column (event time by default; the reference used
    * processing time — SURVEY.md §7.4).
    */
  def writeHivePartitioned(df: DataFrame, tsCol: String, path: String,
      format: String = "parquet"): Unit =
    df.withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .withColumn("day", date_format(col(tsCol), "dd"))
      .withColumn("hour", date_format(col(tsCol), "HH"))
      .write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour")
      .format(format).save(path)
}
