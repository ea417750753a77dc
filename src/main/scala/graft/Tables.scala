package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Plain columnar parquet scans — Catalyst prunes columns and pushes
  * predicates into the scan, so callers just `load(...)` and declare the
  * plan; no manual projection needed. At cluster scale the same call reads
  * a hive-partitioned directory tree with partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
      // generations (which Spark's vectorized reader rejects outright —
      // PARQUET_TYPE_ILLEGAL — so we read the raw int64 nanos and truncate
      // to micros, exactly like DuckDB) and as TIMESTAMP(MICROS) in others
      // (which reads directly as a timestamp). Handle both so the library
      // doesn't care which vintage of the generator wrote the files; either
      // way the column lands as session-TZ (UTC) TimestampType.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType => // nanos vintage, surfaced as int64 by the flag
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // micros vintage: NTZ → session-TZ timestamp (UTC session)
          raw.withColumn("ts", raw.col("ts").cast(TimestampType))
      }
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so the SQL entry point
    * (`spark.sql`) can reference the catalog by name — the Athena-style
    * consumption surface the reference deferred (SURVEY.md §3.3).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
