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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the raw int64
      // nanos and truncate to microseconds — exactly what DuckDB does when
      // it reads the same file, so oracle comparisons stay aligned.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
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
