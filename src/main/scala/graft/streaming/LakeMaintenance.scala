package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction for the hive-partitioned lake.
  *
  * The reference writes one object PER POLL CYCLE per topic
  * (processor_stock_quotes.py:68-73 — a new S3 key every minute), so a
  * quotes lake accrues ~1,440 tiny files per partition per day; every
  * downstream scan then pays per-file open/footer cost. Compaction is the
  * standard warehouse answer (OPTIMIZE in Delta/Iceberg): rewrite each
  * partition's row set into ceil(rows / targetRecordsPerFile) files.
  *
  * Shape: one shuffle on the partition column routes each hive partition
  * to a single task (skew costs spilled I/O, not memory — sort-based
  * shuffle), and `maxRecordsPerFile` rolls files at the target size. The
  * rewrite lands in a NEW directory: at 100 TB the swap into place is a
  * metastore/manifest pointer flip (or an atomic rename), never an
  * in-place overwrite of files a concurrent reader may hold open — the
  * same replace-don't-mutate stance as the idempotent partition sinks
  * (Pipelines.scala).
  */
object LakeMaintenance {

  final case class CompactionReport(
      partitions: Long, rows: Long, filesBefore: Long, filesAfter: Long)

  private def dataFileCount(dir: String): Long = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        // listFiles() is null if the dir vanishes or turns unreadable
        // mid-walk — treat as empty rather than NPE the maintenance job
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .toLong
  }

  /** Compact the hive lake at `srcDir` (partitioned by `partitionCol`)
    * into `destDir`. Returns the before/after accounting a maintenance
    * scheduler would log and alert on. The source is scanned ONCE — the
    * rewrite is the scan, and the report's rows/partitions are counted
    * from the compacted OUTPUT (identical content, and at 100 TB two
    * extra source passes for bookkeeping would double the job).
    */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      partitionCol: String, targetRecordsPerFile: Long): CompactionReport = {
    val before = dataFileCount(srcDir)
    spark.read.parquet(srcDir)
      .transform(graft.Par.byKey(col(partitionCol)))
      .write
      .partitionBy(partitionCol)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .mode("overwrite")
      .parquet(destDir)
    val out = spark.read.parquet(destDir)
    val agg = out.groupBy(col(partitionCol)).count()
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)), org.apache.spark.sql.functions.sum("count"))
      .head()
    CompactionReport(agg.getLong(0), agg.getLong(1), before, dataFileCount(destDir))
  }
}
