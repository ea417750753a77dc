package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables}

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  test("JSONL round-trip with corrupt-record drop (R2 semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val e = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    e.write.mode("overwrite").json(s"$dir/clean")
    // append a corrupt line alongside valid ones
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/clean/zz_corrupt.json"),
      """{"event_id": 1, "user_id": 2, "event_type": "click", "value": 3.0}
        |{"event_id": broken json
        |""".stripMargin)
    val back = Sources.readJsonl(spark, s"$dir/clean", schema)
    assert(back.count() == e.count() + 1) // valid extra row kept, corrupt dropped
  }

  test("CSV scan with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val e = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    e.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = Sources.readCsv(spark, s"$dir/csv", schema)
    assert(back.count() == e.count())
    assert(back.schema("value").dataType == DoubleType)
    val sum0 = e.agg(sum("event_id")).head.getLong(0)
    assert(back.agg(sum("event_id")).head.getLong(0) == sum0)
  }

  test("batch hive-partitioned lake write (W1 layout) prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val e = Tables.load(spark, sf0001, "events")
    Sources.writeHivePartitioned(e, "ts", s"$dir/lake")
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.count() == e.count())
    // partition pruning: filtering on hour touches only matching dirs
    val pruned = lake.filter(col("year") === "2024" && col("hour") === "01")
    val expect = e.filter(date_format(col("ts"), "HH") === "01").count()
    assert(pruned.count() == expect)
    assert(new java.io.File(s"$dir/lake/year=2024/month=01/day=01").isDirectory)
  }
}
