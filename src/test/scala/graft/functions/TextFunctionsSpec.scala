package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class TextFunctionsSpec extends SparkSpec {

  test("WordShingleHashes == declarative transform/concat_ws/array_distinct + xxhash64") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val declarative = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(ws) >= 3
           THEN array_distinct(transform(sequence(1, size(ws) - 2),
                                         i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))
           ELSE array(text) END"""))
      .select(col("doc_id"), transform(col("shingles"), s => xxhash64(s)).as("hs"))
    val fused = docs.select(col("doc_id"),
      TextFunctions.shingleHashes(col("text")).as("hs"))
    val joined = declarative.alias("d")
      .join(fused.alias("f"), "doc_id")
      .select(col("doc_id"),
        (array_sort(col("d.hs")) === array_sort(col("f.hs"))).as("eq"))
    assert(joined.filter(!col("eq")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("WordShingleHashes edge cases: short texts, empty string, repeated spaces") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two"),            // < 3 words -> whole-text shingle
      (2L, ""),                   // empty -> single shingle of empty string
      (3L, "a  b c"),             // empty middle word (double space)
      (4L, "x y z"),              // exactly 3 words -> one shingle
      (5L, "a b a b a b")         // repeated shingles -> deduplicated
    ).toDF("doc_id", "text")
    val declarative = df
      .withColumn("ws", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(ws) >= 3
           THEN array_distinct(transform(sequence(1, size(ws) - 2),
                                         i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))
           ELSE array(text) END"""))
      .select(col("doc_id"), transform(col("shingles"), s => xxhash64(s)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val fused = df.select(col("doc_id"), TextFunctions.shingleHashes(col("text")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    assert(fused == declarative)
    assert(fused(4L).length == 1)
    assert(fused(5L).length == 2) // "a b a" and "b a b"
  }
}
