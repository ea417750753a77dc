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

  test("SortedIntersectCount == size(array_intersect) on the corpus' sorted shingle sets") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      array_sort(TextFunctions.shingleHashes(col("text"))).as("hs"))
    // every within-stride pair (bounded cross join): kernel count must
    // equal the built-in's on these distinct sorted sets
    val a = sh.select(col("doc_id").as("a_id"), col("hs").as("ha"))
    val b = sh.select(col("doc_id").as("b_id"), col("hs").as("hb"))
    val pairs = a.join(b, col("a_id") % 25 === col("b_id") % 25 && col("a_id") < col("b_id"))
      .select(
        TextFunctions.sortedIntersectCount(col("ha"), col("hb")).as("fast"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("ref"))
    assert(pairs.filter(col("fast") =!= col("ref")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("SortedIntersectCount edge cases: empty, disjoint, identical, interleaved") {
    import spark.implicits._
    val cases = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(-5L, 0L, 7L, 9L), Seq(-5L, 7L, 8L), 2L),
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue, 0L, Long.MaxValue), 2L))
    val df = cases.toDF("a", "b", "want")
      .select(TextFunctions.sortedIntersectCount(col("a"), col("b")).as("got"), col("want"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
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
