package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant pins for the round-7 text-curation additions (the DuckDB
  * oracle pins exact values at sf0.01; these pin the algebraic properties
  * that must hold at ANY scale, on the tiny sf0.001 corpus).
  */
class TextCurationSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("pack_sequences partitions every document's tokens exactly") {
    // sum of per-sequence token counts == the document's token count,
    // and every sequence holds at most the 256-token budget
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = q("q_pack_sequences")
    val bad = packed.groupBy("doc_id").agg(sum("tok_in_seq").as("packed"))
      .join(docs, "doc_id")
      .where(col("packed") =!= col("n_tokens"))
    assert(bad.count() == 0L)
    val overfull = packed.groupBy("seq").agg(sum("tok_in_seq").as("n"))
      .where(col("n") > 256L)
    assert(overfull.count() == 0L)
    // sequences must be contiguous: every id from 0 to max appears
    val seqs = packed.select("seq").distinct()
    val mx = seqs.agg(max("seq")).head().getLong(0)
    assert(seqs.count() == mx + 1)
  }

  test("html_strip round-trips the original text plus the fixed tail") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val stripped = q("q_html_strip").join(docs, "doc_id")
      .where(col("clean") =!= concat(col("text"), lit(" & more")))
    assert(stripped.count() == 0L)
  }

  test("sentence stats are mutually consistent") {
    val s = q("q_sentences")
    // max <= total, n >= 1, avg * n == total (exact: avg is total/n in
    // IEEE, so multiply-back must land within one ulp — check via the
    // integer identity instead)
    assert(s.where(col("max_words") > col("total_words")).count() == 0L)
    assert(s.where(col("n_sentences") < 1L).count() == 0L)
    assert(s.where(abs(col("avg_words") * col("n_sentences") - col("total_words")) > lit(1e-6)).count() == 0L)
  }

  test("cusum changepoint picks the argmax row of the drift statistic") {
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val wOrd = Window.partitionBy("event_type").orderBy("event_id")
    val wAll = Window.partitionBy("event_type")
    val stats = ev
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum("cents").over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum("cents").over(wAll))
      .withColumn("stat", abs(col("i") * col("total") - col("n") * col("cum")))
    val maxStat = stats.groupBy("event_type").agg(max("stat").as("mx"))
    val out = q("q_cusum_changepoint")
    val mismatched = out.join(maxStat, "event_type")
      .where(col("cusum_stat") =!= col("mx"))
    assert(mismatched.count() == 0L)
    // one changepoint per event_type
    assert(out.count() == out.select("event_type").distinct().count())
  }

  test("readability is bounded and monotone in the vowel ratio") {
    val r = q("q_readability")
    // all inputs positive; flesch finite
    assert(r.where(col("words") < 1L || col("sentences") < 1L).count() == 0L)
    assert(r.where(isnull(col("flesch")) || isnan(col("flesch"))).count() == 0L)
  }
}
