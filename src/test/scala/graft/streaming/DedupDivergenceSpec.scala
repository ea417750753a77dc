package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Pins WHY D1 needs custom state (SURVEY.md §7.4): Spark's built-in
  * dropDuplicates keeps a SET of seen ids, the reference keeps a
  * monotone per-key MAX (producer_company_news.py:133). The observable
  * divergence: an id that arrives late and is BELOW the key's
  * high-watermark but was never actually seen — the set emits it, the
  * reference drops it. This spec drives both operators over the same two
  * micro-batches and asserts they disagree exactly there.
  */
class DedupDivergenceSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def newsJson(symbol: String, id: Long, dt: Long): String =
    s"""{"symbol":"$symbol","id":$id,"datetime":$dt,"category":"company","headline":"h$id","summary":"s","source":"src","url":"u","image":"i"}"""

  test("late below-watermark id: set-based dedup emits, monotone-max drops") {
    // watermark path
    val inW = MemoryStream[String]
    val qW = Pipelines.news(inW.toDF().toDF("value"))
      .writeStream.format("memory").queryName("div_watermark")
      .outputMode(OutputMode.Append).start()
    // set path: same decode, built-in set dedup on (symbol, news_id)
    val inS = MemoryStream[String]
    val qS = Pipelines.newsArticles(Pipelines.decodeNews(inS.toDF().toDF("value")))
      .dropDuplicates("symbol", "news_id")
      .writeStream.format("memory").queryName("div_set")
      .outputMode(OutputMode.Append).start()

    val batch1 = Seq(newsJson("AAPL", 10L, 1700000000L))
    val batch2 = Seq(newsJson("AAPL", 5L, 1700000300L)) // late, < max, never seen
    for ((in, q) <- Seq((inW, qW), (inS, qS))) {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      q.stop()
    }
    val watermarkIds = spark.table("div_watermark")
      .select("news_id").collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    val setIds = spark.table("div_set")
      .select("news_id").collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    assert(watermarkIds.toSet == Set(10L))     // reference semantics: 5 dropped
    assert(setIds.toSet == Set(10L, 5L))       // built-in set: 5 emitted
  }

  test("hot-key batch: 100k single-key articles dedup in one pass, sorted") {
    // guards the documented it.toSeq bound: one key's slice of one
    // micro-batch materializes for the O1 sort, so a hot symbol must stay
    // O(n log n) time and O(batch) memory — not quadratic
    import graft.model.NewsArticle
    import java.sql.Timestamp
    val batch = (1 to 100000).map { i =>
      NewsArticle("S", Some((i.toLong * 7919L) % 100000L), new Timestamp(0),
        Some(new Timestamp((i % 997).toLong)), None, None, None, None, None, None)
    }
    val t0 = System.nanoTime()
    val (mx, out) = HighWatermarkDedup.dedupBatch(0L, batch)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 10, s"took $secs s")
    assert(mx == 99999L)
    val keys = out.map(a => (a.published_ts.map(_.getTime).getOrElse(0L), a.news_id.getOrElse(0L)))
    assert(keys == keys.sorted)
  }
}
