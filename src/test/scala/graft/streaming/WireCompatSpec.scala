package graft.streaming

import graft.SparkSpec

class WireCompatSpec extends SparkSpec {
  import spark.implicits._

  test("withWireColumns reproduces the reference's redundant timestamp wire fields") {
    val raw = Seq(
      """{"symbol":"AAPL","c":190.5,"d":1.2,"dp":0.6,"h":191.0,"l":188.0,"o":189.0,"pc":189.3,"t":1700000000}"""
    ).toDF("value")
    val engine = Pipelines.quotes(Pipelines.decodeQuotes(raw))
    val wire = Pipelines.withWireColumns(engine)
    val row = wire.collect()(0)
    assert(row.getAs[Long]("quote_timestamp_unix") == 1700000000L)
    // python: datetime.fromtimestamp(1700000000, tz=timezone.utc).isoformat()
    assert(row.getAs[String]("quote_timestamp_utc") == "2023-11-14T22:13:20+00:00")
    // fetch_ts = current_timestamp() carries micros: isoformat shape with
    // optional 6-digit fraction, "+00:00" offset (never "Z")
    assert(row.getAs[String]("fetch_timestamp_utc")
      .matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{6})?\+00:00"""))
    assert(row.getAs[Double]("current_price") == 190.5)
    // the reference's exact field set, producer construction order
    // (producer_stock_quotes.py:98-110)
    assert(wire.columns.toSeq == Seq(
      "symbol", "fetch_timestamp_utc", "quote_timestamp_unix", "quote_timestamp_utc",
      "current_price", "change", "percent_change", "high_price_day",
      "low_price_day", "open_price_day", "previous_close_price"))
  }

  test("withNewsWireColumns: unix/ISO pair derives from published_ts; nulls propagate") {
    implicit val s = spark
    val raw = Seq(
      """{"symbol":"AAPL","id":7,"datetime":1700000000,"category":"company","headline":"h","summary":"s","source":"src","url":"u","image":"img"}""",
      """{"symbol":"MSFT","id":8,"category":"company","headline":"h2","summary":"s2","source":"src","url":"u2","image":null}"""
    ).toDF("value")
    val wire = Pipelines.withNewsWireColumns(
      Pipelines.newsArticles(Pipelines.decodeNews(raw)).toDF())
    assert(wire.columns.toSeq == Seq(
      "symbol", "news_id", "fetch_timestamp_utc", "article_published_unix",
      "article_published_utc", "category", "headline", "summary",
      "source", "url", "image_url"))
    val rows = wire.collect().map(r => r.getAs[String]("symbol") -> r).toMap
    assert(rows("AAPL").getAs[Long]("article_published_unix") == 1700000000L)
    assert(rows("AAPL").getAs[String]("article_published_utc") == "2023-11-14T22:13:20+00:00")
    // missing datetime -> both wire forms null, like the producer's None
    assert(rows("MSFT").isNullAt(rows("MSFT").fieldIndex("article_published_unix")))
    assert(rows("MSFT").isNullAt(rows("MSFT").fieldIndex("article_published_utc")))
  }

  test("symbol-universe filter reproduces the producers' tracked-symbols invariant") {
    import graft.model.GraftConfig
    assert(GraftConfig.SymbolsToTrack ==
      Seq("AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META")) // ref config.py:4
    val df = Seq("AAPL", "META", "UNTRACKED").toDF("symbol")
    val kept = df.filter(GraftConfig.inUniverse).collect().map(_.getString(0)).toSet
    assert(kept == Set("AAPL", "META"))
  }
}
