package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Record types of the reference's two topics, normalized per SURVEY.md
  * §1.3: the redundant unix/ISO timestamp pair becomes one TimestampType
  * event-time column; the string form is derived on demand.
  *
  * stock_quotes fields: ref producer_stock_quotes.py:98-110.
  * company_news fields: ref producer_company_news.py:152-164.
  */
final case class StockQuote(
    symbol: String,
    fetch_ts: Timestamp,          // processing time (fetch_timestamp_utc)
    event_ts: Option[Timestamp],  // quote_timestamp_unix, normalized
    current_price: Double,
    change: Option[Double],
    percent_change: Option[Double],
    high_price_day: Option[Double],
    low_price_day: Option[Double],
    open_price_day: Option[Double],
    previous_close_price: Option[Double])

final case class NewsArticle(
    symbol: String,
    news_id: Option[Long],        // dedup key; None bypasses dedup (ref :128-131)
    fetch_ts: Timestamp,
    published_ts: Option[Timestamp],
    category: Option[String],
    headline: Option[String],
    summary: Option[String],
    source: Option[String],
    url: Option[String],
    image_url: Option[String])

object Schemas {

  /** Wire schema of the quotes topic (Finnhub short keys, pre-projection —
    * what E2 deserializes; ref processor_stock_quotes.py:35-44).
    */
  val quoteWire: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("c", DoubleType),                 // current price
    StructField("d", DoubleType),                 // change
    StructField("dp", DoubleType),                // percent change
    StructField("h", DoubleType),
    StructField("l", DoubleType),
    StructField("o", DoubleType),
    StructField("pc", DoubleType),
    StructField("t", LongType)))                  // event time, unix seconds

  /** Wire schema of one news article (ref producer_company_news.py:152-164). */
  val newsWire: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("id", LongType),
    StructField("datetime", LongType),            // published, unix seconds
    StructField("category", StringType),
    StructField("headline", StringType),
    StructField("summary", StringType),
    StructField("source", StringType),
    StructField("url", StringType),
    StructField("image", StringType)))
}
