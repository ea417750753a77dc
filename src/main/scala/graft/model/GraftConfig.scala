package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Engine analogue of the reference's shared config (src/config.py:4-5):
  * the tracked symbol universe and the polling cadences the producers
  * hard-code. The universe drives an optional ingest filter (the
  * producers only ever FETCH tracked symbols, so a topic fed by another
  * producer needs the filter to reproduce that invariant); the cadences
  * are the `Trigger.ProcessingTime` intervals the lake jobs use in
  * continuous mode (H1).
  */
object GraftConfig {

  /** ref config.py:4 */
  val SymbolsToTrack: Seq[String] =
    Seq("AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META")

  /** ref producer_stock_quotes.py:45 (60 s poll cycle). */
  val QuotesCadence: String = "60 seconds"

  /** ref producer_company_news.py:44-45 (15 min poll, 2-day lookback —
    * the lookback is also the natural watermark delay for late news).
    */
  val NewsCadence: String = "15 minutes"
  val NewsLookbackDays: Int = 2

  /** Predicate for "symbol is in the tracked universe". */
  def inUniverse: Column = col("symbol").isin(SymbolsToTrack: _*)
}
