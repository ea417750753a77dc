package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-bigram language identification — the heuristic counterpart of
  * the SQL-oracled stopword vote in TextOps (q_langid). Profiles are
  * high-frequency character bigrams per language (from public frequency
  * tables); a document scores each language by profile overlap of its
  * bigram set, normalized by profile size. Pure Column composition — no
  * UDF, no driver state; evaluates per-row and scales embarrassingly.
  */
object LangId {

  /** Top character bigrams per language. */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
      "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"),
    "es" -> Seq("de", "es", "en", "el", "la", "os", "ue", "ra", "qu", "do",
      "er", "as", "on", "st", "ad", "al", "or", "ta", "ci", "io"),
    // all entries must be BIgrams — a trigram can never match the bigram
    // set and silently deflates the language's normalized score
    "de" -> Seq("er", "en", "ch", "de", "ei", "nd", "te", "in", "ie", "ge",
      "st", "ne", "be", "es", "un", "ic", "an", "he", "au", "ng"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "er", "te", "el",
      "an", "ai", "se", "et", "la", "it", "me", "ou", "em", "ie"))

  /** Distinct character bigrams of the (lowercased) named text column. */
  def bigrams(textColName: String): Column = expr(
    s"""array_distinct(CASE WHEN size(split(lower($textColName), '')) >= 2
        THEN transform(sequence(1, size(split(lower($textColName), '')) - 1),
                       i -> concat(split(lower($textColName), '')[i-1],
                                   split(lower($textColName), '')[i]))
        ELSE array() END)""")

  /** Predicted language of the named text column among the profiled
    * languages (alphabetical tie-break); "und" when nothing matches.
    */
  def predict(textColName: String): Column = {
    val grams = bigrams(textColName)
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      val arr = prof.map(b => s"'$b'").mkString("array(", ", ", ")")
      lang -> (size(array_intersect(grams, expr(arr))).cast("double") / prof.size)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0.0, lit(lang)).otherwise(acc)
    }
  }
}
