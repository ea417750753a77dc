package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.LangId

class SkewAndLangSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation (exact, deterministic)") {
    val e = Tables.load(spark, sf001, "events")
      .withColumn("v", col("value").cast("decimal(18,2)")) // exact merge
    val direct = e.groupBy(col("event_type").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val (salted, merged) = Skew.saltedAgg(e, col("event_type"), col("v"),
      saltBuckets = 16, saltSource = col("event_id"))
    // phase 1 fanned the hot keys out across reducers
    assert(salted.groupBy("k").count().agg(max("count")).head.getLong(0) > 1)
    val diff = direct.except(merged).count() + merged.except(direct).count()
    assert(diff == 0)
  }

  test("char-bigram language id on real sentences") {
    val samples = Seq(
      ("the quick brown fox jumps over the lazy dog and then sits there", "en"),
      ("el rapido zorro marron salta sobre el perro perezoso de la granja", "es"),
      ("der schnelle braune fuchs springt uber den faulen hund und rennt", "de"),
      ("le renard brun rapide saute par dessus le chien paresseux ensemble", "fr"))
      .toDF("text", "expected")
    val got = samples.withColumn("pred", LangId.predict("text"))
      .filter(col("pred") === col("expected")).count()
    assert(got >= 3, "at least 3 of 4 languages identified")
  }

  test("langid returns und on unmatchable input") {
    val d = Seq(("0123 456 789", "x")).toDF("text", "junk")
    assert(d.select(LangId.predict("text")).head.getString(0) == "und")
  }
}
