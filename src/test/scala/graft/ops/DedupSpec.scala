package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Pins the sketch-based dedup variants (no DuckDB oracle) against the
  * exact Jaccard ground truth on the driver's deterministic documents
  * table.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf001, "documents")
  private lazy val exact = TextDedup.ngramJaccardPairs(docs, 0.6)
    .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash pairs are a subset of exact pairs (precision 1 by construction)") {
    val mh = TextDedup.minhashPairs(docs, 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact))
    // 16 bands x 4 rows at j>=0.7 -> expected recall ~0.99; require >=0.9
    assert(exact.nonEmpty && mh.size.toDouble / exact.size >= 0.9,
      s"recall ${mh.size}/${exact.size}")
  }

  test("simhash finds the planted near-dup pairs at small Hamming distance") {
    val sh = TextDedup.simhashPairs(docs, maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // word-level simhash overlaps strongly with shingle-Jaccard truth
    assert(sh.nonEmpty)
    val hits = sh.intersect(exact).size
    assert(hits.toDouble / sh.size >= 0.5, s"precision vs exact: $hits/${sh.size}")
  }

  test("md5-regime simhash (the gate fingerprint) finds near-dup pairs too") {
    // q_dedup_simhash's declared form: same banding, MD5-derived 60-bit
    // fingerprint (DuckDB-replayable). Same planted-pair quality bar as
    // the xxhash production fingerprint above.
    val fp = docs.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.md5Simhash60(col("text")).as("h"))
    val sh = TextDedup.hammingBandedPairs(fp, maxHamming = 3, bands = 4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    val hits = sh.intersect(exact).size
    assert(hits.toDouble / sh.size >= 0.5, s"precision vs exact: $hits/${sh.size}")
  }

  test("connected components label chained near-dups with the min id") {
    import spark.implicits._
    // components: {1,2,3,9} (chained), {5,6}, isolated nodes absent
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("a_id", "b_id")
    val cc = TextDedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("exact dedup keeps one keeper per distinct text") {
    val d = TextDedup.queries.find(_.name == "q_dedup_exact").get.fn(spark, sf001)
    val n = d.agg(sum("n_copies")).head.getLong(0)
    assert(n == docs.count())
  }

  test("hash-based exact dedup equals text-based exact dedup") {
    val byText = TextDedup.queries.find(_.name == "q_dedup_exact").get.fn(spark, sf001)
    val byHash = TextDedup.queries.find(_.name == "q_dedup_exact_hash").get.fn(spark, sf001)
    assert(byText.except(byHash).count() == 0 && byHash.except(byText).count() == 0)
  }

  test("approx percentile within 2% of exact") {
    val e = Tables.load(spark, sf001, "events")
    val both = e.groupBy("event_type").agg(
      expr("percentile(value, 0.9)").as("exact"),
      percentile_approx(col("value"), lit(0.9), lit(10000)).as("approx"))
    val rel = both.select((abs(col("exact") - col("approx")) / col("exact")).as("err"))
      .collect().map(_.getDouble(0))
    assert(rel.forall(_ <= 0.02), rel.toSeq.toString)
  }

  test("incrementalDedup: bloom fast-path invisible (exact vs plain anti-join)") {
    // batch/corpus split must be NON-empty on both sides and, on synthetic
    // dup structure, actually exercise both branches (novel + suspicious)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    assert(batch.count() > 0 && corpus.count() > 0)
    val out = TextDedup.incrementalDedup(batch, corpus)
    val plain = batch.join(corpus.select("text").distinct(), Seq("text"), "left_anti")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // null text must surface as novel (NOT-EXISTS semantics: null never
    // equals a corpus row), not vanish into a null bloom probe
    val withNull = batch.select(col("doc_id"), col("source"), col("n_chars"),
      when(col("doc_id") === 9L, lit(null)).otherwise(col("text")).as("text"))
    val outN = TextDedup.incrementalDedup(withNull, corpus)
    assert(outN.filter(col("doc_id") === 9L).count() == 1,
      "null-text batch row must be kept as novel")
  }

  test("approx_count_distinct is within 5% of exact") {
    val e = Tables.load(spark, sf001, "events")
    val exactCounts = e.groupBy("event_type").agg(countDistinct("user_id").as("x"))
    val approx = e.groupBy("event_type").agg(approx_count_distinct("user_id", 0.01).as("a"))
    val joined = exactCounts.join(approx, "event_type")
      .select(abs(col("x") - col("a")).cast("double") / col("x")).collect()
    assert(joined.forall(_.getDouble(0) <= 0.05))
  }

  test("repeatedSpans crossDocOnly: within-doc repeats flagged only in the any-repeat mode") {
    import spark.implicits._
    val chunk = (1 to 10).map(i => s"w$i").mkString(" ")
    val filler = (1 to 10).map(i => s"f$i").mkString(" ")
    val other = (1 to 10).map(i => s"z$i").mkString(" ")
    // doc 1 repeats `chunk` twice INTERNALLY; docs 2+3 SHARE `other`
    val docs = Seq(
      (1L, s"$chunk $filler $chunk"),
      (2L, s"$other intro words here"),
      (3L, s"closing words $other")).toDF("doc_id", "text")
    def spansOf(crossDoc: Boolean): Set[Long] =
      TextDedup.repeatedSpans(docs, 10, crossDocOnly = crossDoc)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // any-repeat mode sees all three; cross-document mode must NOT cut
    // doc 1's internal repetition
    assert(spansOf(false) == Set(1L, 2L, 3L))
    assert(spansOf(true) == Set(2L, 3L))
  }
}
