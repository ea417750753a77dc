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

  test("packDecontaminate: coordinates consistent, counts sane") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextOps.packDecontaminate(docs, col("doc_id") % 97 === 0,
      ngram = 5).collect()
    // shard/seq arithmetic agrees row-by-row; first_pos lands in its seq
    assert(out.forall(r => r.getAs[Long]("shard") == r.getAs[Long]("seq") / 8L))
    assert(out.forall(r => r.getAs[Long]("first_pos") / 256L ==
      r.getAs[Long]("seq")))
    assert(out.forall(r => r.getAs[Long]("n_hits") >=
      math.max(r.getAs[Long]("n_eval_docs"), r.getAs[Long]("n_train_docs"))))
  }

  test("shardProvenance conserves every source's token count; shard rows bounded") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextOps.shardProvenance(docs)
    // per-source conservation: provenance sums == the source's encoded size
    val enc = docs.select(col("source"),
      size(graft.functions.BpeEncodeIds.bpeIds(col("text"))).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("expected"))
    val bad = out.groupBy("source").agg(sum("n_tokens").as("got"))
      .join(enc, "source").where(col("got") =!= col("expected"))
    assert(bad.count() == 0L, bad.collect().mkString(", "))
    // no (shard, source) cell can exceed the shard's token capacity
    assert(out.where(col("n_tokens") > 2048L || col("n_tokens") < 1L).count() == 0L)
    // shards are contiguous from 0
    val shards = out.select("shard").distinct()
    assert(shards.count() == shards.agg(max("shard")).head().getLong(0) + 1)
    // the SHUFFLED layout conserves the same per-source totals (a
    // permutation moves tokens, never creates them) but re-seats the
    // per-shard composition
    val shuf = TextOps.shardProvenance(docs, shuffleSeed = Some("epoch1"))
    val badShuf = shuf.groupBy("source").agg(sum("n_tokens").as("got"))
      .join(enc, "source").where(col("got") =!= col("expected"))
    assert(badShuf.count() == 0L)
    assert(shuf.exceptAll(out).count() > 0L, "shuffle did not re-seat the layout")
  }

  test("pack_decontaminated ships exactly the survivor corpus's tokens") {
    val q = graft.SparkEntry.queries("q_pack_decontaminated")(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val flagged = PipelineOps.decontaminate(docs, col("doc_id") % 97 === 0, 2)
      .select("doc_id")
    val survivors = docs.filter(col("doc_id") % 97 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
    val expected = survivors.select(
      size(graft.functions.BpeEncodeIds.bpeIds(col("text"))).cast("long").as("nt"))
      .agg(sum("nt")).head().getLong(0)
    assert(q.agg(sum("n_tokens")).head().getLong(0) == expected)
    // and it differs from the undecontaminated pack (boundaries re-seat)
    val plain = graft.SparkEntry.queries("q_pack_shards")(spark, sf0001)
    assert(plain.agg(sum("n_tokens")).head().getLong(0) > expected)
  }

  test("packDecontaminate finds a PLANTED token-run leak at its exact pack position") {
    import spark.implicits._
    // doc 0 is eval (0 % 97 == 0); train doc 1 embeds eval doc 0's exact
    // word run, train doc 2 is unrelated filler that packs FIRST (doc_id
    // order puts doc 1 after... doc 1 < doc 2, so doc 1 packs first at
    // offset 0). The leak's position is doc1's offset plus the id-index
    // where the shared run begins.
    val docs = Seq(
      (0L, "quick brown foxes jump over lazy dogs"),
      (1L, "zzz quick brown foxes jump over lazy dogs yyy"),
      (2L, "completely unrelated filler words here")
    ).toDF("doc_id", "text")
    val out = TextOps.packDecontaminate(docs, col("doc_id") === 0L, ngram = 5)
      .collect()
    assert(out.nonEmpty, "planted leak not found")
    // expected first position: doc 1 is the first train doc, so its
    // offset is 0; the shared run starts after 'zzz' encodes
    val ids = docs.select(col("doc_id"),
      graft.functions.BpeEncodeIds.bpeIds(col("text")).as("tids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val evalIds = ids(0L)
    val d1 = ids(1L)
    val runStart = d1.indexOfSlice(evalIds.take(5))
    assert(runStart > 0, s"fixture broken: ${d1} vs ${evalIds}")
    assert(out.map(_.getAs[Long]("first_pos")).min == runStart.toLong)
    // the unrelated doc contributes no hits
    assert(out.forall(_.getAs[Long]("n_train_docs") == 1L))
    // ...and the loss mask is EXACTLY the planted run's coverage: one
    // interval from the run's first id to its last (tiny fixture — all
    // in sequence 0)
    val mask = TextOps.packLossMask(docs, col("doc_id") === 0L, ngram = 5)
      .collect()
    assert(mask.length == 1, mask.mkString(", "))
    assert(mask(0).getAs[Long]("mask_start") == runStart.toLong)
    assert(mask(0).getAs[Long]("mask_end") == (runStart + evalIds.length - 1).toLong)
    assert(mask(0).getAs[Long]("mask_tokens") == evalIds.length.toLong)
  }

  test("packLossMask: intervals inside their sequence, disjoint, exact token counts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextOps.packLossMask(docs, col("doc_id") % 97 === 0, ngram = 5)
      .collect()
    assert(out.forall(r => r.getAs[Long]("mask_start") / 256L ==
      r.getAs[Long]("seq") &&
      r.getAs[Long]("mask_end") / 256L == r.getAs[Long]("seq")))
    assert(out.forall(r => r.getAs[Long]("mask_tokens") ==
      r.getAs[Long]("mask_end") - r.getAs[Long]("mask_start") + 1L))
    out.groupBy(_.getAs[Long]("seq")).values.foreach { rs =>
      rs.toSeq.sortBy(_.getAs[Long]("mask_start")).sliding(2).foreach {
        case Seq(a, b) => assert(a.getAs[Long]("mask_end") + 1L <
          b.getAs[Long]("mask_start"), s"mergeable intervals: $a $b")
        case _ => ()
      }
    }
  }
}
