package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec, Tables}

/** Invariants of the corpus-curation operators (PipelineOps) and the
  * clustering/SemDeDup stage (Similarity) that the SQL oracles can't
  * express directly — cap bounds, sampling monotonicity, and the kept-set
  * contract of semantic dedup.
  */
class PipelineOpsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf001, "documents")
  private lazy val emb = Tables.load(spark, sf001, "embeddings")

  test("domainCap keeps at most N per source, the N smallest doc_ids") {
    val out = PipelineOps.domainCap(docs, 10)
    val bySrc = out.groupBy("source").count().collect()
    assert(bySrc.forall(_.getLong(1) <= 10))
    // kept ids per source are exactly the 10 smallest
    val smallest = docs.groupBy("source")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 10).as("ids"))
      .select(col("source"), explode(col("ids")).as("doc_id"))
    assert(out.select("source", "doc_id").exceptAll(smallest).isEmpty)
    assert(smallest.exceptAll(out.select("source", "doc_id")).isEmpty)
  }

  test("sourceMix is a deterministic subset with per-source rates ordered") {
    val out = PipelineOps.sourceMix(docs,
      Seq("src0" -> "ff", "src1" -> "ff", "src2" -> "7f"), "19")
    // 'ff' threshold keeps every md5 prefix -> src0 keeps all its docs
    val n0 = out.filter(col("source") === "src0").count()
    assert(n0 == docs.filter(col("source") === "src0").count())
    // rate monotonicity: the 7f source keeps a larger fraction than a 19 one
    val n2 = out.filter(col("source") === "src2").count().toDouble /
      docs.filter(col("source") === "src2").count()
    val nRest = out.filter(!col("source").isin("src0", "src1", "src2")).count().toDouble /
      docs.filter(!col("source").isin("src0", "src1", "src2")).count()
    assert(n2 > nRest, s"rate(src2)=$n2 rate(rest)=$nRest")
    // replay-stable: a second evaluation returns the identical set
    assert(out.exceptAll(PipelineOps.sourceMix(docs,
      Seq("src0" -> "ff", "src1" -> "ff", "src2" -> "7f"), "19")).isEmpty)
  }

  test("decontaminate flags only non-eval docs and honors the overlap floor") {
    val out = PipelineOps.decontaminate(docs, col("doc_id") % 97 === 0, 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 97 != 0), "an eval doc flagged itself")
    assert(out.forall(_.getLong(1) >= 2))
  }

  test("decontaminate broadcasts the eval side (corpus never shuffles for the join)") {
    val plan = PipelineOps.decontaminate(docs, col("doc_id") % 97 === 0, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(20).mkString("\n"))
  }

  test("unigramLogprob: token counts survive the scoring join; scores positive") {
    val out = PipelineOps.unigramLogprob(docs)
    val n = out.agg(sum("n_tokens")).collect()(0).getLong(0)
    val expected = docs.select(size(split(col("text"), " ")).cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(n == expected, s"token instances $n != $expected")
    // every doc scored, -ln p of a proper distribution is positive
    assert(out.count() == docs.count())
    assert(out.filter(col("avg_nll") <= 0).isEmpty)
  }

  test("quality gate keeps at least three quarters of the corpus, none below threshold") {
    val q = SparkEntry.queries("q_quality_gate")(spark, sf001)
    val kept = q.collect()
    val n = docs.count()
    assert(kept.length >= n * 3 / 4, s"${kept.length} of $n kept")
    val thr = kept.map(_.getLong(1)).min
    // the discrete p25 is an actual data point: something sits exactly at it
    assert(kept.exists(_.getLong(1) == thr))
  }

  test("effectiveMix down-weights a syndicated source vs the plain temperature mix") {
    import spark.implicits._
    // srcFresh: 40 docs, 30 of them globally unique (75% unique
    // shingles). srcCopy: 10 docs, ALL verbatim copies of fresh docs ->
    // n_unique = 0 -> eff = 0 -> rate 0, while a plain doc-count
    // temperature mix would sample it in proportion to its row count.
    val fresh = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(j => s"fresh${i}w$j").mkString(" "), "srcFresh")
    }
    val copied = (0 until 10).map { i =>
      (100L + i, fresh(i)._2, "srcCopy") // verbatim copy of a fresh doc
    }
    val df = (fresh ++ copied).toDF("doc_id", "text", "source")
    val eff = PipelineOps.effectiveMix(df).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(!eff.exists(_._1 == "srcCopy"),
      s"a fully-syndicated source must rate 0: ${eff.filter(_._1 == "srcCopy").toSeq}")
    assert(eff.count(_._1 == "srcFresh") > 0,
      "the fresh source must still be sampled")
    // determinism: same input -> same selection
    val again = PipelineOps.effectiveMix(df).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(eff.toSeq == again.toSeq)
  }

  test("uint8 quantization error is bounded by half a step") {
    val q = SparkEntry.queries("q_embed_quantize")(spark, sf001).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val scale = r.getDouble(1)
      val rmse = r.getDouble(2)
      // per-dim |err| <= scale/2 for in-range affine rounding => rmse too
      assert(rmse <= scale / 2 + 1e-12, s"vec ${r.getLong(0)}: rmse $rmse scale $scale")
    }
  }

  test("epochShuffle: a different seed reshuffles; shards stay balanced") {
    val e1 = PipelineOps.epochShuffle(docs, "epoch1", 8)
    val e2 = PipelineOps.epochShuffle(docs, "epoch2", 8)
    val p1 = e1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p2 = e2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both are permutations of 0..n-1
    assert(p1.values.toSeq.sorted == (0L until p1.size.toLong))
    assert(p2.keySet == p1.keySet)
    // epochs genuinely differ (not a derangement requirement — just "moved")
    assert(p1.count { case (k, v) => p2(k) != v } > p1.size / 2)
    // loader shards balanced within one doc
    val sizes = e1.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
  }

  test("epochShuffle: positions invariant across md5 hex-prefix widths") {
    // the bucket width is a pure parallelism knob: any md5 prefix is a
    // prefix of the full-hash order, so bucket-offset + in-bucket rank
    // must equal the SAME global rank at every width (w=1 → 16 fat
    // buckets, w=4 → 65,536 — the 100 TB default where no task ever
    // window-sorts more than ~corpus/65k rows)
    def pos(w: Int): Set[(Long, Long)] =
      PipelineOps.epochShuffle(docs, "epoch1", 8, hexPrefix = w)
        .select(col("doc_id"), col("shuffle_pos")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pos(1)
    assert(base.nonEmpty)
    for (w <- Seq(2, 3, 4))
      assert(pos(w) == base, s"hexPrefix=$w diverged from w=1")
  }

  test("cdcDedup is insertion-robust where fixed segments are not") {
    import spark.implicits._
    // doc 1 = doc 0 with one word inserted near the front. Fixed-width
    // segmentation shifts every later segment; CDC boundaries re-sync, so
    // all of doc 1's chunks after the edited one dedup away.
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val edited = "w1 INSERTED " + (2 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val out = TextDedup.cdcDedup(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // doc 0 keeps everything
    assert(out(0L)._2 == base)
    // doc 1 keeps ONLY the chunk containing the insertion, far fewer than
    // its total chunk count (which the fixed-segment scheme would keep in
    // full: every 20-word segment after the insertion differs from doc 0)
    assert(out(1L)._1 <= 2, s"CDC kept ${out(1L)._1} chunks of doc 1")
    assert(out(1L)._2.contains("INSERTED"))
    val fixedKept = TextDedup.segmentDedup(docs, 20).collect()
      .find(_.getLong(0) == 1L).get.getString(1)
    assert(fixedKept.length > out(1L)._2.length,
      "fixed segments should have kept more (shifted) content than CDC")
  }

  test("repeatedSpans finds planted cross-doc and within-doc repeats, merged maximally") {
    import spark.implicits._
    val shared = (1 to 15).map(i => s"s$i").mkString(" ") // 15-word shared run
    val a = s"a1 a2 a3 $shared a4 a5 a6"
    val b = s"b1 b2 $shared b3 b4 b5 b6 b7"
    // doc 2 repeats ITS OWN 12-word run twice, back to back
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val c = s"c1 $run c2 c3 $run c4"
    val docs = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val spans = TextDedup.repeatedSpans(docs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 0: shared run occupies words 3..17 -> one merged span exactly
    assert(spans.contains((0L, 3L, 17L)), spans.toString)
    // doc 1: words 2..16
    assert(spans.contains((1L, 2L, 16L)), spans.toString)
    // doc 2: both copies of the self-repeat are flagged (positions 1..12
    // and 15..26); they are within k-1 of each other here only if the gap
    // allows — assert both runs are covered by SOME span
    val d2 = spans.filter(_._1 == 2L)
    assert(d2.exists(s => s._2 <= 1 && s._3 >= 12), d2.toString)
    assert(d2.exists(s => s._2 <= 15 && s._3 >= 26), d2.toString)
    // no span in the unrepeated doc-0 prefix
    assert(!spans.exists(s => s._1 == 0L && s._3 < 3), spans.toString)
  }

  test("kmeansAssign covers every vector with a seed-range cell") {
    val asg = Similarity.kmeansAssign(spark, emb, 8)
    assert(asg.count() == emb.filter(col("embedding").isNotNull).count())
    val cells = asg.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf((0L until 8L).toSet), s"cells $cells")
  }

  test("semDedup kept set has no same-cell pair at or above the threshold") {
    val kept = Similarity.semDedup(spark, emb, 8, 0.4)
    assert(kept.count() < emb.count(), "nothing was deduped at tau=0.4")
    // join the kept assignments against the exact cosine pairs: no
    // surviving pair may share a cell
    val pairs = Similarity.cosinePairs(spark, emb, 0.4)
    val ka = kept.select(col("vec_id").as("a_id"), col("cell").as("a_cell"))
    val kb = kept.select(col("vec_id").as("b_id"), col("cell").as("b_cell"))
    val violations = pairs.join(ka, "a_id").join(kb, "b_id")
      .filter(col("a_cell") === col("b_cell"))
    assert(violations.isEmpty, violations.collect().mkString(", "))
  }

  test("decontaminateSpans: bounds, disjointness, eval attribution") {
    val out = PipelineOps.decontaminateSpans(docs, col("doc_id") % 97 === 0, 3)
      .collect()
    assert(out.nonEmpty, "fixture produced no contaminated spans")
    assert(out.forall(_.getLong(0) % 97 != 0), "an eval doc got a span")
    assert(out.forall(r => r.getAs[Long]("min_eval_id") % 97 == 0))
    assert(out.forall(r => r.getAs[Long]("n_eval_docs") >= 1L))
    assert(out.forall(r => r.getAs[Long]("span_words") ==
      r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1L))
    // islands separated by a gap > k-1 cannot touch after the +k-1 extension
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      rs.toSeq.sortBy(_.getAs[Long]("span_start")).sliding(2).foreach {
        case Seq(a, b) => assert(a.getAs[Long]("span_end") <
          b.getAs[Long]("span_start"), s"overlapping spans: $a $b")
        case _ => ()
      }
    }
  }

  test("decontaminateSpans: spans inside doc bounds; doc set == decontaminate at floor 1") {
    val spans = PipelineOps.decontaminateSpans(docs, col("doc_id") % 97 === 0, 3)
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    assert(spans.join(lens, "doc_id")
      .where(col("span_end") >= col("n") || col("span_start") < 0).count() == 0L)
    // the window machinery and the shingle-set machinery agree on WHICH
    // docs are contaminated (same 3-word convention incl. the short-doc
    // whole-text fallback)
    val spanDocs = spans.select("doc_id").distinct()
    val flagged = PipelineOps.decontaminate(docs, col("doc_id") % 97 === 0, 1)
      .select("doc_id")
    assert(spanDocs.exceptAll(flagged).isEmpty &&
      flagged.exceptAll(spanDocs).isEmpty)
  }

  test("decontaminate_removed: per-doc removal equals total span words") {
    val q = graft.SparkEntry.queries("q_decontaminate_removed")(spark, sf001)
    val spans = PipelineOps.decontaminateSpans(docs, col("doc_id") % 97 === 0, 3)
      .groupBy("doc_id").agg(sum("span_words").as("w"))
    // spans are disjoint (pinned above), so the cut removes exactly their sum
    assert(q.join(spans, Seq("doc_id"), "left")
      .where(coalesce(col("w"), lit(0L)) =!= col("n_removed")).count() == 0L)
    // untouched docs keep their original text byte-for-byte
    val orig = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
    assert(q.filter(col("n_removed") === 0L).join(orig, "doc_id")
      .where(col("clean_md5") =!= col("m")).count() == 0L)
  }

  test("ccnetBuckets: spine rank equals a JVM per-lang sort; thirds split exactly") {
    val got = PipelineOps.ccnetBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4),
        r.getString(5)))
    assert(got.nonEmpty)
    for ((lang, rows) <- got.groupBy(_._2)) {
      val n = rows.length
      // the two-phase spine rank must equal the plain per-lang
      // (avg_nll, doc_id) sort rank
      val expected = rows.sortBy(r => (r._3, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
      rows.foreach { r => assert(r._4 == expected(r._1), s"$lang rank ${r._1}") }
      // rank-third semantics: head = floor(n/3) docs, tail = the
      // strictly-worst third, and buckets follow the rank order
      val byB = rows.groupBy(_._5).view.mapValues(_.length).toMap
      assert(byB.getOrElse("head", 0) == n / 3)
      assert(byB.getOrElse("middle", 0) == 2 * n / 3 - n / 3)
      assert(byB.getOrElse("tail", 0) == n - 2 * n / 3)
      val worstHead = rows.filter(_._5 == "head").map(_._4).maxOption.getOrElse(0L)
      val bestTail = rows.filter(_._5 == "tail").map(_._4).min
      assert(worstHead < bestTail)
    }
  }
}
