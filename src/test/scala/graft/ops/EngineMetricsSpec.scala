package graft.ops

import graft.SparkSpec

/** Measured-runtime pins for the scale claims the plan-shape tests assert
  * structurally: partial aggregation and broadcast dims must SHRINK the
  * shuffled volume, and the deliberately-shuffling paths must show the
  * volume they claim to pay.
  */
class EngineMetricsSpec extends SparkSpec {

  private def prof(name: String) =
    EngineMetrics.profile(graft.SparkEntry.queries(name)(spark, sf0001))

  test("q_join_star: measured shuffle carries groups, not fact rows") {
    val p = prof("q_join_star")
    assert(p.scanRows > 5000, s"expected the sf0.001 lineitem scan, got $p")
    assert(p.broadcastExchanges >= 3, s"all three dims must broadcast: $p")
    // the only shuffled records are the partial-aggregate groups (25
    // nation-region pairs x map partitions) plus the tiny ordered result —
    // orders of magnitude below the fact scan
    assert(p.shuffleRecords > 0 && p.shuffleRecords < p.scanRows / 10,
      s"partial agg must shrink the shuffle: $p")
  }

  test("q_salted_join: the salted path pays the full two-sided shuffle it claims") {
    val p = prof("q_salted_join")
    // both sides shuffle every row (fact + salted-replicated dim)
    assert(p.shuffleRecords >= p.scanRows,
      s"salted join must shuffle both full sides: $p")
  }

  test("pagerank iterations re-read the persisted edge list, not the events scan") {
    // sf0.01: the minute-grain co-occurrence graph is empty at sf0.001
    // (the query's empty-graph branch would be the whole plan)
    val (ranks, persisted) = WarehouseOps.pagerankRanks(spark, sf001)
    try {
      // data-vintage guard: the driver regenerates testdata between
      // rounds — if a regeneration empties the minute-grain graph there
      // are no iterations to pin; cancel instead of failing on no defect
      assume(persisted.nonEmpty,
        "minute-grain co-occurrence graph is empty at sf0.01 for this testdata vintage")
      val nodes = EngineMetrics.ranPlanNodes(ranks)
      // the iterations' run must contain ZERO events file scans: the edge
      // build already materialized into the persisted ed/deg relations
      // when they were counted, so every iteration reads caches only — at
      // 100 TB the difference between an iteration costing |edges| and a
      // corpus re-read per round
      val fileScans = nodes.count(n =>
        n.getClass.getSimpleName == "FileSourceScanExec" &&
          n.toString.contains("events"))
      assert(fileScans == 0,
        s"iterations must not re-scan the events file, got $fileScans")
      // ...and the iterations' edge-list reads hit the persisted relation
      val cachedScans = nodes.count(
        _.getClass.getSimpleName == "InMemoryTableScanExec")
      assert(cachedScans >= 3,
        s"3 iterations must re-read the cached edge list, got $cachedScans")
    } finally persisted.foreach(_.unpersist())
  }

  test("k-core: every peel round scans strictly fewer edges than the last") {
    import org.apache.spark.sql.functions._
    // K is DERIVED from the current data vintage (the driver regenerates
    // /root/testdata between rounds, so a fixed K can silently stop
    // peeling): one above the graph's minimum degree guarantees round 1
    // peels whenever the graph is non-empty. The production query keeps
    // its fixed K; this pin is about the peel loop's runtime property.
    val (full, _) = WarehouseOps.kcorePeel(spark, sf0001, 0) // K=0: no peel, full graph back
    val minDeg = try {
      val r = full.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .agg(min(col("d"))).collect().head
      if (r.isNullAt(0)) -1L else r.getLong(0)
    } finally full.unpersist()
    assume(minDeg >= 0,
      "sf0.001 co-occurrence graph is empty for this testdata vintage — nothing to peel")
    val k = (minDeg + 1).min(Int.MaxValue.toLong).toInt
    val (ed, rounds) = WarehouseOps.kcorePeel(spark, sf0001, k)
    try {
      assert(rounds.length >= 2,
        s"K=$k exceeds the minimum degree, so round 1 must peel: $rounds")
      rounds.sliding(2).foreach { case Seq(a, b) =>
        assert(b < a, s"round edge counts must strictly shrink: $rounds")
      }
    } finally ed.unpersist()
  }

  test("q_decontaminate_semantic: the argmax shuffle never carries the corpus x eval expansion") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, sf001, "embeddings")
      .filter(col("embedding").isNotNull)
    val nEval = emb.filter(col("vec_id") % 97 === 0).count()
    val nTrain = emb.filter(col("vec_id") % 97 =!= 0).count()
    assert(nEval >= 2 && nTrain > 100, s"fixture sanity: $nTrain train x $nEval eval")
    val p = EngineMetrics.profile(
      graft.SparkEntry.queries("q_decontaminate_semantic")(spark, sf001))
    // the aggregate argmax reduces map-side: at most one partial row per
    // train vector per map partition enters the shuffle (plus the flagged
    // rows the final orderBy repartitions) — never the nTrain x nEval
    // cross-join expansion a window-ranked argmax would shuffle
    assert(p.shuffleRecords > 0, s"$p")
    assert(p.shuffleRecords < nTrain * nEval / 2,
      s"argmax must not shuffle the expanded relation ($nTrain x $nEval): $p")
    assert(p.shuffleRecords <= 3 * nTrain,
      s"shuffle must be bounded by train vectors, not scored pairs: $p")
  }

  test("q1_agg: zero spill at test scale, one shuffle boundary pair") {
    val p = prof("q1_agg")
    assert(p.spillBytes == 0, s"hash agg must not spill at sf0.001: $p")
    // partial->final agg plus the final orderBy: at most 2 shuffle stages
    assert(p.shuffleExchanges <= 2, s"$p")
    assert(p.shuffleRecords < p.scanRows / 100, s"6 groups from 6k rows: $p")
  }

  // ---- stored-index pruning, as MEASURED bytes ----------------------
  // The plan-shape specs pin that the stored probes bucket-/cell-prune
  // and never touch the corpus; these turn the win into a number: the
  // file bytes the pruned scan selects (FileSourceScanExec "size of
  // files read", post partition-pruning) must be a small fraction of
  // the store component's total on-disk bytes.

  /** Total bytes under a local directory tree. */
  private def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(dir))
  }

  /** Executed-plan scan bytes per file scan whose location string
    * mentions `pathFragment` — isolates one store component from the
    * probe/stats side scans of the same plan (one entry per scan node,
    * so a plan that reads the component twice shows both).
    */
  private def scanBytesOf(df: org.apache.spark.sql.DataFrame,
      pathFragment: String): Seq[Long] =
    EngineMetrics.ranPlanNodes(df)
      .filter(n => n.getClass.getSimpleName == "FileSourceScanExec" &&
        n.toString.contains(pathFragment))
      .flatMap(_.metrics.get("filesSize")).map(_.value)

  test("text index: a 3-term bm25 probe reads a pruned fraction of the postings bytes") {
    val idx = graft.sources.TextIndexStore.ensure(spark, sf001)
    val read = scanBytesOf(
      graft.sources.TextIndexStore.bm25(spark, idx, Seq("hash", "join", "vector")),
      "postings").sum
    val total = dirBytes(s"$idx/postings")
    assert(read > 0, "postings scan must be a file scan with measurable bytes")
    // 3 terms hit <= 3 of 64 hive buckets; half-total is a loose ceiling
    // that still fails if bucket pruning is ever lost
    assert(read < total / 2,
      s"bm25 probe must read a pruned postings fraction: $read of $total bytes")
  }

  test("vector index: the IVF candidate scan reads only the probed cells' list bytes") {
    val idx = graft.sources.VectorIndexStore.ensure(spark, sf001)
    val reads = scanBytesOf(
      graft.sources.VectorIndexStore.ivfTopK(spark, idx, nQueries = 1, k = 5),
      "lists")
    val total = dirBytes(s"$idx/lists")
    // the plan reads lists twice: the probe-extraction scan (full — test
    // convenience, probes come from outside the store in production) and
    // the CANDIDATE scan, which must be cell-pruned to ~nprobe/nlist
    // (4/16) by the literal IN list; min() isolates the candidate scan
    assert(reads.nonEmpty, "lists scans must be file scans with measurable bytes")
    val pruned = reads.min
    assert(pruned > 0 && pruned < total / 2,
      s"IVF candidate scan must read only probed cells: $pruned of $total bytes")
  }

  test("signature store: a 1-probe near-dup match reads a pruned fraction of bucket bytes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the probe must actually MATCH something in the store, or AQE
    // empty-propagates the whole plan and no bucket scan ever runs: a
    // near-dup of corpus doc 0 (its text minus the last word) bands
    // into doc 0's buckets and survives the jaccard verify
    val d0 = graft.Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") === 0L).select(col("text")).head.getString(0)
    val nearDup = d0.split(" ").dropRight(1).mkString(" ")
    val probe = Seq((100000L, nearDup)).toDF("doc_id", "text")
    val idx = graft.sources.SignatureStore.ensure(spark, sf001, bands = 16, rows = 4)
    val df = graft.sources.SignatureStore.nearDupMatches(spark, idx, probe,
      minJaccard = 0.5, bands = 16, rows = 4)
    val read = scanBytesOf(df, "buckets").sum
    val total = dirBytes(s"$idx/buckets")
    assert(read > 0, "buckets scan must be a file scan with measurable bytes")
    // one probe hashes to <= 16 of 64 bucket partitions
    assert(read < total / 2,
      s"near-dup probe must read pruned buckets: $read of $total bytes")
  }

  test("BPE trainer input is vocabulary-sized: constant rows across a 10x corpus") {
    // q_bpe_train's driver-side rounds run over the word HISTOGRAM, and
    // the 100 TB story rests on that structure being bounded by distinct
    // word forms, not corpus size. Measure it: the histogram row count
    // at sf0.1 (10x the corpus words of sf0.01) must not grow with the
    // corpus — here the synthetic vocabulary is identical at both SFs.
    import org.apache.spark.sql.functions._
    def vocabAndWords(dir: String): (Long, Long) = {
      val w = graft.Tables.load(spark, dir, "documents")
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      (w.select(countDistinct(col("word"))).head.getLong(0),
        w.count())
    }
    val (v001, w001) = vocabAndWords(sf001)
    val (v01, w01) = vocabAndWords("/root/testdata/sf0.1")
    assert(w01 > 5 * w001, s"sf0.1 must be a much larger corpus: $w001 -> $w01")
    assert(v01 == v001,
      s"histogram rows must be corpus-size-independent: $v001 -> $v01 at ${w01 / w001}x words")
  }
}
