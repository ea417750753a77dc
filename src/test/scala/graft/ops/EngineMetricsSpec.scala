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

  test("q1_agg: zero spill at test scale, one shuffle boundary pair") {
    val p = prof("q1_agg")
    assert(p.spillBytes == 0, s"hash agg must not spill at sf0.001: $p")
    // partial->final agg plus the final orderBy: at most 2 shuffle stages
    assert(p.shuffleExchanges <= 2, s"$p")
    assert(p.shuffleRecords < p.scanRows / 100, s"6 groups from 6k rows: $p")
  }
}
