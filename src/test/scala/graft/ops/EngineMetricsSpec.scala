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

  test("q1_agg: zero spill at test scale, one shuffle boundary pair") {
    val p = prof("q1_agg")
    assert(p.spillBytes == 0, s"hash agg must not spill at sf0.001: $p")
    // partial->final agg plus the final orderBy: at most 2 shuffle stages
    assert(p.shuffleExchanges <= 2, s"$p")
    assert(p.shuffleRecords < p.scanRows / 100, s"6 groups from 6k rows: $p")
  }
}
