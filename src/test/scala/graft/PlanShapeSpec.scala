package graft

/** Physical-plan regression pins: the 100 TB-relevant plan properties the
  * design doc claims (broadcast dims, scan pushdown, O(k) top-k, salted
  * shuffle, no accidental cartesians) asserted against the OPTIMIZED
  * plans, so a regression fails the suite instead of only showing up as a
  * slower benchmark line. String-level checks on executedPlan are coarse
  * but catch exactly the failures that matter (a broadcast silently
  * becoming a sort-merge join, a filter no longer reaching the scan).
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q_join_star: every dim join broadcasts, fact never sort-merges") {
    val p = plan("q_join_star")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "star dims must broadcast")
  }

  test("q_filter_project: predicate reaches the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q_global_topn: plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q_global_topn")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q_salted_join: runs the salted shuffle (sort-merge), not a broadcast") {
    val p = plan("q_salted_join")
    assert(p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_semi_join / q_anti_join: plan as semi/anti, not inner + distinct") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("q_theta_join / q_cross_join: nested-loop confined to broadcast sides") {
    val t = plan("q_theta_join")
    assert(t.contains("BroadcastNestedLoopJoin") || t.contains("BroadcastHashJoin"), t.take(800))
    assert(!t.contains("CartesianProduct"), "theta join must not plan a shuffle cartesian")
    assert(plan("q_cross_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q1_agg: two-phase hash aggregation (partial before the exchange)") {
    val p = plan("q1_agg")
    // partial + final HashAggregate pairs around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("Exchange"), p.take(800))
  }

  test("q_asof_native: executes the custom AsOfJoinExec") {
    assert(plan("q_asof_native").contains("AsOfJoin"), "native exec missing")
  }

  test("q_hash_sample: ReadSchema prunes the unused text column") {
    // (q_tfidf returns a localCheckpointed frame — its plan is a leaf, so
    // pruning is pinned on a query whose full plan survives to the caller)
    val line = plan("q_hash_sample").linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(line.contains("doc_id") && !line.contains("text"), line)
  }

  test("q_chunk_windows: codegen Generate over the scan, only doc_id+text read") {
    val p = plan("q_chunk_windows")
    assert(p.contains("Generate posexplode"), p.take(800))
    val line = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(line.contains("doc_id") && line.contains("text") &&
      !line.contains("n_chars") && !line.contains("source"), line)
  }

  test("q_dedup_incremental: bloom probes at both scans, no cartesian anywhere") {
    val p = plan("q_dedup_incremental")
    assert("might_contain".r.findAllIn(p).size >= 2,
      "both union branches must carry the bloom probe:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("LeftAnti"), "exact verification must plan as anti join")
  }

  test("q_gopher_rules / q_repetition: single codegen pass, no shuffle before sort") {
    // per-row quality scoring must not aggregate or join anything: the
    // only Exchange allowed is the final declared orderBy's range partition
    Seq("q_gopher_rules", "q_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must be join-free:\n" + p.take(600))
      assert(!p.contains("HashAggregate"), s"$q must be aggregation-free")
    }
  }

  test("q_source_mix: pure per-row filter — no join, no aggregate, no hash shuffle") {
    val p = plan("q_source_mix")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(600))
    // only the declared orderBy's range partitioning may exchange
    assert(!p.contains("hashpartitioning"), p.take(600))
  }

  test("q_unigram_logprob: the corpus-side scoring join broadcasts the vocab") {
    val p = plan("q_unigram_logprob")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "vocab must broadcast — the corpus side never shuffles for the join")
  }

  test("q_kmeans: final assignment is projection-only (centroids ride as literals)") {
    val p = plan("q_kmeans")
    assert(!p.contains("Join"), p.take(600))
    assert(!p.contains("HashAggregate"),
      "assignment must not aggregate — refinement happens before, driver-side bounded")
  }

  test("q_media_dedup: shuffles the content hash, never the binary payload") {
    val p = plan("q_media_dedup")
    assert(p.contains("hashpartitioning(content_md5"), p.take(800))
    // projection collapse means the binary column never materializes as a
    // carried attribute — md5(cast(text)) is computed at the scan side
    assert(!p.contains("bytes#"), "binary payload leaked past the scan:\n" + p.take(1200))
  }

  test("q_ivfpq_topk: candidate generation and ADC scoring broadcast; corpus never sort-merges") {
    val p = plan("q_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), "no all-pairs fallback")
  }

  test("q_collation_join: collated equality stays an equi-join (sort-merge), never a nested loop") {
    // Spark 4.1 does not hash-join collated string keys (the broadcast
    // hint is dropped and the join sort-merges on collate(key)) — pinned
    // here so an upgrade that adds hash support shows up as a plan change.
    // The 100 TB consequence is documented on the query: for a hot join
    // key, normalize (lower()) instead of collating.
    val p = plan("q_collation_join")
    assert(p.contains("SortMergeJoin") && p.contains("collate("), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "collation must not demote the join to a nested loop")
  }

  test("q_lateral_topn: LATERAL decorrelates to a ranked window, not a per-row re-scan") {
    val p = plan("q_lateral_topn")
    assert(p.contains("Window"), "expected decorrelation into a window:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_table_profile: two passes, no gid-rewrite, 5-row join broadcasts") {
    val p = plan("q_table_profile")
    // one scan feeds the pure map-side count/min/max aggregate, one feeds
    // the single-distinct unpivot — NOT the one-scan multi-countDistinct
    // form, whose RewriteDistinctAggregates Expand pushes 6 copies of
    // every row (text included) through the shuffle AND plans
    // non-deterministically (the PLANS.json flap fixed in round 9)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"expected two table scans, saw $scans:\n" + p.take(1200))
    assert(!p.contains("gid") && !p.contains("Expand"),
      "multi-distinct gid/Expand rewrite must not appear")
    assert(p.contains("Generate stack"), "unpivot should plan via stack")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the 5-row stats/distinct join must broadcast:\n" + p.take(1200))
  }

  test("q_triangle_count: wedge join stays hash/shuffle, never cartesian") {
    val p = plan("q_triangle_count")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("q_variant_extract: scan reads only props and value") {
    val line = plan("q_variant_extract").linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(line.contains("props") && line.contains("value") &&
      !line.contains("event_type") && !line.contains("user_id"), line)
  }

  test("q_ewma / q_scd2_intervals: one window shuffle plus the result sort, nothing more") {
    for (name <- Seq("q_ewma", "q_scd2_intervals")) {
      val p = plan(name)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$name: expected <=2 exchanges, got $exchanges:\n" + p.take(1000))
      assert(!p.contains("Join"), s"$name must not join")
    }
  }

  test("q_zorder_key / q_importance_sample: pure per-row compute, no join or aggregate") {
    val z = plan("q_zorder_key")
    assert(!z.contains("Join") && !z.contains("HashAggregate"), z.take(800))
    val i = plan("q_importance_sample")
    assert(!i.contains("Join") && !i.contains("HashAggregate"), i.take(800))
  }

  test("q_text_search: query shingles broadcast — the corpus never self-joins or sort-merges") {
    val p = plan("q_text_search")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_zscore_outliers: the stats table broadcasts over the fact scan") {
    val p = plan("q_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "O(types) stats must broadcast — the fact side never shuffles for the join")
  }

  test("q_drawdown / q_rolling_volatility: one window pass, join-free") {
    for (name <- Seq("q_drawdown", "q_rolling_volatility")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name must not join:\n" + p.take(600))
      assert("Window".r.findAllIn(p).size >= 1, s"$name plans no window exec")
    }
  }

  test("q_winsorize / q_mad: per-group thresholds broadcast over the fact stream") {
    for (name <- Seq("q_winsorize", "q_mad")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name:\n" + p.take(800))
      assert(!p.contains("SortMergeJoin"),
        s"$name: O(groups) thresholds must broadcast — the fact side never shuffles for the join")
    }
  }

  test("q_corr / q_linear_fit: one two-phase aggregation, join-free") {
    for (name <- Seq("q_corr", "q_linear_fit")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name must not join:\n" + p.take(600))
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$name: moments must partial-aggregate before the exchange:\n" + p.take(800))
    }
  }

  test("q_kl_sources: per-source totals and the global total broadcast onto the token stream") {
    val p = plan("q_kl_sources")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(!p.contains("CartesianProduct"),
      "the single-row global total must broadcast, not plan a shuffle cartesian")
  }

  test("q_url_parse: pure per-row compute, no join or aggregate") {
    val p = plan("q_url_parse")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(800))
  }

  test("q_autocorr: one window shuffle feeding the moment aggregation, no join") {
    val p = plan("q_autocorr")
    assert(!p.contains("Join"), p.take(600))
    assert("Window".r.findAllIn(p).size >= 1, "lag pair formation must plan a window exec")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("q_nb_score: the NB model broadcasts; the corpus never shuffles by term") {
    val p = plan("q_nb_score")
    assert(p.contains("BroadcastHashJoin"),
      "vocab-model join must broadcast:\n" + p.take(800))
    // the corpus-side tf relation must meet the model through the
    // broadcast, never by being shuffled to it: a term-shuffled corpus
    // join would plan SortMergeJoin / ShuffledHashJoin. (Exchanges keyed
    // on term DO legitimately appear — they carry the model side's
    // vocab-level partial counts, one row per distinct term.)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus token stream shuffled to meet the model:\n" + p.take(1200))
  }

  test("q_passage_search: df/stats broadcast; top-10 is TakeOrdered, not a global sort") {
    // pre-checkpoint pipeline (the pagerankRanks convention): the Q's
    // localCheckpoint would hide the shape behind an RDD scan
    val (out, tf) = ops.CorpusOps.passageSearchPipeline(spark, sf0001)
    val p = out.queryExecution.executedPlan.toString
    tf.unpersist()
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "chunk-level df/stats must broadcast:\n" + p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 passages must plan O(k), not a global sort:\n" + p.take(800))
  }

  test("q_clip_gate: pair join stays hash-shuffle/broadcast, never a cartesian") {
    val p = plan("q_clip_gate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the image/caption pair join must be an equi-join:\n" + p.take(800))
  }

  test("q_nb_train: label is row-local — training plans zero joins") {
    val p = plan("q_nb_train")
    // one tiny totals broadcast is allowed; a HASH join would mean the
    // doc-level label table got joined against the token stream
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(800))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "class counts must partial-aggregate before the exchange:\n" + p.take(800))
  }

  // q_decontaminate_spans / q_pack_decontaminate end in localCheckpoint
  // (the persist-safety house pattern), so their executedPlan is an RDD
  // scan — the eval-side broadcast is an explicit broadcast() hint in the
  // operator code and exercised by their sf0.01 oracles instead.

  test("q_shard_provenance: interval explode, no per-token rows, no sort-merge join") {
    val p = plan("q_shard_provenance")
    // the only joins are doc-level (offsets x source), small enough to
    // hash/broadcast; a sort-merge here would mean a corpus-wide shuffle
    // of something bigger than doc-level rows
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "provenance must partial-aggregate before the exchange:\n" + p.take(800))
  }

  test("q_decontaminate_semantic: aggregate argmax — no Window over the corpus x eval expansion") {
    val p = plan("q_decontaminate_semantic")
    // the round-12 verdict's finding: a row_number() window here forces
    // the ENTIRE expanded relation through a shuffle; the argmax must be
    // a two-phase hash aggregate over the broadcasted cross join instead
    assert(!p.contains("Window"), "argmax must be an aggregate, not a window:\n" + p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the eval side must broadcast:\n" + p.take(800))
    // max(struct) plans as SortAggregate (struct buffers aren't hash-agg
    // mutable) — the scale property is the PARTIAL phase before the
    // exchange: only one row per train vector per partition shuffles
    assert(p.contains("partial_max"),
      "the argmax must partial-aggregate before the exchange:\n" + p.take(800))
  }

  test("q_pref_pairs: per-prompt argmax/argmin as two-phase aggregation, join-free") {
    val p = plan("q_pref_pairs")
    assert(!p.contains("Window") && !p.contains("Join"),
      "pair construction is one aggregation over the scan:\n" + p.take(800))
    assert(p.contains("partial_max") && p.contains("partial_min"),
      "both picks must partial-aggregate before the exchange:\n" + p.take(800))
  }
}
