package graft

import org.apache.spark.sql.DataFrame

/** Partition-invariance pins: the determinism conventions (decimal-exact
  * sums, scaled-long iteration, integer-exact ranking — DESIGN "exactness
  * rules") claim results are BITWISE identical no matter how the data is
  * partitioned. On a 1000-executor cluster partition count and partial-
  * aggregation order are whatever the scheduler picks that day, so this is
  * the property that makes replays, retries, and cluster re-sizes
  * reproducible. Here it is asserted directly: the same query at 1, 3 and
  * 4 shuffle partitions (and under a prior input repartition) must produce
  * the same rows to the last bit — Row.equals on DoubleType compares raw
  * doubles, so any partial-order drift fails the suite.
  */
class PartitionInvarianceSpec extends SparkSpec {

  // the families where naive double aggregation WOULD drift: exact-decimal
  // aggregates, moment closed-forms, decimal-rounded log terms, scaled-long
  // fixed-point iteration, weighted IEEE chains, ratio-ranked tf-idf
  // q_pagerank runs at sf0.01: the sf0.001 events slice is too sparse to
  // form co-occurrence edges at all (empty graph -> empty result)
  private val pinned = Seq("q1_agg" -> sf0001, "q_stats_agg" -> sf0001,
    "q_corr" -> sf0001, "q_kl_sources" -> sf0001, "q_pagerank" -> sf001,
    "q_ewma" -> sf0001, "q_tfidf" -> sf0001, "q_token_entropy" -> sf0001,
    // round-9 late: NB llr lattice + exact-decimal scoring sums; the
    // md5-minhash recall curve's counts; LPA's argmax tie-break (the
    // property async LPA lacks); q_label_prop needs sf0.01 like pagerank
    // (sf0.001 forms no co-occurrence edges)
    "q_nb_train" -> sf0001, "q_nb_score" -> sf0001, "q_nb_eval" -> sf0001,
    "q_lsh_recall" -> sf0001, "q_lsh_geometry" -> sf0001,
    "q_label_prop" -> sf001,
    // round-10: the pack audit's two-phase offsets + span/id checksums
    // (a partition-order drift would re-seat sequence boundaries), the
    // curated end-to-end composition, the calibration sweeps' counts over
    // persisted scored relations, and the trained-merge rounds on the
    // bounded histogram
    "q_pack_shards" -> sf0001, "q_pipeline_pack" -> sf0001,
    "q_ivf_recall" -> sf0001, "q_semdedup_sweep" -> sf0001,
    "q_ivfpq_rerank" -> sf0001, "q_bpe_train_full" -> sf0001,
    // round-11: byte-level unit training rounds over the bounded unit
    // histogram (+ the learned-table encode composition), the trained
    // pack composition, and the clip-hash banded pairs (a partition
    // drift in the greedy banding would re-seat pairs)
    "q_bpe_train_encode_full" -> sf0001, "q_pack_shards_trained" -> sf0001,
    "q_clip_neardup" -> sf0001,
    // round-12: the contamination-hit arithmetic over the offset spine
    // (a partition drift would re-seat hit positions), the island merge
    // over position-tracked windows, and the permuted-layout offsets
    // (bucket-windowed cumulative sums must agree at any parallelism)
    "q_pack_decontaminate" -> sf001, "q_decontaminate_spans" -> sf001,
    "q_shard_provenance_shuffled" -> sf001,
    // round-12 trainer family: the curriculum rank's two-phase spine
    // (per-length bases + within-length row_number) and the repetition
    // mask's span/offset/island arithmetic must agree at any parallelism
    "q_length_curriculum" -> sf0001, "q_pack_repetition_mask" -> sf0001,
    // the FFD fold sorts inside the bucket (collect_list build order is
    // partition-dependent), and the SFT mask's interval islands ride the
    // offset spine — both must not care how the input is split
    "q_pack_firstfit" -> sf0001, "q_pack_sft_mask" -> sf0001,
    // round-13: the exact-spans island merge over verified char windows
    // (hash prefilter + content verify must not care how windows are
    // split), and the aggregate argmax of the semantic decontaminator
    // (partial max(struct) merges in scheduler order)
    "q_repeated_spans_exact" -> sf0001, "q_decontaminate_semantic" -> sf001,
    // the preference-pair argmax/argmin (partial struct-max merge order)
    // and the probe-sweep counts over the persisted scored relation
    "q_pref_pairs" -> sf0001, "q_decontaminate_semantic_sweep" -> sf001,
    // first-owner MIN per shingle + the novelty ratio
    "q_doc_novelty" -> sf0001,
    // round-14: byte-offset spans (binary window islands), the parsed
    // messages seam (per-doc turn cumsum + interval islands over the
    // offset spine), and the uniqueness-weighted mix (distinct-shingle
    // aggregates feeding broadcast rates)
    "q_repeated_spans_exact_bytes" -> sf0001,
    "q_pack_sft_messages" -> sf0001, "q_effective_mix" -> sf0001,
    // train-eval exact decon: two hash-bounded semi-joins + island merge
    "q_decontaminate_exact_spans" -> sf0001,
    // in-context layout: per-cell base spine + within-cell row_number,
    // and the composed token-offset spine
    "q_pack_incontext" -> sf0001, "q_pack_incontext_offsets" -> sf0001,
    // bitext mining: sorted-fold k-NN averages + double aggregate argmax
    // (partial struct-max merge order), and the DoReMi step's quantized
    // boost over the decimal-exact KL terms
    "q_bitext_mine" -> sf0001, "q_doremi_mix" -> sf0001,
    // long-context layout: repeat-exploded stream over the two-level
    // offset spine (chunk bases + within-chunk windows)
    "q_pack_longctx" -> sf0001,
    // retrieval metrics: decimal-rounded idf/dcg term sums + ranked
    // window over exact-double scores
    "q_retrieval_metrics" -> sf0001,
    // waterfill: ordered cumsums + integer level decisions over the
    // uniqueness-derived caps (sf001 = the mixed regime)
    "q_epoch_cap_mix" -> sf001)

  private def rows(name: String, dir: String, parts: Int): Seq[org.apache.spark.sql.Row] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try SparkEntry.queries(name)(spark, dir).collect().toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for ((name, dir) <- pinned)
    test(s"$name: bitwise-identical at 1, 3 and 4 shuffle partitions") {
      val p4 = rows(name, dir, 4)
      assert(p4.nonEmpty, s"$name returned no rows at $dir")
      assert(rows(name, dir, 1) == p4, s"$name drifts between 1 and 4 partitions")
      assert(rows(name, dir, 3) == p4, s"$name drifts between 3 and 4 partitions")
    }

  test("q1_agg: invariant under an adversarial pre-shuffle of the input") {
    // same aggregation over an input scattered round-robin across 7
    // partitions — partial aggregates form over completely different row
    // subsets; the decimal sums must not care
    val base = SparkEntry.queries("q1_agg")(spark, sf0001).collect().toSeq
    val scattered: DataFrame = Tables.load(spark, sf0001, "lineitem").repartition(7)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    val again = scattered
      .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(ops.dsum(col("l_quantity")).as("sum_qty"))
    // shape differs from q1_agg's full column list; compare the overlap
    val byKey = again.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (r <- base) {
      val key = (r.getString(r.fieldIndex("l_returnflag")),
        r.getString(r.fieldIndex("l_linestatus")))
      assert(r.getDouble(r.fieldIndex("sum_qty")) == byKey(key),
        s"sum_qty for $key drifts under repartition(7)")
    }
  }
}
