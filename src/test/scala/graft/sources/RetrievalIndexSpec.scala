package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-index retrieval contract (sources.TextIndexStore):
  *
  *  1. the scoring job reads the INDEX, never the corpus — at 100 TB the
  *     difference between a query and a batch job;
  *  2. the postings scan is partition-PRUNED to the query terms' buckets
  *     (PartitionFilters on the hive `bucket` column) — the index read is
  *     |query buckets|/64 of the postings bytes;
  *  3. the driver-side bucket arithmetic matches the executor-side
  *     `pmod(xxhash64(term), 64)` exactly (else pruning would silently
  *     drop postings — wrong answers, not just slow ones);
  *  4. a stale index (corpus fingerprint changed) rebuilds; a fresh one
  *     does not.
  */
class RetrievalIndexSpec extends SparkSpec {

  private lazy val idx = TextIndexStore.ensure(spark, sf0001)

  test("driver-side bucketOf matches executor-side pmod(xxhash64, 64)") {
    val terms = Seq("hash", "join", "vector", "the", "a", "zebra", "", "x y")
    val fromSpark = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(col("term"), pmod(xxhash64(col("term")), lit(64L)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { tm =>
      assert(TextIndexStore.bucketOf(tm).toLong == fromSpark(tm),
        s"bucket mismatch for '$tm'")
    }
  }

  test("stored-path scoring plan reads the index and never the corpus") {
    val df = TextIndexStore.bm25(spark, idx, Seq("hash", "join", "vector"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_text_index"),
      s"plan does not scan the stored index:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"stored-path plan still touches the corpus:\n$plan")
  }

  test("postings scan is partition-pruned to the query terms' buckets") {
    val qterms = Seq("hash", "join", "vector")
    val df = TextIndexStore.bm25(spark, idx, qterms)
    val plan = df.queryExecution.executedPlan.toString
    // the hive partition column must appear as a PartitionFilter (planned
    // pruning), not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition filter on bucket:\n$plan")
    // and the pruning must bite: files read <= files of the query buckets.
    // collect() doesn't descend into the AdaptiveSparkPlanExec wrapper, so
    // walk it explicitly.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val allScans = scans(df.queryExecution.executedPlan)
    assert(allScans.nonEmpty)
    val postingsScan = allScans.find(_.toString.contains("postings")).get
    val prunedParts = postingsScan.selectedPartitions.partitionCount
    val qbuckets = qterms.map(TextIndexStore.bucketOf).distinct.length
    assert(prunedParts <= qbuckets,
      s"read $prunedParts partitions for $qbuckets query buckets")
  }

  test("stored-path BM25 equals the in-query arithmetic (values)") {
    // same top-10 (doc_id, bm25) as a freshly-computed reference
    val stored = TextIndexStore.bm25(spark, idx, Seq("hash", "join", "vector"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = graft.SparkEntry.queries("q_bm25")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == direct)
  }

  test("stored-path hybrid RRF reads only the index and matches the in-query fusion") {
    val df = TextIndexStore.hybridRrf(spark, idx, Seq("hash", "join", "vector"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_text_index") && !plan.contains("documents.parquet"),
      s"stored-path RRF plan must scan the index, not the corpus:\n$plan")
    val stored = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = graft.SparkEntry.queries("q_hybrid_rrf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(stored == direct)
  }

  test("fingerprint keeps a fresh index; ensure is idempotent") {
    val p = new org.apache.hadoop.fs.Path(s"$idx/postings")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(p).getModificationTime
    TextIndexStore.ensure(spark, sf0001) // second call: no rebuild
    val after = fs.getFileStatus(p).getModificationTime
    assert(before == after, "fresh index was rebuilt")
  }
}
