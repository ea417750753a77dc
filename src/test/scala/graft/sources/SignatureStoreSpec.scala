package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-signature dedup contract (sources.SignatureStore):
  *
  *  1. the PRODUCTION store (16×4 banding) reproduces the in-query
  *     minhashPairs pair set exactly, restricted to the probe
  *     orientation — the store changes WHERE signatures live, never
  *     WHICH pairs survive;
  *  2. the bucket scan partition-prunes to the probes' buckets
  *     (PartitionFilters on the hive `bucket` column);
  *  3. the probe path never re-shingles the corpus: documents.parquet
  *     appears exactly once in the plan (the probe side);
  *  4. a fresh store does not rebuild; ensure is idempotent.
  */
class SignatureStoreSpec extends SparkSpec {

  private val (bands, rows) = (16, 4)
  private lazy val prodIdx = SignatureStore.ensure(spark, sf0001, bands, rows)

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("production store matches in-query minhashPairs, probe-oriented") {
    val probes = docs.filter(col("doc_id") % 5 === 0)
    val stored = SignatureStore.nearDupMatches(spark, prodIdx, probes,
        0.6, bands, rows, maxBucket = graft.ops.TextDedup.MaxBucketSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pairs = graft.ops.TextDedup.minhashPairs(docs, 0.6, bands, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val probeIds = probes.select("doc_id").collect().map(_.getLong(0)).toSet
    // reorient: every (a, b) pair yields a match row per probe-side member
    val expected = pairs.flatMap { case (a, b, j) =>
      Seq(a -> (a, b, j), b -> (b, a, j)).collect {
        case (p, row) if probeIds(p) => row
      }
    }.toSet
    assert(stored == expected,
      s"stored=${stored.size} expected=${expected.size}; " +
        s"missing=${(expected -- stored).take(3)} extra=${(stored -- expected).take(3)}")
    assert(expected.nonEmpty, "fixture must produce at least one match")
  }

  test("bucket scan partition-prunes to the probes' buckets") {
    val oneProbe = docs.filter(col("doc_id") === 0)
    val df = SignatureStore.nearDupMatches(spark, prodIdx, oneProbe,
      0.6, bands, rows)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition filter on bucket:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val bucketScan = scans(df.queryExecution.executedPlan)
      .find(_.toString.contains("buckets")).get
    // one probe has at most `bands` distinct band hashes -> bucket ids
    assert(bucketScan.selectedPartitions.partitionCount <= bands,
      s"read ${bucketScan.selectedPartitions.partitionCount} bucket " +
        s"partitions for a single probe (bands=$bands)")
  }

  test("probe path never re-shingles the corpus (probes materialize once)") {
    val probes = docs.filter(col("doc_id") % 5 === 0)
    val df = SignatureStore.nearDupMatches(spark, prodIdx, probes,
      0.6, bands, rows)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sig_index"),
      s"plan does not read the stored signatures:\n$plan")
    // the probe batch localCheckpoints at construction (one scan, before
    // this plan exists); the match plan itself must contain ZERO corpus
    // scans — the corpus side comes entirely from the store
    assert(!plan.contains("documents.parquet"),
      s"match plan still scans the corpus:\n$plan")
  }

  test("fingerprint keeps a fresh store; ensure is idempotent") {
    val p = new org.apache.hadoop.fs.Path(s"$prodIdx/arrays")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(p).getModificationTime
    SignatureStore.ensure(spark, sf0001, bands, rows)
    val after = fs.getFileStatus(p).getModificationTime
    assert(before == after, "fresh store was rebuilt")
  }
}
