package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-ANN-index contract (sources.VectorIndexStore) — the vector
  * sibling of RetrievalIndexSpec:
  *
  *  1. the scoring job reads the INDEX, never the corpus file — query
  *     vectors and candidates both come from the stored inverted lists;
  *  2. the candidate scan is partition-PRUNED to the probed cells
  *     (PartitionFilters on the hive `cell` column) — the index read is
  *     nprobe-cells/nlist of the lists bytes;
  *  3. stored-path results are bit-identical to the in-query IVF and
  *     IVF-PQ paths (same centroids, same fused dot-product codegen);
  *  4. a stale index (corpus fingerprint changed) rebuilds; a fresh one
  *     does not.
  */
class VectorIndexSpec extends SparkSpec {

  private lazy val idx = VectorIndexStore.ensure(spark, sf0001)

  test("stored-path IVF plan reads the index and never the corpus") {
    val df = VectorIndexStore.ivfTopK(spark, idx, nQueries = 20, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_vector_index"),
      s"plan does not scan the stored index:\n$plan")
    assert(!plan.contains("embeddings.parquet"),
      s"stored-path plan still touches the corpus:\n$plan")
  }

  test("lists scan is partition-pruned to the probed cells") {
    // 2 queries x nprobe 4 probe at most 8 of the 16 cells — the scan
    // must read no more partitions than that (at 20 queries the probe
    // set can legitimately cover every cell of this near-uniform corpus,
    // which would make the assertion vacuous)
    val df = VectorIndexStore.ivfTopK(spark, idx, nQueries = 2, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter on cell:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val allScans = scans(df.queryExecution.executedPlan)
    // the candidate side (filtered on cell) must be pruned; the query
    // side scans all cells for its vec_id filter, so look specifically
    // for a lists scan WITH a partition-filter on cell
    val pruned = allScans.filter(s =>
      s.toString.contains("lists") && s.toString.contains("PartitionFilters: [")
        && s.toString.contains("cell"))
      .filter(_.selectedPartitions.partitionCount < VectorIndexStore.NList)
    assert(pruned.nonEmpty,
      s"no cell-pruned lists scan found:\n${allScans.map(_.toString).mkString("\n")}")
    assert(pruned.exists(_.selectedPartitions.partitionCount <= 8),
      s"read ${pruned.map(_.selectedPartitions.partitionCount)} partitions for <= 8 probed cells")
  }

  test("stored-path IVF equals the in-query IVF (values)") {
    val stored = VectorIndexStore.ivfTopK(spark, idx, nQueries = 20, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = graft.ops.Similarity.ivfTopK(spark,
        graft.Tables.load(spark, sf0001, "embeddings"), nQueries = 20, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(stored == direct)
  }

  test("stored-path IVF-PQ equals the in-query IVF-PQ (values) and reads no corpus") {
    val df = VectorIndexStore.ivfPqTopK(spark, idx, nQueries = 20, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"stored-path IVF-PQ plan still touches the corpus:\n$plan")
    val stored = df.orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = graft.ops.Similarity.ivfPqTopK(spark,
        graft.Tables.load(spark, sf0001, "embeddings"), nQueries = 20, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(stored == direct)
  }

  test("fat-eval decontamination seam: broadcast is size-conditional, results identical") {
    // small-suite regime (default threshold): the probe side broadcasts
    val small = VectorIndexStore.semanticDecontaminate(spark, idx,
      minCos = 0.2, nprobe = VectorIndexStore.NList)
    assert(small.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "small eval suites should keep the explicit broadcast hint")
    // fat regime (threshold 0): the HINT is gone — the size estimator /
    // AQE own the choice (at fixture scale they still pick broadcast
    // from size stats, which is the point: nothing FORCES eval x nprobe
    // exploded embedding rows onto every executor). Pin it by disabling
    // auto-broadcast: the un-hinted join must then plan shuffle-side,
    // while the small-regime EXPLICIT hint would have overridden the
    // threshold.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (preAqe, logical, b) = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fat = VectorIndexStore.semanticDecontaminate(spark, idx,
        minCos = 0.2, nprobe = VectorIndexStore.NList, broadcastEvalRows = 0L)
      (fat.queryExecution.sparkPlan.toString,
        fat.queryExecution.optimizedPlan.toString,
        fat.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!preAqe.contains("BroadcastHashJoin"),
      s"fat regime must not force a broadcast join:\n$preAqe\nLOGICAL:\n$logical")
    // same rows either side of the seam
    val a = small.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("fingerprint keeps a fresh index; a stale fingerprint rebuilds") {
    val listsPath = new org.apache.hadoop.fs.Path(s"$idx/lists")
    val fs = listsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(listsPath).getModificationTime
    VectorIndexStore.ensure(spark, sf0001) // fresh: no rebuild
    assert(fs.getFileStatus(listsPath).getModificationTime == before,
      "fresh index was rebuilt")
    // corrupt the marker — the next ensure must detect staleness and
    // rebuild the whole tree (new lists mtime, repaired fingerprint)
    val marker = new org.apache.hadoop.fs.Path(s"$idx/_FINGERPRINT")
    val out = fs.create(marker, true)
    try out.write("stale".getBytes("UTF-8")) finally out.close()
    Thread.sleep(1100) // FS mtime granularity can be 1s
    VectorIndexStore.ensure(spark, sf0001)
    assert(fs.getFileStatus(listsPath).getModificationTime != before,
      "stale index was not rebuilt")
    val in = fs.open(marker)
    val have = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(have != "stale", "fingerprint was not repaired by the rebuild")
  }

  test("stored bitext mining equals the brute force row-for-row (exact regime); narrow probe stays a matching") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val idx = VectorIndexStore.ensure(spark, sf0001)
    val brute = graft.ops.Similarity.bitextMine(spark, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val stored = VectorIndexStore.bitextMine(spark, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(stored.nonEmpty && stored == brute)
    val narrow = VectorIndexStore.bitextMine(spark, idx, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(narrow.map(_._1).distinct.length == narrow.length)
    assert(narrow.map(_._2).distinct.length == narrow.length)
  }
}
