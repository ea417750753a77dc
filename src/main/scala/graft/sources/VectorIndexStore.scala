package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions

/** Persisted ANN index for the similarity family — the vector sibling of
  * [[TextIndexStore]], completing the index-once-query-many story for
  * both retrieval modalities: the in-query builders (`q_sim_topk_ivf`,
  * `q_ivfpq_topk`, `ops/Similarity.scala`) recompute centroids, cell
  * assignments and PQ codes on every run; at 100 TB an embedding store
  * is indexed ONCE and every query is a pruned read of the index, never
  * a corpus pass.
  *
  * Layout (all parquet under `indexDir`):
  *
  *   centroids/              (cell INT, centroid ARRAY<FLOAT>) — nlist rows
  *   lists/cell=<0..15>/     (vec_id, embedding, norm) — the IVF inverted
  *                           lists: the corpus, hive-partitioned by its
  *                           nearest-centroid cell, vec_id-sorted in-file
  *   codes/cell=<0..15>/     (vec_id, codes ARRAY<INT>) — 8x4-bit PQ
  *                           codes per vector, same cell partitioning
  *   codebook/               (sub INT, cid INT, cv ARRAY<FLOAT>) — the PQ
  *                           subspace codebook (nSub x nCent rows)
  *   _FINGERPRINT            freshness marker (source (len, mtime) + layout
  *                           version), written LAST
  *
  * Partition pruning is the scale story, exactly as the text index's
  * term-hash buckets: a query probes `nprobe` cells, so the candidate
  * scan reads nprobe/nlist of the lists (or codes) bytes — the plan's
  * PartitionFilters, pinned by VectorIndexSpec. Centroids are the one
  * bounded driver-side structure an IVF index legitimately keeps
  * (nlist x dim floats), collect()ed once per query and shipped to
  * executors inside the fused NearestCells / FloatDotProduct codegen
  * expressions.
  *
  * Faithfulness: the build runs the SAME deterministic clustering as the
  * in-query path (`Similarity.refinedCentroids` — seed = first nlist
  * vectors, one decimal-exact Lloyd refinement), floats and doubles
  * round-trip parquet bit-exactly, and the query-side arithmetic is the
  * identical codegen expression — so the stored path returns
  * bit-identical rows to `q_sim_topk_ivf` and shares its oracle.
  *
  * Freshness + concurrency follow TextIndexStore: `_FINGERPRINT` records
  * the source `embeddings.parquet` (len, mtime) and the layout version;
  * `ensure` rebuilds on mismatch; the build stages into a temp dir and
  * swaps into place with one FS rename so a concurrent reader sees a
  * complete old index or a complete new one, never a half-built tree.
  *
  * Reference telemetry scope (MantissaMr/fineventstream README.md:1-40)
  * has no vector search; this family is part of the NS training-data
  * extension surface.
  */
object VectorIndexStore {

  /** nlist: inverted-list cell count. 16 matches the in-query IVF queries
    * at test SF; at 100 TB nlist grows with the corpus (cells stay
    * task-sized) — it is a build parameter, not a code constant.
    */
  val NList = 16
  val NSub = 8
  val NCent = 16

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bumped when the index LAYOUT changes; part of the fingerprint so an
    * old-layout index reads as stale instead of failing reads.
    */
  private val FormatVersion = 1

  /** Same config seam as TextIndexStore.defaultIndexDir: root from
    * `graft.index.dir`, else the first `spark.local.dir`, else /tmp.
    */
  def defaultIndexDir(spark: SparkSession, sfDir: String): String = {
    val root = spark.conf.getOption("graft.index.dir")
      .orElse(spark.sparkContext.getConf.getOption("spark.local.dir")
        .map(_.split(",")(0).stripSuffix("/")))
      .getOrElse("/tmp")
    root + "/graft_vector_index/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
  }

  private def fingerprintOf(spark: SparkSession, sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    val st = fs(spark, sfDir).getFileStatus(p)
    s"v$FormatVersion|${p.toString}|${st.getLen}|${st.getModificationTime}"
  }

  /** Build (or rebuild) the index: one clustering pass (the deterministic
    * k-means the in-query path runs), one assignment pass writing the
    * cell-partitioned lists and PQ codes. Paid once, amortized over every
    * query.
    */
  def build(spark: SparkSession, sfDir: String, indexDir: String): Unit = {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull)
    val cents = graft.ops.Similarity.refinedCentroids(spark, emb, NList)
    val cb = graft.ops.Similarity.pqCodebook(emb, NSub, NCent)

    // one pass computes the cell assignment; lists carry the vector and
    // its norm (so queries never recompute norms), codes carry only the
    // packed PQ codes — the compressed candidate representation
    val assigned = graft.ops.Similarity.withNorm(spark, emb)
      .withColumn("cell", VectorFunctions.nearestCells(col("embedding"), cents, 1)(0))
      .persist()
    val lists = assigned
      .select(col("vec_id"), col("embedding"), col("norm"), col("cell"))
      .transform(graft.Par.byKey(col("cell")))
      .sortWithinPartitions(col("vec_id"))
    val codes = assigned
      .select(col("vec_id"),
        VectorFunctions.pqCodes(col("embedding"), cb).as("codes"), col("cell"))
      .transform(graft.Par.byKey(col("cell")))
      .sortWithinPartitions(col("vec_id"))
    val centDf = cents.map { case (c, v) => (c, v) }.toDF("cell", "centroid")
    val cbDf = cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cv, cid) => (s, cid, cv) }
    }.toDF("sub", "cid", "cv")

    // stage + atomic swap (the TextIndexStore convention); _FINGERPRINT
    // written LAST so a tree without it always reads stale
    val f = fs(spark, indexDir)
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val tmp = new org.apache.hadoop.fs.Path(
      indexDir + ".build-" + java.util.UUID.randomUUID().toString.take(8))
    // four independent writes (one persisted relation, disjoint staging
    // paths) — overlapped (Par.inParallel)
    graft.Par.inParallel(
      () => lists.write.partitionBy("cell").parquet(s"$tmp/lists"),
      () => codes.write.partitionBy("cell").parquet(s"$tmp/codes"),
      () => centDf.coalesce(1).write.parquet(s"$tmp/centroids"),
      () => cbDf.coalesce(1).write.parquet(s"$tmp/codebook"))
    assigned.unpersist()
    val out = f.create(new org.apache.hadoop.fs.Path(s"$tmp/_FINGERPRINT"), true)
    try out.write(fingerprintOf(spark, sfDir).getBytes("UTF-8")) finally out.close()
    StoreSwap.swapIn(f, tmp, root)
  }

  private def isFresh(spark: SparkSession, indexDir: String,
      want: String): Boolean = {
    val f = fs(spark, indexDir)
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_FINGERPRINT")
    f.exists(marker) && {
      val in = f.open(marker)
      val have = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      have == want
    }
  }

  /** Build iff missing or stale; returns the index dir (post-build
    * fingerprint re-verified, one retry — same contract as the text
    * index).
    */
  def ensure(spark: SparkSession, sfDir: String,
      indexDir0: String = null): String = synchronized {
    val indexDir = Option(indexDir0).getOrElse(defaultIndexDir(spark, sfDir))
    // sweep .old-*/.compact-* orphans from crashed/raced swaps (leak fix)
    StoreSwap.sweepOrphans(fs(spark, indexDir),
      new org.apache.hadoop.fs.Path(indexDir))
    val want = fingerprintOf(spark, sfDir)
    if (!isFresh(spark, indexDir, want)) {
      build(spark, sfDir, indexDir)
      if (!isFresh(spark, indexDir, want)) build(spark, sfDir, indexDir)
    }
    indexDir
  }

  /** Stored centroids, collect()ed — bounded at nlist x dim, cell-sorted
    * (NearestCells tie-breaks by cell id, so order is cosmetic).
    */
  def loadCentroids(spark: SparkSession, indexDir: String): Seq[(Int, Seq[Float])] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toIndexedSeq))
      .sortBy(_._1).toIndexedSeq

  /** IVF top-k over the STORED index: probe each query's `nprobe` nearest
    * cells, scan ONLY those cells' inverted lists (hive partition pruning
    * on `cell` — the plan's PartitionFilters), exact-rerank with the same
    * fused dot-product codegen as the in-query path. The corpus file is
    * never touched: query vectors and candidates both come from the
    * index. Bit-identical to `Similarity.ivfTopK` (shared oracle).
    */
  def ivfTopK(spark: SparkSession, indexDir: String, nQueries: Int, k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
    val q = lists.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm"),
        explode(VectorFunctions.nearestCells(col("embedding"), cents, nprobe))
          .as("cell"))
    // the probed cell SET is computed driver-side (bounded at
    // nQueries x nprobe values) so the lists scan partition-prunes at
    // planning — the literal IN list is what makes PartitionFilters bite
    val probed = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0).toLong).sorted
    val cand = lists.filter(col("cell").isin(probed: _*))
      .select(col("vec_id").as("n_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    broadcast(q).join(cand, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        VectorFunctions.floatDot(spark, col("a_emb"), col("b_emb"))
          / (col("a_norm") * col("b_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"),
        col("n_id"), col("cosine"))
  }

  /** FAT-EVAL-SET semantic decontamination over the STORED index — the
    * scale form of `ops.Similarity.semanticDecontaminate` (same
    * flag/argmax semantics, same eval split convention vec_id % 97 == 0):
    * every eval probe reads its vector and its `nprobe` nearest cells
    * from the index; candidates are a cell-PRUNED scan of the inverted
    * lists restricted to train vectors — the corpus file is never
    * touched, and an eval suite too fat to broadcast against every
    * corpus partition only meets the cells it probes. Each train vector
    * lives in exactly ONE cell, so a (train, eval) pair is scored at most
    * once; at nprobe = nlist every cell is probed and the pair coverage
    * is provably complete — the EXACT REGIME the declared row runs in,
    * sharing the brute-force oracle. The argmax is the same AGGREGATE
    * (max(struct(cosine, -eval_id)), ties to the lower eval id) as the
    * in-query form: partial aggregation means the shuffle carries at most
    * one row per train vector per partition, never the train×eval
    * expansion. Zero-norm vectors are excluded on both legs (cosine
    * against a zero vector is NaN).
    *
    * Join strategy is SIZE-CONDITIONAL, never forced: the probe side is
    * eval × nprobe exploded rows each carrying a 64-float embedding
    * (~300 B/row), so at the 10⁵–10⁶-vector eval suites this row exists
    * for, a forced broadcast would pin GBs on every executor — the
    * bottleneck it is supposed to avoid. The same bounded job that
    * collects the probed-cell IN list also counts the exploded probe
    * rows; at or under `broadcastEvalRows` the small-suite plan keeps
    * the explicit broadcast, above it the join is left un-hinted on its
    * `cell` key (AQE picks shuffle-hash for a genuinely fat suite, or
    * re-converts to broadcast if runtime stats say the probe side is
    * small after all). Same results either way — VectorIndexSpec pins
    * row equality across the seam and the un-hinted fat-regime plan
    * shape.
    */
  def semanticDecontaminate(spark: SparkSession, indexDir: String,
      minCos: Double, nprobe: Int = 4,
      broadcastEvalRows: Long = 100000L): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
      .filter(col("norm") > 0)
    val ev = lists.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm"),
        explode(VectorFunctions.nearestCells(col("embedding"), cents, nprobe))
          .as("cell"))
    // ONE bounded job (<= nlist rows back) yields both the literal IN
    // list that makes the candidate scan partition-prune at planning
    // (the ivfTopK convention) and the exploded probe-row count that
    // decides the join strategy
    val cellCounts = ev.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val probed = cellCounts.map(_._1).sorted
    val evRows = cellCounts.map(_._2).sum
    val tr = lists.filter(col("vec_id") % 97 =!= 0 &&
        col("cell").isin(probed: _*))
      .select(col("vec_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm"), col("cell"))
    val evSide = if (evRows <= broadcastEvalRows) broadcast(ev) else ev
    evSide.join(tr, Seq("cell"))
      .withColumn("cosine",
        VectorFunctions.floatDot(spark, col("a_emb"), col("b_emb"))
          / (col("a_norm") * col("b_norm")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cosine"), (-col("eval_id")).as("neg_eval")))
        .as("best"))
      .filter(col("best.cosine") >= minCos)
      .select(col("vec_id"), (-col("best.neg_eval")).as("best_eval_id"),
        col("best.cosine").as("best_cosine"))
      .orderBy(col("vec_id"))
  }

  /** Margin-based bitext mining over the STORED index — the
    * index-once-mine-many form of [[graft.ops.Similarity.bitextMine]]:
    * both pools read vectors, norms and cell assignments from the
    * persisted lists (nothing recomputed); the src side probes its
    * `nprobe` nearest cells, the tgt side is a literal-IN
    * partition-pruned scan of its STORED cells, and the margin /
    * mutual-argmax tail is shared verbatim
    * ([[graft.ops.Similarity.mineFromScored]]). Declared at the exact
    * regime (nprobe = NList — every pair scored once, coverage
    * provably complete) so the row shares the brute oracle verbatim.
    * The probe-side broadcast is SIZE-CONDITIONAL (the
    * semanticDecontaminate seam): one bounded job returns both the
    * probed-cell IN list and the exploded probe-row count that decides
    * the join strategy.
    */
  def bitextMine(spark: SparkSession, indexDir: String, k: Int = 4,
      minMargin: Double = 1.05, nprobe: Int = NList,
      broadcastSrcRows: Long = 100000L): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
      .filter(col("norm") > 0)
    val src = lists.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm"),
        explode(VectorFunctions.nearestCells(col("embedding"), cents, nprobe))
          .as("cell"))
    val cellCounts = src.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val probed = cellCounts.map(_._1).sorted
    val srcRows = cellCounts.map(_._2).sum
    val tgt = lists.filter(col("vec_id") % 2 =!= 0 &&
        col("cell").isin(probed: _*))
      .select(col("vec_id").as("tgt_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm"), col("cell"))
    val srcSide = if (srcRows <= broadcastSrcRows) broadcast(src) else src
    val scored = srcSide.join(tgt, Seq("cell"))
      .withColumn("cosine",
        VectorFunctions.floatDot(spark, col("a_emb"), col("b_emb"))
          / (col("a_norm") * col("b_norm")))
      .select(col("src_id"), col("tgt_id"), col("cosine"))
    graft.ops.Similarity.mineFromScored(scored, k, minMargin)
  }

  /** IVF-PQ top-k over the STORED index: candidates come from the
    * cell-pruned `codes` table (≈9 bytes/vector — the compressed shuffle
    * the in-query path documents), ADC-scored against a broadcast lookup
    * table built from the stored codebook, then the top k x rerank pool
    * exact-reranks against the pruned `lists`. Same arithmetic as
    * `Similarity.ivfPqTopK` (equality pinned by VectorIndexSpec).
    */
  def ivfPqTopK(spark: SparkSession, indexDir: String, nQueries: Int, k: Int,
      nprobe: Int = 4, rerank: Int = 4): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
    val q = lists.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"),
        VectorFunctions.nearestCells(col("embedding"), cents, nprobe).as("cells"))
    val cbDf = spark.read.parquet(s"$indexDir/codebook")
    val subDim = 64 / NSub
    val lut = q.select(col("q_id"), col("q_emb")).crossJoin(broadcast(cbDf))
      .withColumn("pdot",
        VectorFunctions.floatDot(spark,
          slice(col("q_emb"), col("sub") * subDim + 1, lit(subDim)), col("cv"))
          .cast(DecimalType(24, 9)))
      .select(col("q_id"), col("sub"), col("cid"), col("pdot"))
    val qcells = q.select(col("q_id"), explode(col("cells")).as("cell"))
    val probed = qcells.select(col("cell")).distinct()
      .collect().map(_.getInt(0).toLong).sorted
    val codes = spark.read.parquet(s"$indexDir/codes")
      .filter(col("cell").isin(probed: _*))
    val cand = broadcast(qcells).join(codes, Seq("cell"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        posexplode(col("codes")).as(Seq("sub", "cid")))
    val approx = cand.join(broadcast(lut), Seq("q_id", "sub", "cid"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("pdot")).as("approx_dot"))
      .filter(col("q_id") =!= col("n_id"))
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_dot").desc, col("n_id"))
    val pool = approx.withColumn("arn", row_number().over(wa))
      .filter(col("arn") <= k * rerank)
      .select(col("q_id"), col("n_id"))
    val rer = lists.filter(col("cell").isin(probed: _*))
      .select(col("vec_id").as("n_id"), col("embedding").as("b_emb"),
        col("norm").as("b_norm"))
    val exact = broadcast(pool)
      .join(rer, Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_emb").as("a_emb"),
        col("q_norm").as("a_norm"))), Seq("q_id"))
      .withColumn("cosine",
        VectorFunctions.floatDot(spark, col("a_emb"), col("b_emb"))
          / (col("a_norm") * col("b_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"),
        col("n_id"), col("cosine"))
  }
}
