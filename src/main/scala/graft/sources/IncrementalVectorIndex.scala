package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Streaming-maintained ANN index — the MAINTENANCE half of the stored
  * vector-index story, completing the four-quadrant symmetry: batch text
  * ([[TextIndexStore]]), incremental text ([[IncrementalTextIndex]]),
  * batch vector ([[VectorIndexStore]]), incremental vector (this).
  * Embedding stores are append-heavy at 100 TB — new documents embed
  * continuously, and re-clustering the corpus per batch would be a
  * corpus pass per micro-batch.
  *
  * The index VINTAGE is its centroid set (and PQ codebook), FROZEN at
  * `baseBuild` — standard IVF practice: appends assign new vectors to
  * the existing cells; the cells drift from optimal as the distribution
  * shifts, and a periodic re-cluster (a new base build) is the
  * re-balancing event, exactly like a search engine's segment rebuild.
  * Queries are therefore comparable across appends: same centroids,
  * same probe order, results as if the whole corpus had been indexed in
  * one shot (pinned by IncrementalVectorIndexSpec).
  *
  * Layout (parquet under `indexDir`):
  *
  *   centroids/                        frozen at base build
  *   codebook/                         frozen at base build
  *   lists/cell=<N>/__batch_id=<M>/    (vec_id, embedding, norm)
  *   codes/cell=<N>/__batch_id=<M>/    (vec_id, codes)
  *
  * Every append writes ONLY its own `__batch_id` partitions (dynamic
  * partition overwrite, per-writer option), so a crash-replayed batch
  * overwrites itself with the same bytes and the index CONVERGES —
  * the IncrementalTextIndex discipline. The read side is unchanged
  * arithmetic over `lists/` with the batch dimension folded in by the
  * scan (hive partition discovery walks both levels, cell then
  * __batch_id); read
  * cost grows with batch count until [[compactTo]] folds the deltas
  * into the batch [[VectorIndexStore]] layout — whose query path then
  * serves the stream-built index verbatim.
  */
object IncrementalVectorIndex {

  import VectorIndexStore.{NList, NSub, NCent}

  /** Freeze the vintage: centroids + PQ codebook from the base corpus,
    * then index the base corpus itself as batch 0.
    */
  def baseBuild(spark: SparkSession, base: DataFrame, indexDir: String): Unit = {
    import spark.implicits._
    val emb = base.filter(col("embedding").isNotNull)
    val cents = graft.ops.Similarity.refinedCentroids(spark, emb, NList)
    val cb = graft.ops.Similarity.pqCodebook(emb, NSub, NCent)
    val centDf = cents.map { case (c, v) => (c, v) }.toDF("cell", "centroid")
    val cbDf = cb.zipWithIndex.flatMap { case (sub, s) =>
      sub.zipWithIndex.map { case (cv, cid) => (s, cid, cv) }
    }.toDF("sub", "cid", "cv")
    centDf.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    cbDf.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    appendBatch(spark, emb, 0L, indexDir)
  }

  private def loadCodebook(spark: SparkSession, indexDir: String): Seq[Seq[Seq[Float]]] = {
    val rows = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toIndexedSeq))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)
  }

  /** Index one embedding batch against the FROZEN vintage: assign to the
    * existing cells, write this batch's own lists/codes partitions.
    * Idempotent per (batchId, batch) — a replay converges.
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String): Unit = {
    val cents = VectorIndexStore.loadCentroids(spark, indexDir)
    val cb = loadCodebook(spark, indexDir)
    val assigned = graft.ops.Similarity.withNorm(spark,
        batch.filter(col("embedding").isNotNull))
      .withColumn("cell", VectorFunctions.nearestCells(col("embedding"), cents, 1)(0))
      .withColumn("__batch_id", lit(batchId))
      .persist()
    // two independent writes over the one persisted batch relation, to
    // disjoint paths — overlapped (Par.inParallel)
    graft.Par.inParallel(
      () => assigned
        .select(col("vec_id"), col("embedding"), col("norm"), col("cell"),
          col("__batch_id"))
        .transform(graft.Par.byKey(col("cell")))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "__batch_id")
        .parquet(s"$indexDir/lists"),
      () => assigned
        .select(col("vec_id"),
          VectorFunctions.pqCodes(col("embedding"), cb).as("codes"), col("cell"),
          col("__batch_id"))
        .transform(graft.Par.byKey(col("cell")))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell", "__batch_id")
        .parquet(s"$indexDir/codes"))
    assigned.unpersist()
    ()
  }

  /** IVF top-k over the maintained index: identical arithmetic to
    * [[VectorIndexStore.ivfTopK]] — the batch dimension is folded in by
    * partition discovery, so on the same vintage + corpus the two index
    * forms return identical rows (spec-pinned). Cell pruning still
    * bites: `cell=` is the outer partition level.
    */
  def ivfTopK(spark: SparkSession, indexDir: String, nQueries: Int, k: Int,
      nprobe: Int = 4): DataFrame = {
    val cents = VectorIndexStore.loadCentroids(spark, indexDir)
    val lists = spark.read.parquet(s"$indexDir/lists")
    val q = lists.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("a_emb"),
        col("norm").as("a_norm"),
        explode(VectorFunctions.nearestCells(col("embedding"), cents, nprobe))
          .as("cell"))
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

  /** Fold the per-batch partitions into the batch [[VectorIndexStore]]
    * layout (no batch dimension), copying the frozen centroids/codebook —
    * after which `VectorIndexStore.ivfTopK`/`ivfPqTopK` serve the
    * stream-built index verbatim (spec-pinned identical). Same
    * stage-and-atomic-swap as the other stores. The fingerprint marks
    * the store stream-built: `ensure` against a corpus file would
    * correctly treat it as a different vintage.
    */
  def compactTo(spark: SparkSession, indexDir: String, storeDir: String): Unit = {
    val lists = spark.read.parquet(s"$indexDir/lists")
      .select(col("vec_id"), col("embedding"), col("norm"), col("cell"))
      .transform(graft.Par.byKey(col("cell")))
      .sortWithinPartitions(col("vec_id"))
    val codes = spark.read.parquet(s"$indexDir/codes")
      .select(col("vec_id"), col("codes"), col("cell"))
      .transform(graft.Par.byKey(col("cell")))
      .sortWithinPartitions(col("vec_id"))
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val f = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(
      storeDir + ".build-" + java.util.UUID.randomUUID().toString.take(8))
    lists.write.partitionBy("cell").parquet(s"$tmp/lists")
    codes.write.partitionBy("cell").parquet(s"$tmp/codes")
    cents.coalesce(1).write.parquet(s"$tmp/centroids")
    cb.coalesce(1).write.parquet(s"$tmp/codebook")
    val out = f.create(new org.apache.hadoop.fs.Path(s"$tmp/_FINGERPRINT"), true)
    try out.write(s"stream-compacted|$indexDir".getBytes("UTF-8")) finally out.close()
    StoreSwap.swapIn(f, tmp, root)
  }

  /** Wire a (vec_id, embedding) stream into continuous index
    * maintenance against a frozen vintage — the lake job: each
    * micro-batch lands as its own partitions, and the index is
    * queryable between batches.
    */
  def start(embeddings: DataFrame, indexDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // batch ids from the stream start at 0, which baseBuild used for
        // the base corpus — offset so appends never collide with it
        appendBatch(batch.sparkSession, batch, id + 1L, indexDir)
        ()
      }
      .start()
}
