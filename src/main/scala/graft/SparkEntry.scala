package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the ops modules; each module keeps the Spark
  * program and its DuckDB oracle side by side (ops.Q). Names key into
  * SURVEY.md §2's operator inventory.
  */
object SparkEntry {

  /** All declared queries, in module order. */
  def all: Seq[Q] =
    ops.Relational.queries ++ ops.Relational2.queries ++ ops.Temporal.queries ++
      ops.TextDedup.queries ++ ops.Similarity.queries ++ ops.TextOps.queries ++
      ops.Skew.queries ++ ops.BloomJoin.queries ++ ops.CorpusOps.queries ++
      ops.PipelineOps.queries ++ ops.SqlSurface.queries ++
      ops.TrainerOps.queries ++
      ops.WarehouseOps.queries ++ ops.StatsOps.queries ++
      multimodal.Multimodal.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Temporal.ohlcDaily(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for ops whose semantics DuckDB can't reproduce
    * (hash sketches, streaming state) — those get ScalaTest specs instead.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
