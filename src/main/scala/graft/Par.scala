package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Keyed repartition with an EXPLICIT partition count (the session's
  * `spark.sql.shuffle.partitions`), for use in front of hive-partitioned
  * writes and per-key mapPartitions folds.
  *
  * `df.repartition(col(k))` leaves the post-shuffle partition count to
  * AQE, which sizes partitions by BYTES (advisoryPartitionSizeInBytes).
  * That is the right policy for shuffles feeding further relational
  * operators, but wrong in front of a dynamic-partition write: the
  * write's cost is dominated by FILES OPENED PER TASK — invisible to a
  * byte-based advisory — so on any input under the advisory size AQE
  * coalesces to ONE task, which then creates every partition directory
  * and file serially. Measured on the pack writer at sf0.1 (492 shard
  * dirs): 6.0–8.2 s single-task vs 1.1–1.3 s at the session's shuffle
  * parallelism (OPTIMIZATION_r14.md, plans/r14/). An explicit count pins
  * one wave of write tasks; the file tree is unchanged — all rows of a
  * key hash to one task either way, so each partition value still gets
  * exactly one file. The count follows spark.sql.shuffle.partitions, so
  * it scales with the session's configured parallelism (a conf, not a
  * constant — the bench sets it to the driver's core count, a cluster
  * sets it to cluster width).
  */
object Par {
  def byKey(keys: Column*)(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys: _*)
}
