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

  /** Run independent Spark actions concurrently from a bounded pool
    * (guide §2.6: actions are only sequential because driver code calls
    * them sequentially — overlapping independent write jobs lets the
    * next job's tasks back-fill executors freed by the current job's
    * tail). Used by the store builders/maintainers whose batch commits
    * are several writes to DISJOINT paths/partitions derived from one
    * persisted relation: each write stages under its own Spark staging
    * dir, so concurrency cannot interleave artifacts, and a failure in
    * any task propagates after all settle (completed writes are
    * idempotent per-batch partitions, the replay contract). FIFO
    * scheduling keeps the back-fill behavior.
    */
  def inParallel(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      val errs = futs.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(e.getCause)
          case e: Throwable => Some(e)
        }
      }
      errs.headOption.foreach(e => throw e)
    } finally pool.shutdown()
  }
}
