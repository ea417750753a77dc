package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Runtime plan profiler: executes a DataFrame and aggregates the SQL
  * metrics of its FINAL (post-AQE) physical plan — measured shuffle
  * volume, spill, scan output, and exchange counts.
  *
  * Why it exists: plan-shape assertions (PlanShapeSpec) pin the STRUCTURE
  * the optimizer chose; this pins the RUNTIME consequence — e.g. "the
  * star join's only shuffle carries the aggregated groups, not the fact
  * rows" becomes a measurable `shuffleRecords << scanRows` inequality
  * instead of prose. At cluster scale the same numbers come from the SQL
  * UI / metrics sink; this utility is the in-test equivalent ("measure,
  * don't guess").
  */
object EngineMetrics {

  final case class Profile(
      shuffleBytes: Long,       // bytes written across all shuffle exchanges
      shuffleRecords: Long,     // records written across all shuffle exchanges
      spillBytes: Long,         // sort/agg/join spill (memory + disk spills)
      scanRows: Long,           // rows produced by leaf scans
      scanBytes: Long,          // file bytes selected by leaf scans
                                // (FileSourceScanExec "size of files read",
                                // i.e. post partition-/bucket-pruning)
      shuffleExchanges: Int,    // distinct shuffle boundaries in the final plan
      broadcastExchanges: Int)  // broadcast boundaries in the final plan

  /** Unwrap AQE wrappers so traversal sees the plan that actually ran:
    * AdaptiveSparkPlanExec holds the final plan, and each materialized
    * QueryStageExec is a LEAF whose executed subtree hangs off `.plan`
    * (not `.children`) — both must be pierced or traversal stops at the
    * first stage boundary.
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec => unwrap(q.plan)
    case other => other
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = unwrap(p)
    self +: (self.children ++ self.subqueries).flatMap(nodes)
  }

  /** Execute `df` and profile the plan that ran. */
  def profile(df: DataFrame): Profile = {
    val qe = df.queryExecution
    // run the physical plan itself (not a re-planned command wrapper), so
    // the metric accumulators we read below are the ones that populated
    qe.executedPlan.execute().count()
    val all = nodes(qe.executedPlan)
    def sum(key: String, pred: SparkPlan => Boolean = _ => true): Long =
      all.filter(pred).flatMap(_.metrics.get(key)).map(_.value).sum
    val isScan = (p: SparkPlan) => p.children.isEmpty &&
      p.getClass.getSimpleName.contains("Scan")
    Profile(
      shuffleBytes = sum("shuffleBytesWritten"),
      shuffleRecords = sum("shuffleRecordsWritten"),
      spillBytes = sum("spillSize"),
      scanRows = sum("numOutputRows", isScan),
      scanBytes = sum("filesSize", isScan),
      shuffleExchanges =
        all.count(_.getClass.getSimpleName.startsWith("ShuffleExchange")),
      broadcastExchanges =
        all.count(_.getClass.getSimpleName.startsWith("BroadcastExchange")))
  }

  /** Execute `df` and return every node of the plan that ran (post-AQE,
    * stage boundaries pierced) — for pins on node KINDS the aggregate
    * Profile doesn't carry, e.g. "the iterations read InMemoryTableScan,
    * not the parquet file" (the persisted-relation cost model of the
    * graph family).
    */
  def ranPlanNodes(df: DataFrame): Seq[SparkPlan] = {
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    nodes(qe.executedPlan)
  }
}
