package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** q_kcore's contract: the distributed peel must produce EXACTLY the
  * k-core a reference sequential peel produces — same surviving nodes,
  * same within-core degrees. (The k-core is unique — it is the maximal
  * subgraph with min-degree >= k — so any correct peel order converges to
  * the same fixpoint; what this pins is the semi-join peel round and its
  * convergence test.) The reference peel runs on the collected sf0.001
  * edge list, where the graph is 15 nodes and k=8 genuinely removes
  * some (15 -> 11 at this grain) — the loop body is exercised, not just
  * the already-converged case.
  */
class KCoreSpec extends SparkSpec {

  private val K = 8

  private def edges(sf: String): Seq[(Long, Long)] = {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("user_id"))
      .distinct()
    ev.as("a").join(ev.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  /** Sequential reference peel: remove any node with degree < k until
    * none remains; return each survivor's within-core degree.
    */
  private def referenceCore(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    for ((u, v) <- es) {
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    var changed = true
    while (changed) {
      changed = false
      for (n <- adj.keys.toSeq if adj.contains(n) && adj(n).size < K) {
        for (m <- adj(n)) adj(m) -= n
        adj.remove(n)
        changed = true
      }
    }
    adj.map { case (n, s) => n -> s.size.toLong }.toMap
  }

  test("distributed peel matches the sequential reference k-core") {
    val es = edges(sf0001)
    assert(es.nonEmpty, "sf0.001 co-occurrence graph is empty")
    val expect = referenceCore(es)
    assert(expect.nonEmpty && expect.size < es.flatMap(e => Seq(e._1, e._2)).distinct.size,
      "fixture must peel some but not all nodes, or the loop body goes untested")
    val got = WarehouseOps.queries.find(_.name == "q_kcore").get
      .fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect,
      s"distributed core ${got.toSeq.sorted} != reference ${expect.toSeq.sorted}")
  }
}
