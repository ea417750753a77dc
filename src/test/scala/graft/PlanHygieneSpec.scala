package graft

/** Whole-inventory plan hygiene: every declared query's physical plan is
  * built (at sf0.001 — plan shapes don't depend on SF) and swept for the
  * failure modes that are catastrophic at 100 TB no matter which query
  * they sneak into:
  *
  *  - CartesianProduct: a shuffle cartesian over two corpus-sized inputs
  *    is never the intent — intentional small-side products must ride a
  *    broadcast (BroadcastNestedLoopJoin), which AQE can also pick when a
  *    theta join's side turns out tiny. No allowlist.
  *
  * The per-query PlanShapeSpec pins assert what a handful of queries MUST
  * look like; this sweep asserts what NO query may look like, so a new
  * query can't regress silently just because nobody wrote it a pin.
  */
class PlanHygieneSpec extends SparkSpec {

  test("no query in the inventory plans a shuffle CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // building the plan may run the bounded driver-side index jobs some
      // queries legitimately contain (k-means seeds, PQ codebooks) — at
      // sf0.001 those are milliseconds
      val plan =
        try fn(spark, sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN-BUILD-FAILED: ${e.getMessage}" }
      if (plan.contains("CartesianProduct") || plan.startsWith("PLAN-BUILD-FAILED"))
        Some(name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }
}
