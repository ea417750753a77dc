package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for ops.WarehouseOps / ops.SqlSurface that the DuckDB
  * oracle can't (sketches) or doesn't (bit-level invariants) cover.
  */
class WarehouseSpec extends SparkSpec {

  test("zorderKey: bijective on the 256x256 grid and de-interleavable") {
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .select(col("x"), col("y"),
        WarehouseOps.zorderKey(col("x"), col("y")).as("z"))
    // bijection: 65536 distinct z values over 65536 distinct (x, y) pairs
    assert(grid.select(countDistinct(col("z"))).as[Long].head() == 65536L)
    // de-interleave recovers both coordinates — the even bits are x, the
    // odd bits are y (checked exhaustively)
    val deX = (0 until 8).map(i =>
      shiftleft(shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i))
      .reduce(_ bitwiseOR _)
    val deY = (0 until 8).map(i =>
      shiftleft(shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i))
      .reduce(_ bitwiseOR _)
    val bad = grid.filter(deX =!= col("x") || deY =!= col("y")).count()
    assert(bad == 0L, s"$bad grid points fail round-trip")
  }

  test("zorderKey: range-clustering beats the 1-D sort on a 2-D box probe") {
    // The layout claim, measured: sort the 256x256 grid by zkey and by the
    // 1-D key (x), cut both orders into 256-row "files", and count files
    // whose [min,max] stats intersect a 16x16 box predicate. Z-order must
    // prune strictly better than the x-sort for the 2-D box (the 1-D sort
    // reads every file matching x regardless of y).
    import spark.implicits._
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .select(col("x"), col("y"),
        WarehouseOps.zorderKey(col("x"), col("y")).as("z"))
    def filesTouched(orderCol: String): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
      grid
        .withColumn("file", ((row_number().over(w) - 1) / 256).cast("long"))
        .groupBy(col("file"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .filter(col("x1") >= 32 && col("x0") < 48 && col("y1") >= 32 && col("y0") < 48)
        .count()
    }
    val zFiles = filesTouched("z")
    val xFiles = filesTouched("x")
    assert(zFiles < xFiles,
      s"z-order touched $zFiles files, x-sort touched $xFiles — layout must prune better")
  }

  test("q_hll_union: merged daily sketches == one whole-table sketch (mergeability)") {
    // The operational contract: unioning per-day sketches must give the
    // SAME estimate as sketching the whole table directly — rollups never
    // re-read facts. (HLL union at equal lgK is lossless.)
    import spark.implicits._
    val merged = graft.SparkEntry.queries("q_hll_union")(spark, sf001)
      .select(col("event_type"), col("approx_users"))
    // same mod-32 domain as the (now-oracled) query — mergeability is
    // about the union algebra, not the counted column
    val direct = graft.Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id") % 32)).as("direct_users"))
    val diff = merged.join(direct, "event_type")
      .filter(col("approx_users") =!= col("direct_users")).count()
    assert(diff == 0L, "merged-sketch estimate diverged from direct sketch")
    // and the estimate lands within 5% of the exact count at this scale
    val exact = graft.Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id") % 32).as("exact_users"))
    val offBound = merged.join(exact, "event_type")
      .filter(abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * 0.05)
      .count()
    assert(offBound == 0L, "HLL estimate off by more than 5%")
    // and the UNBOUNDED-domain production shape keeps its error pin: a
    // raw-user_id sketch lands within 5% of the exact distinct count
    val rawOff = graft.Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("a"),
        countDistinct(col("user_id")).as("e"))
      .filter(abs(col("a") - col("e")) > col("e") * 0.05)
      .count()
    assert(rawOff == 0L, "raw-domain sketch error above 5%")
  }

  test("q_triangle_count: degree-oriented count equals the naive u<v<w count") {
    import spark.implicits._
    val oriented = graft.SparkEntry.queries("q_triangle_count")(spark, sf0001)
      .as[Long].head()
    // naive recount on the same co-occurrence edges (id order, no
    // orientation) — the form the oracle uses, recomputed in-engine
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), date_trunc("minute", col("ts")).as("h"), col("user_id"))
      .distinct()
    val e = ev.as("a").join(ev.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v")).distinct()
    val naive = e.as("a")
      .join(e.as("b"), col("b.u") === col("a.u") && col("b.v") > col("a.v"))
      .join(e.as("c"), col("c.u") === col("a.v") && col("c.v") === col("b.v"))
      .count()
    assert(oriented == naive, s"oriented=$oriented naive=$naive")
  }

  test("recursive CTE covers every customer exactly once (tree is spanning)") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q_recursive_cte")(spark, sf0001)
    val total = out.agg(sum(col("n"))).as[Long].head()
    val nCust = graft.Tables.load(spark, sf0001, "customer").count()
    assert(total == nCust, s"tree covered $total of $nCust customers")
  }
}
