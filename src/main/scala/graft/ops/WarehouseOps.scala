package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Warehouse-operations layer: the queries a data platform runs ABOUT its
  * data rather than on behalf of an analyst — multi-dimensional layout
  * keys (Z-order), per-column profiling, graph structure metrics over
  * co-occurrence edges, importance-weighted corpus resampling, SCD2
  * dimension builds, EWMA smoothing, and mergeable distinct sketches.
  *
  * Scale notes (the 100 TB lens):
  *  - the Z-order key is pure per-row bit arithmetic (codegen, no
  *    shuffle); writing a table CLUSTERED BY zkey turns every 2-D
  *    predicate into file-level min/max pruning — the layout trick behind
  *    Delta/Iceberg OPTIMIZE ZORDER;
  *  - profiling runs ONE pass over the table computing every column's
  *    stats together (count/distinct/min/max), then unpivots the tiny
  *    result — never one scan per column (at 100 TB, 5 scans vs 1 is the
  *    whole game); exact distinct is used here because the oracle needs
  *    exactness — production would swap approx_count_distinct per column;
  *  - triangle counting orients every edge from its lower-(degree,id)
  *    endpoint, which bounds per-vertex out-degree at O(sqrt(m)) and
  *    therefore the wedge join at O(m^1.5) — the standard MR/graph trick
  *    that keeps hub vertices from exploding the join (a naive wedge join
  *    on an unoriented edge list is quadratic in the hub degree);
  *  - importance resampling is a pure per-row filter (deterministic
  *    md5-unit acceptance against a per-row weight), so it composes with
  *    scan pushdown and needs no global pass — the DSIR-style reweighting
  *    shape where the weight would come from a quality/domain model;
  *  - the HLL sketches are partial-aggregation-friendly byte buffers:
  *    daily sketches merge into weekly/total estimates WITHOUT re-reading
  *    the fact table — the mergeability contract exact distinct lacks.
  */
/** One user's folded clamped-balance state (see q_clamped_balance). */
case class ClampedBalance(user_id: Long, final_balance: Long,
    max_balance: Long)

object WarehouseOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 8-bit × 8-bit Morton (Z-order) interleave of two bounded dimensions,
    * as a single codegen'd arithmetic expression over longs.
    */
  def zorderKey(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xs = x.cast(LongType).bitwiseAND(lit(255L))
    val ys = y.cast(LongType).bitwiseAND(lit(255L))
    (0 until 8).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  val queries: Seq[Q] = Seq(

    // Z-order layout key over (p_size, p_partkey%256): the table rewritten
    // in zkey order co-locates rows close in BOTH dimensions, so file
    // min/max stats prune 2-D range predicates that a 1-D sort can only
    // prune on its leading column. The oracle spells the identical bit
    // interleave with SQL shift operators.
    Q("q_zorder_key",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            zorderKey(col("p_size"), col("p_partkey") % 256).as("zkey"))
          .orderBy(col("zkey"), col("p_partkey")),
      Some("""SELECT p_partkey,
                     (((p_size & 255) >> 0 & 1) << 0) | (((p_partkey % 256) >> 0 & 1) << 1) |
                     (((p_size & 255) >> 1 & 1) << 2) | (((p_partkey % 256) >> 1 & 1) << 3) |
                     (((p_size & 255) >> 2 & 1) << 4) | (((p_partkey % 256) >> 2 & 1) << 5) |
                     (((p_size & 255) >> 3 & 1) << 6) | (((p_partkey % 256) >> 3 & 1) << 7) |
                     (((p_size & 255) >> 4 & 1) << 8) | (((p_partkey % 256) >> 4 & 1) << 9) |
                     (((p_size & 255) >> 5 & 1) << 10) | (((p_partkey % 256) >> 5 & 1) << 11) |
                     (((p_size & 255) >> 6 & 1) << 12) | (((p_partkey % 256) >> 6 & 1) << 13) |
                     (((p_size & 255) >> 7 & 1) << 14) | (((p_partkey % 256) >> 7 & 1) << 15)
                       AS zkey
              FROM part ORDER BY zkey, p_partkey""")),

    // Table profile: null count, exact distinct count, min and max (as
    // strings) for every column of `documents`. Two passes over one scan:
    // (1) a plain global aggregate for count/min/max (no distinct — fully
    // map-side combined, one row crosses the wire), and (2) distinct
    // counts via unpivot -> single-distinct aggregate keyed by column
    // name. NOT five countDistincts in one agg: Spark's
    // RewriteDistinctAggregates would Expand every row 6x (six copies of
    // `text` through the shuffle) AND its gid<->column assignment
    // iterates a hash structure seeded by session exprId state, so the
    // physical plan text differs run to run — the one PLANS.json
    // fingerprint that flapped every gate run until round 9. The
    // single-distinct shape dedups (col, value) map-side, shuffles each
    // distinct value once, and plans deterministically. The oracle is
    // the per-column UNION ALL a human would write — same numbers, five
    // scans (DuckDB's problem, not ours).
    Q("q_table_profile",
      (s, dir) => {
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val docs = t(s, dir, "documents")
        val aggs = cols.flatMap { c =>
          Seq(
            (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
            min(col(c)).cast(StringType).as(s"${c}__mn"),
            max(col(c)).cast(StringType).as(s"${c}__mx"))
        }
        val one = docs.agg(aggs.head, aggs.tail: _*)
        val stackArgs = cols.map(c =>
          s"'$c', ${c}__nn, ${c}__mn, ${c}__mx").mkString(", ")
        val base = one.selectExpr(
          s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, vmin, vmax)")
        // distinct counts: unpivot to (col_name, value-as-string) — the
        // string cast is injective per column, so distinct-by-string ==
        // distinct-by-value — then ONE distinct agg (no gid rewrite)
        val ndArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
        val nd = docs
          .selectExpr(s"stack(${cols.size}, $ndArgs) AS (col_name, v)")
          .groupBy(col("col_name"))
          .agg(countDistinct(col("v")).as("n_distinct"))
        base.join(nd, Seq("col_name"))
          .select(col("col_name"), col("n_null"), col("n_distinct"),
            col("vmin"), col("vmax"))
          .orderBy(col("col_name"))
      },
      Some("""SELECT 'doc_id' AS col_name, COUNT(*) - COUNT(doc_id) AS n_null,
                     COUNT(DISTINCT doc_id) AS n_distinct,
                     CAST(MIN(doc_id) AS VARCHAR) AS vmin, CAST(MAX(doc_id) AS VARCHAR) AS vmax
              FROM documents
              UNION ALL
              SELECT 'text', COUNT(*) - COUNT(text), COUNT(DISTINCT text),
                     CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR) FROM documents
              UNION ALL
              SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
                     CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR) FROM documents
              UNION ALL
              SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
                     CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
              UNION ALL
              SELECT 'n_chars', COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
                     CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
              ORDER BY col_name""")),

    // Triangle count over the user co-occurrence graph (same event_type +
    // minute bucket — the MINUTE granularity keeps Σc² edge generation
    // linear-ish as the corpus densifies; hour buckets go quadratic:
    // 790k edges / 197M triangles at sf0.1 vs 23k / 8.5k at minute).
    // Spark side uses degree orientation: every edge points
    // from its lower-(degree, id) endpoint, wedges fan out only from the
    // bounded out-degree side, and the closing edge is probed in its
    // oriented direction. The oracle counts the same triangles with the
    // textbook u<v<w triple join — equal by symmetry.
    Q("q_triangle_count",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), date_trunc("minute", col("ts")).as("h"),
            col("user_id"))
          .distinct()
        // the edge subtree is consumed by degrees AND both join sides; it
        // stays LAZY here — measured at bench scale, re-deriving the 23k-
        // row subtree per consumer costs ~1.8 s total while persist +
        // count + localCheckpoint materialization costs ~5.4 s (cache
        // write + checkpoint jobs dominate a small subtree). At lake
        // scale the ratio flips and the edge list materializes to a table
        // first — the same size-adaptive call connectedComponents makes.
        val e2 = ev.as("a").join(ev.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.h") === col("b.h") &&
              col("a.user_id") < col("b.user_id"))
          .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
          .distinct()
        // (degree, id) as one sortable long: degree ranks first, id breaks
        // ties; ids are < 1e9 by construction of the synthetic corpus
        val deg = e2.select(col("u").as("node"))
          .unionAll(e2.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .select(col("node"), (col("deg") * 1000000000L + col("node")).as("ord"))
        val withOrd = e2
          .join(deg.withColumnRenamed("node", "u").withColumnRenamed("ord", "ou"), Seq("u"))
          .join(deg.withColumnRenamed("node", "v").withColumnRenamed("ord", "ov"), Seq("v"))
        val oriented = withOrd.select(
            when(col("ou") < col("ov"), col("u")).otherwise(col("v")).as("src"),
            when(col("ou") < col("ov"), col("ov")).otherwise(col("ou")).as("dord"),
            when(col("ou") < col("ov"), col("v")).otherwise(col("u")).as("dst"))
        val wedges = oriented.as("e1").join(oriented.as("e2"),
            col("e1.src") === col("e2.src") && col("e1.dord") < col("e2.dord"))
          .select(col("e1.dst").as("x"), col("e2.dst").as("y"))
        val closing = oriented.select(col("src").as("x"), col("dst").as("y"))
        wedges.join(closing, Seq("x", "y"))
          .agg(count(lit(1)).as("n_triangles"))
      },
      Some("""WITH ev AS (
                SELECT DISTINCT event_type, date_trunc('minute', ts) AS h, user_id
                FROM events),
              e AS (
                SELECT DISTINCT a.user_id AS u, b.user_id AS v
                FROM ev a JOIN ev b
                  ON a.event_type = b.event_type AND a.h = b.h
                 AND a.user_id < b.user_id)
              SELECT COUNT(*) AS n_triangles
              FROM e a JOIN e b ON b.u = a.u AND b.v > a.v
                       JOIN e c ON c.u = a.v AND c.v = b.v""")),

    // Importance-weighted resampling (DSIR shape): per-doc acceptance
    // probability w = min(1, n_chars/800) — longer docs kept more often —
    // realized as a deterministic md5-unit test, so the sample is
    // replay-stable and needs no rand() or global pass. The weight is
    // where a quality-classifier or domain-ratio score plugs in.
    Q("q_importance_sample",
      (s, dir) => {
        val w = least(lit(1.0), col("n_chars").cast(DoubleType) / 800.0)
        val thr = lpad(lower(hex((w * 16777215.0).cast(LongType))), 6, "0")
        t(s, dir, "documents")
          .filter(substring(md5(col("doc_id").cast(StringType)), 1, 6) <= thr)
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_chars FROM documents
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) <=
                    lpad(lower(to_hex(CAST(least(1.0, CAST(n_chars AS DOUBLE) / 800.0)
                                           * 16777215.0 AS BIGINT))), 6, '0')
              ORDER BY doc_id""")),

    // SCD2 dimension build from the event stream as CDC: collapse
    // consecutive identical states per user, then close each version's
    // validity interval with the next change's timestamp. Both windows
    // share one (user_id, ts) sort — a single shuffle.
    Q("q_scd2_intervals",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_scd2_v")
        s.sql("""WITH chg AS (
                   SELECT user_id, event_type, ts, event_id,
                          LAG(event_type) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                   FROM events_scd2_v)
                 SELECT user_id, event_type,
                        ts AS valid_from,
                        LEAD(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                        LEAD(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          AS is_current
                 FROM chg
                 WHERE prev IS NULL OR prev <> event_type
                 ORDER BY user_id, valid_from""")
      },
      Some("""WITH chg AS (
                SELECT user_id, event_type, ts, event_id,
                       LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events)
              SELECT user_id, event_type,
                     CAST(ts AS TIMESTAMP) AS valid_from,
                     CAST(LEAD(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)
                       AS valid_to,
                     LEAD(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       AS is_current
              FROM chg
              WHERE prev IS NULL OR prev <> event_type
              ORDER BY user_id, valid_from""")),

    // EWMA smoothing (5-tap, alpha-decay 0.85) of each user's value
    // series: written as an explicit weighted lag sum so Spark and DuckDB
    // execute the IDENTICAL left-to-right IEEE double chain — bitwise
    // parity without decimal rounding. The k-tap truncation makes the
    // smoother a fixed-size window op (an unbounded EWMA is a sequential
    // recurrence — that form lives in streaming state, not a window).
    Q("q_ewma",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_ewma_v")
        s.sql("""SELECT event_id, user_id,
                        (value
                         + 0.85 * coalesce(LAG(value, 1) OVER w, 0.0)
                         + 0.7225 * coalesce(LAG(value, 2) OVER w, 0.0)
                         + 0.614125 * coalesce(LAG(value, 3) OVER w, 0.0)
                         + 0.52200625 * coalesce(LAG(value, 4) OVER w, 0.0))
                        /
                        (1.0
                         + (CASE WHEN LAG(value, 1) OVER w IS NULL THEN 0.0 ELSE 0.85 END)
                         + (CASE WHEN LAG(value, 2) OVER w IS NULL THEN 0.0 ELSE 0.7225 END)
                         + (CASE WHEN LAG(value, 3) OVER w IS NULL THEN 0.0 ELSE 0.614125 END)
                         + (CASE WHEN LAG(value, 4) OVER w IS NULL THEN 0.0 ELSE 0.52200625 END))
                          AS ewma5
                 FROM events_ewma_v
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
                 ORDER BY event_id""")
      },
      Some("""SELECT event_id, user_id,
                     (value
                      + 0.85 * coalesce(LAG(value, 1) OVER w, 0.0)
                      + 0.7225 * coalesce(LAG(value, 2) OVER w, 0.0)
                      + 0.614125 * coalesce(LAG(value, 3) OVER w, 0.0)
                      + 0.52200625 * coalesce(LAG(value, 4) OVER w, 0.0))
                     /
                     (1.0
                      + (CASE WHEN LAG(value, 1) OVER w IS NULL THEN 0.0 ELSE 0.85 END)
                      + (CASE WHEN LAG(value, 2) OVER w IS NULL THEN 0.0 ELSE 0.7225 END)
                      + (CASE WHEN LAG(value, 3) OVER w IS NULL THEN 0.0 ELSE 0.614125 END)
                      + (CASE WHEN LAG(value, 4) OVER w IS NULL THEN 0.0 ELSE 0.52200625 END))
                       AS ewma5
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id""")),

    // Declarative data-quality audit (the Deequ/great-expectations shape):
    // each rule is one bounded aggregate — range checks stream map-side,
    // the referential check is a broadcast anti-join count — and the
    // result is the tiny (rule, violations) report a pipeline gates on.
    // At 100 TB every rule is one pass, and same-table rules share their
    // scan via the union's common subtree.
    Q("q_dq_audit",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val e = t(s, dir, "events")
        val docs = t(s, dir, "documents")
        def rule(name: String, d: DataFrame): DataFrame =
          d.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("rule"), col("n_violations"))
        rule("lineitem_quantity_range",
            li.filter(col("l_quantity") < 1 || col("l_quantity") > 50))
          .unionAll(rule("orders_custkey_fk",
            o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_anti")))
          .unionAll(rule("events_value_nonnegative",
            e.filter(col("value") < 0)))
          .unionAll(rule("documents_text_nonempty",
            docs.filter(col("text").isNull || length(col("text")) === 0)))
          .orderBy(col("rule"))
      },
      Some("""SELECT 'lineitem_quantity_range' AS rule, COUNT(*) AS n_violations
              FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
              UNION ALL
              SELECT 'orders_custkey_fk', COUNT(*) FROM orders
              WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
              UNION ALL
              SELECT 'events_value_nonnegative', COUNT(*) FROM events WHERE value < 0
              UNION ALL
              SELECT 'documents_text_nonempty', COUNT(*) FROM documents
              WHERE text IS NULL OR len(text) = 0
              ORDER BY rule""")),

    // Incremental aggregate maintenance: a stored pre-cutoff rollup plus
    // the new-data delta merge into the updated rollup WITHOUT rescanning
    // history — counts and decimal sums add, min/max combine, avg derives
    // from the merged sum/count. The oracle recomputes from the full
    // table: merged partials MUST equal the full recompute (the algebraic
    // property incremental warehouse rollups rely on). At scale the base
    // aggregate is a stored table; here it is the filtered branch.
    Q("q_rollup_incremental",
      (s, dir) => {
        val e = t(s, dir, "events")
        def part(d: DataFrame): DataFrame =
          d.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).as("sv"),
              min(col("value")).as("mn"), max(col("value")).as("mx"))
        val cutoff = lit("2024-01-15").cast(TimestampType)
        part(e.filter(col("ts") < cutoff))
          .unionAll(part(e.filter(col("ts") >= cutoff)))
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n_events"),
            sum(col("sv")).cast(DoubleType).as("sum_value"),
            min(col("mn")).as("min_value"), max(col("mx")).as("max_value"),
            (sum(col("sv")).cast(DoubleType) / sum(col("n"))).as("avg_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                     MIN(value) AS min_value, MAX(value) AS max_value,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
              FROM events
              GROUP BY event_type ORDER BY event_type""")),

    // PageRank (3 damped iterations) over the minute co-occurrence graph,
    // in FIXED-POINT: ranks are longs scaled by 1e12, every share is an
    // integer division, every combine an exact long sum — so the result
    // is bitwise-identical across engines and partition orders (float
    // PageRank never hash-compares: per-node sums are order-dependent).
    // Each iteration is one broadcast-or-shuffle join of the edge list
    // against the rank vector + one aggregate — the textbook distributed
    // PR shape; the edge list and degrees are persisted across the
    // unrolled iterations (at lake scale: a materialized edge table).
    // No dangling nodes by construction (every node has degree >= 1).
    Q("q_pagerank",
      (s, dir) => {
        val (ranks, persisted) = pagerankRanks(s, dir)
        val out = ranks.localCheckpoint()
        persisted.foreach(_.unpersist())
        out
      },
      Some("""WITH ev AS (
                SELECT DISTINCT event_type, date_trunc('minute', ts) AS h, user_id
                FROM events),
              e AS (
                SELECT DISTINCT a.user_id AS u, b.user_id AS v
                FROM ev a JOIN ev b
                  ON a.event_type = b.event_type AND a.h = b.h
                 AND a.user_id < b.user_id),
              ed AS (SELECT u AS src, v AS dst FROM e
                     UNION ALL SELECT v, u FROM e),
              deg AS (SELECT src, COUNT(*) AS d FROM ed GROUP BY src),
              nn AS (SELECT COUNT(*) AS c FROM deg),
              p0 AS (SELECT src AS node, d,
                            1000000000000 // (SELECT c FROM nn) AS pr FROM deg),
              s1 AS (SELECT ed.dst, CAST(SUM(p.pr // p.d) AS BIGINT) AS s
                     FROM ed JOIN p0 p ON ed.src = p.node GROUP BY ed.dst),
              p1 AS (SELECT p.node, p.d,
                            (15 * 1000000000000) // (100 * (SELECT c FROM nn))
                              + (85 * COALESCE(s1.s, 0)) // 100 AS pr
                     FROM p0 p LEFT JOIN s1 ON s1.dst = p.node),
              s2 AS (SELECT ed.dst, CAST(SUM(p.pr // p.d) AS BIGINT) AS s
                     FROM ed JOIN p1 p ON ed.src = p.node GROUP BY ed.dst),
              p2 AS (SELECT p.node, p.d,
                            (15 * 1000000000000) // (100 * (SELECT c FROM nn))
                              + (85 * COALESCE(s2.s, 0)) // 100 AS pr
                     FROM p1 p LEFT JOIN s2 ON s2.dst = p.node),
              s3 AS (SELECT ed.dst, CAST(SUM(p.pr // p.d) AS BIGINT) AS s
                     FROM ed JOIN p2 p ON ed.src = p.node GROUP BY ed.dst),
              p3 AS (SELECT p.node, p.d,
                            (15 * 1000000000000) // (100 * (SELECT c FROM nn))
                              + (85 * COALESCE(s3.s, 0)) // 100 AS pr
                     FROM p2 p LEFT JOIN s3 ON s3.dst = p.node)
              SELECT node, pr FROM p3 ORDER BY pr DESC, node""")),

    // Synchronous label propagation (3 rounds) over the same minute
    // co-occurrence graph — the classic LPA community detector,
    // completing the graph family (components, PageRank, k-core,
    // triangles): community(v) starts as v; each round every node adopts
    // the most frequent label among its neighbors, ties broken toward the
    // SMALLEST label. Sync rounds + integer tie-break make the fixture
    // deterministic, so communities hash-match (async/random-order LPA,
    // the usual formulation, cannot). Each round is one join of the
    // persisted edge list against the label vector, one (dst, label)
    // count, and one deterministic argmax via max(struct(c, -label)) —
    // exact integers end to end. At 100 TB: a round's shuffle is
    // O(edges) with map-side combine on (dst, label); rounds re-read the
    // persisted edge list, never the events table (the PageRank cost
    // model). The oracle unrolls the same 3 rounds with the row_number
    // (c DESC, label ASC) argmax — the same function by construction.
    Q("q_label_prop",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), date_trunc("minute", col("ts")).as("h"),
            col("user_id"))
          .distinct()
        val e2 = ev.as("a").join(ev.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.h") === col("b.h") &&
              col("a.user_id") < col("b.user_id"))
          .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
          .distinct()
        val ed = e2.select(col("u").as("src"), col("v").as("dst"))
          .unionAll(e2.select(col("v").as("src"), col("u").as("dst")))
          .persist()
        var lab = ed.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
        (1 to 3).foreach { _ =>
          lab = ed.join(lab, ed("src") === lab("node"))
            .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
            .groupBy(col("dst"))
            .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
            .select(col("dst").as("node"), (-col("m.nl")).as("label"))
        }
        val out = lab
          .select(col("node").as("user_id"), col("label").as("community"))
          .orderBy(col("user_id")).localCheckpoint()
        ed.unpersist()
        out
      },
      Some("""WITH ev AS (
                SELECT DISTINCT event_type, date_trunc('minute', ts) AS h, user_id
                FROM events),
              e AS (
                SELECT DISTINCT a.user_id AS u, b.user_id AS v
                FROM ev a JOIN ev b
                  ON a.event_type = b.event_type AND a.h = b.h
                 AND a.user_id < b.user_id),
              ed AS (SELECT u AS src, v AS dst FROM e
                     UNION ALL SELECT v, u FROM e),
              l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
              g1 AS (SELECT ed.dst, l.label, COUNT(*) AS c
                     FROM ed JOIN l0 l ON ed.src = l.node GROUP BY 1, 2),
              l1 AS (SELECT dst AS node, label FROM (
                       SELECT dst, label, ROW_NUMBER() OVER (
                         PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
                       FROM g1) WHERE rn = 1),
              g2 AS (SELECT ed.dst, l.label, COUNT(*) AS c
                     FROM ed JOIN l1 l ON ed.src = l.node GROUP BY 1, 2),
              l2 AS (SELECT dst AS node, label FROM (
                       SELECT dst, label, ROW_NUMBER() OVER (
                         PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
                       FROM g2) WHERE rn = 1),
              g3 AS (SELECT ed.dst, l.label, COUNT(*) AS c
                     FROM ed JOIN l2 l ON ed.src = l.node GROUP BY 1, 2),
              l3 AS (SELECT dst AS node, label FROM (
                       SELECT dst, label, ROW_NUMBER() OVER (
                         PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
                       FROM g3) WHERE rn = 1)
              SELECT node AS user_id, label AS community
              FROM l3 ORDER BY user_id""")),

    // Heavy hitters via the frequent-items sketch (approx_top_k,
    // DataSketches ItemsSketch): THE bounded-memory answer to "top
    // values" over an unbounded-cardinality column — one pass, fixed
    // sketch size, partial-merge-friendly, vs the exact groupBy+top-k
    // that must shuffle every distinct key. Here the tracked capacity
    // (default 10k) exceeds the 100 distinct buckets, where the sketch is
    // EXACT by construction — so the oracle can hash-compare against the
    // exact SQL. k covers the whole item domain: a smaller k would make
    // the SELECTION at the count-tie boundary sketch-internal (ranks
    // 10-12 tie at sf0.1) — the values are contractual, the tie order is
    // not. Output re-sorted by (count, item) for the same reason.
    Q("q_approx_topk",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_topk_v")
        s.sql("""SELECT t.item AS bucket, t.count AS n
                 FROM (SELECT approx_top_k(user_id % 100, 100) AS tk
                       FROM events_topk_v) LATERAL VIEW explode(tk) AS t
                 ORDER BY n DESC, bucket""")
      },
      Some("""SELECT (user_id % 100) AS bucket, COUNT(*) AS n
              FROM events
              GROUP BY bucket ORDER BY n DESC, bucket""")),

    // Key-skew diagnostics: the numbers an operator reads before choosing
    // a salt factor or AQE threshold — per-key-domain row counts
    // summarized as max/mean skew factor and the top heavy hitter. One
    // partial-aggregated pass per profiled key domain; the output is one
    // row per domain. (The salting/AQE machinery this informs is
    // ops/Skew.scala and the AQE skew-split spec.)
    Q("q_key_skew_profile",
      (s, dir) => {
        def profile(domain: String, d: DataFrame, key: org.apache.spark.sql.Column)
            : DataFrame =
          d.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
            .agg(count(lit(1)).as("n_keys"),
              sum(col("c")).as("n_rows"),
              max(col("c")).as("max_rows"),
              (max(col("c")).cast(DoubleType) * count(lit(1)) / sum(col("c")))
                .as("skew_factor"),
              max_by(col("k").cast(StringType), struct(col("c"), col("k").cast(StringType)))
                .as("heaviest_key"))
            .select(lit(domain).as("domain"), col("n_keys"), col("n_rows"),
              col("max_rows"), col("skew_factor"), col("heaviest_key"))
        profile("events.user_id", t(s, dir, "events"), col("user_id"))
          .unionAll(profile("events.event_type", t(s, dir, "events"), col("event_type")))
          .unionAll(profile("lineitem.l_suppkey", t(s, dir, "lineitem"), col("l_suppkey")))
          .unionAll(profile("documents.source", t(s, dir, "documents"), col("source")))
          .orderBy(col("domain"))
      },
      Some("""WITH p AS (
                SELECT 'events.user_id' AS domain, COUNT(*) AS c, CAST(user_id AS VARCHAR) AS k
                FROM events GROUP BY user_id
                UNION ALL
                SELECT 'events.event_type', COUNT(*), event_type FROM events GROUP BY event_type
                UNION ALL
                SELECT 'lineitem.l_suppkey', COUNT(*), CAST(l_suppkey AS VARCHAR)
                FROM lineitem GROUP BY l_suppkey
                UNION ALL
                SELECT 'documents.source', COUNT(*), source FROM documents GROUP BY source),
              m AS (SELECT domain, COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
                           MAX(c) AS max_rows,
                           CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) AS skew_factor
                    FROM p GROUP BY domain),
              h AS (SELECT p.domain, MAX(p.k) AS heaviest_key
                    FROM p JOIN m ON p.domain = m.domain AND p.c = m.max_rows
                    GROUP BY p.domain)
              SELECT m.domain, n_keys, n_rows, max_rows, skew_factor, heaviest_key
              FROM m JOIN h ON m.domain = h.domain ORDER BY m.domain""")),

    // Cohort retention: users grouped by first-seen ISO week, activity
    // counted per weeks-since-cohort — the standard triangle every event
    // warehouse serves. Plan: one pass derives (user, week), the per-user
    // min is a user-cardinality aggregate (persisted: it feeds both the
    // cohort sizes and the activity join, and is the small side of that
    // join), and the fact stream joins it on user_id. Week arithmetic
    // stays integral (datediff/7 on Monday-truncated dates), so the only
    // double is the final single-division retention ratio.
    // Ordered 3-step conversion funnel (signup -> click -> purchase, each
    // step within 7 days of the previous): the sequential-pattern operator
    // retention/attribution don't cover — step N's qualifying window
    // DEPENDS on the user's step-N-1 time, so this is not a conditional
    // aggregation but a chain of user-keyed min-aggregates, each joined
    // back to the (pre-filtered) event stream. Scale shape: every
    // aggregate and join keys on user_id — three co-partitioned shuffles
    // of per-stage survivor sets that only SHRINK down the funnel; the
    // per-stage event scans are type-filtered before any join (predicate
    // reaches the scan), and no window function ever sees the full
    // stream. Output is 3 rows; the one double op is the final
    // conversion division of two exact longs.
    Q("q_funnel_steps",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val step = expr("INTERVAL 7 DAYS")
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
          .persist()
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("ts") > col("t1") && col("ts") <= col("t1") + step)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
          .persist()
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts") > col("t2") && col("ts") <= col("t2") + step)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val counts =
          s1.agg(count(lit(1)).as("users")).withColumn("step", lit(1L))
            .unionAll(s2.agg(count(lit(1)).as("users")).withColumn("step", lit(2L)))
            .unionAll(s3.agg(count(lit(1)).as("users")).withColumn("step", lit(3L)))
        val base = s1.agg(count(lit(1)).as("step1_users"))
        val out = counts.crossJoin(broadcast(base))
          .select(col("step"),
            col("users"),
            (col("users").cast(DoubleType) / col("step1_users")).as("conversion"))
          .orderBy(col("step"))
          .localCheckpoint()
        s1.unpersist(); s2.unpersist()
        out
      },
      Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                          WHERE event_type = 'signup' GROUP BY 1),
                   s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                          FROM events e JOIN s1 USING (user_id)
                          WHERE e.event_type = 'click'
                            AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
                          GROUP BY 1),
                   s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                          FROM events e JOIN s2 USING (user_id)
                          WHERE e.event_type = 'purchase'
                            AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 7 DAY
                          GROUP BY 1),
                   c AS (SELECT 1 AS step, COUNT(*) AS users FROM s1
                         UNION ALL SELECT 2, COUNT(*) FROM s2
                         UNION ALL SELECT 3, COUNT(*) FROM s3)
              SELECT CAST(step AS BIGINT) AS step, users,
                     CAST(users AS DOUBLE) / (SELECT COUNT(*) FROM s1) AS conversion
              FROM c ORDER BY step""")),

    // Funnel conversion LATENCY — the companion readout to
    // q_funnel_steps' counts: for every fully-converted user, how long
    // each leg took (signup→click, click→purchase, and end-to-end).
    // Latencies are exact integer MICROSECONDS (unix_micros difference —
    // NOT date_diff boundary counting, whose truncation semantics differ
    // between engines), so count/min/max are integer-exact, the median
    // of integers interpolates to at most an exact .5, and the mean is
    // one exact-sum division. Same chained min-aggregate plan as the
    // funnel; one extra 3-way union over the converted-user relation.
    Q("q_funnel_latency",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val step = expr("INTERVAL 7 DAYS")
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("ts") > col("t1") && col("ts") <= col("t1") + step)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts") > col("t2") && col("ts") <= col("t2") + step)
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val j = s3.join(s2, Seq("user_id")).join(s1, Seq("user_id"))
          .select(col("user_id"),
            (unix_micros(col("t2")) - unix_micros(col("t1"))).as("l12"),
            (unix_micros(col("t3")) - unix_micros(col("t2"))).as("l23"),
            (unix_micros(col("t3")) - unix_micros(col("t1"))).as("l13"))
          .persist()
        val legs = j.select(lit("signup_to_click").as("leg"), col("l12").as("v"))
          .unionAll(j.select(lit("click_to_purchase").as("leg"), col("l23").as("v")))
          .unionAll(j.select(lit("signup_to_purchase").as("leg"), col("l13").as("v")))
        val out = legs.groupBy(col("leg"))
          .agg(count(lit(1)).as("n"),
            min(col("v")).as("min_us"), max(col("v")).as("max_us"),
            expr("percentile(v, 0.5D)").as("median_us"),
            (sum(col("v")).cast(DoubleType) / count(lit(1))).as("avg_us"))
          .orderBy(col("leg"))
          .localCheckpoint()
        j.unpersist()
        out
      },
      Some("""WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                          WHERE event_type = 'signup' GROUP BY 1),
                   s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                          FROM events e JOIN s1 USING (user_id)
                          WHERE e.event_type = 'click'
                            AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
                          GROUP BY 1),
                   s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                          FROM events e JOIN s2 USING (user_id)
                          WHERE e.event_type = 'purchase'
                            AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 7 DAY
                          GROUP BY 1),
                   j AS (SELECT s1.user_id,
                                epoch_us(t2) - epoch_us(t1) AS l12,
                                epoch_us(t3) - epoch_us(t2) AS l23,
                                epoch_us(t3) - epoch_us(t1) AS l13
                         FROM s3 JOIN s2 USING (user_id) JOIN s1 USING (user_id))
              SELECT leg, count(*) AS n,
                     CAST(min(v) AS BIGINT) AS min_us,
                     CAST(max(v) AS BIGINT) AS max_us,
                     quantile_cont(v, 0.5) AS median_us,
                     CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / count(*) AS avg_us
              FROM (SELECT 'signup_to_click' AS leg, l12 AS v FROM j
                    UNION ALL SELECT 'click_to_purchase', l23 FROM j
                    UNION ALL SELECT 'signup_to_purchase', l13 FROM j)
              GROUP BY leg ORDER BY leg""")),

    Q("q_retention",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
          .persist()
        val sizes = first.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_users"))
        val out = ev.join(first, Seq("user_id"))
          .groupBy(col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast(LongType).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .join(broadcast(sizes), Seq("cohort"))
          .withColumn("retention",
            col("active_users").cast(DoubleType) / col("cohort_users"))
          .select(col("cohort"), col("weeks_since"), col("active_users"),
            col("cohort_users"), col("retention"))
          .orderBy(col("cohort"), col("weeks_since"))
          .localCheckpoint()
        first.unpersist()
        out
      },
      Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
                   f AS (SELECT user_id, MIN(wk) AS cohort FROM ev GROUP BY 1),
                   sizes AS (SELECT cohort, COUNT(*) AS cohort_users FROM f GROUP BY 1),
                   act AS (SELECT f.cohort,
                                  CAST(date_diff('day', f.cohort, ev.wk) / 7 AS BIGINT) AS weeks_since,
                                  COUNT(DISTINCT ev.user_id) AS active_users
                           FROM ev JOIN f USING (user_id) GROUP BY 1, 2)
              SELECT cohort, weeks_since, active_users, cohort_users,
                     CAST(active_users AS DOUBLE) / cohort_users AS retention
              FROM act JOIN sizes USING (cohort)
              ORDER BY cohort, weeks_since""")),

    // Rolling 20-event volatility per event type — the trailing-window
    // dispersion a quotes feed monitors. The window sums are decimal
    // (order-independent, so Spark's partial ordering and DuckDB's
    // sequential scan agree bitwise); the two-pass variance identity
    // ((ss - s²/n)/(n-1)) runs in double only AFTER the exact sums are
    // fixed. ROWS frame over a unique (ts, event_id) order keeps the
    // frame contents deterministic; only full windows (n = 20) emit.
    Q("q_rolling_volatility",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_vol_v")
        s.sql("""SELECT event_id, event_type,
                        sqrt((ss - sv * sv / n) / (n - 1)) AS vol20
                 FROM (SELECT event_id, event_type,
                              COUNT(*) OVER w AS n,
                              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sv,
                              CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ss
                       FROM events_vol_v
                       WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
                 WHERE n = 20
                 ORDER BY event_id""")
      },
      Some("""SELECT event_id, event_type,
                     sqrt((ss - sv * sv / n) / (n - 1)) AS vol20
              FROM (SELECT event_id, event_type,
                           COUNT(*) OVER w AS n,
                           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sv,
                           CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ss
                    FROM events
                    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
              WHERE n = 20
              ORDER BY event_id""")),

    // Z-score outlier flagging: per-type mean/std from ONE decimal-exact
    // stats pass (the q_stats_agg identity), broadcast back over the fact
    // stream, rows beyond 3 sigma surfaced with their score. The probe
    // side is a pure per-row codegen filter — the anomaly scan shape that
    // runs map-side-only at 100 TB (stats table is O(types)).
    Q("q_zscore_outliers",
      (s, dir) => {
        val stats = t(s, dir, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast(DoubleType).as("sv"),
            sum(dec2(col("value")) * dec2(col("value"))).cast(DoubleType).as("ss"))
          .select(col("event_type"),
            (col("sv") / col("n")).as("mean"),
            sqrt((col("ss") - col("sv") * col("sv") / col("n")) / (col("n") - 1)).as("std"))
        t(s, dir, "events").join(broadcast(stats), Seq("event_type"))
          .withColumn("z", (col("value") - col("mean")) / col("std"))
          .filter(abs(col("z")) > 3.0)
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
          .orderBy(col("event_id"))
      },
      Some("""WITH st AS (SELECT event_type, COUNT(*) AS n,
                                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
                                 CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
                          FROM events GROUP BY 1),
                   ms AS (SELECT event_type, sv / n AS mean,
                                 sqrt((ss - sv * sv / n) / (n - 1)) AS std FROM st)
              SELECT e.event_id, e.event_type, e.value,
                     (e.value - ms.mean) / ms.std AS z
              FROM events e JOIN ms USING (event_type)
              WHERE abs((e.value - ms.mean) / ms.std) > 3.0::DOUBLE
              ORDER BY e.event_id""")),

    // Per-user maximum drawdown: running peak minus current value, both
    // held in DECIMAL through the window and the final max so no float
    // accumulates — only the finished statistic casts to double. Running
    // MAX over a ROWS frame is order-insensitive in VALUE but the frame
    // is pinned by the unique (ts, event_id) sort; one window pass plus
    // one grouped max, the monitoring pass a quotes warehouse runs
    // per-symbol at scale.
    Q("q_drawdown",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        t(s, dir, "events")
          .withColumn("peak", max(dec2(col("value"))).over(w))
          .withColumn("dd", col("peak") - dec2(col("value")))
          .groupBy(col("user_id"))
          .agg(max(col("dd")).cast(DoubleType).as("max_drawdown"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(MAX(peak - v) AS DOUBLE) AS max_drawdown
              FROM (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
                           MAX(CAST(value AS DECIMAL(18,2))) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
                    FROM events)
              GROUP BY user_id ORDER BY user_id""")),

    // Snapshot reconciliation: added/removed/changed rows between two
    // table versions by content hash — the CDC diff a lake runs after a
    // backfill. The "previous" snapshot is derived deterministically from
    // the current one (dropped ids -> added, shifted ids -> removed,
    // perturbed hashes -> changed) so the oracle sees the same pair. The
    // diff itself is the production shape: hash at the scan (md5 — the
    // one digest both engines spell identically), full-outer join on the
    // key, per-row status classify, unchanged rows filtered before any
    // downstream sink. At 100 TB both sides shuffle once on the join key
    // and the payload never travels — only (key, digest).
    Q("q_snapshot_diff",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("h"))
          .persist()
        val prev = base.filter(col("doc_id") % 17 =!= 3)
          .select(col("doc_id"),
            when(col("doc_id") % 23 === 5, concat(col("h"), lit("x")))
              .otherwise(col("h")).as("h"))
          .unionAll(base.filter(col("doc_id") % 31 === 7)
            .select((col("doc_id") + 1000000).as("doc_id"), col("h")))
        val out = base.as("c").join(prev.as("p"), Seq("doc_id"), "full_outer")
          .withColumn("status",
            when(col("p.h").isNull, lit("added"))
              .when(col("c.h").isNull, lit("removed"))
              .when(col("c.h") =!= col("p.h"), lit("changed")))
          .filter(col("status").isNotNull)
          .select(col("doc_id"), col("status"))
          .orderBy(col("doc_id"))
          .localCheckpoint()
        base.unpersist()
        out
      },
      Some("""WITH base AS (SELECT doc_id, md5(text) AS h FROM documents),
                   prev AS (SELECT doc_id,
                                   CASE WHEN doc_id % 23 = 5 THEN h || 'x' ELSE h END AS h
                            FROM base WHERE doc_id % 17 <> 3
                            UNION ALL
                            SELECT doc_id + 1000000, h FROM base WHERE doc_id % 31 = 7)
              SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
                     CASE WHEN p.h IS NULL THEN 'added'
                          WHEN c.h IS NULL THEN 'removed'
                          WHEN c.h <> p.h THEN 'changed' END AS status
              FROM base c FULL JOIN prev p ON c.doc_id = p.doc_id
              WHERE p.h IS NULL OR c.h IS NULL OR c.h <> p.h
              ORDER BY doc_id""")),

    // Mergeable distinct sketches (Apache DataSketches HLL): per-day
    // sketches union into a per-type total WITHOUT re-reading the facts —
    // the incremental-rollup contract exact distinct cannot offer. Oracled
    // by the exact-by-construction-domain trick: DataSketches HLL keeps an
    // EXACT coupon list below its dense-promotion threshold (~hundreds of
    // items at the default lgK), so over a 32-value domain every daily
    // sketch AND their union report the exact distinct count (verified at
    // sf0.001/0.01/0.1) and DuckDB's COUNT(DISTINCT) hash-matches. The
    // mergeable-rollup structure (daily sketch images → union agg) is
    // unchanged — that's what's being proven; the unbounded-domain
    // production shape stays pinned by the estimate-error spec.
    Q("q_hll_union",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id") % 32).as("sk"))
          .groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
            count(lit(1)).as("n_daily_sketches"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
                     COUNT(DISTINCT user_id % 32) AS approx_users,
                     COUNT(DISTINCT date_trunc('day', ts)) AS n_daily_sketches
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Mergeable QUANTILE rollups — the percentile sibling of q_hll_union.
    // approx_percentile's state is not a storable value (daily percentiles
    // cannot re-aggregate to a monthly one without re-reading facts);
    // a KLL sketch is: per-day kll_agg → stored binary → kll_merge_agg per
    // type → kll_quantile reads p50/p95 out of the union. The aggregates
    // are native TypedImperativeAggregates (functions/KllFunctions.scala,
    // the hll_sketch_agg integration shape). Gate regime mirrors
    // q_hll_union's: k=4096 >= the ~1.6k per-type item count at sf0.01, so
    // no compaction ever fires and the sketch is EXACT — kll_quantile's
    // INCLUSIVE rule ("smallest item with rank >= r") is then replayed by
    // DuckDB as min(v) FILTER (cume_dist >= r), and the sketched values
    // (per-user daily spend totals) are exact decimal sums, so both
    // engines see bit-identical doubles. The default-k randomized-
    // compaction production shape stays pinned by KllSpec's rank-error and
    // mergeability bounds; the exact==cume_dist rule itself is pinned by
    // KllSpec at both band sizes.
    Q("q_kll_union",
      (s, dir) => {
        val ud = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"),
            date_trunc("day", col("ts")).as("day"))
          .agg(dsum(col("value")).as("user_day_total"))
        val daily = ud
          .groupBy(col("event_type"), col("day"))
          .agg(graft.functions.KllFunctions.kllAgg(s, col("user_day_total"), 4096).as("sk"))
        daily.groupBy(col("event_type"))
          .agg(graft.functions.KllFunctions.kllMergeAgg(s, col("sk"), 4096).as("total"),
            count(lit(1)).as("n_daily_sketches"))
          .select(col("event_type"),
            graft.functions.KllFunctions.kllQuantile(s, col("total"), 0.5).as("p50"),
            graft.functions.KllFunctions.kllQuantile(s, col("total"), 0.95).as("p95"),
            col("n_daily_sketches"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ud AS (
                SELECT event_type, user_id, date_trunc('day', ts) AS day,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_day_total
                FROM events GROUP BY 1, 2, 3
              ), r AS (
                SELECT event_type, day, user_day_total,
                       cume_dist() OVER (PARTITION BY event_type ORDER BY user_day_total) AS cd
                FROM ud
              )
              SELECT event_type,
                     min(user_day_total) FILTER (WHERE cd >= 0.5) AS p50,
                     min(user_day_total) FILTER (WHERE cd >= 0.95) AS p95,
                     count(DISTINCT day) AS n_daily_sketches
              FROM r GROUP BY event_type ORDER BY event_type""")),

    // Mergeable FREQUENCY rollups — Count-Min completes the sketch set
    // (HLL/theta: distinct; KLL: quantiles; CMS: per-key counts): per-
    // event-type sketches of user activity merge ELEMENTWISE-EXACTLY
    // into the corpus sketch (unlike every other sketch family, the
    // merge is bit-lossless), and point estimates read out with the
    // min-over-rows rule — always >= truth, the CM guarantee. The row
    // hashes are the committed arithmetic pairwise-independent family
    // (functions/CountMinFunctions.scala), so the oracle replays the
    // EXACT bucket map and the estimates are value-oracled — the only
    // sketch family on the hard gate end-to-end. Scale shape: state is
    // depth x width longs per group regardless of key cardinality, and
    // partial aggregation merges inside the exchange.
    Q("q_countmin",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val perType = ev.groupBy(col("event_type"))
          .agg(graft.functions.CmsFunctions.cmsAgg(s, col("user_id")).as("sk"))
        val merged = perType.agg(
          graft.functions.CmsFunctions.cmsMergeAgg(s, col("sk")).as("sk"),
          count(lit(1)).as("n_sketches"))
        val probes = s.range(0, 12).select(col("id").as("probe_id"))
        val truth = ev.groupBy(col("user_id").as("probe_id"))
          .agg(count(lit(1)).as("true_cnt"))
        probes.crossJoin(broadcast(merged))
          .select(col("probe_id"),
            graft.functions.CmsFunctions.cmsQuery(s, col("sk"), col("probe_id"))
              .as("est"),
            col("n_sketches"))
          .join(truth, Seq("probe_id"), "left")
          .select(col("probe_id"), col("est"),
            coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
            col("n_sketches"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH par(r, a, b) AS (VALUES
                (0, 1103515245, 12345), (1, 214013, 2531011),
                (2, 69069, 362437), (3, 1664525, 1013904223)),
              probes AS (SELECT unnest(range(0, 12)) AS probe_id),
              bct AS (
                SELECT par.r,
                       ((par.a * ((e.user_id % 2147483647 + 2147483647) % 2147483647) + par.b)
                         % 2147483647) % 512 AS bkt,
                       count(*) AS c
                FROM events e CROSS JOIN par GROUP BY 1, 2),
              est AS (
                SELECT p.probe_id, MIN(coalesce(b.c, 0)) AS est
                FROM probes p CROSS JOIN par
                LEFT JOIN bct b ON b.r = par.r
                  AND b.bkt = ((par.a * ((p.probe_id % 2147483647 + 2147483647) % 2147483647) + par.b)
                                % 2147483647) % 512
                GROUP BY 1),
              truth AS (SELECT user_id AS probe_id, count(*) AS true_cnt
                        FROM events GROUP BY 1),
              ns AS (SELECT count(DISTINCT event_type) AS n_sketches FROM events)
              SELECT p.probe_id,
                     CAST(e.est AS BIGINT) AS est,
                     CAST(coalesce(t.true_cnt, 0) AS BIGINT) AS true_cnt,
                     CAST(ns.n_sketches AS BIGINT) AS n_sketches
              FROM probes p
              JOIN est e USING (probe_id)
              LEFT JOIN truth t USING (probe_id)
              CROSS JOIN ns
              ORDER BY p.probe_id""")),

    // First-order event-transition matrix (the Markov-chain view of user
    // journeys): per user, order events by time and pair each with its
    // successor (lead over the per-user window — the sessionize/funnel
    // shuffle shape, keyed on user_id); aggregate to (from, to) counts and
    // in-row transition probabilities. The probability is ONE double
    // division of two exact longs (the window sum groups per from-type),
    // so the result is bitwise cross-engine like the other ratio queries.
    Q("q_event_transitions",
      (s, dir) => {
        val wu = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cnt = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          .withColumn("next_type", lead(col("event_type"), 1).over(wu))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        cnt.withColumn("p", col("n").cast(DoubleType) /
            sum(col("n")).over(Window.partitionBy(col("event_type"))))
          .orderBy(col("event_type"), col("next_type"))
      },
      Some("""WITH seq AS (SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
                     FROM events),
                   c AS (SELECT event_type, next_type, COUNT(*) AS n
                         FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
              SELECT event_type, next_type, n,
                     CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
              FROM c ORDER BY event_type, next_type""")),

    // 2-D skyline (Pareto frontier): parts where no other part is both
    // cheaper-or-equal AND larger-or-equal (strict somewhere) — the
    // preference-query operator behind "best tradeoff" curation filters
    // (e.g. quality-score vs toxicity-score document frontiers). The
    // textbook formulation is a quadratic NOT EXISTS self-join (the
    // oracle); the engine computes it as a CUMULATIVE-MAX sweep: per
    // price keep the max size, then a point survives iff its size beats
    // the running max over all strictly-cheaper prices. The running max
    // uses the same two-phase shape as tokenShards: per-chunk maxima
    // (tiny, broadcast, chunk-level prefix max) + a within-chunk window —
    // O(n log n) total, distributed, no global single-partition scan and
    // no self-join. Same-price ties: only the max size survives (any
    // lower size at equal price is strictly dominated).
    Q("q_skyline",
      (s, dir) => {
        val p = t(s, dir, "part").select(col("p_partkey"),
          col("p_retailprice").as("price"), col("p_size").cast(LongType).as("size"))
        val pts = p.groupBy(col("price")).agg(max(col("size")).as("ymax"))
          .withColumn("chunk", floor(col("price") / 100).cast(LongType))
          .persist()
        // chunk-level prefix maxima: one row per price-chunk — broadcastable,
        // and the only place a (chunk-count-sized) global window runs
        val wCh = Window.orderBy(col("chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val chunkMax = pts.groupBy(col("chunk")).agg(max(col("ymax")).as("cm"))
          .withColumn("prev_max", max(col("cm")).over(wCh))
          .select(col("chunk"), col("prev_max"))
        val wIn = Window.partitionBy(col("chunk")).orderBy(col("price"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = pts.join(broadcast(chunkMax), Seq("chunk"))
          .withColumn("pm", greatest(
            coalesce(col("prev_max"), lit(Long.MinValue)),
            coalesce(max(col("ymax")).over(wIn), lit(Long.MinValue))))
          .filter(col("ymax") > col("pm"))
          .select(col("price"), col("ymax").as("size"))
        val out = p.join(frontier, Seq("price", "size"))
          .select(col("p_partkey"), col("price"), col("size"))
          .orderBy(col("p_partkey"))
          .localCheckpoint()
        pts.unpersist()
        out
      },
      Some("""SELECT a.p_partkey, a.p_retailprice AS price,
                     CAST(a.p_size AS BIGINT) AS size
              FROM part a
              WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
                  AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
              ORDER BY a.p_partkey""")),

    // Incremental JOIN maintenance: the delta algebra for a materialized
    // join view. With base relations A,B and deltas ΔA,ΔB:
    //   (A∪ΔA) ⋈ (B∪ΔB) = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
    // — the stored base join is REUSED and only the three delta joins run,
    // each bounded by |Δ| on at least one side (broadcastable at lake
    // scale, where A⋈B re-execution is the thing you cannot afford). The
    // completeness of the algebra is what the oracle proves: the
    // incremental union hash-matches the from-scratch join. Splits are
    // hash-deterministic (Spark-side only — the oracle never needs them).
    // Companion to q_rollup_incremental (aggregate maintenance) and
    // streaming/RollupMaintenance (the streaming form).
    Q("q_join_incremental",
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val oNew = pmod(xxhash64(col("o_orderkey")), lit(4)) === 0
        val lNew = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(4)) === 0
        val (oB, oD) = (o.filter(!oNew), o.filter(oNew))
        val (lB, lD) = (l.filter(!lNew), l.filter(lNew))
        def j(a: DataFrame, b: DataFrame): DataFrame =
          a.join(b, a("o_orderkey") === b("l_orderkey"))
            .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
              col("l_quantity"))
        j(oB, lB) // the stored base view (at scale: read back, not recomputed)
          .unionAll(j(oD, lB))
          .unionAll(j(oB, lD))
          .unionAll(j(oD, lD))
          .orderBy(col("o_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT o_orderkey, l_linenumber, o_custkey, l_quantity
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              ORDER BY o_orderkey, l_linenumber""")),

    // Audience overlap, EXACT: per event type, distinct users active in
    // BOTH halves of the month (plus each half's reach). One aggregation
    // tree — flags fold at (type, user) grain, counts fold at type grain —
    // so the whole question costs a single shuffle of user-grain partials,
    // never a self-join of two distinct sets. The oracled exact twin of
    // q_theta_overlap below.
    Q("q_distinct_overlap",
      (s, dir) => {
        val mid = lit("2024-01-16 00:00:00").cast(TimestampType)
        t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(max(when(col("ts") < mid, 1).otherwise(0)).as("f1"),
            max(when(col("ts") >= mid, 1).otherwise(0)).as("f2"))
          .groupBy(col("event_type"))
          .agg(count(when(col("f1") === 1 && col("f2") === 1, 1)).as("both_halves"),
            count(when(col("f1") === 1, 1)).as("first_half"),
            count(when(col("f2") === 1, 1)).as("second_half"))
          .orderBy(col("event_type"))
      },
      Some("""WITH u AS (
                SELECT event_type, user_id,
                       MAX(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS f1,
                       MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS f2
                FROM events GROUP BY 1, 2)
              SELECT event_type,
                     COUNT(CASE WHEN f1 = 1 AND f2 = 1 THEN 1 END) AS both_halves,
                     COUNT(CASE WHEN f1 = 1 THEN 1 END) AS first_half,
                     COUNT(CASE WHEN f2 = 1 THEN 1 END) AS second_half
              FROM u GROUP BY event_type ORDER BY event_type""")),

    // Audience overlap from STORED sketches: per-half theta sketches of
    // the user set (the summary a warehouse would keep per day/month),
    // intersected per type — the overlap question answered WITHOUT
    // re-reading either half's facts, which is the whole point at 100 TB:
    // the facts are petabytes, the sketch table is kilobytes. Theta (not
    // HLL) because HLL union-only algebra cannot express intersection.
    // Oracled by the exact-by-construction-domain trick: a theta sketch
    // is a KMV sample that stays EXACT below its nominal k=4096 entries,
    // so over the 1024-value domain every per-half sketch, intersection
    // and union report exact set cardinalities (verified at sf0.001/
    // 0.01/0.1) and DuckDB's exact set algebra hash-matches. The
    // raw-domain audience semantics stay oracled via the exact twin
    // above; ThetaSpec pins the estimate error beyond the exact regime.
    Q("q_theta_overlap",
      (s, dir) => {
        val mid = lit("2024-01-16 00:00:00").cast(TimestampType)
        t(s, dir, "events")
          .groupBy(col("event_type"), (col("ts") < mid).as("first_half"))
          .agg(graft.functions.ThetaFunctions.thetaAgg(s, col("user_id") % 1024).as("sk"))
          .groupBy(col("event_type"))
          .agg(graft.functions.ThetaFunctions.thetaIntersectAgg(s, col("sk")).as("inter"),
            graft.functions.ThetaFunctions.thetaUnionAgg(s, col("sk")).as("uni"))
          .select(col("event_type"),
            round(graft.functions.ThetaFunctions.thetaEstimate(s, col("inter")), 0)
              .cast(LongType).as("approx_both"),
            round(graft.functions.ThetaFunctions.thetaEstimate(s, col("uni")), 0)
              .cast(LongType).as("approx_either"))
          .orderBy(col("event_type"))
      },
      Some("""WITH u AS (
                SELECT event_type, user_id % 1024 AS ub,
                       MAX(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS f1,
                       MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS f2
                FROM events GROUP BY 1, 2)
              SELECT event_type,
                     COUNT(CASE WHEN f1 = 1 AND f2 = 1 THEN 1 END) AS approx_both,
                     COUNT(*) AS approx_either
              FROM u GROUP BY event_type ORDER BY event_type""")),

    // MERGE upsert (the CDC-apply algebra): base snapshot ⟕ delta batch →
    // new snapshot. Matched delta rows replace (op='U') or remove
    // (op='D') base rows; unmatched delta rows insert. Computed as
    //   (base ANTI-JOIN delta.keys) ∪ (delta WHERE op <> 'D')
    // — the delta side is the small one by construction (a CDC batch vs
    // the accumulated table), so the anti-join BROADCASTS the delta keys
    // and the base table never shuffles; the union is shuffle-free. The
    // base/delta split is md5-deterministic so DuckDB reproduces it
    // bit-for-bit (the same convention as the sampling family).
    Q("q_merge_upsert",
      (s, dir) => {
        val keyed = t(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          substring(md5(col("o_orderkey").cast(StringType)), 1, 1).as("h1"),
          substring(md5(col("o_orderkey").cast(StringType)), 2, 1).as("h2"))
        // Arithmetic stays decimal-exact (+1 on DECIMAL(15,2) is lossless);
        // the OUTPUT casts to DOUBLE per the suite convention — every
        // oracled query emits DOUBLE, never DECIMAL, because the driver's
        // cross-engine hash compare diverges on decimal cells even when
        // values agree (the round-5 red row). SchemaHygieneSpec pins this.
        val base = keyed.filter(col("h1") <= "b")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast(DoubleType).as("price"))
        val delta = keyed.filter(col("h1") >= "8")
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") + 1).cast(DoubleType).as("price"),
            when(col("h2") <= "3", "D").otherwise("U").as("op"))
        base.join(broadcast(delta.select(col("o_orderkey"))), Seq("o_orderkey"),
            "left_anti")
          .withColumn("src", lit("base"))
          .unionAll(delta.filter(col("op") =!= "D")
            .select(col("o_orderkey"), col("o_custkey"), col("price"))
            .withColumn("src", lit("delta")))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH k AS (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS h1,
                       substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1) AS h2
                FROM orders),
              base AS (SELECT o_orderkey, o_custkey,
                              CAST(o_totalprice AS DOUBLE) AS price
                       FROM k WHERE h1 <= 'b'),
              delta AS (SELECT o_orderkey, o_custkey,
                               CAST(o_totalprice + 1 AS DOUBLE) AS price,
                               CASE WHEN h2 <= '3' THEN 'D' ELSE 'U' END AS op
                        FROM k WHERE h1 >= '8')
              SELECT b.o_orderkey, b.o_custkey, b.price, 'base' AS src
              FROM base b
              WHERE NOT EXISTS (SELECT 1 FROM delta d
                                WHERE d.o_orderkey = b.o_orderkey)
              UNION ALL
              SELECT o_orderkey, o_custkey, price, 'delta' FROM delta
              WHERE op <> 'D'
              ORDER BY o_orderkey""")),

    // Last-touch attribution: each purchase attributes to the user's most
    // recent preceding click within 3 days. NOT a join — one window pass
    // per user carries the last-seen click forward (last(…, ignoreNulls)
    // over an explicit ROWS frame), so the operator costs a single
    // user-keyed shuffle regardless of the click:purchase ratio; the
    // as-of-join formulation would shuffle both event subsets separately
    // and pay a range-merge per user. Frame is ROWS (not the default
    // RANGE) so both engines resolve same-timestamp peers identically via
    // the (ts, event_id) total order.
    // Clamped running balance (the inventory-floor recurrence
    // bal' = max(0, bal + delta)) — NON-ASSOCIATIVE, so no window frame
    // or partial aggregation can express it. Scale shape: ONE user-keyed
    // shuffle (repartition) + an in-partition (user_id, ts, event_id)
    // sort, then a mapPartitions running fold that carries exactly two
    // longs per OPEN user — O(1) heap per key, so a bot user with 10^9
    // events streams through instead of materializing a collect_list
    // array (the shape the round-7 review flagged). Deltas are signed
    // cents (integer-exact), computed in codegen BEFORE the fold so the
    // imperative part is only the clamp recurrence; DuckDB mirrors with
    // list_reduce over the same (ts, event_id) total order. True
    // infinite streams use the EwmaTws carry-state shape instead.
    Q("q_clamped_balance",
      (s, dir) => {
        val delta = when(col("event_type").isin("click", "view"),
          round(col("value") * 100).cast(LongType))
          .otherwise(-round(col("value") * 100).cast(LongType))
        implicit val enc = Encoders.product[ClampedBalance]
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), delta.as("d"))
          .transform(graft.Par.byKey(col("user_id")))
          .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
          .select(col("user_id"), col("d"))
          .mapPartitions { rows =>
            // running fold over the sorted partition: carries (uid, bal,
            // max) for the single OPEN user; emits on key change / end
            new Iterator[ClampedBalance] {
              private var haveCur = false
              private var uid = 0L; private var bal = 0L; private var mx = 0L
              private var out: ClampedBalance = null
              private def advance(): Unit =
                while (out == null && (haveCur || rows.hasNext)) {
                  if (!haveCur) {
                    val r = rows.next()
                    uid = r.getLong(0); bal = math.max(0L, r.getLong(1))
                    mx = bal; haveCur = true
                  } else if (rows.hasNext) {
                    val r = rows.next()
                    if (r.getLong(0) == uid) {
                      bal = math.max(0L, bal + r.getLong(1))
                      if (bal > mx) mx = bal
                    } else {
                      out = ClampedBalance(uid, bal, mx)
                      uid = r.getLong(0); bal = math.max(0L, r.getLong(1))
                      mx = bal
                    }
                  } else {
                    out = ClampedBalance(uid, bal, mx); haveCur = false
                  }
                }
              def hasNext: Boolean = { if (out == null) advance(); out != null }
              def next(): ClampedBalance = {
                if (!hasNext) throw new NoSuchElementException
                val o = out; out = null; o
              }
            }
          }
          .toDF("user_id", "final_balance", "max_balance")
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (
                SELECT user_id,
                       array_agg(CASE WHEN event_type IN ('click','view')
                                      THEN CAST(round(value*100) AS BIGINT)
                                      ELSE -CAST(round(value*100) AS BIGINT) END
                                 ORDER BY ts, event_id) AS ds
                FROM events GROUP BY user_id),
              f AS (
                SELECT user_id,
                       list_reduce(list_prepend([0::BIGINT, 0::BIGINT],
                                     list_transform(ds, x -> [x])),
                         (a, x) -> [greatest(0, a[1] + x[1]),
                                    greatest(a[2], greatest(0, a[1] + x[1]))]) AS st
                FROM d)
              SELECT user_id, CAST(st[1] AS BIGINT) AS final_balance,
                     CAST(st[2] AS BIGINT) AS max_balance
              FROM f ORDER BY user_id""")),

    // Time-decay MULTI-touch attribution — the sibling of last-touch
    // q_attribution: every click in the purchase's 3-day lookback gets
    // weight 2^-age_days, normalized per purchase. Weights are DYADIC
    // (1, 1/2, 1/4, 1/8 via a lookup array, not libm pow), so the
    // per-purchase weight sum is exact in double REGARDLESS of
    // aggregation order and the one normalization division is
    // bit-identical cross-engine; age_days is exact integer division of
    // the microsecond difference. Plan: one user-keyed equi-join with
    // the range as residual (the q_range_join shape), one
    // purchase-keyed window for the normalizer.
    Q("q_attribution_decay",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("c_ts"))
        val w = Window.partitionBy(col("purchase_id"))
        purchases.join(clicks, Seq("user_id"))
          .filter(col("c_ts") < col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 3 DAYS"))
          .withColumn("age_days",
            expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 86400000000"))
          .withColumn("wt", element_at(
            array(lit(1.0), lit(0.5), lit(0.25), lit(0.125)),
            (col("age_days") + 1).cast(IntegerType)))
          .withColumn("credit", col("wt") / sum(col("wt")).over(w))
          .select(col("purchase_id"), col("click_id"),
            col("age_days"), col("credit"))
          .orderBy(col("purchase_id"), col("click_id"))
      },
      Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts
                         FROM events WHERE event_type = 'purchase'),
                   c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
                         FROM events WHERE event_type = 'click'),
                   j AS (SELECT purchase_id, click_id,
                                (epoch_us(p_ts) - epoch_us(c_ts)) // 86400000000 AS age_days
                         FROM p JOIN c USING (user_id)
                         WHERE c_ts < p_ts AND c_ts >= p_ts - INTERVAL 3 DAY),
                   wts AS (SELECT purchase_id, click_id, age_days,
                                  ([1.0, 0.5, 0.25, 0.125])[CAST(age_days + 1 AS INT)] AS wt
                           FROM j)
              SELECT purchase_id, click_id, CAST(age_days AS BIGINT) AS age_days,
                     wt / SUM(wt) OVER (PARTITION BY purchase_id) AS credit
              FROM wts ORDER BY purchase_id, click_id""")),

    Q("q_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          .withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")), true).over(w))
          .withColumn("click_ts",
            last(when(col("event_type") === "click", col("ts")), true).over(w))
          .filter(col("event_type") === "purchase" && col("click_ts").isNotNull &&
            col("ts") <= col("click_ts") + expr("INTERVAL 3 DAYS"))
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"), col("click_id"), col("click_ts"))
          .orderBy(col("purchase_id"))
      },
      Some("""WITH tagged AS (
                SELECT event_id, user_id, ts, event_type,
                       last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
                       last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
                FROM events)
              SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
                     click_id, click_ts
              FROM tagged
              WHERE event_type = 'purchase' AND click_ts IS NOT NULL
                AND ts <= click_ts + INTERVAL 3 DAY
              ORDER BY purchase_id""")),

    // Deterministic A/B experiment readout: md5-bucket assignment (the
    // replay-stable convention of the sampling family — assignment never
    // depends on row order or a seed), per-variant reach and conversion
    // counts folded in ONE aggregation pass, rates and lift derived as
    // single double divisions of exact longs (bitwise cross-engine). The
    // final pivot runs on 2 rows; all heavy lifting is the one
    // partial-aggregated pass over the facts.
    Q("q_ab_lift",
      (s, dir) => {
        val per = t(s, dir, "events")
          .withColumn("variant",
            when(substring(md5(col("user_id").cast(StringType)), 1, 1) <= "7", "A")
              .otherwise("B"))
          .groupBy(col("variant"))
          .agg(countDistinct(col("user_id")).as("users"),
            count(when(col("event_type") === "purchase", 1)).as("convs"))
          .withColumn("rate", col("convs").cast(DoubleType) / col("users"))
        per.agg(
            max(when(col("variant") === "A", col("users"))).as("users_a"),
            max(when(col("variant") === "B", col("users"))).as("users_b"),
            max(when(col("variant") === "A", col("convs"))).as("convs_a"),
            max(when(col("variant") === "B", col("convs"))).as("convs_b"),
            max(when(col("variant") === "A", col("rate"))).as("rate_a"),
            max(when(col("variant") === "B", col("rate"))).as("rate_b"))
          .withColumn("lift", col("rate_b") / col("rate_a"))
      },
      Some("""WITH v AS (
                SELECT user_id, event_type,
                       CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
                            THEN 'A' ELSE 'B' END AS variant
                FROM events),
              per AS (
                SELECT variant, COUNT(DISTINCT user_id) AS users,
                       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS convs
                FROM v GROUP BY 1),
              p2 AS (SELECT variant, users, convs,
                            CAST(convs AS DOUBLE) / users AS rate FROM per)
              SELECT MAX(CASE WHEN variant = 'A' THEN users END) AS users_a,
                     MAX(CASE WHEN variant = 'B' THEN users END) AS users_b,
                     MAX(CASE WHEN variant = 'A' THEN convs END) AS convs_a,
                     MAX(CASE WHEN variant = 'B' THEN convs END) AS convs_b,
                     MAX(CASE WHEN variant = 'A' THEN rate END) AS rate_a,
                     MAX(CASE WHEN variant = 'B' THEN rate END) AS rate_b,
                     MAX(CASE WHEN variant = 'B' THEN rate END)
                       / MAX(CASE WHEN variant = 'A' THEN rate END) AS lift
              FROM p2""")),

    // Incremental COUNT DISTINCT maintenance with DELETES — the refcount
    // algebra: the stored view keeps (key, user, refcount); inserts add,
    // retractions SUBTRACT, and a user leaves the distinct set only when
    // its refcount reaches zero (a plain distinct-set view cannot process
    // a delete at all — it does not know whether other references
    // remain). Here events whose md5 bucket is '0' are retracted after
    // the fact; the maintained counts must equal a from-scratch distinct
    // over the surviving events — users whose every reference was
    // retracted drop out, users with other references survive, which is
    // exactly what the oracle checks. Completes the IVM family:
    // q_rollup_incremental (SUM), q_join_incremental (JOIN), this
    // (DISTINCT). At scale the retraction batch is delta-sized and the
    // merge is a keyed upsert into the refcount store, never a rescan.
    Q("q_distinct_incremental",
      (s, dir) => {
        val k = t(s, dir, "events").select(col("event_type"), col("user_id"),
          substring(md5(col("event_id").cast(StringType)), 1, 1).as("h"))
        val refcounts = k.groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        val retractions = k.filter(col("h") === "0")
          .groupBy(col("event_type"), col("user_id"))
          .agg((-count(lit(1))).as("c"))
        refcounts.unionAll(retractions)
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("c")).as("c"))
          .filter(col("c") > 0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"), sum(col("c")).cast(LongType).as("n_refs"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
                     COUNT(DISTINCT user_id) AS n_users,
                     COUNT(*) AS n_refs
              FROM events
              WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) <> '0'
              GROUP BY event_type ORDER BY event_type""")),

    // K-core decomposition (k=8) of the hour-grain co-occurrence graph —
    // the graph-curation filter that keeps only nodes embedded in a
    // dense neighborhood (spam/bot rings and isolated users peel away;
    // the standard subgraph selection before community analysis).
    // Iterative PEEL: drop nodes with degree < k, delete their incident
    // edges, repeat to fixpoint. The loop runs in the DRIVER but touches
    // only counts — each round is one distributed degree-filter + two
    // semi-joins, the new edge set is persisted and the old freed, and
    // convergence is the round's edge count (already on the driver for
    // free). Rounds are O(peel depth), typically << 10; no per-row data
    // ever leaves the cluster — same regime discipline as the
    // star-contraction CC. Fixpoint iteration is not SQL-expressible
    // (recursive CTEs cannot aggregate over the recursive term), so the
    // contract is KCoreSpec's brute-force reference peel, not a DuckDB
    // oracle.
    // Oracled via a DuckDB recursive-CTE mirror of the SIMULTANEOUS peel
    // (each level recomputes degrees on the previous level's edge set and
    // drops every node under K at once — exactly kcorePeel's round). The
    // recursion is guarded by EXISTS(degree < K) so it terminates at the
    // fixed point; the outer `keep`/`core` step applies ONE more peel
    // application to the max-iter level, which is the identity when the
    // recursion ended stable and yields the correct empty set when the
    // last round would have removed everything (cascade collapse) — both
    // regimes validated against a brute-force peel (K=8 stable, K=86
    // three live rounds, K=87/100 collapse-to-empty at sf0.01).
    Q("q_kcore",
      (s, dir) => {
        val (ed, _) = kcorePeel(s, dir, 8)
        val out = ed.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("core_degree"))
          .orderBy(col("node"))
          .localCheckpoint()
        ed.unpersist()
        out
      },
      Some("""WITH RECURSIVE ev AS (
                SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
                FROM events),
              e2 AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
                     FROM ev a JOIN ev b
                       ON a.event_type = b.event_type AND a.h = b.h
                      AND a.user_id < b.user_id),
              edges AS (SELECT u AS src, v AS dst FROM e2
                        UNION ALL SELECT v, u FROM e2),
              peel(iter, src, dst) AS (
                SELECT 0, src, dst FROM edges
                UNION ALL
                SELECT p.iter + 1, p.src, p.dst FROM peel p
                WHERE p.src IN (SELECT src FROM peel GROUP BY src HAVING count(*) >= 8)
                  AND p.dst IN (SELECT src FROM peel GROUP BY src HAVING count(*) >= 8)
                  AND EXISTS (SELECT 1 FROM peel GROUP BY src HAVING count(*) < 8)
              ),
              last AS (SELECT src, dst FROM peel
                       WHERE iter = (SELECT max(iter) FROM peel)),
              keep AS (SELECT src AS node FROM last
                       GROUP BY src HAVING count(*) >= 8),
              core AS (SELECT l.src FROM last l
                       WHERE l.src IN (SELECT node FROM keep)
                         AND l.dst IN (SELECT node FROM keep))
              SELECT src AS node, count(*) AS core_degree
              FROM core GROUP BY src ORDER BY node""")),

    // Longest consecutive-day activity streak per user — the
    // gaps-and-islands pattern on the CALENDAR axis (q_sessionize is the
    // same pattern on the time-gap axis): distinct active days collapse
    // to islands via the dd − row_number() trick, islands aggregate to
    // run lengths, users take their max. Integer day arithmetic end to
    // end. Plan: one distinct shuffle on (user, day), one user-keyed
    // window, two small aggregates — O(active-days) intermediate, never
    // O(events).
    Q("q_streaks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("dd"))
        val days = t(s, dir, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("dd"))
          .distinct()
        days
          .withColumn("grp", col("dd") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
            sum(col("len")).as("n_active_days"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (
                SELECT DISTINCT user_id,
                       datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd
                FROM events),
              isl AS (
                SELECT user_id, dd,
                       dd - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dd) AS grp
                FROM days),
              runs AS (
                SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp)
              SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
                     CAST(sum(len) AS BIGINT) AS n_active_days
              FROM runs GROUP BY user_id ORDER BY user_id""")),

    // Daily new-vs-returning user split — the growth-accounting readout
    // next to q_retention: each user's first-seen day marks them "new"
    // exactly once; every later active day counts them returning. Two
    // user-keyed aggregates co-partitioned on user_id (first-day and
    // distinct active days shuffle together), then one day-grained
    // rollup — intermediates are O(users + user-days), never O(events).
    Q("q_new_vs_returning",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val firstDay = ev.groupBy(col("user_id"))
          .agg(date_trunc("day", min(col("ts"))).as("first_day"))
        val active = ev
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .distinct()
        active.join(firstDay, Seq("user_id"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("active_users"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("new_users"))
          .withColumn("returning_users",
            col("active_users") - col("new_users"))
          .orderBy(col("day"))
      },
      Some("""WITH f AS (SELECT user_id,
                     CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_day
              FROM events GROUP BY 1),
              act AS (SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
              FROM events)
              SELECT act.day, count(*) AS active_users,
                     CAST(sum(CASE WHEN act.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
                     CAST(count(*) - sum(CASE WHEN act.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
              FROM act JOIN f USING (user_id)
              GROUP BY act.day ORDER BY act.day"""))
  )

  /** The PageRank iteration pipeline, PRE-checkpoint — factored out of
    * q_pagerank so EngineMetricsSpec can profile the runtime plan of the
    * iterations themselves (the Q's localCheckpoint would otherwise hide
    * them behind an RDD scan). Returns the ranks DataFrame plus the
    * persisted relations the caller must unpersist after consuming it.
    * Cost model being pinned: the 3 iterations re-read the PERSISTED edge
    * list (InMemoryTableScan), never the events file — at 100 TB the
    * difference between an iteration costing |edges| cached and costing a
    * corpus re-scan per iteration.
    */
  private[graft] def pagerankRanks(s: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    val SCALE = 1000000000000L
    val ev = t(s, dir, "events")
      .select(col("event_type"), date_trunc("minute", col("ts")).as("h"),
        col("user_id"))
      .distinct()
    val e2 = ev.as("a").join(ev.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
    val ed = e2.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e2.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("d")).persist()
    val n = deg.count()
    if (n == 0L) { // empty graph (possible at tiny SFs): empty ranks
      ed.unpersist(); deg.unpersist()
      (deg.selectExpr("src AS node", "d AS pr"), Seq.empty)
    } else {
      val base = 15L * SCALE / (100L * n)
      var pr = deg.select(col("src").as("node"), col("d"),
        lit(SCALE / n).as("pr"))
      (1 to 3).foreach { _ =>
        val share = pr.selectExpr("node", "pr div d AS share")
        val incoming = ed.join(share, ed("src") === share("node"))
          .groupBy(col("dst")).agg(sum(col("share")).as("s"))
        pr = pr.select(col("node"), col("d"))
          .join(incoming, pr("node") === incoming("dst"), "left")
          .selectExpr("node", "d",
            s"$base + (85 * coalesce(s, 0L)) div 100 AS pr")
      }
      (pr.select(col("node"), col("pr"))
        .orderBy(col("pr").desc, col("node")), Seq(ed, deg))
    }
  }

  /** The k-core peel loop — factored out of q_kcore so EngineMetricsSpec
    * can pin its cost model: each round's surviving edge count (returned
    * per round) must shrink monotonically, which IS the "round N+1 scans
    * fewer rows than round N" guarantee — every round's degree-filter and
    * semi-joins read only the previous round's persisted survivor set
    * (persist-swap-unpersist), so round cost is proportional to the
    * returned counts, O(peel-depth) rounds total, and only these counts
    * ever cross the driver boundary. Returns the final (still-persisted)
    * edge set — caller unpersists — plus the edge count before each round.
    */
  private[graft] def kcorePeel(s: SparkSession, dir: String, K: Int)
      : (DataFrame, Seq[Long]) = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("user_id"))
      .distinct()
    val e2 = ev.as("a").join(ev.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
    var ed = e2.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e2.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    var n = ed.count()
    val rounds = scala.collection.mutable.ArrayBuffer(n)
    var done = n == 0L
    while (!done) {
      val keep = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= K).select(col("src").as("node"))
      val pruned = ed
        .join(keep, ed("src") === keep("node"), "left_semi")
        .join(keep, ed("dst") === keep("node"), "left_semi")
        .persist()
      val m = pruned.count()
      if (m == n) { pruned.unpersist(); done = true }
      else { ed.unpersist(); ed = pruned; n = m; rounds += m; done = m == 0L }
    }
    (ed, rounds.toSeq)
  }
}
