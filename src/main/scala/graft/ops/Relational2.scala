package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Second batch of relational surface: outer joins, SQL entry point with
  * GROUPING SETS, window navigation functions, scalar math, UNION ALL.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Seq[Q] = Seq(

    // FULL OUTER join of two aggregated sides with deliberate asymmetry
    // (value > 300 filters) — exercises null-producing joins + coalesce.
    Q("q_outer_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val a = e.filter(col("event_type") === "click" && col("value") > 300.0)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
        val b = e.filter(col("event_type") === "purchase" && col("value") > 300.0)
          .groupBy(col("user_id").as("user_id_b")).agg(count(lit(1)).as("n_purchases"))
        a.join(b, col("user_id") === col("user_id_b"), "full_outer")
          .select(
            coalesce(col("user_id"), col("user_id_b")).as("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT coalesce(a.user_id, b.user_id) AS user_id,
                     coalesce(a.n_clicks, 0) AS n_clicks,
                     coalesce(b.n_purchases, 0) AS n_purchases
              FROM (SELECT user_id, COUNT(*) AS n_clicks FROM events
                    WHERE event_type = 'click' AND value > 300.0 GROUP BY user_id) a
              FULL OUTER JOIN
                   (SELECT user_id, COUNT(*) AS n_purchases FROM events
                    WHERE event_type = 'purchase' AND value > 300.0 GROUP BY user_id) b
                ON a.user_id = b.user_id
              ORDER BY user_id""")),

    // LEFT outer join: every customer kept; non-matching side nulls
    // aggregate away (count skips nulls, sum coalesced to 0).
    Q("q_left_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("big_total"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big,
                     COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS big_total
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_totalprice > 450000.0
              GROUP BY c_custkey ORDER BY c_custkey""")),

    // SQL entry point: the engine's spark.sql path with GROUPING SETS
    // (SURVEY.md §3.3 — the declared Athena-style consumption).
    Q("q_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                        grouping_id(l_returnflag, l_linestatus) AS gid
                 FROM lineitem_v
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                 ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     GROUPING_ID(l_returnflag, l_linestatus) AS gid
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Window navigation: rank/dense_rank over a tied key (order year),
    // lead over a fully tie-broken order.
    Q("q_rank_nav",
      (s, dir) => {
        val wTied = Window.partitionBy(col("o_custkey"))
          .orderBy(year(col("o_orderdate")))
        val wUnique = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            rank().over(wTied).cast(LongType).as("yr_rank"),
            dense_rank().over(wTied).cast(LongType).as("yr_dense_rank"),
            lead(col("o_orderkey"), 1).over(wUnique).as("next_order"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS yr_rank,
                     dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS yr_dense_rank,
                     lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
              FROM orders ORDER BY o_orderkey""")),

    // Scalar math surface: derives the reference's precomputed change /
    // percent-change fields (producer_stock_quotes.py:104-105) and more.
    // round() happens in DECIMAL: 2dec x 2dec products land exactly on
    // .xx50 half-boundaries, where double-based rounding diverges between
    // engines (Spark rounds the double's exact decimal expansion, DuckDB
    // doesn't); in decimal both round half-away-from-zero identically.
    Q("q_math_scalar",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(dec2(col("l_extendedprice")) * dec2(col("l_discount")), 2)
              .cast(DoubleType).as("disc_amount"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            pow(col("l_quantity"), 2.0).as("qty_sq"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            when(col("l_quantity") >= 40, "H").when(col("l_quantity") >= 15, "M")
              .otherwise("L").as("qty_bucket"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                     CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS disc_amount,
                     sqrt(l_quantity) AS qty_sqrt,
                     pow(l_quantity, 2.0) AS qty_sq,
                     abs(l_discount - 0.05) AS disc_dev,
                     CASE WHEN l_quantity >= 40 THEN 'H'
                          WHEN l_quantity >= 15 THEN 'M' ELSE 'L' END AS qty_bucket
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Typed-Aggregator top-k (UDAF surface): same result contract as the
    // window-based q_topk_per_group, but with O(k) partial-aggregation
    // state per group (map-side combine) instead of a per-partition sort —
    // the shape that wins when groups are huge and k is small.
    Q("q_topk_aggregator",
      (s, dir) => {
        import s.implicits._
        val topk = new graft.functions.TopKAggregator(3)
        t(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3))
          .agg(topk.toColumn.name("topk"))
          .toDF("p_brand", "topk")
          .select(col("p_brand"), posexplode(col("topk")))
          .select(col("p_brand"), (col("pos") + 1).cast(LongType).as("rk"),
            col("col._2").as("p_partkey"), col("col._1").as("p_retailprice"))
          .orderBy(col("p_brand"), col("rk"))
      },
      Some("""SELECT p_brand, rk, p_partkey, p_retailprice
              FROM (SELECT p_brand, p_partkey, p_retailprice,
                           row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
                    FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""")),

    // HAVING: post-aggregation predicate (kept out of the scan pushdown,
    // applied on the aggregated rows).
    Q("q_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
          .filter(col("n_orders") >= 12)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
              ORDER BY o_custkey""")),

    // ntile: equal-frequency bucketing per partition.
    Q("q_ntile",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
                     ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
              FROM orders ORDER BY o_orderkey""")),

    // Unpivot (melt): wide measure columns -> long (measure, val) rows —
    // the inverse of q_pivot, a pure narrow transform (no shuffle).
    Q("q_unpivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
            "measure", "val")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure")),
      Some("""SELECT l_orderkey, l_linenumber, measure, val FROM (
                SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
                UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
                UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
                UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
              ORDER BY l_orderkey, l_linenumber, measure""")),

    // Per-row edit distance — the classic fuzzy-string primitive both
    // engines implement natively.
    Q("q_edit_distance",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            levenshtein(col("p_name"), lit("forest green")).cast(LongType).as("dist"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, levenshtein(p_name, 'forest green') AS dist
              FROM part ORDER BY p_partkey""")),

    // Array set algebra over each document's first/second word halves —
    // sorted and joined to strings: the driver's oracle compare sorts
    // result columns with pandas, which cannot hash array cells, so
    // oracled queries must emit scalar columns (the array ops themselves
    // are still what's under test).
    Q("q_array_fns",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("a", expr("slice(ws, 1, int(size(ws) / 2))"))
          .withColumn("b", expr("slice(ws, int(size(ws) / 2) + 1, size(ws))"))
          .select(col("doc_id"),
            array_join(array_sort(array_intersect(col("a"), col("b"))), " ").as("inter"),
            array_join(array_sort(array_union(col("a"), col("b"))), " ").as("uni"),
            array_join(array_sort(array_except(col("a"), col("b"))), " ").as("exc"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     coalesce(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ' '), '') AS inter,
                     coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ' '), '') AS uni,
                     coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ' '), '') AS exc
              FROM (SELECT doc_id,
                           ws[1 : len(ws) // 2] AS a,
                           ws[len(ws) // 2 + 1 : len(ws)] AS b
                    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
              ORDER BY doc_id""")),

    // Distribution window functions: percent_rank / cume_dist / nth_value
    // — one shuffle on the partition key, same single-Window plan as the
    // ranking family.
    Q("q_window_distribution",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cdist"),
            nth_value(col("o_orderkey"), 2).over(wf).as("second_key"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
                     percent_rank() OVER w AS pct_rank,
                     cume_dist() OVER w AS cdist,
                     nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
              FROM orders
              WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")),

    // Pure theta join (no equi key): plans as BroadcastNestedLoopJoin —
    // correct for small x small; anything larger should carry an equi key
    // (q_range_join) or be banded first.
    Q("q_theta_join",
      (s, dir) => {
        val a = t(s, dir, "supplier")
          .select(col("s_suppkey").as("a_key"), col("s_acctbal").as("a_bal"))
        val b = t(s, dir, "supplier")
          .select(col("s_suppkey").as("b_key"), col("s_acctbal").as("b_bal"))
        a.join(b, col("a_bal") < col("b_bal"))
          .groupBy(col("a_key"))
          .agg(count(lit(1)).as("n_richer"))
          .orderBy(col("a_key"))
      },
      Some("""SELECT a.s_suppkey AS a_key, COUNT(*) AS n_richer
              FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
              GROUP BY a.s_suppkey ORDER BY a_key""")),

    // Variance/stddev computed from decimal-exact sums (sum, sum of
    // squares) so the result is order-independent on both engines — the
    // builtin stddev's streaming update is accumulation-order-dependent
    // and can't hash-match across engines.
    Q("q_stats_agg",
      (s, dir) => {
        val v = dec2(col("l_quantity"))
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(v).cast(DoubleType).as("s"),
            sum(v * v).cast(DoubleType).as("ss"))
          .select(col("l_returnflag"), col("n"),
            (col("s") / col("n")).as("mean"),
            ((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("variance"),
            sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("stddev"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, n, s / n AS mean,
                     (ss - s * s / n) / (n - 1) AS variance,
                     sqrt((ss - s * s / n) / (n - 1)) AS stddev
              FROM (SELECT l_returnflag, COUNT(*) AS n,
                           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
                           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ss
                    FROM lineitem GROUP BY l_returnflag)
              ORDER BY l_returnflag""")),

    // Scalar subquery through the SQL entry point: orders above the global
    // mean price (mean computed decimal-exact for cross-engine equality).
    Q("q_scalar_subquery",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders_v
                 WHERE o_totalprice > 1.5 * (
                   SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM orders_v)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > 1.5 * (
                SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                FROM orders)
              ORDER BY o_orderkey""")),

    // Generator (UDTF surface): explode tokens, global top-20 by count.
    Q("q_explode_tokens",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some("""SELECT token, COUNT(*) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
              GROUP BY token ORDER BY n DESC, token LIMIT 20""")),

    // Map column type: props parsed as map<string,bigint>, key lookup.
    // try_element_at, not element_at: under ANSI mode a row whose props
    // lacks "k" must become null and drop in the filter (what the
    // json_extract oracle does), not throw MAP_KEY_DOES_NOT_EXIST.
    Q("q_map_access",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            try_element_at(from_json(col("props"), MapType(StringType, LongType)), lit("k")).as("k"))
          .filter(col("k") >= 90)
          .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
              ORDER BY event_id""")),

    // Approximate percentiles (GK sketch) — the 100 TB path where the
    // exact sort-based percentile is unaffordable. Oracled by the
    // exact-by-construction-domain trick: values quantize to 5-wide
    // buckets, so each distinct value spans thousands of ranks while the
    // sketch's rank error is <= n/accuracy (= n/10000) ranks — the
    // returned data point is therefore the same value PERCENTILE_DISC
    // picks (verified to hold at sf0.001/0.01/0.1; at sf0.1 even 2-wide
    // buckets flip, so 5 is not near the edge). percentile_approx always
    // returns an ACTUAL data value, which is what makes the cross-engine
    // compare exact — no interpolation arithmetic to drift. The
    // raw-domain production shape stays pinned by DedupSpec's 2%-error
    // bound.
    Q("q_approx_percentile",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("qv", (floor(col("value") / 5) * 5).cast(DoubleType))
          .groupBy(col("event_type"))
          .agg(percentile_approx(col("qv"), lit(0.5), lit(10000)).as("p50_approx"),
            percentile_approx(col("qv"), lit(0.9), lit(10000)).as("p90_approx"))
          .orderBy(col("event_type")),
      Some("""WITH q AS (SELECT event_type,
                                CAST(floor(value / 5) * 5 AS DOUBLE) AS qv
                         FROM events)
              SELECT event_type,
                     quantile_disc(qv, 0.5) AS p50_approx,
                     quantile_disc(qv, 0.9) AS p90_approx
              FROM q GROUP BY event_type ORDER BY event_type""")),

    // Exact percentiles (median / p90) per group — linear interpolation on
    // the sorted values in both engines.
    Q("q_percentile",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.9)").as("p90"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, quantile_cont(value, 0.5) AS p50,
                     quantile_cont(value, 0.9) AS p90, COUNT(*) AS n
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // UNION ALL (duplicate-preserving), then aggregate.
    Q("q_union_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        val a = e.filter(col("event_type") === "error").select(col("user_id"))
        val b = e.filter(col("event_type") === "signup").select(col("user_id"))
        a.unionByName(b).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_rows FROM (
                SELECT user_id FROM events WHERE event_type = 'error'
                UNION ALL
                SELECT user_id FROM events WHERE event_type = 'signup')
              GROUP BY user_id ORDER BY user_id""")),

    // RIGHT OUTER join (the left form's mirror — kept distinct because
    // plan-side build/stream roles flip): all customers, their order
    // counts, null-padded where a customer never ordered.
    Q("q_right_join",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, coalesce(n_orders, 0) AS n_orders
              FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
              RIGHT JOIN customer ON o_custkey = c_custkey
              ORDER BY c_custkey""")),

    // Conditional aggregation: FILTER-ed aggregates + CASE-sum in one
    // grouped pass — the pivot-without-pivot idiom (one scan, no joins).
    Q("q_conditional_agg",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === "click", 1)).as("n_clicks"),
            count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
            sum(when(col("event_type") === "purchase", dec2(col("value")))
              .otherwise(lit(0).cast(D2))).cast(DoubleType).as("purchase_total"))
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
                     count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
                     count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                                   THEN CAST(value AS DECIMAL(18,2))
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_total
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys MATCH
    // each other instead of dropping — the grouping-compatible join
    // semantics. Null keys are derived (users divisible by 7 anonymize to
    // null) so both engines join real null groups.
    Q("q_null_safe_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val keyed = e.select(
          when(col("user_id") % 7 === 0, lit(null)).otherwise(col("user_id") % 100)
            .as("bucket"),
          col("value"))
        val dims = keyed.groupBy(col("bucket").as("b"))
          .agg(count(lit(1)).as("bucket_n"))
        keyed.join(dims, col("bucket") <=> col("b"))
          .groupBy(col("bucket"), col("bucket_n"))
          .agg(dsum(col("value")).as("total"))
          .select(col("bucket"), col("bucket_n"), col("total"))
          .orderBy(col("bucket").asc_nulls_first)
      },
      Some("""WITH keyed AS (SELECT CASE WHEN user_id % 7 = 0 THEN NULL
                                         ELSE user_id % 100 END AS bucket, value
                             FROM events),
                   dims AS (SELECT bucket AS b, count(*) AS bucket_n
                            FROM keyed GROUP BY 1)
              SELECT bucket, bucket_n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM keyed JOIN dims ON bucket IS NOT DISTINCT FROM b
              GROUP BY bucket, bucket_n
              ORDER BY bucket NULLS FIRST""")),

    // Higher-order array functions on the gate: transform / filter /
    // aggregate (fold) over each doc's token array. Note the engine
    // PERFORMANCE stance: HOF lambdas evaluate interpreted, so hot paths
    // (shingling, dot products) use custom codegen expressions instead —
    // this query pins the HOF surface itself.
    Q("q_hof_fns",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .select(col("doc_id"),
            size(expr("filter(ws, x -> x != '')")).cast(LongType).as("n_words"),
            expr("aggregate(ws, 0, (acc, x) -> acc + length(x))")
              .cast(LongType).as("total_chars"),
            expr("array_max(transform(ws, x -> length(x)))")
              .cast(LongType).as("max_word_len"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     CAST(len(list_filter(ws, x -> x <> '')) AS BIGINT) AS n_words,
                     CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS total_chars,
                     CAST(list_max(list_transform(ws, x -> length(x))) AS BIGINT) AS max_word_len
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
              ORDER BY doc_id""")),

    // Discrete percentile (completes the family: exact-interpolated
    // q_percentile, sketch q_approx_percentile, and here the
    // actual-data-point quantile) — PERCENTILE_DISC picks the smallest
    // value whose cumulative fraction reaches p, so results are real rows
    // and exactly comparable across engines with no interpolation math.
    Q("q_percentile_disc",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_v")
        s.sql("""SELECT event_type,
                        PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS p50,
                        PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value) AS p90,
                        count(*) AS n
                 FROM events_v GROUP BY event_type ORDER BY event_type""")
      },
      Some("""SELECT event_type,
                     quantile_disc(value, 0.5) AS p50,
                     quantile_disc(value, 0.9) AS p90,
                     count(*) AS n
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Bitwise aggregates — the primitive behind compact set signatures
    // (the CC convergence check xors row hashes the same way).
    Q("q_bitwise_agg",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(expr("bit_or(event_id)").as("ids_or"),
            expr("bit_and(event_id)").as("ids_and"),
            expr("bit_xor(event_id)").as("ids_xor"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, bit_or(event_id) AS ids_or,
                     bit_and(event_id) AS ids_and, bit_xor(event_id) AS ids_xor
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // ANSI-safe arithmetic surface: try_divide returns null on /0 instead
    // of raising (this session runs ANSI mode) — DuckDB mirrors with
    // divide-by-nullif. Null-diff rows prove the null path is exercised.
    Q("q_safe_divide",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            try_divide(col("l_extendedprice"),
              round(col("l_discount") * 10).cast(LongType)).as("price_per_tick"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice / nullif(CAST(round(l_discount * 10) AS BIGINT), 0) AS price_per_tick
              FROM lineitem ORDER BY l_orderkey, l_linenumber"""))
  )
}
