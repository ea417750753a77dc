package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** The relational operator surface of SURVEY.md §2.2, expressed as pure
  * DataFrame programs. Each query is named after the SURVEY operator ids it
  * exercises and carries a DuckDB oracle. Design rules (SURVEY.md §7.3):
  * UTC session TZ, decimal-exact aggregation of doubles, explicit ORDER BY
  * with unique tie-breaks, identical column aliases on both sides.
  *
  * Scale notes are inline per query: which side broadcasts, where the
  * shuffle lands, and why the plan survives 100 TB.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Seq[Q] = Seq(

    // F1 + P1/P2: null-safe validation filter, projection + rename.
    // Predicates and the 4-column projection push into the parquet scan
    // (PushedFilters / ReadSchema) — at 100 TB only matching row groups and
    // 4 columns are read. (ref: producer_stock_quotes.py:65-70,83-111)
    Q("q_filter_project",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase") &&
            col("value").isNotNull && col("value") > 100.0)
          .select(col("event_id").as("id"), col("user_id"),
            col("event_type").as("etype"), col("value"))
          .orderBy(col("id")),
      Some("""SELECT event_id AS id, user_id, event_type AS etype, value
              FROM events
              WHERE event_type IN ('click','purchase') AND value IS NOT NULL AND value > 100.0
              ORDER BY id""")),

    // T1: epoch <-> timestamp casts and truncation (ref:
    // producer_stock_quotes.py:90-96; W1 hour-prefix processor_stock_quotes.py:69).
    Q("q_time_cast",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            unix_timestamp(col("ts")).as("ts_unix"),
            date_trunc("hour", col("ts")).as("ts_hour"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix,
                     date_trunc('hour', ts) AS ts_hour,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
              FROM events ORDER BY event_id""")),

    // Grouped aggregation, TPC-H Q1 shape: partial (map-side) + final hash
    // aggregate; only the shuffled state is 6 groups x 5 aggregates, so the
    // shuffle is O(partitions), not O(rows) — scales to any fact size.
    Q("q1_agg",
      (s, dir) => {
        val one = lit(1).cast(D2)
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
              .cast(DoubleType).as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
                     COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '2000-12-01'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // Equi inner join chain: fact(orders) x dim(customer) x dim(nation).
    // Dims are broadcast (size << 10 MB even at sf=1000-equivalent for
    // nation), so the fact table never shuffles for the join; the only
    // shuffle is the 25-group aggregate.
    Q("q_join_revenue",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val n = t(s, dir, "nation").select("n_nationkey", "n_name")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM orders JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Broadcast-dim star join on the biggest fact: lineitem x supplier x
    // nation x region. All three dims broadcast; zero fact shuffles before
    // the final small aggregate.
    Q("q_join_star",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val n = t(s, dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
        val r = t(s, dir, "region").select("r_regionkey", "r_name")
        val one = lit(1).cast(D2)
        li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                            JOIN nation ON s_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // Left-semi join (EXISTS): customers having at least one big order.
    // Semi-join shuffles only the distinct keys of the probe side.
    Q("q_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
              ORDER BY c_custkey""")),

    // Left-anti join (NOT EXISTS): customers with no URGENT orders.
    Q("q_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
              ORDER BY c_custkey""")),

    // Equi join + range (theta) residual: parts matched to lineitems whose
    // quantity falls in a +/-2 band around p_size. Planner uses the equi key
    // for a hash join and evaluates the band as a residual predicate — no
    // nested-loop blowup at scale.
    Q("q_range_join",
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        val li = t(s, dir, "lineitem").select("l_partkey", "l_quantity")
        li.join(broadcast(p),
            li("l_partkey") === p("p_partkey") &&
              col("l_quantity").between(col("p_size") - 2, col("p_size") + 2))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_matches"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n_matches,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
                 AND l_quantity BETWEEN p_size - 2 AND p_size + 2
              GROUP BY p_brand ORDER BY p_brand""")),

    // Ranking window: latest event per user (row_number = 1). One shuffle on
    // user_id; state per partition is a single running row — scales linearly.
    Q("q_window_latest",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"), col("value").as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
              FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events) WHERE rn = 1 ORDER BY user_id""")),

    // Analytic window: per-user delta vs previous event (lag) — derives the
    // reference's precomputed `change` field (producer_stock_quotes.py:104).
    Q("q_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value,
                     value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
              FROM events ORDER BY event_id""")),

    // Frame window: 5-row moving average of order totals per customer.
    // Exact decimal sum / count inside the frame keeps both engines
    // bit-identical (no double accumulation order dependence).
    Q("q_window_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-4, 0)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            (sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType) /
              count(lit(1)).over(w)).as("moving_avg"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              ORDER BY o_orderkey""")),

    // Running (cumulative) sum per customer over order date.
    Q("q_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
              FROM orders ORDER BY o_orderkey""")),

    // Top-k per group: 3 priciest parts per brand. row_number bounds state;
    // no global sort of the fact table.
    Q("q_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("p_brand"), col("rk").cast(LongType).as("rk"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rk"))
      },
      Some("""SELECT p_brand, rk, p_partkey, p_retailprice
              FROM (SELECT p_brand, p_partkey, p_retailprice,
                           row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
                    FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""")),

    // ROLLUP hierarchy totals. grouping_id() disambiguates NULL-as-total vs
    // NULL-as-value and provides a deterministic sort key.
    Q("q_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
            grouping_id().as("gid"))
          .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     GROUPING_ID(o_orderstatus, o_orderpriority) AS gid
              FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // CUBE over lineitem flags.
    Q("q_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     GROUPING_ID(l_returnflag, l_linestatus) AS gid
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // DISTINCT (D1's relational cousin) — dedup via hash aggregate.
    Q("q_distinct",
      (s, dir) =>
        t(s, dir, "events").select(col("user_id"), col("event_type")).distinct()
          .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type""")),

    // COUNT(DISTINCT) per group — expands to a two-phase aggregate.
    Q("q_count_distinct",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Approximate distinct (HyperLogLog++) — the 100 TB-scale path where
    // exact distinct would shuffle every key. Oracled by the
    // exact-by-construction-domain trick (same as q_approx_topk): the
    // counted domain (user_id mod 32) is far below the sketch's
    // linear-counting regime's resolution at rsd=0.01 (2^14 registers),
    // where the estimate m*ln(m/V) rounds to the exact count — verified
    // to hold with zero register-collision drift at sf0.001/0.01/0.1 —
    // so DuckDB's exact COUNT(DISTINCT) hash-matches. The
    // unbounded-domain production shape (approx over raw user_id) stays
    // pinned by DedupSpec's 5%-error bound.
    Q("q_approx_distinct",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id") % 32, 0.01).as("approx_users"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id % 32) AS approx_users
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Set ops: users that clicked vs users that purchased.
    Q("q_union",
      (s, dir) => {
        val e = t(s, dir, "events")
        val a = e.filter(col("event_type") === "click").select(col("user_id"))
        val b = e.filter(col("event_type") === "purchase").select(col("user_id"))
        a.union(b).distinct().orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
              UNION
              SELECT user_id FROM events WHERE event_type = 'purchase'
              ORDER BY user_id""")),

    Q("q_intersect",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select(col("user_id"))
          .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
              INTERSECT
              SELECT user_id FROM events WHERE event_type = 'purchase'
              ORDER BY user_id""")),

    Q("q_except",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "error" && col("value") > 300.0).select(col("user_id"))
          .except(e.filter(col("event_type") === "signup" && col("value") > 300.0).select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'error' AND value > 300.0
              EXCEPT
              SELECT user_id FROM events WHERE event_type = 'signup' AND value > 300.0
              ORDER BY user_id""")),

    // Multiset (ALL) forms: bag semantics with per-row multiplicity —
    // planned as aggregate-on-counts, not row-by-row anti joins.
    Q("q_except_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select(col("user_id"))
          .exceptAll(e.filter(col("event_type") === "purchase").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
              EXCEPT ALL
              SELECT user_id FROM events WHERE event_type = 'purchase'
              ORDER BY user_id""")),

    Q("q_intersect_all",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select(col("user_id"))
          .intersectAll(e.filter(col("event_type") === "purchase").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM events WHERE event_type = 'click'
              INTERSECT ALL
              SELECT user_id FROM events WHERE event_type = 'purchase'
              ORDER BY user_id""")),

    // Global top-N: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    // per-partition top-N then a single-driver merge of N*partitions rows,
    // never a full global sort.
    Q("q_global_topn",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // JSON scalar functions (E1/E2 analogue): extract props.k, aggregate.
    Q("q_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, SUM(k)::BIGINT AS sum_k, MAX(k) AS max_k
              FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
              GROUP BY event_type ORDER BY event_type""")),

    // Date/time arithmetic (T1 family + news 2-day window analogue).
    Q("q_date_arith",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("yr"),
            month(col("o_orderdate")).cast(LongType).as("mo"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                     CAST(o_orderdate AS DATE) + 30 AS due_date
              FROM orders ORDER BY o_orderkey""")),

    // Pivot (conditional aggregation): per-user event counts by type.
    Q("q_pivot",
      (s, dir) => {
        val types = Seq("click", "view", "purchase", "error", "signup")
        val agg = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types).count()
        types.foldLeft(agg)((d, ty) =>
            d.withColumn(s"n_$ty", coalesce(col(ty), lit(0L))).drop(ty))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
                     COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
                     COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
                     COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                     COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
                     COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup
              FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
