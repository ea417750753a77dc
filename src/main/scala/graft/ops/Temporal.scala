package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Time-series operators over the events stream table: OHLC candles (the
  * canonical consumption of the reference's quotes lake, SURVEY.md §7.2),
  * as-of join, and interval join (SURVEY.md §2.2 "Joins").
  */
object Temporal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Daily OHLC candles per event_type — the flagship query (SparkEntry.entry).
    * Single shuffle on (day, type); open/close via min_by/max_by on a
    * (ts, event_id) struct key — the event_id tie-break makes the picked
    * value deterministic when timestamps tie within a group (plain
    * min_by(value, ts) is unspecified on ties, and so is the oracle's
    * arg_min) — so no per-group sort or collect.
    */
  def ohlcDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_trades"),
        dsum(col("value")).as("volume"))
      .orderBy(col("day"), col("event_type"))

  /** As-of join via the scalable union+window trick (SURVEY.md §2.2): for
    * each purchase, the latest click by the same user at or before it.
    * One shuffle on user_id, one per-key ordered pass carrying a single
    * "last click" value — no join explosion, state O(1) per key. This is
    * the plan shape that survives 100 TB (vs. a range join that would
    * produce every (purchase, earlier-click) pair before aggregation).
    */
  def asofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    AsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        rightValues = Seq("event_id", "value"), rightTieBreak = Some("event_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_event_id").as("last_click_id"),
        col("asof_value").as("last_click_value"))
      .orderBy(col("purchase_id"))
  }

  /** The same as-of semantics through the native
    * LogicalPlan/Strategy/Exec stack (plans.NativeAsOfJoin) — declared as
    * its own oracled query so the custom-operator path sits under the hard
    * correctness gate (executing AsOfJoinExec), not just under its spec.
    */
  def asofPurchaseClickNative(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    graft.plans.NativeAsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        rightValues = Seq("event_id", "value"), rightTieBreak = Some("event_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_event_id").as("last_click_id"),
        col("asof_value").as("last_click_value"))
      .orderBy(col("purchase_id"))
  }

  /** Interval join: (error, view) pairs for the same user where the view
    * happened within the 10 minutes before the error. Planner hash-joins on
    * the user_id equi-key and applies the time band as a residual — never a
    * cartesian product.
    */
  def intervalErrorView(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("err_ts"))
    val vw = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    err.join(vw,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("err_ts") - expr("INTERVAL 10 MINUTES") &&
          col("view_ts") <= col("err_ts"))
      .select(col("user_id"), col("error_id"), col("view_id"))
      .orderBy(col("user_id"), col("error_id"), col("view_id"))
  }

  /** Shared by q_asof_join (union+window plan) and q_asof_native
    * (AsOfJoinExec merge): both must match the same reachability closure.
    */
  private val asofOracleSql: String =
    """WITH e AS (SELECT event_id, user_id, ts, value,
              CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
       FROM events WHERE event_type IN ('click','purchase')),
       w AS (SELECT *,
              last_value(CASE WHEN kind = 0 THEN struct_pack(i := event_id, v := value) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
             FROM e)
       SELECT event_id AS purchase_id, user_id,
              lc.i AS last_click_id, lc.v AS last_click_value
       FROM w WHERE kind = 1 ORDER BY purchase_id"""

  private val asofToleranceOracleSql: String =
    """WITH e AS (SELECT event_id, user_id, ts, value,
              CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
       FROM events WHERE event_type IN ('click','purchase')),
       w AS (SELECT *,
              last_value(CASE WHEN kind = 0 THEN struct_pack(i := event_id, v := value, t := ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
             FROM e)
       SELECT event_id AS purchase_id, user_id,
              CASE WHEN ts - lc.t <= INTERVAL 2 DAY THEN lc.i END AS last_click_id,
              CASE WHEN ts - lc.t <= INTERVAL 2 DAY THEN lc.v END AS last_click_value
       FROM w WHERE kind = 1 ORDER BY purchase_id"""

  private def asofToleranceQuery(native: Boolean)(
      s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val tol = Some(2L * 86400L * 1000000L)
    val joined =
      if (native)
        graft.plans.NativeAsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightValues = Seq("event_id", "value"),
          rightTieBreak = Some("event_id"), toleranceMicros = tol)
      else
        AsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightValues = Seq("event_id", "value"),
          rightTieBreak = Some("event_id"), toleranceMicros = tol)
    joined
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_event_id").as("last_click_id"),
        col("asof_value").as("last_click_value"))
      .orderBy(col("purchase_id"))
  }

  private val asofForwardOracleSql: String =
    """WITH e AS (SELECT event_id, user_id, ts, value,
              CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
       FROM events WHERE event_type IN ('click','purchase')),
       w AS (SELECT *,
              first_value(CASE WHEN kind = 0 THEN struct_pack(i := event_id, v := value) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind DESC, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
             FROM e)
       SELECT event_id AS purchase_id, user_id,
              nc.i AS next_click_id, nc.v AS next_click_value
       FROM w WHERE kind = 1 ORDER BY purchase_id"""

  private val asofNearestOracleSql: String =
    """WITH e AS (SELECT event_id, user_id, ts, value,
              CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
       FROM events WHERE event_type IN ('click','purchase')),
       w AS (SELECT *,
              last_value(CASE WHEN kind = 0 THEN struct_pack(i := event_id, v := value, t := ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc,
              first_value(CASE WHEN kind = 0 THEN struct_pack(i := event_id, v := value, t := ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind DESC, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
             FROM e),
       c AS (SELECT *,
              CASE WHEN nc IS NULL THEN lc
                   WHEN lc IS NULL THEN nc
                   WHEN epoch_us(nc.t) - epoch_us(ts) < epoch_us(ts) - epoch_us(lc.t)
                     THEN nc ELSE lc END AS ch
             FROM w)
       SELECT event_id AS purchase_id, user_id,
              ch.i AS near_click_id, ch.v AS near_click_value
       FROM c WHERE kind = 1 ORDER BY purchase_id"""

  /** One builder for the forward/nearest directions on BOTH
    * implementations — the per-direction semantics live in ops.AsOfJoin /
    * plans.NativeAsOfJoin; this just wires the purchase/click shape.
    */
  private def asofDirectionQuery(native: Boolean, direction: String,
      idAlias: String, valAlias: String)(
      s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val joined =
      if (native)
        graft.plans.NativeAsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightValues = Seq("event_id", "value"),
          rightTieBreak = Some("event_id"), direction = direction)
      else
        AsOfJoin.join(purchases, clicks, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightValues = Seq("event_id", "value"),
          rightTieBreak = Some("event_id"), direction = direction)
    joined
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_event_id").as(idAlias), col("asof_value").as(valAlias))
      .orderBy(col("purchase_id"))
  }

  val queries: Seq[Q] = Seq(
    // Oracle: DuckDB's arg_min/arg_max take no composite key, so the
    // (ts, event_id)-deterministic open/close are expressed as first_value
    // windows (constant per group; MIN collapses them in the GROUP BY).
    Q("q_ohlc_daily", ohlcDaily,
      Some("""SELECT day, event_type, MIN(open) AS open, MAX(value) AS high,
                     MIN(value) AS low, MIN(close) AS close, COUNT(*) AS n_trades,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
              FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, value,
                           first_value(value) OVER (PARTITION BY date_trunc('day', ts), event_type
                                                    ORDER BY ts, event_id) AS open,
                           first_value(value) OVER (PARTITION BY date_trunc('day', ts), event_type
                                                    ORDER BY ts DESC, event_id DESC) AS close
                    FROM events)
              GROUP BY day, event_type ORDER BY day, event_type""")),

    Q("q_asof_join", asofPurchaseClick, Some(asofOracleSql)),

    // Identical contract, executed by the native AsOfJoinExec merge
    // operator — same oracle puts the custom plan stack on the hard gate.
    Q("q_asof_native", asofPurchaseClickNative, Some(asofOracleSql)),

    // direction="forward" (pandas merge_asof parity): the EARLIEST click
    // at or after each purchase — same single key-shuffle, the window
    // frame flips to [current, following) with lefts sorted first at
    // equal ts so an equal-ts click still matches; smallest event_id
    // breaks same-timestamp ties (mirrored in the oracle's ORDER BY).
    // direction="forward" (pandas merge_asof parity): the EARLIEST click
    // at or after each purchase — same single key-shuffle, the window
    // frame flips to [current, following) with lefts sorted first at
    // equal ts so an equal-ts click still matches; smallest event_id
    // breaks same-timestamp ties (mirrored in the oracle's ORDER BY).
    // Declared on BOTH implementations (union+window and the native
    // merge exec), sharing one oracle each — exactly like q_asof_join /
    // q_asof_native.
    Q("q_asof_forward", asofDirectionQuery(native = false, "forward",
      "next_click_id", "next_click_value"), Some(asofForwardOracleSql)),

    Q("q_asof_forward_native", asofDirectionQuery(native = true, "forward",
      "next_click_id", "next_click_value"), Some(asofForwardOracleSql)),

    // direction="nearest": the click closest in time on EITHER side,
    // equidistant ties resolving backward — the union+window form runs
    // both window passes on one key-shuffle (two in-partition sorts); the
    // native exec reads the nearest match off its single merge pass (the
    // backward carry and the forward head coexist in O(1) state).
    Q("q_asof_nearest", asofDirectionQuery(native = false, "nearest",
      "near_click_id", "near_click_value"), Some(asofNearestOracleSql)),

    Q("q_asof_nearest_native", asofDirectionQuery(native = true, "nearest",
      "near_click_id", "near_click_value"), Some(asofNearestOracleSql)),

    // Tolerance-bounded as-of (pandas merge_asof `tolerance`): a click
    // older than 2 days no longer explains the purchase — the carried
    // payload nulls out, the purchase row stays. Same single-shuffle
    // union+window plan; the bound is a per-row post-filter on the
    // carried right timestamp.
    Q("q_asof_tolerance",
      asofToleranceQuery(native = false),
      Some(asofToleranceOracleSql)),

    // The same bound executed by the native AsOfJoinExec (the merge pass
    // tracks the matched row's timestamp and drops stale carries) — same
    // oracle gates both implementations at feature parity.
    Q("q_asof_tolerance_native",
      asofToleranceQuery(native = true),
      Some(asofToleranceOracleSql)),

    // Sessionization: split each user's event stream into sessions at
    // >1-day silence gaps (batch analogue of session_window; the streaming
    // form lives in graft.streaming). Two windows over one shuffle on
    // user_id; state per key is a single lag value + running sum.
    // Session conversion funnel — the composite every product-analytics
    // stack runs: sessionize (same gap logic as q_sessionize), then per
    // session count clicks/purchases and test whether the first click
    // precedes the first purchase (min-ts of each type compared). Still
    // ONE shuffle on user_id: the session windows and the conditional
    // aggregates share the partition.
    Q("q_session_funnel",
      (s, dir) => {
        val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("gap", when(
            lag(col("ts"), 1).over(wo).isNull ||
              col("ts") - lag(col("ts"), 1).over(wo) > expr("INTERVAL 1 DAY"),
            1L).otherwise(0L))
          .withColumn("session_id", sum(col("gap")).over(
            wo.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(when(col("event_type") === "click", 1)).as("n_clicks"),
            count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
            min(when(col("event_type") === "click", col("ts"))).as("first_click"),
            min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
          .withColumn("converted",
            col("first_click").isNotNull && col("first_purchase").isNotNull &&
              col("first_click") <= col("first_purchase"))
          .filter(col("n_clicks") > 0 || col("n_purchases") > 0)
          .select(col("user_id"), col("session_id"), col("n_clicks"),
            col("n_purchases"), col("converted"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 1 DAY THEN 1 ELSE 0 END AS gap
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (
                SELECT user_id, ts, event_type,
                       (SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
                FROM g),
              agg AS (
                SELECT user_id, session_id,
                       count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
                       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
                       min(ts) FILTER (WHERE event_type = 'click') AS first_click,
                       min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
                FROM s GROUP BY user_id, session_id)
              SELECT user_id, session_id, n_clicks, n_purchases,
                     (first_click IS NOT NULL AND first_purchase IS NOT NULL
                      AND first_click <= first_purchase) AS converted
              FROM agg WHERE n_clicks > 0 OR n_purchases > 0
              ORDER BY user_id, session_id""")),

    Q("q_sessionize",
      (s, dir) => {
        val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        // exact interval comparison — unix_timestamp() floors to seconds,
        // which disagrees with the oracle's microsecond-exact ts - lag(ts)
        // on gaps within a second of the boundary
        t(s, dir, "events")
          .withColumn("gap", when(
            lag(col("ts"), 1).over(wo).isNull ||
              col("ts") - lag(col("ts"), 1).over(wo) > expr("INTERVAL 1 DAY"),
            1L).otherwise(0L))
          .withColumn("session_id", sum(col("gap")).over(
            wo.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 1 DAY THEN 1 ELSE 0 END AS gap
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (
                SELECT user_id, ts,
                       (SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
                FROM g)
              SELECT user_id, session_id, COUNT(*) AS n_events,
                     MIN(ts) AS session_start, MAX(ts) AS session_end
              FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    Q("q_interval_join", intervalErrorView,
      Some("""SELECT e.user_id AS user_id, e.event_id AS error_id, v.event_id AS view_id
              FROM events e JOIN events v
                ON e.user_id = v.user_id AND e.event_type = 'error' AND v.event_type = 'view'
               AND v.ts >= e.ts - INTERVAL 10 MINUTE AND v.ts <= e.ts
              ORDER BY user_id, error_id, view_id""")),

    // Linear interpolation fill over a sparse daily series (every-3rd-day
    // anchors synthesized from the dense events table — the fixture-
    // synthesis stance of q_url_parse): gap days get
    // prev + (next-prev) * frac via IGNORE-NULLS carry windows. Anchor
    // values are integer cents so every engine-crossing value before the
    // one mirrored double expression is exact. The un-partitioned carry
    // windows run over CALENDAR cardinality (O(days), like the
    // q_token_shards chunk prefix sum) — never over events; at 100 TB
    // the calendar is still tiny.
    Q("q_interpolate",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast(LongType)).as("cents"))
        val anch = daily
          .withColumn("dd", datediff(col("day"), lit("1970-01-01")))
          .filter(col("dd") % 3 === 0)
        val cal = anch.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(explode(sequence(col("mn"), col("mx"),
            expr("interval 1 day"))).as("day"))
        val wPrev = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wNext = Window.orderBy(col("day"))
          .rowsBetween(0, Window.unboundedFollowing)
        cal.join(anch.select(col("day"), col("cents")), Seq("day"), "left")
          .withColumn("dd", datediff(col("day"), lit("1970-01-01")))
          .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wPrev))
          .withColumn("pd", last(when(col("cents").isNotNull, col("dd")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wNext))
          .withColumn("nd", first(when(col("cents").isNotNull, col("dd")),
            ignoreNulls = true).over(wNext))
          .withColumn("filled",
            when(col("cents").isNotNull, col("cents").cast(DoubleType))
              .otherwise(col("pv").cast(DoubleType)
                + (col("nv") - col("pv")).cast(DoubleType)
                  * ((col("dd") - col("pd")).cast(DoubleType)
                    / (col("nd") - col("pd")).cast(DoubleType))))
          .select(col("day"), col("cents").as("observed"), col("filled"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
                FROM events GROUP BY 1),
              anch AS (
                SELECT day, cents,
                       datediff('day', DATE '1970-01-01', CAST(day AS DATE)) AS dd
                FROM daily
                WHERE datediff('day', DATE '1970-01-01', CAST(day AS DATE)) % 3 = 0),
              cal AS (
                SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
                FROM (SELECT min(day) AS mn, max(day) AS mx FROM anch)),
              j AS (
                SELECT cal.day, anch.cents,
                       datediff('day', DATE '1970-01-01', CAST(cal.day AS DATE)) AS dd
                FROM cal LEFT JOIN anch ON cal.day = anch.day),
              w AS (
                SELECT day, cents, dd,
                  last_value(cents IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                  last_value(CASE WHEN cents IS NOT NULL THEN dd END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                  first_value(cents IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                  first_value(CASE WHEN cents IS NOT NULL THEN dd END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                FROM j)
              SELECT day, cents AS observed,
                CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                     ELSE CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
                            * (CAST(dd - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                END AS filled
              FROM w ORDER BY day""")),

    // Daily VWAP per event_type — the volume-weighted average that plain
    // q_ohlc_daily/avg cannot express, with the weight pulled from the
    // JSON props column (the reference's records carry exactly this
    // shape). Price×volume products are integer cents×units, summed as
    // longs (exact, order-free); the single division at the end is the
    // one mirrored double op. One shuffle on (type, day) — partial
    // aggregation keeps shuffled bytes O(groups).
    Q("q_vwap_daily",
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        t(s, dir, "events")
          .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
            round(col("value") * 100).cast(LongType).as("cents"), k.as("vol"))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("cents") * col("vol")).as("pv"),
            sum(col("vol")).as("volume"))
          .withColumn("vwap",
            col("pv").cast(DoubleType) / (lit(100.0) * col("volume")))
          .select(col("event_type"), col("day"), col("volume"), col("vwap"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH g AS (
                SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                       CAST(SUM(CAST(round(value * 100) AS BIGINT)
                                * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS pv,
                       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS volume
                FROM events GROUP BY 1, 2)
              SELECT event_type, day, volume,
                     CAST(pv AS DOUBLE) / (100.0::DOUBLE * volume) AS vwap
              FROM g ORDER BY event_type, day""")),

    // Bollinger bands: 20-row rolling mean ± 2σ per event_type over the
    // (ts, event_id) order. The frame aggregates are INTEGER sums
    // (cents and cents² as longs — exact, order-free); mean/variance
    // come from the closed form (n·Σx² − (Σx)²)/n² evaluated in ONE
    // fixed double sequence, so both engines agree bitwise (the
    // q_window_distribution convention: exact integer moments, double
    // only at the boundary). Only full 20-row windows emit — ragged
    // warmup rows carry no signal.
    Q("q_bollinger",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val w = ord.rowsBetween(-19, Window.currentRow)
        val base = t(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .withColumn("rn", row_number().over(ord))
          .withColumn("s1", sum(col("cents")).over(w))
          .withColumn("s2", sum(col("cents") * col("cents")).over(w))
          .filter(col("rn") >= 20)
        val mean = col("s1").cast(DoubleType) / lit(20.0)
        val variance = (lit(20L) * col("s2") - col("s1") * col("s1"))
          .cast(DoubleType) / lit(400.0)
        base.select(col("event_type"), col("ts"), col("event_id"),
            col("cents"), mean.as("mid"),
            (mean + lit(2.0) * sqrt(variance)).as("upper"),
            (mean - lit(2.0) * sqrt(variance)).as("lower"))
          .orderBy(col("event_type"), col("ts"), col("event_id"))
      },
      Some("""WITH b AS (
                SELECT event_type, ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
                       SUM(CAST(round(value * 100) AS BIGINT))
                         OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s1,
                       SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
                         OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2
                FROM events)
              SELECT event_type, ts, event_id, cents,
                     CAST(s1 AS DOUBLE) / 20.0 AS mid,
                     CAST(s1 AS DOUBLE) / 20.0
                       + 2.0 * sqrt(CAST(20 * s2 - s1 * s1 AS DOUBLE) / 400.0) AS upper,
                     CAST(s1 AS DOUBLE) / 20.0
                       - 2.0 * sqrt(CAST(20 * s2 - s1 * s1 AS DOUBLE) / 400.0) AS lower
              FROM b WHERE rn >= 20
              ORDER BY event_type, ts, event_id""")),

    // RSI-14 (simple-average variant): per-symbol up/down moves over the
    // (ts, event_id) order, 14-delta frame sums. The algebra collapses
    // 100 − 100/(1+RS) to 100·Σgain/(Σgain+Σloss): gains and losses are
    // integer cents (exact, order-free), so the ONE double op is the
    // final division — bitwise across engines; a flat 14-window (all
    // deltas zero) yields NULL via the nullif guard, identically on
    // both sides. Same scale shape as q_bollinger: one symbol-keyed
    // shuffle, O(1) window state.
    Q("q_rsi",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val w = ord.rowsBetween(-13, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .withColumn("d", col("cents") - lag(col("cents"), 1).over(ord))
          .withColumn("rn", row_number().over(ord))
          .withColumn("g", sum(greatest(col("d"), lit(0L))).over(w))
          .withColumn("l", sum(greatest(-col("d"), lit(0L))).over(w))
          .filter(col("rn") >= 15)
          .select(col("event_type"), col("ts"), col("event_id"),
            (lit(100.0) * col("g").cast(DoubleType)
              / nullif(col("g") + col("l"), lit(0L)).cast(DoubleType))
              .as("rsi"))
          .orderBy(col("event_type"), col("ts"), col("event_id"))
      },
      Some("""WITH b AS (
                SELECT event_type, ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
                       CAST(round(value * 100) AS BIGINT)
                         - lag(CAST(round(value * 100) AS BIGINT), 1)
                             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS d
                FROM events),
              f AS (SELECT event_type, ts, event_id, rn,
                           SUM(greatest(d, 0)) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS g,
                           SUM(greatest(-d, 0)) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS l
                    FROM b)
              SELECT event_type, ts, event_id,
                     100.0::DOUBLE * CAST(g AS DOUBLE) / CAST(nullif(g + l, 0) AS DOUBLE) AS rsi
              FROM f WHERE rn >= 15
              ORDER BY event_type, ts, event_id"""))
  )
}
