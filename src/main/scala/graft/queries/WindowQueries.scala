package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Windowed
import Registry.T

/** Driver-gradable queries for the window-function operators (SURVEY
  * §2.5 W2-W4 beyond-reference extensions + the as-of join from the
  * custom-operator track). The reference has no OVER clause anywhere;
  * these are the window building blocks its pipelines (and any
  * training-data pipeline) need at scale — each is ONE shuffle.
  *
  * Timestamp note: `events.ts` is TIMESTAMP(NANOS) parquet, which this
  * library reads as nanos-since-epoch long (`nanosAsLong`); queries
  * reduce it to epoch seconds with integer `div` so both engines agree
  * exactly (driver-gate gotcha: never emit raw nanos).
  */
object WindowQueries {

  // events.ts nanos → exact epoch seconds (integer division, no float).
  private val tsSec = expr("ts div 1000000000").cast("long")
  private val tsSecSql = "CAST(floor(date_part('epoch', ts)) AS BIGINT)"

  val defs: Seq[(String, Q)] = Seq(

    "w2_keep_latest_dedup" -> Q((s, dir) =>
      // The SCD2 building block SURVEY §2.5 names: newest row per key
      // via row_number()=1 — one shuffle, no groupBy+join-back.
      Windowed.keepLatest(T(s, dir, "orders"), Seq("o_custkey"),
        col("o_orderdate"), tieBreak = Seq(col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_order_date"),
          col("o_totalprice"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(o_orderdate AS DATE) AS latest_order_date, o_totalprice
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |      FROM orders)
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    "w3_running_totals" -> Q((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Cumulative + offset functions in ONE window spec = one exchange.
      // The running sum goes through decimal so the cumulation is exact
      // and order-independent across engines, then widens to double at
      // the gate (decimal gate rule).
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(cum)
          .cast("double").as("running_qty"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        row_number().over(w).as("line_seq"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }, Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
              |    OVER w_cum AS DOUBLE) AS running_qty,
              |  lag(l_quantity, 1) OVER w AS prev_qty,
              |  CAST(row_number() OVER w AS INT) AS line_seq
              |FROM lineitem
              |WINDOW
              |  w AS (PARTITION BY l_orderkey
              |        ORDER BY l_linenumber, l_partkey, l_suppkey),
              |  w_cum AS (PARTITION BY l_orderkey
              |        ORDER BY l_linenumber, l_partkey, l_suppkey
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin),
      bench = true),

    "j8_asof_join" -> Q((s, dir) => {
      // As-of join: each 'click' matched to the user's most recent
      // 'view' at or before it. Spark side composes the union+window
      // pattern (one shuffle, no range-join explosion); the oracle is
      // DuckDB's NATIVE ASOF JOIN — two independent formulations of the
      // same semantics.
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_sec")
      // One view per (user, second): two views in the same second are an
      // as-of tie with engine-unspecified winners — collapse to the max
      // event id on BOTH sides so the match is total-order deterministic.
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_sec")
        .agg(max(col("event_id")).as("view_event_id"))
      // No tieBreak needed: views are pre-collapsed to one row per
      // (user_id, ts_sec) above, so right-side (key, ts) ties cannot
      // occur. (tieBreak names RIGHT-frame columns — see asofJoin doc.)
      Windowed.asofJoin(clicks, views, Seq("user_id"),
        leftTs = "ts_sec", rightTs = "ts_sec",
        rightPayload = Seq("view_event_id", "ts_sec"))
        .select(col("event_id"), col("user_id"),
          col("ts_sec").as("click_sec"),
          col("asof_view_event_id").as("view_event_id"),
          col("asof_ts_sec").as("view_sec"))
        .orderBy("event_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
               |    $tsSecSql AS ts_sec FROM events),
               |clicks AS (SELECT event_id, user_id, ts_sec FROM ev
               |  WHERE event_type = 'click'),
               |views AS (SELECT user_id, ts_sec,
               |    MAX(event_id) AS view_event_id FROM ev
               |  WHERE event_type = 'view' GROUP BY user_id, ts_sec)
               |SELECT c.event_id, c.user_id, c.ts_sec AS click_sec,
               |  v.view_event_id, v.ts_sec AS view_sec
               |FROM clicks c ASOF LEFT JOIN views v
               |  ON c.user_id = v.user_id AND v.ts_sec <= c.ts_sec
               |ORDER BY c.event_id""".stripMargin), bench = true),

    "j14_asof_merge_exec" -> Q((s, dir) => {
      // The SAME as-of scenario as j8, but through the CUSTOM physical
      // operator (plans/AsOfJoin: logical node → planner strategy →
      // partition-wise merge exec) instead of the composed union+window
      // spelling. Three independent formulations of one semantics now
      // gate against each other: the window composition (j8), this
      // merge exec, and DuckDB's native ASOF JOIN (the shared oracle).
      // Plan: both sides hash-cluster + sort on (user, ts); ONE forward
      // merge pass, no window machinery (pinned in AsOfMergeJoinSpec).
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_sec")
        .agg(max(col("event_id")).as("view_event_id"))
        .select(col("user_id").as("v_user_id"), col("ts_sec").as("v_ts_sec"),
          col("view_event_id"))
      graft.plans.AsOfJoin.asof(clicks, views,
          Seq("user_id"), Seq("v_user_id"), "ts_sec", "v_ts_sec")
        .select(col("event_id"), col("user_id"),
          col("ts_sec").as("click_sec"),
          col("view_event_id"), col("v_ts_sec").as("view_sec"))
        .orderBy("event_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
               |    $tsSecSql AS ts_sec FROM events),
               |clicks AS (SELECT event_id, user_id, ts_sec FROM ev
               |  WHERE event_type = 'click'),
               |views AS (SELECT user_id, ts_sec,
               |    MAX(event_id) AS view_event_id FROM ev
               |  WHERE event_type = 'view' GROUP BY user_id, ts_sec)
               |SELECT c.event_id, c.user_id, c.ts_sec AS click_sec,
               |  v.view_event_id, v.ts_sec AS view_sec
               |FROM clicks c ASOF LEFT JOIN views v
               |  ON c.user_id = v.user_id AND v.ts_sec <= c.ts_sec
               |ORDER BY c.event_id""".stripMargin)),

    "j15_asof_forward" -> Q((s, dir) => {
      // FORWARD as-of through the custom merge exec: each click matched
      // to the user's NEXT view at-or-after it (the attribution-window
      // dual of j14's lookback). The forward merge buffers NOTHING —
      // the scan skips right rows strictly before the left position and
      // the row it stops on is the match. Oracle: DuckDB ASOF with the
      // >= inequality (its native forward direction).
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_sec")
        .agg(max(col("event_id")).as("view_event_id"))
        .select(col("user_id").as("v_user_id"), col("ts_sec").as("v_ts_sec"),
          col("view_event_id"))
      graft.plans.AsOfJoin.asof(clicks, views,
          Seq("user_id"), Seq("v_user_id"), "ts_sec", "v_ts_sec",
          direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("ts_sec").as("click_sec"),
          col("view_event_id"), col("v_ts_sec").as("view_sec"))
        .orderBy("event_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
               |    $tsSecSql AS ts_sec FROM events),
               |clicks AS (SELECT event_id, user_id, ts_sec FROM ev
               |  WHERE event_type = 'click'),
               |views AS (SELECT user_id, ts_sec,
               |    MAX(event_id) AS view_event_id FROM ev
               |  WHERE event_type = 'view' GROUP BY user_id, ts_sec)
               |SELECT c.event_id, c.user_id, c.ts_sec AS click_sec,
               |  v.view_event_id, v.ts_sec AS view_sec
               |FROM clicks c ASOF LEFT JOIN views v
               |  ON c.user_id = v.user_id AND v.ts_sec >= c.ts_sec
               |ORDER BY c.event_id""".stripMargin)),

    "j16_asof_tolerance" -> Q((s, dir) => {
      // Attribution-window as-of: latest view within ONE HOUR before
      // the click, else NULL — merge_asof's `tolerance` knob (no
      // fallback to the next-nearest row). The window check happens
      // inside the merge, so out-of-window rows cost nothing
      // downstream. Oracle: unbounded DuckDB ASOF, then CASE-null the
      // payload beyond the window — provably the same semantics.
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_sec")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts_sec")
        .agg(max(col("event_id")).as("view_event_id"))
        .select(col("user_id").as("v_user_id"), col("ts_sec").as("v_ts_sec"),
          col("view_event_id"))
      graft.plans.AsOfJoin.asof(clicks, views,
          Seq("user_id"), Seq("v_user_id"), "ts_sec", "v_ts_sec",
          tolerance = Some(3600L))
        .select(col("event_id"), col("user_id"),
          col("ts_sec").as("click_sec"),
          col("view_event_id"), col("v_ts_sec").as("view_sec"))
        .orderBy("event_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
               |    $tsSecSql AS ts_sec FROM events),
               |clicks AS (SELECT event_id, user_id, ts_sec FROM ev
               |  WHERE event_type = 'click'),
               |views AS (SELECT user_id, ts_sec,
               |    MAX(event_id) AS view_event_id FROM ev
               |  WHERE event_type = 'view' GROUP BY user_id, ts_sec)
               |SELECT c.event_id, c.user_id, c.ts_sec AS click_sec,
               |  CASE WHEN c.ts_sec - v.ts_sec <= 3600
               |    THEN v.view_event_id END AS view_event_id,
               |  CASE WHEN c.ts_sec - v.ts_sec <= 3600
               |    THEN v.ts_sec END AS view_sec
               |FROM clicks c ASOF LEFT JOIN views v
               |  ON c.user_id = v.user_id AND v.ts_sec <= c.ts_sec
               |ORDER BY c.event_id""".stripMargin)),

    "w4_sessionize" -> Q((s, dir) => {
      // Gap-based sessionization (30-min gap) + per-session rollup: the
      // canonical event-stream operator for behavioral training data.
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      Windowed.sessionize(ev, Seq("user_id"), "ts_sec", gapSec = 1800L,
        tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_sec")).as("session_start_sec"),
          max(col("ts_sec")).as("session_end_sec"))
        .orderBy("user_id", "session_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id,
               |    $tsSecSql AS ts_sec FROM events),
               |flagged AS (SELECT event_id, user_id, ts_sec,
               |    CASE WHEN ts_sec - lag(ts_sec, 1) OVER w > 1800
               |          OR lag(ts_sec, 1) OVER w IS NULL
               |         THEN 1 ELSE 0 END AS new_session
               |  FROM ev
               |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
               |sess AS (SELECT user_id, ts_sec,
               |    CAST(SUM(new_session) OVER (PARTITION BY user_id
               |      ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED PRECEDING
               |      AND CURRENT ROW) AS BIGINT) AS session_id
               |  FROM flagged)
               |SELECT user_id, session_id, count(*) AS n_events,
               |  MIN(ts_sec) AS session_start_sec, MAX(ts_sec) AS session_end_sec
               |FROM sess GROUP BY user_id, session_id
               |ORDER BY user_id, session_id""".stripMargin)),

    "w5_session_funnel" -> Q((s, dir) => {
      // Session-level funnel: per user, how many sessions converted
      // (saw a 'view' and then a 'click' at-or-after it). Sessionize →
      // per-session conditional MIN/MAX → per-user rollup; the whole
      // funnel is two hash aggregates on top of the one-shuffle
      // sessionizer, no self-joins.
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      Windowed.sessionize(ev, Seq("user_id"), "ts_sec", gapSec = 1800L,
        tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(
          min(when(col("event_type") === "view", col("ts_sec"))).as("first_view"),
          max(when(col("event_type") === "click", col("ts_sec"))).as("last_click"),
          count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          count(when(col("last_click") >= col("first_view"), lit(1)))
            .as("converted_sessions"),
          sum(col("n_events")).as("n_events"))
        .orderBy("user_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
               |    $tsSecSql AS ts_sec FROM events),
               |flagged AS (SELECT event_id, user_id, event_type, ts_sec,
               |    CASE WHEN ts_sec - lag(ts_sec, 1) OVER w > 1800
               |          OR lag(ts_sec, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
               |sess AS (SELECT user_id, event_type, ts_sec,
               |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               |  FROM flagged),
               |per_session AS (SELECT user_id, sid,
               |    MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS first_view,
               |    MAX(CASE WHEN event_type = 'click' THEN ts_sec END) AS last_click,
               |    count(*) AS n_events
               |  FROM sess GROUP BY user_id, sid)
               |SELECT user_id, count(*) AS n_sessions,
               |  count(CASE WHEN last_click >= first_view THEN 1 END)
               |    AS converted_sessions,
               |  CAST(SUM(n_events) AS BIGINT) AS n_events
               |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "j13_interval_overlap_join" -> Q((s, dir) => {
      import s.implicits._
      // Interval×interval OVERLAP join (RangeJoin.intervalOverlapJoin):
      // user sessions against fixed 6-hour analysis windows — the
      // "which sessions touch this window" query that a naive overlap
      // theta-join answers quadratically. Each overlapping pair is
      // emitted exactly once (left-edge-bucket dedup). Windows anchor
      // at the corpus min timestamp so the gate is data-deterministic.
      import graft.operators.{RangeJoin, Windowed}
      val ev = T(s, dir, "events").withColumn("ts_sec", tsSec)
      val sessions = Windowed.sessionize(ev, Seq("user_id"), "ts_sec",
        gapSec = 1800L, tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(min("ts_sec").as("s_lo"), max("ts_sec").as("s_hi"))
      val mn = ev.agg(min("ts_sec")).head().getLong(0)
      val windows = (0 until 8).map(i =>
        (i, mn + i * 43200L, mn + i * 43200L + 21600L))
        .toDF("w_id", "w_lo", "w_hi")
      val counts = RangeJoin.intervalOverlapJoin(
        sessions, "s_lo", "s_hi", windows, "w_lo", "w_hi", bucketSize = 21600L)
        .groupBy("w_id").agg(count(lit(1)).as("n_sessions"))
      windows.select("w_id").join(counts, Seq("w_id"), "left")
        .select(col("w_id"), coalesce(col("n_sessions"), lit(0L)).as("n_sessions"))
        .orderBy("w_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id,
               |    $tsSecSql AS ts_sec FROM events),
               |flagged AS (SELECT user_id, ts_sec,
               |    CASE WHEN ts_sec - lag(ts_sec, 1) OVER w > 1800
               |          OR lag(ts_sec, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
               |sess AS (SELECT user_id, ts_sec,
               |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_sec
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               |  FROM flagged),
               |bounds AS (SELECT user_id, sid, MIN(ts_sec) AS s_lo,
               |    MAX(ts_sec) AS s_hi FROM sess GROUP BY user_id, sid),
               |mn AS (SELECT MIN(ts_sec) AS m FROM ev),
               |win AS (SELECT CAST(i AS INT) AS w_id, m + i * 43200 AS w_lo,
               |    m + i * 43200 + 21600 AS w_hi
               |  FROM mn, (SELECT unnest(range(0, 8)) AS i)),
               |cnt AS (SELECT w_id, count(*) AS n FROM win w JOIN bounds b
               |  ON b.s_lo <= w.w_hi AND w.w_lo <= b.s_hi GROUP BY w_id)
               |SELECT w.w_id, COALESCE(cnt.n, 0) AS n_sessions
               |FROM win w LEFT JOIN cnt USING (w_id) ORDER BY w_id""".stripMargin)),

    "w6_rank_family" -> Q((s, dir) => {
      // The full SQL rank family in ONE exchange. Two window specs share
      // the partitioning (one shuffle) and differ only in sort: the
      // tie-ABLE order (quantity only) for rank/dense_rank/percent_rank/
      // cume_dist, whose tie semantics are the point, and a TOTALIZED
      // order (quantity + the unique lineitem key) for row_number/ntile,
      // which are position-based and engine-nondeterministic under ties.
      import org.apache.spark.sql.expressions.Window
      val part = Window.partitionBy("l_returnflag")
      val tieable = part.orderBy(col("l_quantity"))
      val total = part.orderBy(col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_returnflag"),
          col("l_quantity").as("qty"),
          rank().over(tieable).as("rnk"),
          dense_rank().over(tieable).as("drnk"),
          percent_rank().over(tieable).as("prnk"),
          cume_dist().over(tieable).as("cdist"),
          row_number().over(total).as("rn"),
          ntile(4).over(total).as("quartile"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }, Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              |  l_returnflag, l_quantity AS qty,
              |  CAST(rank() OVER w1 AS INT) AS rnk,
              |  CAST(dense_rank() OVER w1 AS INT) AS drnk,
              |  percent_rank() OVER w1 AS prnk,
              |  cume_dist() OVER w1 AS cdist,
              |  CAST(row_number() OVER w2 AS INT) AS rn,
              |  CAST(ntile(4) OVER w2 AS INT) AS quartile
              |FROM lineitem
              |WINDOW w1 AS (PARTITION BY l_returnflag ORDER BY l_quantity),
              |  w2 AS (PARTITION BY l_returnflag ORDER BY l_quantity,
              |    l_orderkey, l_linenumber, l_partkey, l_suppkey)
              |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    "w7_gap_fill_ffill" -> Q((s, dir) => {
      // Gap-fill + forward-fill: the time-series densification every
      // reporting pipeline needs. A per-key date spine (months × keys —
      // generated, tiny, broadcastable) left-joins the sparse actuals;
      // last(_, ignoreNulls) over an explicit ROWS frame carries the
      // last observation forward. One window shuffle on the key; the
      // spine costs |keys|·|months| rows, never a scan of the fact.
      // Rare high-value orders make real gaps at every SF.
      import org.apache.spark.sql.expressions.Window
      val base = T(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderpriority").as("prio"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .groupBy("prio", "month")
        .agg(sum("price").as("monthly_total"), count(lit(1)).as("n_orders"))
      val months = base.agg(min("month").as("lo"), max("month").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("month"))
      val spine = base.select("prio").distinct().crossJoin(broadcast(months))
      val w = Window.partitionBy("prio").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(base, Seq("prio", "month"), "left")
        .select(col("prio"), col("month"),
          col("n_orders").isNotNull.as("observed"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          last(col("monthly_total"), ignoreNulls = true).over(w)
            .cast("double").as("ffill_total"))
        .orderBy("prio", "month")
    }, Some("""WITH base AS (SELECT o_orderpriority AS prio,
              |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monthly_total,
              |    count(*) AS n_orders
              |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1, 2),
              |months AS (SELECT CAST(unnest(generate_series(lo, hi,
              |    INTERVAL 1 MONTH)) AS DATE) AS month
              |  FROM (SELECT min(month) AS lo, max(month) AS hi FROM base)),
              |spine AS (SELECT p.prio, m.month
              |  FROM (SELECT DISTINCT prio FROM base) p CROSS JOIN months m)
              |SELECT s.prio, s.month,
              |  b.n_orders IS NOT NULL AS observed,
              |  COALESCE(b.n_orders, 0) AS n_orders,
              |  CAST(last_value(b.monthly_total IGNORE NULLS) OVER (
              |    PARTITION BY s.prio ORDER BY s.month
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              |    AS ffill_total
              |FROM spine s LEFT JOIN base b
              |  ON b.prio = s.prio AND b.month = s.month
              |ORDER BY s.prio, s.month""".stripMargin)),

    "w8_zscore_anomaly" -> Q((s, dir) => {
      // Rolling z-score outlier flag over each user's last 20 events
      // (Windowed.rollingZscore). The measure is converted to exact
      // milli-integers first so the window sums (Σv, Σv²) are
      // order-independent integers; mean/variance then evaluate in one
      // fixed-shape double formula both engines replay bit-for-bit.
      val ev = T(s, dir, "events")
        .withColumn("ts_sec", tsSec)
        .withColumn("v_milli", expr("CAST(round(value * 1000) AS BIGINT)"))
      Windowed.rollingZscore(ev, Seq("user_id"),
          Seq(col("ts_sec"), col("event_id")), col("v_milli"),
          lookback = 20, minRows = 5, threshold = 2.5)
        .select(col("event_id"), col("user_id"), col("ts_sec"), col("value"),
          round(col("z"), 4).as("z"), col("is_anomaly"))
        .orderBy("event_id")
    }, Some(s"""WITH ev AS (SELECT event_id, user_id, $tsSecSql AS ts_sec, value,
               |    CAST(round(value * 1000) AS BIGINT) AS v_milli FROM events),
               |win AS (SELECT event_id, user_id, ts_sec, value,
               |    CAST(count(*) OVER w AS DOUBLE) AS n,
               |    CAST(SUM(v_milli) OVER w AS DOUBLE) AS s1,
               |    CAST(SUM(v_milli * v_milli) OVER w AS DOUBLE) AS s2,
               |    CAST(v_milli AS DOUBLE) AS v
               |  FROM ev WINDOW w AS (PARTITION BY user_id
               |    ORDER BY ts_sec, event_id
               |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
               |z AS (SELECT event_id, user_id, ts_sec, value,
               |    CASE WHEN n >= 5
               |        AND sqrt((s2 - s1 * s1 / n) / (n - 1.0)) > 0
               |      THEN (v - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1.0))
               |    END AS z_raw FROM win)
               |SELECT event_id, user_id, ts_sec, value,
               |  round(z_raw, 4) AS z,
               |  coalesce(abs(z_raw) > 2.5, FALSE) AS is_anomaly
               |FROM z ORDER BY event_id""".stripMargin)),

    "w9_cohort_retention" -> Q((s, dir) => {
      // Weekly cohort retention (operators/Retention.cohortRetention):
      // users cohorted by first active epoch-week; each (cohort, offset)
      // cell counts distinct still-active users. All-integer bucket
      // arithmetic; the event log collapses at the first aggregate.
      val ev = T(s, dir, "events")
        .withColumn("week", expr("(ts div 1000000000) div 604800"))
      graft.operators.Retention.cohortRetention(ev, "user_id", col("week"))
        .orderBy("cohort_bucket", "offset")
    }, Some(s"""WITH act AS (SELECT DISTINCT user_id,
               |    ($tsSecSql) // 604800 AS bucket FROM events),
               |coh AS (SELECT user_id, min(bucket) AS cohort_bucket
               |  FROM act GROUP BY user_id),
               |sizes AS (SELECT cohort_bucket, count(*) AS cohort_users
               |  FROM coh GROUP BY cohort_bucket),
               |ret AS (SELECT c.cohort_bucket,
               |    a.bucket - c.cohort_bucket AS "offset",
               |    count(DISTINCT a.user_id) AS active_users
               |  FROM act a JOIN coh c USING (user_id) GROUP BY 1, 2)
               |SELECT r.cohort_bucket, r."offset", r.active_users,
               |  s.cohort_users,
               |  CAST(r.active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE)
               |    AS retention
               |FROM ret r JOIN sizes s USING (cohort_bucket)
               |ORDER BY r.cohort_bucket, r."offset"""".stripMargin),
      bench = true),

    "w10_sliding_distinct_hll" -> Q((s, dir) => {
      // Trailing-7-day distinct users per day, twice: exactly
      // (Sketches.slidingDistinctExact — distinct (day,user) pairs
      // range-joined to the broadcast day spine) and via daily HLL
      // sketch merge (Sketches.slidingDistinct — ONE pass over events,
      // then a window union over the |days|-row sketch frame). At 100 TB
      // only stage 1 touches the events; the exact variant inflates the
      // pair set windowDays× and re-distincts every window. The gate
      // compares the verdict, not the engine-specific sketch estimate.
      import graft.operators.Sketches
      val ev = T(s, dir, "events")
        .select(expr("(ts div 1000000000) div 86400").cast("long").as("day"),
          col("user_id"))
      val exact = Sketches.slidingDistinctExact(ev, "day", "user_id", 7)
      val approx = Sketches.slidingDistinct(ev, "day", "user_id", 7)
      val bound = Sketches.hllBound(12)
      exact.join(approx, Seq("day"))
        .select(col("day"), col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct"))
            <= col("exact_distinct") * bound).as("approx_within_bound"))
        .orderBy("day")
    }, Some(s"""WITH pairs AS (SELECT DISTINCT
               |    ($tsSecSql) // 86400 AS day, user_id FROM events),
               |days AS (SELECT DISTINCT day FROM pairs)
               |SELECT d.day,
               |  count(DISTINCT p.user_id) AS exact_distinct,
               |  TRUE AS approx_within_bound
               |FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
               |GROUP BY d.day ORDER BY d.day""".stripMargin)),

    "w11_moving_percentile" -> Q((s, dir) =>
      // Moving median over a trailing 5-row frame — the robust (outlier-
      // immune) twin of w3's moving average. percentile is a mergeable
      // sketch-buffer aggregate, so it windows like any other aggregate:
      // ONE exchange on the partition key. Both engines interpolate
      // lower + (upper − lower)·frac over the same doubles, so the
      // median is bit-identical; o_orderkey totalizes the frame order.
      T(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          expr("""percentile(o_totalprice, 0.5) OVER (
                 |  PARTITION BY o_custkey ORDER BY o_orderkey
                 |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin)
            .as("moving_median"))
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  quantile_cont(o_totalprice, 0.5) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderkey
             |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS moving_median
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    "w13_ewma" -> Q((s, dir) =>
      // Truncated EWMA (Windowed.ewma, α = 1/2): explicit left fold
      // over the trailing-20 frame pins the accumulation order; the
      // oracle prepends the 0 seed because list_reduce seeds from the
      // list head.
      Windowed.ewma(
          T(s, dir, "events").withColumn("ts_sec", tsSec)
            .select("event_id", "user_id", "ts_sec", "value"),
          Seq("user_id"), Seq("ts_sec", "event_id"), "value", lookback = 20)
        .orderBy("user_id", "ts_sec", "event_id"),
      Some(s"""WITH ev AS (SELECT event_id, user_id, value,
              |    $tsSecSql AS ts_sec FROM events)
              |SELECT event_id, user_id, ts_sec, value,
              |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(value) OVER (
              |      PARTITION BY user_id ORDER BY ts_sec, event_id
              |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
              |    (acc, x) -> acc * 0.5 + x * 0.5) AS ewma
              |FROM ev ORDER BY user_id, ts_sec, event_id""".stripMargin)),

    "w12_transition_matrix" -> Q((s, dir) =>
      // Session-local first-order Markov matrix (Windowed.
      // transitionMatrix): next-event transition counts + row-normalized
      // probabilities. lead() rides the sessionizer's one user-keyed
      // exchange (cross-session pairs guarded by lead(session_id));
      // row totals broadcast back, never an empty-over() window.
      Windowed.transitionMatrix(
          T(s, dir, "events").withColumn("ts_sec", tsSec),
          Seq("user_id"), "ts_sec", "event_type", gapSec = 1800L,
          tieBreak = Seq("event_id"))
        .orderBy("from_type", "to_type"),
      Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
              |    $tsSecSql AS ts_sec FROM events),
              |flagged AS (SELECT event_id, user_id, event_type, ts_sec,
              |    CASE WHEN ts_sec - lag(ts_sec, 1) OVER w > 1800
              |          OR lag(ts_sec, 1) OVER w IS NULL
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM ev
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
              |sess AS (SELECT event_id, user_id, event_type, ts_sec,
              |    CAST(SUM(new_session) OVER (PARTITION BY user_id
              |      ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED PRECEDING
              |      AND CURRENT ROW) AS BIGINT) AS session_id
              |  FROM flagged),
              |led AS (SELECT event_type, session_id,
              |    lead(event_type, 1) OVER w AS next_type,
              |    lead(session_id, 1) OVER w AS next_sess
              |  FROM sess
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
              |tr AS (SELECT event_type AS from_type, next_type AS to_type,
              |    CAST(count(*) AS BIGINT) AS n_trans
              |  FROM led WHERE next_sess = session_id
              |  GROUP BY 1, 2),
              |tot AS (SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
              |  FROM tr GROUP BY from_type)
              |SELECT t.from_type, t.to_type, t.n_trans, o.n_from,
              |  CAST(t.n_trans AS DOUBLE) / CAST(o.n_from AS DOUBLE) AS p
              |FROM tr t JOIN tot o USING (from_type)
              |ORDER BY t.from_type, t.to_type""".stripMargin)))
}
