package graft

import graft.operators.Channels.{Sql => Ch}

/** DuckDB oracle SQL twins for every oracle-checkable query in
  * `SparkEntry.queries`. Parity rules (SURVEY.md §7.4):
  *  - every float aggregate wrapped in round(x, 2..4) on BOTH sides;
  *  - integer division written `div`(Spark) / `//`(DuckDB) — both truncate
  *    toward zero (verified empirically);
  *  - double→int conversions via explicit floor() (DuckDB CAST rounds,
  *    Spark CAST truncates — never bare-CAST a double);
  *  - timestamps surfaced as epoch_ms (Spark `unix_millis` = DuckDB
  *    `epoch_ms`) or formatted date strings, never raw timestamp columns;
  *  - hex→int via Spark `conv(hex,16,10)` = DuckDB `('0x'||hex)::BIGINT`
  *    (≤15 hex digits keeps it in 60 bits, positive);
  *  - deterministic ORDER BY with a unique tiebreaker on every query.
  */
object Oracles {
  /** DuckDB twin of Spark's `max_by(v, struct(tsm, event_id))`: arg_max
    * over a lexicographic HUGEINT encoding of (tsm, event_id). 2^63 scale
    * factor makes the encoding exactly lexicographic for any non-negative
    * event_id < 2^63 — no overflow (HUGEINT is 128-bit). */
  private val byTsEid = "tsm::HUGEINT * 9223372036854775808 + event_id"

  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_region_rollup" ->
      """SELECT r_name,
        | count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q03_revenue_by_priority" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderstatus,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q06_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q07_top_orders_per_customer" ->
      """SELECT o_custkey, rk, o_orderkey, totalprice FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,

    "q08_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_top_customers" ->
      """SELECT o_custkey,
        | round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY revenue DESC, o_custkey
        |LIMIT 10""".stripMargin,

    "q10_set_ops" ->
      """WITH with_orders AS (
        |  SELECT DISTINCT c_custkey FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)),
        |building AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |diff AS (SELECT c_custkey FROM with_orders EXCEPT SELECT c_custkey FROM building)
        |SELECT count(*) AS n_customers, min(c_custkey) AS min_key, max(c_custkey) AS max_key
        |FROM diff""".stripMargin,

    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n_lines,
        | grouping(l_returnflag) AS g_flag,
        | grouping(l_linestatus) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "q12_distinct_users" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events,
        | round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q13_validate_cascade" ->
      """WITH cmds AS (
        |  SELECT event_id, CAST(user_id % 8 AS INT) AS target_id,
        |    1 + event_id % 10 AS n_channels,
        |    event_id % 50 - 2 AS duration_ms,
        |    CAST(floor(value * 30) AS INT) % 2600 - 200 AS chv
        |  FROM events WHERE event_type = 'purchase'),
        |msgs AS (
        |  SELECT CASE
        |    WHEN n_channels < 1 OR n_channels > 8 THEN
        |      'Invalid channel count. Expected 1-8, got ' || CAST(n_channels AS VARCHAR)
        |    WHEN duration_ms < 1 THEN 'Duration must be at least 1ms'
        |    WHEN chv <> -1 AND (chv < 1000 OR chv > 2000) THEN
        |      'Channel values must be between 1000-2000 or -1 to skip'
        |    ELSE 'Channels updated for target ' || CAST(target_id AS VARCHAR)
        |      || ' with ' || CAST(duration_ms AS VARCHAR) || 'ms timeout'
        |  END AS message FROM cmds)
        |SELECT CASE WHEN message LIKE 'Channels updated%' THEN 'success' ELSE 'error' END AS status,
        |  message, count(*) AS n
        |FROM msgs
        |GROUP BY status, message
        |ORDER BY status, message""".stripMargin,

    "q14_json_extract" ->
      """SELECT k % 10 AS k_bucket, count(*) AS n,
        | round(avg(value), 2) AS avg_value,
        | min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, value FROM events)
        |GROUP BY k_bucket
        |ORDER BY k_bucket""".stripMargin,

    "q15_mac_format" ->
      """SELECT user_id, printf('%02X:%02X:%02X:%02X:%02X:%02X',
        |  (h >> 40) & 255, (h >> 32) & 255, (h >> 24) & 255,
        |  (h >> 16) & 255, (h >> 8) & 255, h & 255) AS mac
        |FROM (SELECT DISTINCT user_id, (user_id & 16777215) * 2654435761 AS h FROM events)
        |ORDER BY user_id""".stripMargin,

    "q16_rescale" ->
      s"""WITH fr AS (${Ch.frames})
         |SELECT target_id, count(*) AS n_frames,
         | min(sbus) AS min_sbus, max(sbus) AS max_sbus,
         | round(avg(sbus), 2) AS avg_sbus
         |FROM (SELECT target_id, CAST(172 + ((ch - 1000) * 1639) // 1000 AS INT) AS sbus FROM fr)
         |GROUP BY target_id
         |ORDER BY target_id""".stripMargin,

    "q17_effective_channels" ->
      s"""WITH fr AS (${Ch.frames}),
         |cm AS (${Ch.commands}),
         |lf AS (SELECT target_id, arg_max(ch, $byTsEid) AS live_ch
         |  FROM fr GROUP BY target_id),
         |lc AS (SELECT target_id, arg_max(ovr, $byTsEid) AS ovr,
         |    arg_max(tsm, $byTsEid) AS cmd_tsm,
         |    arg_max(duration_ms, $byTsEid) AS duration_ms
         |  FROM cm GROUP BY target_id),
         |t AS (SELECT max(epoch_ms(ts)) AS tmax FROM events)
         |SELECT f.target_id, f.live_ch, c.ovr AS ovr_ch,
         |  CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax THEN 1 ELSE 0 END AS is_overridden,
         |  CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax THEN c.ovr ELSE f.live_ch END AS effective_ch,
         |  CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax THEN 'override' ELSE 'live' END AS source,
         |  CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax
         |    THEN greatest(0, c.cmd_tsm + c.duration_ms - t.tmax) ELSE 0 END AS remaining_ms
         |FROM lf f LEFT JOIN lc c USING (target_id) CROSS JOIN t
         |ORDER BY f.target_id""".stripMargin,

    "q18_sentinel_merge" ->
      s"""WITH fr AS (${Ch.frames}),
         |sc AS (${Ch.sentinelCommands}),
         |lv AS (SELECT target_id, ci, arg_max(ch, $byTsEid) AS live_ch
         |  FROM fr GROUP BY target_id, ci),
         |oc AS (SELECT target_id, ci, arg_max(ovr, $byTsEid) AS ovr
         |  FROM sc GROUP BY target_id, ci)
         |SELECT coalesce(l.target_id, o.target_id) AS target_id,
         |  coalesce(l.ci, o.ci) AS ci, l.live_ch, o.ovr,
         |  coalesce(nullif(o.ovr, -1), l.live_ch) AS merged
         |FROM lv l FULL JOIN oc o ON l.target_id = o.target_id AND l.ci = o.ci
         |ORDER BY target_id, ci""".stripMargin,

    "q19_forward_fill" ->
      s"""WITH hours AS (SELECT DISTINCT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS hour_ms FROM events),
         |targets AS (SELECT CAST(x AS INT) AS target_id FROM generate_series(0, 7) t(x)),
         |fr AS (${Ch.frames}),
         |hourly AS (SELECT target_id, tsm - tsm % 3600000 AS hour_ms,
         |    arg_max(ch, $byTsEid) AS ch
         |  FROM fr GROUP BY target_id, hour_ms)
         |SELECT s.target_id, s.hour_ms,
         |  last_value(h.ch IGNORE NULLS) OVER (PARTITION BY s.target_id ORDER BY s.hour_ms
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_ch
         |FROM (SELECT hour_ms, target_id FROM hours CROSS JOIN targets) s
         |LEFT JOIN hourly h ON h.target_id = s.target_id AND h.hour_ms = s.hour_ms
         |ORDER BY s.target_id, s.hour_ms""".stripMargin,

    "q20_last_per_key" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS tsm FROM events),
        |newest AS (SELECT user_id, arg_max(event_type, $byTsEid) AS last_event_type,
        |  round(arg_max(value, $byTsEid), 2) AS last_value
        |  FROM e GROUP BY user_id),
        |counts AS (SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
        |  FROM e GROUP BY user_id),
        |ack AS (SELECT user_id,
        |    arg_max(CAST(event_type = 'signup' AS INT), event_id) AS last_ack_success,
        |    max(CASE WHEN event_type = 'signup' THEN tsm END) AS last_signup_ms
        |  FROM e WHERE event_type IN ('signup', 'error') GROUP BY user_id)
        |SELECT n.user_id, n.last_event_type, n.last_value, c.n_events, c.total_value,
        |  a.last_ack_success, a.last_signup_ms
        |FROM newest n JOIN counts c USING (user_id) LEFT JOIN ack a USING (user_id)
        |ORDER BY n.user_id""".stripMargin,

    "q21_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS tsm FROM events),
        |lagged AS (SELECT *, lag(tsm) OVER (PARTITION BY user_id ORDER BY tsm, event_id) AS prev_tsm FROM e),
        |flagged AS (SELECT *, CASE WHEN prev_tsm IS NULL OR tsm - prev_tsm > 14400000 THEN 1 ELSE 0 END AS is_new FROM lagged),
        |sessions AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsm, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tsm) AS start_ms, max(tsm) AS end_ms,
        |  max(tsm) - min(tsm) AS duration_ms
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q22_snapshot_derived" ->
      s"""WITH targets AS (SELECT CAST(x AS INT) AS target_id,
         |    'Drone_' || CAST(x + 1 AS VARCHAR) AS name,
         |    printf('%02X:%02X:%02X:%02X:%02X:%02X',
         |      (h >> 40) & 255, (h >> 32) & 255, (h >> 24) & 255,
         |      (h >> 16) & 255, (h >> 8) & 255, h & 255) AS mac
         |  FROM (SELECT x, ((x + 1) & 16777215) * 2654435761 AS h FROM generate_series(0, 7) t(x))),
         |fr AS (${Ch.frames}),
         |cm AS (${Ch.commands}),
         |ak AS (${Ch.acks}),
         |lf AS (SELECT target_id, arg_max(ch, $byTsEid) AS live_ch
         |  FROM fr GROUP BY target_id),
         |lc AS (SELECT target_id, arg_max(ovr, $byTsEid) AS ovr,
         |    arg_max(tsm, $byTsEid) AS cmd_tsm,
         |    arg_max(duration_ms, $byTsEid) AS duration_ms
         |  FROM cm GROUP BY target_id),
         |t AS (SELECT max(epoch_ms(ts)) AS tmax FROM events),
         |eff AS (SELECT f.target_id, f.live_ch,
         |    CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax THEN 1 ELSE 0 END AS is_overridden,
         |    CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax THEN c.ovr ELSE f.live_ch END AS effective_ch,
         |    CASE WHEN c.cmd_tsm IS NOT NULL AND c.cmd_tsm + c.duration_ms > t.tmax
         |      THEN greatest(0, c.cmd_tsm + c.duration_ms - t.tmax) ELSE 0 END AS remaining_ms
         |  FROM lf f LEFT JOIN lc c USING (target_id) CROSS JOIN t),
         |ack AS (SELECT target_id, arg_max(success, event_id) AS connection_state,
         |    max(CASE WHEN success = 1 THEN tsm END) AS last_successful_send_ms
         |  FROM ak GROUP BY target_id)
         |SELECT tg.target_id, tg.name, tg.mac, e.live_ch, e.is_overridden,
         |  e.effective_ch, e.remaining_ms, a.connection_state, a.last_successful_send_ms
         |FROM targets tg LEFT JOIN eff e USING (target_id) LEFT JOIN ack a USING (target_id)
         |ORDER BY tg.target_id""".stripMargin,
    "q34_mac_lookup" ->
      s"""WITH targets AS (SELECT CAST(x AS INT) AS target_id,
         |    'Drone_' || CAST(x + 1 AS VARCHAR) AS name,
         |    printf('%02X:%02X:%02X:%02X:%02X:%02X',
         |      (h >> 40) & 255, (h >> 32) & 255, (h >> 24) & 255,
         |      (h >> 16) & 255, (h >> 8) & 255, h & 255) AS mac,
         |    -- position = registry insertion index, assigned on the
         |    -- DIMENSION before the join (matches the Spark side: a
         |    -- registered target with zero frames still consumes its
         |    -- position, leaving a gap in the joined output)
         |    row_number() OVER (ORDER BY x) AS position
         |  FROM (SELECT x, ((x + 1) & 16777215) * 2654435761 AS h FROM generate_series(0, 7) t(x))),
         |fr AS (${Ch.frames}),
         |fm AS (SELECT printf('%02X:%02X:%02X:%02X:%02X:%02X',
         |      (h >> 40) & 255, (h >> 32) & 255, (h >> 24) & 255,
         |      (h >> 16) & 255, (h >> 8) & 255, h & 255) AS mac, tsm
         |  FROM (SELECT ((target_id + 1) & 16777215) * 2654435761 AS h, tsm FROM fr)),
         |j AS (SELECT t.position, t.target_id, t.name, t.mac,
         |    count(*) AS n_frames, max(f.tsm) AS last_tsm
         |  FROM fm f JOIN targets t ON f.mac = t.mac
         |  GROUP BY t.position, t.target_id, t.name, t.mac)
         |SELECT position, target_id, name, mac, n_frames, last_tsm
         |FROM j ORDER BY target_id""".stripMargin,

    "q35_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
        |x AS (SELECT user_id FROM p EXCEPT SELECT user_id FROM e),
        |i AS (SELECT user_id FROM p INTERSECT SELECT user_id FROM v),
        |u AS (SELECT DISTINCT user_id FROM (SELECT user_id FROM p UNION ALL SELECT user_id FROM v))
        |SELECT 'except' AS op, count(*) AS n, min(user_id) AS min_user, max(user_id) AS max_user FROM x
        |UNION ALL
        |SELECT 'intersect', count(*), min(user_id), max(user_id) FROM i
        |UNION ALL
        |SELECT 'union', count(*), min(user_id), max(user_id) FROM u
        |ORDER BY op""".stripMargin,

    // Spark side does the lookup through a literal MAP
    // (map_from_arrays + element_at); the twin indexes the equivalent
    // list positionally (DuckDB lists are 1-based).
    "q52_channel_map" ->
      s"""WITH fr AS (${Ch.frames})
         |SELECT target_id,
         |  (['roll','pitch','throttle','yaw','aux1','aux2','aux3','aux4'])[ci + 1] AS channel,
         |  count(*) AS n_samples,
         |  round(avg(ch), 4) AS avg_ch,
         |  max(ch) AS max_ch
         |FROM fr GROUP BY target_id, channel
         |ORDER BY target_id, channel""".stripMargin,

    // The HLL estimate itself is engine-specific; the oracle pins the
    // exact counts and the accuracy CONTRACT (estimate within 5% of
    // exact must hold, i.e. TRUE) — see Relational.q36ApproxDistinct.
    "q36_approx_distinct" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users_exact,
        | count(*) AS n_events,
        | TRUE AS approx_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // GK-sketch estimates are engine-specific; the oracle pins the
    // exact group counts and the rank-error CONTRACT (each estimate's
    // rank within ⌈n/acc⌉+1 of target, i.e. TRUE) — see
    // Relational.q60ApproxPercentiles.
    "q60_approx_percentiles" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        | TRUE AS p50_in_bound,
        | TRUE AS p90_in_bound,
        | TRUE AS p99_in_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // statistical moments: both engines run stable single-pass
    // co-moment aggregation; rounding absorbs merge-order ulps
    "q65_stats_moments" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q67_regression" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        | round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // ordered funnel: each stage's min-timestamp is constrained by the
    // previous stage's — the same shrinking CTE chain as the Spark
    // aggregation tree (see Relational.q77Funnel)
    "q77_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tsm FROM events),
        |v AS (SELECT user_id, min(tsm) AS view_ms FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.tsm) AS click_ms, min(v.view_ms) AS view_ms
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.tsm >= v.view_ms GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.tsm) AS purchase_ms, min(c.click_ms) AS click_ms
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.tsm >= c.click_ms GROUP BY e.user_id),
        |hd AS (SELECT count(*) AS head_users FROM v),
        |stages AS (
        |  SELECT '1_view' AS stage, count(*) AS n_users, CAST(NULL AS DOUBLE) AS avg_ms_from_prev FROM v
        |  UNION ALL
        |  SELECT '2_click', count(*), round(avg(click_ms - view_ms), 2) FROM c
        |  UNION ALL
        |  SELECT '3_purchase', count(*), round(avg(purchase_ms - click_ms), 2) FROM p)
        |SELECT stage, n_users,
        |  round(n_users::DOUBLE / head_users, 6) AS conv_pct, avg_ms_from_prev
        |FROM stages, hd ORDER BY stage""".stripMargin,

    // cohort retention triangle on integer epoch weeks (tsm // week —
    // exact int64 both engines, see Relational.q78CohortRetention)
    "q78_cohort_retention" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT e.user_id, f.cohort_week, e.week - f.cohort_week AS week_offset
        |  FROM e JOIN f ON e.user_id = f.user_id),
        |act AS (SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
        |  FROM a GROUP BY cohort_week, week_offset),
        |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week)
        |SELECT act.cohort_week, act.week_offset, act.n_active, sz.cohort_size,
        |  round(act.n_active::DOUBLE / sz.cohort_size, 6) AS retention_pct
        |FROM act JOIN sz ON act.cohort_week = sz.cohort_week
        |ORDER BY act.cohort_week, act.week_offset""".stripMargin,
    // equi-width histogram on exact integer cents (the q42 cents
    // convention): bucket = cents // width, no float boundary
    "q82_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 1000000 AS bucket
        |  FROM lineitem),
        |b AS (SELECT bucket, count(*) AS n_lines FROM c GROUP BY bucket),
        |t AS (SELECT sum(n_lines) AS total FROM b)
        |SELECT bucket, bucket * 10000 AS lo_dollars,
        |  (bucket + 1) * 10000 AS hi_dollars, n_lines,
        |  round(n_lines::DOUBLE / total, 6) AS pct
        |FROM b, t ORDER BY bucket""".stripMargin,
    // first-order resample: the same union-spine + two window fills,
    // with the lerp as the identical expression tree (int64 time
    // deltas cast to double, one correctly-rounded division)
    "q84_lerp_resample" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tsm, value FROM events),
        |b AS (SELECT user_id, min(tsm) AS lo, max(tsm) AS hi FROM e GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(
        |    ((lo + 21599999) // 21600000) * 21600000,
        |    (hi // 21600000) * 21600000, 21600000)) AS t FROM b),
        |u AS (
        |  SELECT user_id, tsm AS ord_ts, 0 AS is_grid, event_id AS ord_id,
        |    tsm AS ev_ts, value AS ev_v, NULL::BIGINT AS t FROM e
        |  UNION ALL
        |  SELECT user_id, t, 1, NULL, NULL, NULL, t FROM grid),
        |w AS (SELECT *,
        |  last_value(ev_ts IGNORE NULLS) OVER wb AS t0,
        |  last_value(ev_v IGNORE NULLS) OVER wb AS v0,
        |  first_value(ev_ts IGNORE NULLS) OVER wf AS t1,
        |  first_value(ev_v IGNORE NULLS) OVER wf AS v1
        |  FROM u WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY ord_ts, is_grid, ord_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY ord_ts, is_grid, ord_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, t AS grid_ms,
        |  round(v0 + (v1 - v0) *
        |    (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)), 6) AS value
        |FROM w
        |WHERE is_grid = 1 AND t0 IS NOT NULL AND t1 IS NOT NULL
        |ORDER BY user_id, grid_ms""".stripMargin,

    // co-occurring supplier pairs per order: the oracle uses the
    // relational self-join form the array expansion is equivalent to
    // (distinct suppliers per order, s1 < s2, counted once per order)
    "q83_cooccurrence" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |p AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |      FROM li a JOIN li b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey)
        |SELECT s1, s2, count(*) AS n_orders FROM p GROUP BY s1, s2
        |ORDER BY n_orders DESC, s1, s2 LIMIT 20""".stripMargin,

    // rank distribution: the (value, event_id) tie order makes every
    // ntile boundary deterministic in both engines
    "q96_rank_distribution" ->
      """SELECT event_id, event_type, value,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdf,
        |  CAST(ntile(10) OVER w AS INT) AS decile
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, value, event_id""".stripMargin,

    "q108_attribution_credit" ->
      """WITH e AS (SELECT event_type, user_id, event_id, epoch_ms(ts) AS tsm FROM events),
        |imp AS (SELECT user_id, event_id AS imp_id, tsm AS imp_ts
        |  FROM e WHERE event_type = 'view'),
        |conv AS (SELECT user_id, event_id AS conv_id, tsm AS conv_ts
        |  FROM e WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT conv_id, imp_id, imp_ts FROM imp JOIN conv USING (user_id)
        |  WHERE conv_ts > imp_ts AND conv_ts <= imp_ts + 14400000),
        |w AS (
        |  SELECT conv_id, imp_id,
        |    count(*) OVER (PARTITION BY conv_id) AS n_imps,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY imp_ts, imp_id) AS rk
        |  FROM pairs)
        |SELECT conv_id, imp_id, n_imps,
        |  rk = 1 AS is_first, rk = n_imps AS is_last,
        |  CAST(1000000 // n_imps +
        |    CASE WHEN rk = 1 THEN 1000000 % n_imps ELSE 0 END AS BIGINT) AS credit_e6
        |FROM w ORDER BY conv_id, imp_id""".stripMargin,

    "q105_autocorrelation" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |    lag(value, 1) OVER w AS l1,
        |    lag(value, 2) OVER w AS l2,
        |    lag(value, 3) OVER w AS l3
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id)),
        |p AS (
        |  SELECT event_type,
        |    count(l1) AS n1, round(corr(value, l1), 6) AS a1,
        |    count(l2) AS n2, round(corr(value, l2), 6) AS a2,
        |    count(l3) AS n3, round(corr(value, l3), 6) AS a3
        |  FROM s GROUP BY event_type)
        |SELECT event_type, CAST(1 AS INT) AS lag, n1 AS n_pairs, a1 AS acf FROM p
        |UNION ALL
        |SELECT event_type, CAST(2 AS INT), n2, a2 FROM p
        |UNION ALL
        |SELECT event_type, CAST(3 AS INT), n3, a3 FROM p
        |ORDER BY event_type, lag""".stripMargin,

    // EWMA: the same left fold over the same ordered doubles — the
    // α literals MUST cast to DOUBLE (bare 0.25/0.75 are DECIMAL in
    // DuckDB and the fold then truncates scale)
    "q95_ewma" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             epoch_ms(ts) AS tsm FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  round(list_reduce(list(CAST(value AS DOUBLE) ORDER BY tsm, event_id),
        |    (a, b) -> CAST(0.25 AS DOUBLE) * b + CAST(0.75 AS DOUBLE) * a),
        |    6) AS ewma
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    // single-scan profile: one row per column; numeric min/max as
    // doubles, non-numeric NULL (formatting-independent)
    "q94_profile" -> {
      def row(c: String, numeric: Boolean) = {
        val mm =
          if (numeric) s"CAST(min($c) AS DOUBLE) AS min_num, " +
            s"CAST(max($c) AS DOUBLE) AS max_num"
          else "NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct, $mm
           |FROM e""".stripMargin
      }
      val rows = Seq("event_id" -> true, "user_id" -> true,
        "event_type" -> false, "value" -> true, "tsm" -> true,
        "props" -> false)
        .map { case (c, n) => row(c, n) }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
         |  epoch_ms(ts) AS tsm, props FROM events)
         |SELECT col_name, n_rows, n_nulls, n_distinct,
         |  min_num AS min_num, max_num AS max_num FROM (
         |$rows
         |) ORDER BY col_name""".stripMargin
    },

    // association rules: all three count relations from the one
    // distinct (order, supplier) CTE; rank and cut on ROUNDED lift
    "q93_association_rules" ->
      """WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |t AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
        |      FROM os),
        |singles AS (SELECT l_suppkey, count(*) AS c FROM os GROUP BY 1),
        |p AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS n
        |      FROM os a JOIN os b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |      GROUP BY 1, 2)
        |SELECT p.s1, p.s2, p.n AS n_joint,
        |  round(p.n / t.n_orders, 6) AS support,
        |  round(CAST(p.n AS DOUBLE) / c1.c, 6) AS conf_s1_s2,
        |  round(CAST(p.n AS DOUBLE) / c2.c, 6) AS conf_s2_s1,
        |  round(p.n * t.n_orders / (c1.c * c2.c), 6) AS lift
        |FROM p JOIN singles c1 ON p.s1 = c1.l_suppkey
        |  JOIN singles c2 ON p.s2 = c2.l_suppkey, t
        |ORDER BY lift DESC, p.s1, p.s2 LIMIT 20""".stripMargin,

    // strong-tie triangles: the oracle enumerates each triangle once
    // by id order (a < b < c); the engine's degree-oriented
    // enumeration finds the same set, so participation counts match
    "q88_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |p AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS n
        |      FROM li a JOIN li b
        |      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |      GROUP BY 1, 2),
        |t AS (SELECT round(avg(n) + 2 * stddev_samp(n), 6) AS thr FROM p),
        |e AS (SELECT s1, s2 FROM p, t WHERE n > thr),
        |tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |        FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
        |        JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
        |m AS (SELECT a AS s FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |SELECT s AS s_suppkey, count(*) AS n_triangles
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // robust outliers: medians via the SHARED explicit interpolation
    // tree (the q42 discipline — see Relational.q89RobustOutliers);
    // 4.4478 is one decimal literal in both engines
    "q89_robust_outliers" -> {
      def med(vs: String, n: String) = {
        val h = s"(CAST($n - 1 AS DOUBLE) * CAST(0.5 AS DOUBLE))"
        s"""($vs[CAST(floor($h) AS INT) + 1]
           |  + ($vs[least(CAST(floor($h) AS INT) + 2, CAST($n AS INT))]
           |     - $vs[CAST(floor($h) AS INT) + 1]) * ($h - floor($h)))"""
          .stripMargin.replaceAll("\n\\s*", " ")
      }
      s"""WITH e AS (SELECT event_type, value FROM events),
         |g AS (SELECT event_type, count(*) AS n, list_sort(list(value)) AS vs
         |      FROM e GROUP BY 1),
         |m AS (SELECT event_type, n, ${med("vs", "n")} AS med FROM g),
         |d AS (SELECT e.event_type, e.value, m.med, m.n
         |      FROM e JOIN m USING (event_type)),
         |g2 AS (SELECT event_type, count(*) AS n2,
         |       list_sort(list(abs(value - med))) AS vs FROM d GROUP BY 1),
         |s AS (SELECT event_type, ${med("vs", "n2")} AS mad FROM g2)
         |SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n_events,
         |  round(max(d.med), 6) AS med, round(max(s.mad), 6) AS mad,
         |  CAST(sum(CASE WHEN round(abs(d.value - d.med), 6) >
         |    round(CAST(4.4478 AS DOUBLE) * s.mad, 6) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM d JOIN s USING (event_type)
         |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin
    },

    // Markov transitions: lag over (tsm, event_id) — the unique event
    // id breaks timestamp ties identically in both engines
    "q90_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_ms(ts) AS tsm FROM events),
        |pairs AS (SELECT event_type AS dst,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tsm, event_id) AS src
        |  FROM e),
        |c AS (SELECT src, dst, count(*) AS n FROM pairs
        |      WHERE src IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
        |FROM c ORDER BY src, dst""".stripMargin,

    // TWAP: trapezoid between lag pairs / observed span; single-event
    // users and zero spans carry no interval and are excluded
    "q92_twap" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             epoch_ms(ts) AS tsm FROM events),
        |l AS (SELECT user_id, value, tsm,
        |    lag(value) OVER w AS pv, lag(tsm) OVER w AS pt
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        |g AS (SELECT user_id, count(*) AS n_events,
        |    sum(CASE WHEN pt IS NOT NULL
        |        THEN (value + pv) / 2 * (tsm - pt) ELSE 0 END) AS area,
        |    max(tsm) - min(tsm) AS span
        |  FROM l GROUP BY 1)
        |SELECT user_id, n_events, round(area / span, 6) AS twap
        |FROM g WHERE span > 0 ORDER BY user_id""".stripMargin,
  ) ++ graft.operators.Pipeline.Sql.all ++ Map(
    "q32_command_router" -> graft.operators.Router.oracleSql,
    "q33_multimodal_stats" -> graft.operators.Multimodal.oracleSql,
    "q62_audio_stats" -> graft.operators.Multimodal.audioOracleSql,
    "q63_video_stats" -> graft.operators.Multimodal.videoOracleSql,
    "q69_video_thumbnails" -> graft.operators.Multimodal.videoThumbsOracleSql,
    "q97_image_dedup" -> graft.operators.Multimodal.imageDedupOracleSql,
    "q98_audio_dedup" -> graft.operators.Multimodal.audioDedupOracleSql,
    "q99_video_dedup" -> graft.operators.Multimodal.videoDedupOracleSql,
    "q37_asof_join" -> graft.operators.Joins.q37Sql,
    "q38_range_join" -> graft.operators.Joins.q38Sql,
    "q39_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | count(*) AS n_lines,
        | grouping(l_returnflag) AS g_flag,
        | grouping(l_linestatus) AS g_status
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    // Explicit shared interpolation arithmetic (see
    // Relational.q42Percentiles): the same h/lo/frac expression tree
    // over the same sorted integer-cents list — bit-equal doubles in
    // both engines, so the final rounding agrees by construction.
    "q42_percentiles" -> {
      // the fraction MUST be cast: a bare 0.9 literal is DECIMAL in
      // DuckDB and the whole h/frac computation then runs in exact
      // decimal arithmetic, diverging from Spark's doubles by far more
      // than an ulp (h = 9·0.9 is exactly 8.1 in decimal but
      // 8.100000000000001 in binary — frac differs in the 13th digit
      // and one-cent flips return)
      def q(f: String, name: String) = {
        val h = s"(CAST(n_lines - 1 AS DOUBLE) * CAST($f AS DOUBLE))"
        s"""round((vs[CAST(floor($h) AS INT) + 1]
           |  + (vs[least(CAST(floor($h) AS INT) + 2, CAST(n_lines AS INT))]
           |     - vs[CAST(floor($h) AS INT) + 1])
           |    * ($h - floor($h))) / 100, 2) AS $name"""
          .stripMargin.replaceAll("\n\\s*", " ")
      }
      s"""WITH g AS (
         |  SELECT l_returnflag, count(*) AS n_lines,
         |    list_sort(list(round(l_extendedprice * 100))) AS vs
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n_lines,
         |  ${q("0.5", "p50")},
         |  ${q("0.9", "p90")},
         |  ${q("0.99", "p99")}
         |FROM g ORDER BY l_returnflag""".stripMargin
    },
    "q45_unpivot" ->
      """WITH m AS (
        |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part)
        |SELECT measure, count(*) AS n,
        |  round(avg(value), 2) AS avg_value,
        |  round(max(value), 2) AS max_value
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,
    "q44_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_bucket ORDER BY user_bucket""".stripMargin,
    // RANGE frame bounds: Spark rangeBetween(-30*86400+1, 0) ==
    // RANGE 2591999 PRECEDING AND CURRENT ROW (both ends inclusive).
    "q43_rolling_window" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(o_totalprice) OVER w, 2) AS trailing_30d_spend,
        |  count(*) OVER w AS n_orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |  RANGE BETWEEN 2591999 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
