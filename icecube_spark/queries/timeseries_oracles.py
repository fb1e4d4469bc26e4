"""DuckDB oracle SQL for SURVEY §2 group C (twin of timeseries_queries.py)."""

from icecube_spark.functions.parity import sql_dsum, sql_qsum

ORACLES: dict[str, str] = {
    "asof_join": """
        SELECT event_id, ts, user_id, o_orderkey, o_orderdate, o_totalprice
        FROM (
            SELECT e.event_id, e.ts, e.user_id,
                   o.o_orderkey, o.o_orderdate, o.o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) WHERE rn = 1
    """,
    "asof_join_forward": """
        SELECT event_id, ts, user_id, o_orderkey, o_orderdate, o_totalprice
        FROM (
            SELECT e.event_id, e.ts, e.user_id,
                   o.o_orderkey, o.o_orderdate, o.o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        ) WHERE rn = 1
    """,
    "asof_join_nearest": """
        SELECT event_id, ts, user_id, o_orderkey, o_orderdate, o_totalprice
        FROM (
            SELECT e.event_id, e.ts, e.user_id,
                   o.o_orderkey, o.o_orderdate, o.o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) ASC,
                                (o.o_orderdate <= e.ts) DESC,
                                o.o_orderkey DESC
                   ) AS rn
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id
             AND abs(epoch_us(o.o_orderdate) - epoch_us(e.ts))
                 <= CAST(604800000000 AS BIGINT)
        ) WHERE rn = 1
    """,
    "sessionize": f"""
        WITH flagged AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessions AS (
            SELECT *, CAST(SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
            ) AS INT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               {sql_dsum('value')} AS sum_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "window_tumbling": f"""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "rolling_daily_revenue": f"""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
                   {sql_dsum('o_totalprice')} AS revenue,
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
            FROM orders GROUP BY 1, 3
        )
        SELECT day, revenue,
               CAST(SUM(CAST(revenue AS DECIMAL(18,8))) OVER w AS DOUBLE)
                   / COUNT(revenue) OVER w AS rolling_avg_7d,
               COUNT(revenue) OVER w AS n_days_in_window
        FROM daily
        WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
}

ORACLES.update({
    "range_join_clicks": """
        WITH errors AS (
            SELECT event_id AS error_id, user_id, ts AS t0,
                   ts + INTERVAL 1 HOUR AS t1
            FROM events WHERE event_type = 'error'),
        clicks AS (
            SELECT user_id, ts AS click_ts FROM events
            WHERE event_type = 'click'),
        counts AS (
            SELECT e.error_id, COUNT(*) AS n
            FROM errors e JOIN clicks c
              ON e.user_id = c.user_id
             AND c.click_ts > e.t0 AND c.click_ts <= e.t1
            GROUP BY e.error_id)
        SELECT e.error_id, e.user_id, e.t0 AS error_ts,
               COALESCE(counts.n, 0) AS n_clicks_next_hour
        FROM errors e LEFT JOIN counts USING (error_id)
        ORDER BY error_id
    """,
    "ohlc_bars": f"""
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
               (min(struct_pack(t := ts, v := value))).v AS open,
               max(value) AS high,
               min(value) AS low,
               (max(struct_pack(t := ts, v := value))).v AS close,
               {sql_dsum('value')} AS volume,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "gap_stats": """
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
            FROM events)
        SELECT user_id, COUNT(*) AS n_gaps,
               SUM(gap_us) / COUNT(*) / 1e6 AS mean_gap_s,
               MAX(gap_us) / 1e6 AS max_gap_s
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    "anomaly_zscore": f"""
        WITH stats AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events GROUP BY 1),
        ms AS (
            SELECT event_type, s1 / n AS mean,
                   sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
            FROM stats)
        SELECT event_id, e.event_type, value, mean, std,
               (value - mean) / std AS zscore
        FROM events e JOIN ms ON e.event_type = ms.event_type
        WHERE abs((value - mean) / std) > 3.0
        ORDER BY event_id
    """,
    "time_weighted_avg": """
        WITH g AS (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
                   value,
                   epoch_us(lead(ts) OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
            FROM events)
        SELECT user_id, bucket,
               COUNT(*) AS n_events,
               COUNT(gap_us) AS n_gaps,
               SUM(CAST(floor(value * gap_us) AS BIGINT))
                   / SUM(gap_us) AS twa
        FROM g GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "trend_slope": f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   CAST(floor(({sql_dsum('value')} / COUNT(*)) * 1000000)
                        AS BIGINT) AS yq
            FROM events GROUP BY event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))),
        m AS (
            SELECT event_type, COUNT(*) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(yq) AS BIGINT) AS syq,
                   CAST(SUM(x * yq) AS BIGINT) AS sxyq
            FROM daily GROUP BY 1),
        s AS (
            SELECT event_type, n_days, sx, syq,
                   CAST(n_days * sxyq - sx * syq AS DOUBLE)
                       / CAST(n_days * sxx - sx * sx AS DOUBLE) / 1e6 AS slope
            FROM m)
        SELECT event_type, n_days, slope,
               (CAST(syq AS DOUBLE) / 1e6 - slope * sx) / n_days AS intercept
        FROM s ORDER BY event_type
    """,
    "hypertable_rollup": f"""
        SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value,
               CAST(GROUPING(date_trunc('month', ts)) * 4
                    + GROUPING(date_trunc('day', ts)) * 2
                    + GROUPING(date_trunc('hour', ts)) AS BIGINT) AS level
        FROM events
        GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts),
                         date_trunc('hour', ts))
    """,
})

ORACLES.update({
    "cohort_retention": """
        WITH active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events),
        cohorts AS (
            SELECT *, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
            FROM active)
        SELECT cohort_day,
               date_diff('day', cohort_day, day) AS day_offset,
               COUNT(*) AS n_users
        FROM cohorts GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "funnel_conversion": """
        WITH u1 AS (
            SELECT user_id, ts, event_type,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)
                       OVER (PARTITION BY user_id) AS t1
            FROM events),
        u2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM u1),
        u3 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t3
            FROM u2),
        per_user AS (SELECT DISTINCT user_id, t1, t2, t3 FROM u3)
        SELECT COUNT(*) AS n_users,
               COUNT(t1) AS n_step1, COUNT(t2) AS n_step2,
               COUNT(t3) AS n_step3,
               CAST(COUNT(t2) AS DOUBLE) / COUNT(t1) AS rate_step2,
               CAST(COUNT(t3) AS DOUBLE) / COUNT(t2) AS rate_step3
        FROM per_user
    """,
    "value_percentiles": """
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events)
        SELECT event_type, MAX(n) AS n,
               MAX(CASE WHEN rn = CEIL(CAST(0.5 AS DOUBLE) * n) THEN value END) AS p50,
               MAX(CASE WHEN rn = CEIL(CAST(0.9 AS DOUBLE) * n) THEN value END) AS p90,
               MAX(CASE WHEN rn = CEIL(CAST(0.99 AS DOUBLE) * n) THEN value END) AS p99
        FROM ranked GROUP BY event_type ORDER BY event_type
    """,
})

ORACLES["calendar_lag_features"] = f"""
    WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS daily_value
        FROM events GROUP BY 1, 2)
    SELECT user_id, day_num, n_events, daily_value,
           MAX(daily_value) OVER (PARTITION BY user_id ORDER BY day_num
               RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS lag_1d,
           MAX(daily_value) OVER (PARTITION BY user_id ORDER BY day_num
               RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag_7d
    FROM daily ORDER BY user_id, day_num
"""

ORACLES["running_total"] = """
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS INT) AS seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, seq
"""

ORACLES["event_transitions"] = """
    WITH steps AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_type,
               event_type AS to_type
        FROM events),
    counts AS (
        SELECT from_type, to_type, COUNT(*) AS n_steps
        FROM steps WHERE from_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n_steps,
           CAST(n_steps AS DOUBLE) /
           CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS DOUBLE)
               AS p_transition
    FROM counts ORDER BY from_type, to_type
"""

ORACLES["rolling_active_users"] = """
    WITH daily AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    dau AS (
        SELECT day, COUNT(*) AS dau FROM daily GROUP BY 1),
    trail AS (
        SELECT g.day, g.dau, COUNT(DISTINCT d.user_id) AS trailing_active
        FROM dau g JOIN daily d
          ON d.day <= g.day AND d.day > g.day - INTERVAL 7 DAY
        GROUP BY 1, 2)
    SELECT day, dau, trailing_active,
           CAST(dau AS DOUBLE) / CAST(trailing_active AS DOUBLE) AS stickiness
    FROM trail ORDER BY day
"""

ORACLES["conversion_lag"] = """
    WITH ff AS (
        SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS from_us
        FROM events WHERE event_type = 'signup' GROUP BY 1),
    conv AS (
        SELECT e.user_id, ff.from_us,
               MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS first_us
        FROM events e JOIN ff ON e.user_id = ff.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= ff.from_us
        GROUP BY 1, 2),
    lags AS (
        SELECT user_id, first_us - from_us AS lag_us
        FROM conv),
    ranked AS (
        SELECT lag_us, user_id,
               ROW_NUMBER() OVER (ORDER BY lag_us, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM lags)
    SELECT COUNT(*) AS n_converted,
           MIN(lag_us) AS min_lag_us,
           MAX(CASE WHEN rn = CEIL(CAST(0.5 AS DOUBLE) * n) THEN lag_us END)
               AS p50_lag_us,
           MAX(CASE WHEN rn = CEIL(CAST(0.9 AS DOUBLE) * n) THEN lag_us END)
               AS p90_lag_us,
           MAX(lag_us) AS max_lag_us
    FROM ranked
"""

ORACLES["activity_heatmap"] = """
    WITH counts AS (
        SELECT event_type,
               CAST(isodow(ts) - 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hour,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2, 3)
    SELECT event_type, dow, hour, n,
           CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
               AS share_of_type
    FROM counts ORDER BY event_type, dow, hour
"""

ORACLES["coverage_report"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
        FROM events),
    g AS (
        SELECT user_id, day_num,
               day_num - LAG(day_num) OVER (PARTITION BY user_id
                                            ORDER BY day_num) - 1 AS gap_days
        FROM days)
    SELECT user_id,
           COUNT(*) AS n_active_days,
           MAX(day_num) - MIN(day_num) + 1 AS span_days,
           CAST(COALESCE(MAX(gap_days), 0) AS BIGINT) AS max_gap_days,
           CAST(COUNT(*) AS DOUBLE) /
           CAST(MAX(day_num) - MIN(day_num) + 1 AS DOUBLE) AS completeness
    FROM g GROUP BY user_id ORDER BY user_id
"""

ORACLES["rapid_repeat_events"] = """
    WITH flagged AS (
        SELECT user_id, event_type,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - epoch_us(CAST(LAG(ts) OVER (
                            PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS TIMESTAMP))
                      < 60000000
                    THEN 1 ELSE 0 END AS is_rapid
        FROM events),
    per_type AS (
        SELECT user_id, event_type, COUNT(*) AS n,
               CAST(SUM(is_rapid) AS BIGINT) AS n_rapid
        FROM flagged GROUP BY 1, 2),
    per_user AS (
        SELECT user_id,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(n_rapid) AS BIGINT) AS n_rapid
        FROM per_type GROUP BY 1)
    SELECT user_id, n_events, n_rapid,
           CAST(n_rapid AS DOUBLE) / CAST(n_events AS DOUBLE) AS rapid_ratio
    FROM per_user WHERE n_rapid > 0 ORDER BY user_id
"""

ORACLES["props_extract"] = """
    WITH parsed AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events)
    SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_parsed,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE)
               AS avg_k,
           MIN(k) AS min_k, MAX(k) AS max_k,
           COUNT(DISTINCT k) AS n_distinct_k
    FROM parsed GROUP BY event_type ORDER BY event_type
"""

ORACLES["value_histogram"] = """
    WITH counts AS (
        SELECT event_type,
               CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT event_type, bucket, bucket * 50.0 AS bucket_low, n,
           CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
    FROM counts ORDER BY event_type, bucket
"""

ORACLES["scd2_intervals"] = """
    WITH runs AS (
        SELECT user_id, event_type AS state,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_state
        FROM events),
    starts AS (
        SELECT user_id, state, ts_us FROM runs
        WHERE prev_state IS NULL OR prev_state != state)
    SELECT user_id, state,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
               AS valid_to_us
    FROM starts ORDER BY user_id, valid_from_us
"""

ORACLES["purchase_attribution"] = """
    WITH carried AS (
        SELECT event_type,
               LAST_VALUE(CASE WHEN event_type != 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS channel
        FROM events),
    conv AS (
        SELECT COALESCE(channel, 'none') AS channel,
               COUNT(*) AS n_conversions
        FROM carried WHERE event_type = 'purchase' GROUP BY 1)
    SELECT channel, n_conversions,
           CAST(n_conversions AS DOUBLE) /
           CAST(SUM(n_conversions) OVER () AS DOUBLE) AS share
    FROM conv ORDER BY channel
"""


def _ewma_terms(span: int = 10) -> tuple[str, str]:
    num, den = [], []
    for k in range(span):
        w = 1 << (span - 1 - k)
        num.append(f"COALESCE(lag(q, {k}) OVER w * {w}, 0)")
        den.append(f"CASE WHEN lag(q, {k}) OVER w IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_terms()

ORACLES.update(
    {
        "ewma_smooth": f"""
            WITH daily AS (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
                       {sql_dsum('value')} / COUNT(value) AS day_mean
                FROM events GROUP BY 1, 2
            ), q AS (
                SELECT *, CAST(floor(day_mean * 1000000.0) AS BIGINT) AS q
                FROM daily
            )
            SELECT event_type, day, day_mean,
                   CAST({_EWMA_NUM} AS DOUBLE)
                     / CAST({_EWMA_DEN} AS DOUBLE) / 1000000.0 AS ewma
            FROM q
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        """,
        "event_paths": """
            WITH firsts AS (
                SELECT user_id AS k, event_type AS t,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events
            ), p AS (
                SELECT k, string_agg(t, '>' ORDER BY rn) AS path
                FROM firsts WHERE rn <= 3 GROUP BY k
            ), c AS (
                SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
            )
            SELECT path, n_users, rank FROM (
                SELECT path, n_users,
                       ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS rank
                FROM c
            ) WHERE rank <= 20
        """,
        "interval_coverage": """
            WITH base AS (
                SELECT user_id AS k, CAST(ts AS DATE) AS day,
                       epoch_us(ts) AS s_us,
                       epoch_us(ts) + 300000000 AS e_us
                FROM events
            ), flagged AS (
                SELECT *,
                       CASE WHEN COALESCE(max(e_us) OVER (
                                PARTITION BY k, day ORDER BY s_us, e_us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                            ), -1) < s_us THEN 1 ELSE 0 END AS new_island
                FROM base
            ), isl AS (
                SELECT *,
                       SUM(new_island) OVER (
                           PARTITION BY k, day ORDER BY s_us, e_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS island
                FROM flagged
            ), agg AS (
                SELECT k, day, island,
                       min(s_us) AS i_start, max(e_us) AS i_end,
                       COUNT(*) AS n_ev
                FROM isl GROUP BY 1, 2, 3
            )
            SELECT k AS user_id,
                   CAST(day AS TIMESTAMP) AS day,
                   CAST(CAST(SUM(i_end - i_start) AS BIGINT) AS DOUBLE)
                       / 1000000.0 AS covered_s,
                   COUNT(*) AS n_islands,
                   CAST(SUM(n_ev) AS BIGINT) AS n_events
            FROM agg GROUP BY 1, 2
        """,
        "changepoint_cusum": """
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
                FROM events GROUP BY 1, 2
            ), scored AS (
                SELECT event_type, day,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type ORDER BY day) AS d,
                       CAST(SUM(c) OVER (
                           PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS cum,
                       CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                           AS total,
                       COUNT(*) OVER (PARTITION BY event_type) AS n_days
                FROM daily
            ), s AS (
                SELECT event_type, day,
                       n_days * cum - d * total AS s,
                       n_days, total
                FROM scored
            )
            SELECT event_type,
                   CAST(day AS TIMESTAMP) AS change_day,
                   s AS cusum_scaled,
                   n_days,
                   total AS total_events
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY event_type ORDER BY abs(s) DESC, day) AS rn
                FROM s
            ) WHERE rn = 1
        """,
    }
)


ORACLES["downsample_lttb"] = """
    WITH base AS (
        SELECT event_type AS t,
               epoch_us(ts) // 1000000 AS ts_s,
               ts,
               CAST(FLOOR(value * 1000) AS BIGINT) AS q,
               value AS v,
               event_id AS tb
        FROM events),
    pts AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY t ORDER BY ts_s, tb) - 1
                      AS rn
        FROM base),
    pb AS (SELECT *, rn // 20 AS bucket FROM pts),
    anchors AS (
        SELECT t, bucket,
               CAST(SUM(ts_s) AS BIGINT) // COUNT(*) AS a_t,
               CAST(SUM(q) AS BIGINT) // COUNT(*) AS a_q,
               COUNT(*) AS n_points
        FROM pb GROUP BY 1, 2),
    neigh AS (
        SELECT t, bucket, n_points,
               lag(a_t) OVER w AS prev_t, lag(a_q) OVER w AS prev_q,
               lead(a_t) OVER w AS next_t, lead(a_q) OVER w AS next_q
        FROM anchors WINDOW w AS (PARTITION BY t ORDER BY bucket)),
    scored AS (
        SELECT pb.t, pb.bucket, pb.rn, pb.ts, pb.v, n.n_points,
               abs((n.prev_t - n.next_t) * (pb.q - n.prev_q)
                   - (n.prev_t - pb.ts_s) * (n.next_q - n.prev_q)) AS area2
        FROM pb JOIN neigh n ON pb.t = n.t AND pb.bucket = n.bucket)
    SELECT t AS event_type, bucket, n_points, ts, v,
           COALESCE(area2, -1) AS area2
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY t, bucket
            ORDER BY COALESCE(area2, -1) DESC, rn ASC) AS r
        FROM scored)
    WHERE r = 1
"""


ORACLES["seasonal_dow"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        FROM events GROUP BY 1, 2),
    ma AS (
        SELECT event_type, day, c,
               CAST(SUM(c) OVER w AS BIGINT) AS sum7,
               COUNT(*) OVER w AS n_win
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    detr AS (
        SELECT *, 7 * c - sum7 AS resid7 FROM ma WHERE n_win = 7)
    SELECT event_type, dayofweek(day) + 1 AS dow, COUNT(*) AS n_days,
           CAST(CAST(SUM(resid7) AS BIGINT) AS DOUBLE)
               / (7.0 * CAST(COUNT(*) AS DOUBLE)) AS seasonal
    FROM detr GROUP BY 1, 2
"""


_FP_TYPES = ["click", "error", "purchase", "signup", "view"]
_FP_COLS = ",\n           ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t},\n           "
    f"CAST(SUM(CASE WHEN event_type = '{t}'"
    f" THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE) AS sum_{t}"
    for t in _FP_TYPES
)

ORACLES["feature_pivot"] = f"""
    SELECT user_id,
           {_FP_COLS}
    FROM events GROUP BY user_id ORDER BY user_id
"""


ORACLES["cdc_merge"] = """
    WITH changes AS (
        SELECT (event_id % 30000) + 1 AS k,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value * 100 AS new_v,
               ts, event_id
        FROM events),
    latest AS (
        SELECT k, op, new_v FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY k ORDER BY ts DESC, event_id DESC) AS rn
            FROM changes)
        WHERE rn = 1),
    joined AS (
        SELECT COALESCE(o.o_orderkey, l.k) AS o_orderkey,
               CASE WHEN l.op = 'U' THEN l.new_v
                    ELSE o.o_totalprice END AS o_totalprice,
               CASE WHEN l.op IS NULL THEN 'unchanged'
                    WHEN l.op = 'D' THEN 'deleted'
                    WHEN o.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'updated' END AS row_status
        FROM orders o FULL OUTER JOIN latest l ON o.o_orderkey = l.k)
    SELECT * FROM joined WHERE row_status != 'deleted'
    ORDER BY o_orderkey
"""

ORACLES.update({
    "acf_daily_value": f"""
        WITH daily AS (
            SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
                   CAST(FLOOR({sql_dsum('value')} * 1000000.0) AS BIGINT) AS qx
            FROM events GROUP BY 1
        ),
        lags AS (SELECT UNNEST(range(1, 8)) AS lag),
        pairs AS (
            SELECT l.lag, d.qx AS qx, p.qx AS qy
            FROM daily d CROSS JOIN lags l
            JOIN daily p ON d.i - l.lag = p.i
        ),
        mom AS (
            SELECT lag,
                   COUNT(*) AS n,
                   SUM(qx) AS isx, SUM(qy) AS isy,
                   SUM(CAST(qx AS HUGEINT) * qy) AS isxy,
                   SUM(CAST(qx AS HUGEINT) * qx) AS isxx,
                   SUM(CAST(qy AS HUGEINT) * qy) AS isyy
            FROM pairs GROUP BY lag
        )
        SELECT CAST(lag AS INT) AS lag,
               n AS n_pairs,
               (CAST(n AS DOUBLE) * (CAST(isxy AS DOUBLE) / 1000000000000.0)
                  - (CAST(isx AS DOUBLE) / 1000000.0)
                    * (CAST(isy AS DOUBLE) / 1000000.0))
               / SQRT(
                   (CAST(n AS DOUBLE) * (CAST(isxx AS DOUBLE) / 1000000000000.0)
                      - (CAST(isx AS DOUBLE) / 1000000.0)
                        * (CAST(isx AS DOUBLE) / 1000000.0))
                   * (CAST(n AS DOUBLE) * (CAST(isyy AS DOUBLE) / 1000000000000.0)
                      - (CAST(isy AS DOUBLE) / 1000000.0)
                        * (CAST(isy AS DOUBLE) / 1000000.0))
               ) AS acf
        FROM mom
    """,
    "burst_detection": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour_start,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT *,
                   CAST(SUM(n_events) OVER (PARTITION BY user_id) AS DOUBLE)
                     / CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE)
                     AS mean_hourly
            FROM hourly
        )
        SELECT user_id, hour_start, n_events, mean_hourly,
               CAST(n_events AS DOUBLE) / mean_hourly AS burst_ratio
        FROM m
        WHERE n_events >= 3
          AND CAST(n_events AS DOUBLE) >= 2.0 * mean_hourly
    """,
    "seasonal_decompose": f"""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
                   {sql_qsum('o_totalprice')} AS value
            FROM orders GROUP BY 1
        ),
        q AS (
            SELECT day, value,
                   CAST(FLOOR(value * 1000000.0) AS BIGINT) AS qv
            FROM daily
        ),
        t AS (
            SELECT day, value, qv,
                   COUNT(*) OVER w AS win_n,
                   SUM(qv) OVER w AS sqv
            FROM q
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        tr AS (
            SELECT day, value,
                   CASE WHEN win_n = 7
                        THEN CAST(sqv AS DOUBLE) / 7.0 / 1000000.0 END AS trend
            FROM t
        ),
        dt AS (
            SELECT *,
                   CAST(FLOOR((value - trend) * 1000000.0) AS BIGINT) AS qd,
                   dayofweek(day) + 1 AS dow
            FROM tr
        ),
        seas AS (
            SELECT dow,
                   CAST(SUM(qd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                     / 1000000.0 AS seasonal
            FROM dt WHERE trend IS NOT NULL GROUP BY dow
        )
        SELECT d.day, d.value, d.trend, s.seasonal,
               d.value - d.trend - s.seasonal AS residual
        FROM dt d LEFT JOIN seas s ON d.dow = s.dow
    """,
})

ORACLES.update({
    "order_backlog": """
        WITH opened AS (
            SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS opened
            FROM orders GROUP BY 1
        ),
        done AS (
            SELECT done_day AS day, COUNT(*) AS completed FROM (
                SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS done_day
                FROM lineitem GROUP BY 1
            ) GROUP BY 1
        ),
        daily AS (
            SELECT COALESCE(o.day, d.day) AS day,
                   COALESCE(opened, 0) AS opened,
                   COALESCE(completed, 0) AS completed
            FROM opened o FULL JOIN done d ON o.day = d.day
        )
        SELECT CAST(day AS TIMESTAMP) AS day, opened, completed,
               CAST(SUM(opened - completed) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS backlog
        FROM daily
    """,
})

ORACLES.update({
    "m4_downsample": """
        WITH span AS (
            SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
                   MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
            FROM events
        ),
        base AS (
            SELECT event_type, event_id, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events
        ),
        b AS (
            SELECT event_type, event_id, value, ts_us,
                   CAST(LEAST(99, FLOOR((ts_us - t0) * 100 / (t1 - t0 + 1)))
                        AS INT) AS bucket
            FROM base, span
        )
        SELECT event_type, bucket,
               COUNT(*) AS n_points,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               struct_extract(MIN({'t': ts_us, 'i': event_id, 'v': value}),
                              'v') AS first_value,
               struct_extract(MAX({'t': ts_us, 'i': event_id, 'v': value}),
                              'v') AS last_value
        FROM b GROUP BY 1, 2
    """,
    "pit_join_orders": """
        WITH runs AS (
            SELECT user_id, event_type AS state,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_state
            FROM events),
        starts AS (
            SELECT user_id, state, ts_us FROM runs
            WHERE prev_state IS NULL OR prev_state != state),
        iv AS (
            SELECT user_id, state,
                   ts_us AS valid_from_us,
                   LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       AS valid_to_us
            FROM starts),
        probes AS (
            SELECT o_orderkey, o_custkey,
                   epoch_us(TIMESTAMP '2024-01-01 00:00:00')
                     + (o_orderkey % 31536000) * 1000000 AS o_ts_us
            FROM orders),
        best AS (
            SELECT p.o_orderkey, p.o_custkey, p.o_ts_us,
                   i.state, i.valid_from_us, i.valid_to_us,
                   ROW_NUMBER() OVER (PARTITION BY p.o_orderkey
                       ORDER BY i.valid_from_us DESC NULLS LAST) AS rn
            FROM probes p LEFT JOIN iv i
              ON p.o_custkey = i.user_id
             AND i.valid_from_us <= p.o_ts_us)
        SELECT o_orderkey, o_custkey, o_ts_us,
               CASE WHEN valid_to_us IS NULL OR o_ts_us < valid_to_us
                    THEN state END AS state,
               CASE WHEN valid_to_us IS NULL OR o_ts_us < valid_to_us
                    THEN valid_from_us END AS valid_from_us,
               CASE WHEN valid_to_us IS NULL OR o_ts_us < valid_to_us
                    THEN valid_to_us END AS valid_to_us
        FROM best WHERE rn = 1
    """,
})

ORACLES["mad_outliers"] = """
    WITH ranked AS (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
    med AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CEIL(n / 2) THEN value END) AS median
        FROM ranked GROUP BY 1),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.median,
               ABS(e.value - m.median) AS absdev
        FROM events e JOIN med m USING (event_type)),
    dranked AS (
        SELECT event_type, absdev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY absdev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev),
    mad AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CEIL(n / 2) THEN absdev END) AS mad
        FROM dranked GROUP BY 1)
    SELECT d.event_type, d.event_id, d.value, d.median, m.mad,
           d.absdev / (1.4826 * m.mad) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.absdev > 3.0 * 1.4826 * m.mad
"""

ORACLES["winsorize_values"] = """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
    fences AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CEIL(CAST(0.05 AS DOUBLE) * n)
                        THEN value END) AS _lo,
               MAX(CASE WHEN rn = CEIL(CAST(0.95 AS DOUBLE) * n)
                        THEN value END) AS _hi
        FROM ranked GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN e.value < f._lo OR e.value > f._hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(SUM(CAST(e.value AS DECIMAL(18,8))) AS DOUBLE)
               / COUNT(e.value) AS mean_raw,
           CAST(SUM(CAST(LEAST(GREATEST(e.value, f._lo), f._hi)
                         AS DECIMAL(18,8))) AS DOUBLE)
               / COUNT(e.value) AS mean_winsorized,
           CAST(MIN(f._lo) AS DOUBLE) AS fence_lo,
           CAST(MIN(f._hi) AS DOUBLE) AS fence_hi
    FROM events e JOIN fences f USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
"""

ORACLES["survival_km"] = """
    WITH per_user AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS t0,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN CAST(ts AS DATE) END) AS t_event
        FROM events GROUP BY 1),
    endd AS (SELECT MAX(CAST(ts AS DATE)) AS t_end FROM events),
    u AS (
        SELECT CAST(CASE WHEN t_event IS NOT NULL
                         THEN date_diff('day', t0, t_event)
                         ELSE date_diff('day', t0, t_end) END AS INT) AS t,
               CASE WHEN t_event IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per_user, endd),
    grp AS (
        SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM u GROUP BY 1),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u),
    risk AS (
        SELECT t, d,
               CAST(n_total - COALESCE(SUM(d + c) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        FROM grp, n_tot),
    fac AS (
        SELECT t, d, n_at_risk,
               CASE WHEN n_at_risk > d
                    THEN CAST(FLOOR(ln(CAST(n_at_risk - d AS DOUBLE)
                                       / CAST(n_at_risk AS DOUBLE)) * 1e9)
                              AS BIGINT)
                    ELSE CAST(-999000000000 AS BIGINT) END AS qf_nano
        FROM risk WHERE d > 0)
    SELECT t AS t_days, n_at_risk, d AS n_events,
           -CAST(SUM(qf_nano) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9
               AS neg_log_survival
    FROM fac
    ORDER BY t_days
"""

ORACLES["forecast_baseline_eval"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day_num, v,
               MAX(v) OVER (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING)
                   AS f_seasonal,
               MAX(v) OVER (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING)
                   AS f_naive1
        FROM daily
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(CASE WHEN f_seasonal IS NOT NULL THEN 1 END)
                    AS BIGINT) AS n_eval,
               CAST(SUM(CAST(ABS(v - f_seasonal) AS DECIMAL(18,8)))
                    AS DOUBLE)
                 / COUNT(CASE WHEN f_seasonal IS NOT NULL THEN 1 END)
                   AS mae,
               CAST(SUM(CAST(ABS(v - f_naive1) AS DECIMAL(18,8)))
                    AS DOUBLE)
                 / COUNT(CASE WHEN f_naive1 IS NOT NULL THEN 1 END)
                   AS naive1_mae
        FROM scored GROUP BY 1
    )
    SELECT event_type, n_eval, mae, naive1_mae,
           CASE WHEN naive1_mae > 0 THEN mae / naive1_mae
                ELSE 0.0 END AS mase
    FROM agg
    ORDER BY event_type
"""

ORACLES["peak_detection"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    n AS (
        SELECT event_type, day_num, v,
               MAX(v) OVER (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS prev_v,
               MAX(v) OVER (PARTITION BY event_type ORDER BY day_num
                   RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS next_v
        FROM daily
    )
    SELECT event_type, day_num, v, prev_v, next_v
    FROM n
    WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
      AND v > prev_v AND v > next_v
    ORDER BY event_type, day_num
"""

ORACLES["max_drawdown"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,8))) AS dv
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, day,
               SUM(dv) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM daily
    ),
    p AS (
        SELECT event_type, day, cum,
               MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS peak_value,
           CAST(MAX(cum) AS DOUBLE) AS final_value
    FROM p
    GROUP BY event_type
    ORDER BY event_type
"""

ORACLES["bollinger_bands"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS qv
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, day_num, qv,
               COUNT(*) OVER w AS n_w,
               SUM(qv) OVER w AS s1,
               SUM(CAST(qv AS DECIMAL(38,0)) * qv) OVER w AS s2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    calc AS (
        SELECT event_type, day_num,
               CAST(qv AS DOUBLE) / 1e6 AS daily_value,
               CAST(n_w AS BIGINT) AS n_window,
               CAST(s1 AS DOUBLE) / CAST(n_w AS DOUBLE) / 1e6 AS roll_mean,
               CAST(CAST(FLOOR(sqrt(GREATEST(
                   (CAST(n_w AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n_w AS DOUBLE) * CAST(n_w AS DOUBLE)) / 1e12,
                   0.0)) * 1e9) AS BIGINT) AS DOUBLE) / 1e9 AS roll_std
        FROM m
    )
    SELECT event_type, day_num, daily_value, n_window, roll_mean,
           roll_std,
           roll_mean + 2.0 * roll_std AS upper_band,
           roll_mean - 2.0 * roll_std AS lower_band,
           CASE WHEN daily_value > roll_mean + 2.0 * roll_std THEN 'high'
                WHEN daily_value < roll_mean - 2.0 * roll_std THEN 'low'
                ELSE 'in' END AS breach
    FROM calc
    ORDER BY event_type, day_num
"""

ORACLES["bounce_rate"] = """
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               LAG(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                   AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    ),
    per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS start_ts
        FROM sess GROUP BY 1, 2
    )
    SELECT CAST(CAST(start_ts AS DATE) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
    FROM per_session
    GROUP BY 1
    ORDER BY 1
"""

ORACLES["series_lead_lag"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               COALESCE(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(FLOOR(value * 1e6) AS BIGINT) END), 0) AS qa,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(FLOOR(value * 1e6) AS BIGINT) END), 0) AS qb
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ),
    lags AS (SELECT UNNEST(range(-7, 8)) AS lag),
    j AS (
        SELECT l.lag, a.qa, b.qb
        FROM daily a CROSS JOIN lags l
        JOIN daily b ON b.day_num = a.day_num + l.lag
    ),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(qa AS DECIMAL(38,0))) AS sa,
               SUM(CAST(qb AS DECIMAL(38,0))) AS sb,
               SUM(CAST(qa AS DECIMAL(38,0)) * qa) AS saa,
               SUM(CAST(qb AS DECIMAL(38,0)) * qb) AS sbb,
               SUM(CAST(qa AS DECIMAL(38,0)) * qb) AS sab
        FROM j GROUP BY 1
    ),
    scored AS (
        SELECT lag, n,
               CAST(CAST(FLOOR(
                   (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                   / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                   * 1e9) AS BIGINT) AS DOUBLE) / 1e9 AS r
        FROM m
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, lag) AS INT) AS rank,
           lag, n AS n_overlap, r
    FROM scored
    ORDER BY rank
"""

ORACLES["theil_sen_trend"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
    pairs AS (
        SELECT a.event_type, a.d AS da, b.d AS db,
               (b.v - a.v) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d),
    ranked AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY slope, da, db) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM pairs)
    SELECT event_type,
           MAX(CASE WHEN rn = CEIL(n / 2) THEN slope END) AS sen_slope,
           CAST(MAX(n) AS BIGINT) AS n_pairs
    FROM ranked GROUP BY 1 ORDER BY 1
"""

ORACLES["ks_drift"] = """
    WITH pts0 AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               value AS x
        FROM events),
    sp AS (
        SELECT event_type, x,
               d <= CAST(FLOOR((MIN(d) OVER (PARTITION BY event_type)
                    + MAX(d) OVER (PARTITION BY event_type)) / 2)
                    AS BIGINT) AS early
        FROM pts0),
    pts AS (
        SELECT event_type, x,
               CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS c2
        FROM sp GROUP BY 1, 2),
    cum AS (
        SELECT event_type,
               CAST(SUM(c1) OVER (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS f1,
               CAST(SUM(c2) OVER (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS f2,
               CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
        FROM pts)
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n_early,
           CAST(MAX(n2) AS BIGINT) AS n_late,
           MAX(ABS(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_stat,
           MAX(ABS(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
             * SQRT(CAST(MAX(n1) * MAX(n2) AS DOUBLE)
                    / CAST(MAX(n1) + MAX(n2) AS DOUBLE)) AS ks_scaled
    FROM cum GROUP BY 1 ORDER BY 1
"""

ORACLES["benford_deviation"] = """
    WITH bp AS (
        -- VARCHAR->DOUBLE cast: DuckDB parses bare decimal literals
        -- as DECIMAL first, losing the last ulp vs the JVM literal
        SELECT * FROM (VALUES
            (1, '0.3010299956639812'::DOUBLE),
            (2, '0.17609125905568124'::DOUBLE),
            (3, '0.12493873660829993'::DOUBLE),
            (4, '0.09691001300805642'::DOUBLE),
            (5, '0.07918124604762482'::DOUBLE),
            (6, '0.06694678963061322'::DOUBLE),
            (7, '0.05799194697768673'::DOUBLE),
            (8, '0.05115252244738129'::DOUBLE),
            (9, '0.04575749056067514'::DOUBLE)) AS t(digit, p_benford)),
    digits AS (
        SELECT event_type,
               TRY_CAST(regexp_extract(printf('%.6f', value), '[1-9]')
                   AS INT) AS digit
        FROM events WHERE value > 0),
    counts AS (
        SELECT event_type, digit, COUNT(*) AS n_obs
        FROM digits WHERE digit IS NOT NULL GROUP BY 1, 2),
    shares AS (
        SELECT event_type, digit, n_obs,
               CAST(SUM(n_obs) OVER (PARTITION BY event_type)
                   AS BIGINT) AS total
        FROM counts)
    SELECT s.event_type, s.digit, s.n_obs,
           CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS p_obs,
           bp.p_benford,
           (CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) - bp.p_benford)
             * (CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) - bp.p_benford)
             / bp.p_benford AS chi2_term
    FROM shares s JOIN bp USING (digit)
    ORDER BY event_type, digit
"""

ORACLES["record_days"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
    marked AS (
        SELECT event_type, day_num, v,
               MAX(v) OVER (PARTITION BY event_type ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_record
        FROM daily),
    rec AS (
        SELECT * FROM marked
        WHERE prev_record IS NULL OR v > prev_record)
    SELECT event_type, day_num, v AS daily_value, prev_record,
           CAST(day_num - LAG(day_num) OVER (PARTITION BY event_type
               ORDER BY day_num) AS BIGINT) AS days_since_last_record
    FROM rec ORDER BY event_type, day_num
"""

ORACLES["mean_shift_split"] = """
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
    cum AS (
        SELECT event_type, day_num,
               CAST(SUM(CAST(v AS DECIMAL(18,8))) OVER (
                   PARTITION BY event_type ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS lsum,
               CAST(COUNT(*) OVER (
                   PARTITION BY event_type ORDER BY day_num
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS lcnt,
               CAST(SUM(CAST(v AS DECIMAL(18,8))) OVER (
                   PARTITION BY event_type) AS DOUBLE) AS tsum,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS tcnt
        FROM daily),
    scored AS (
        SELECT event_type, day_num,
               lsum / CAST(lcnt AS DOUBLE) AS mean_before,
               (tsum - lsum) / CAST(tcnt - lcnt AS DOUBLE) AS mean_after,
               ABS(lsum / CAST(lcnt AS DOUBLE)
                   - (tsum - lsum) / CAST(tcnt - lcnt AS DOUBLE))
                   AS abs_shift
        FROM cum WHERE lcnt < tcnt)
    SELECT event_type, day_num AS split_day, mean_before, mean_after,
           abs_shift
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY abs_shift DESC, day_num ASC) AS rn
        FROM scored)
    WHERE rn = 1 ORDER BY event_type
"""

ORACLES["dow_anova"] = """
    WITH q AS (
        SELECT event_type,
               dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
               CAST(FLOOR(value * 1000000.0) AS BIGINT) AS qv
        FROM events),
    g AS (
        SELECT event_type, dow, COUNT(*) AS n_g,
               SUM(CAST(qv AS HUGEINT)) AS s_g,
               SUM(CAST(qv AS HUGEINT) * qv) AS ss_g
        FROM q GROUP BY 1, 2),
    pk AS (
        SELECT event_type,
               COUNT(*) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS DOUBLE) AS s,
               CAST(SUM(ss_g) AS DOUBLE) AS ss,
               CAST(SUM(CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                   / CAST(n_g AS DOUBLE)) AS HUGEINT)) AS DOUBLE) AS sb_q
        FROM g GROUP BY 1),
    st AS (
        SELECT event_type, k, n,
               (ss - s * s / CAST(n AS DOUBLE)) AS sst,
               (sb_q - s * s / CAST(n AS DOUBLE)) AS ssb
        FROM pk)
    SELECT event_type,
           CAST(k AS INT) AS k_groups,
           CAST(n AS BIGINT) AS n_obs,
           CAST(FLOOR(((ssb / (CAST(k AS DOUBLE) - 1))
               / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
               * 1e9) AS BIGINT) / 1e9 AS f_stat,
           CAST(FLOOR((ssb / sst) * 1e9) AS BIGINT) / 1e9 AS eta_sq
    FROM st ORDER BY event_type
"""

ORACLES["active_streaks"] = """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events),
    islands AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM days),
    per_island AS (
        SELECT user_id, grp, COUNT(*) AS len,
               MIN(d) AS start_d, MAX(d) AS end_d
        FROM islands GROUP BY 1, 2),
    marked AS (
        SELECT *,
               MAX(end_d) OVER (PARTITION BY user_id) AS max_end,
               MAX(len) OVER (PARTITION BY user_id) AS max_len
        FROM per_island)
    SELECT user_id,
           COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak_days,
           CAST(MAX(CASE WHEN end_d = max_end THEN len END) AS BIGINT)
               AS current_streak_days,
           CAST(MIN(CASE WHEN len = max_len THEN start_d END) AS BIGINT)
               AS longest_streak_start_day
    FROM marked GROUP BY user_id ORDER BY user_id
"""

ORACLES["psi_drift"] = """
    WITH days AS (
        SELECT event_type AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS x
        FROM events),
    sp AS (
        SELECT k, x,
               d <= CAST(FLOOR((MIN(d) OVER (PARTITION BY k)
                    + MAX(d) OVER (PARTITION BY k)) / 2) AS BIGINT) AS early
        FROM days),
    pts AS (
        SELECT k, x,
               CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS c2
        FROM sp GROUP BY 1, 2),
    cum AS (
        SELECT k, x, c1, c2,
               CAST(SUM(c1) OVER (PARTITION BY k ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
               CAST(SUM(c1) OVER (PARTITION BY k) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY k) AS BIGINT) AS n2
        FROM pts),
    edges AS (
        SELECT k, i, MIN(x) AS edge
        FROM cum, range(1, 10) t(i)
        WHERE cum1 >= CAST(FLOOR((i * n1 + 9) / 10) AS BIGINT)
        GROUP BY 1, 2),
    binned0 AS (
        SELECT c.k, c.x, c.c1, c.c2, c.n1, c.n2,
               CAST(SUM(CASE WHEN c.x > e.edge THEN 1 ELSE 0 END) AS INT)
                   AS bin
        FROM cum c LEFT JOIN edges e ON e.k = c.k
        GROUP BY c.k, c.x, c.c1, c.c2, c.n1, c.n2),
    binned AS (
        SELECT k, bin, CAST(SUM(c1) AS BIGINT) AS c1_b,
               CAST(SUM(c2) AS BIGINT) AS c2_b,
               MAX(n1) AS n1, MAX(n2) AS n2
        FROM binned0 GROUP BY 1, 2),
    allbins AS (
        SELECT ks.k, CAST(t.i AS INT) AS bin
        FROM (SELECT DISTINCT event_type AS k FROM events) ks,
             range(10) t(i)),
    filled AS (
        SELECT a.k, a.bin, COALESCE(b.c1_b, 0) AS c1_b,
               COALESCE(b.c2_b, 0) AS c2_b, g.n1, g.n2
        FROM allbins a
        LEFT JOIN binned b ON b.k = a.k AND b.bin = a.bin
        JOIN (SELECT k, MAX(n1) AS n1, MAX(n2) AS n2
              FROM binned GROUP BY 1) g ON g.k = a.k),
    terms AS (
        SELECT k, n1, n2,
               CAST(FLOOR(((CAST(c1_b AS DOUBLE) + 0.5)
                           / (CAST(n1 AS DOUBLE) + 5.0)
                           - (CAST(c2_b AS DOUBLE) + 0.5)
                             / (CAST(n2 AS DOUBLE) + 5.0))
                          * (FLOOR(ln(((CAST(c1_b AS DOUBLE) + 0.5)
                                       / (CAST(n1 AS DOUBLE) + 5.0))
                                      / ((CAST(c2_b AS DOUBLE) + 0.5)
                                         / (CAST(n2 AS DOUBLE) + 5.0)))
                                   * 1e6) / 1e6)
                          * 1e12) AS BIGINT) AS tq
        FROM filled)
    SELECT k AS event_type, MAX(n1) AS n_early, MAX(n2) AS n_late,
           CAST(CAST(SUM(tq) AS BIGINT) AS DOUBLE) / 1e12 AS psi
    FROM terms GROUP BY 1 ORDER BY 1
"""

ORACLES["window_funnel_strict"] = """
    WITH base AS (
        SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               event_type AS et
        FROM events),
    s1 AS (
        SELECT *, MIN(CASE WHEN et = 'signup' THEN tus END)
                      OVER (PARTITION BY u) AS t1
        FROM base),
    s2 AS (
        SELECT *, MIN(CASE WHEN et = 'view' AND tus > t1
                            AND tus <= t1 + 604800000000 THEN tus END)
                      OVER (PARTITION BY u) AS t2
        FROM s1),
    s3 AS (
        SELECT *, MIN(CASE WHEN et = 'purchase' AND tus > t2
                            AND tus <= t1 + 604800000000 THEN tus END)
                      OVER (PARTITION BY u) AS t3
        FROM s2),
    per_user AS (SELECT DISTINCT u, t1, t2, t3 FROM s3),
    counts AS (
        SELECT CAST(COUNT(t1) AS BIGINT) AS n1,
               CAST(COUNT(t2) AS BIGINT) AS n2,
               CAST(COUNT(t3) AS BIGINT) AS n3
        FROM per_user)
    SELECT * FROM (
        SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users,
               CASE WHEN n1 > 0
                    THEN CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) END
                   AS conversion_from_first
        FROM counts
        UNION ALL
        SELECT 2, 'view', n2,
               CASE WHEN n1 > 0
                    THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END
        FROM counts
        UNION ALL
        SELECT 3, 'purchase', n3,
               CASE WHEN n1 > 0
                    THEN CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) END
        FROM counts)
    ORDER BY step
"""

ORACLES["sax_symbols"] = """
    WITH days AS (
        SELECT event_type AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS dq
        FROM events GROUP BY 1, 2),
    wm AS (
        SELECT k, d, dq,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY k ORDER BY d)
                           - 1) / 7) AS INT) AS seg,
               CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_days,
               SUM(CAST(dq AS HUGEINT)) OVER (PARTITION BY k) AS s,
               SUM(CAST(dq AS HUGEINT) * dq) OVER (PARTITION BY k) AS ss
        FROM days),
    seg AS (
        SELECT k, seg, CAST(COUNT(*) AS BIGINT) AS n_seg,
               CAST(SUM(dq) AS BIGINT) AS sq_seg,
               MAX(n_days) AS n_days, MAX(s) AS s, MAX(ss) AS ss
        FROM wm GROUP BY 1, 2),
    z AS (
        SELECT k, seg, n_seg,
               CAST(sq_seg AS DOUBLE) / CAST(n_seg AS DOUBLE) / 1e6 AS paa,
               (CAST(sq_seg AS DOUBLE) / CAST(n_seg AS DOUBLE) / 1e6
                - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e6)
               / (sqrt((CAST(ss AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n_days AS DOUBLE))
                       / CAST(n_days AS DOUBLE)) / 1e6) AS zv
        FROM seg)
    SELECT k AS event_type, seg, n_seg, paa,
           FLOOR(zv * 1e9) / 1e9 AS z,
           CASE WHEN zv < '-0.6745'::DOUBLE THEN 'a'
                WHEN zv < 0.0 THEN 'b'
                WHEN zv < '0.6745'::DOUBLE THEN 'c'
                ELSE 'd' END AS symbol
    FROM z ORDER BY event_type, seg
"""

ORACLES["period_detect"] = """
    WITH days AS (
        SELECT event_type AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS dq
        FROM events GROUP BY 1, 2),
    dev AS (
        SELECT k, d,
               CAST(dq * CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT)
                    - CAST(SUM(dq) OVER (PARTITION BY k) AS BIGINT)
                   AS BIGINT) AS devq,
               CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_days
        FROM days),
    den AS (
        SELECT k, SUM(CAST(devq AS DECIMAL(19,0))
                      * CAST(devq AS DECIMAL(19,0))) AS den,
               MAX(n_days) AS n_days
        FROM dev GROUP BY 1),
    prods AS (
        SELECT l.k, l.lg,
               SUM(CAST(l.devq AS DECIMAL(19,0))
                   * CAST(r.devq AS DECIMAL(19,0))) AS num,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM (SELECT k, d + lg AS d2, devq, lg
              FROM dev, range(2, 15) t(lg)) l
        JOIN dev r ON r.k = l.k AND r.d = l.d2
        GROUP BY 1, 2),
    scored AS (
        SELECT p.k, p.lg, p.n_pairs, d.n_days,
               FLOOR((CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE)) * 1e9)
                   / 1e9 AS acf
        FROM prods p JOIN den d ON d.k = p.k)
    SELECT k AS event_type, CAST(lg AS INT) AS best_lag, acf, n_pairs,
           n_days
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY k ORDER BY acf DESC, lg) AS r
          FROM scored)
    WHERE r = 1 ORDER BY event_type
"""

ORACLES["diff_in_diff"] = """
    WITH days AS (
        SELECT event_type AS grp,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               value AS x
        FROM events WHERE event_type IN ('purchase', 'view')),
    mid AS (
        SELECT CAST(FLOOR((MIN(d) + MAX(d)) / 2) AS BIGINT) AS mid
        FROM days),
    cells AS (
        SELECT grp,
               CASE WHEN d <= mid THEN 'pre' ELSE 'post' END AS period,
               CAST(SUM(CAST(x AS DECIMAL(18,8))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_x
        FROM days, mid GROUP BY 1, 2),
    w AS (
        SELECT
            MAX(CASE WHEN grp = 'purchase' AND period = 'pre'
                     THEN mean_x END) AS treat_pre,
            MAX(CASE WHEN grp = 'purchase' AND period = 'post'
                     THEN mean_x END) AS treat_post,
            MAX(CASE WHEN grp = 'view' AND period = 'pre'
                     THEN mean_x END) AS control_pre,
            MAX(CASE WHEN grp = 'view' AND period = 'post'
                     THEN mean_x END) AS control_post
        FROM cells)
    SELECT treat_pre, treat_post, control_pre, control_post,
           (treat_post - treat_pre) - (control_post - control_pre)
               AS did_estimate
    FROM w
"""

ORACLES["multitouch_attribution"] = """
    WITH base AS (
        SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               event_type AS et, event_id
        FROM events),
    conv AS (SELECT u, tus AS conv_t, event_id AS conv_id
             FROM base WHERE et = 'purchase'),
    touch AS (SELECT u, tus AS touch_t, et AS touch_type
              FROM base WHERE et IN ('view', 'click')),
    j AS (
        SELECT c.conv_id, t.touch_type
        FROM conv c JOIN touch t ON t.u = c.u
        WHERE t.touch_t < c.conv_t
          AND t.touch_t >= c.conv_t - 604800000000),
    cr AS (
        SELECT conv_id, touch_type,
               CAST(FLOOR(1e12 / CAST(COUNT(*) OVER (PARTITION BY conv_id)
                   AS BIGINT)) AS BIGINT) AS credit_pico
        FROM j)
    SELECT touch_type,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(CAST(SUM(credit_pico) AS BIGINT) AS DOUBLE) / 1e12
               AS credited_conversions
    FROM cr GROUP BY 1 ORDER BY 1
"""

ORACLES["markov_accuracy"] = """
    WITH days AS (
        SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               event_type AS et, event_id
        FROM events),
    sq AS (
        SELECT *,
               CAST(FLOOR((MIN(d) OVER () + MAX(d) OVER ()) / 2)
                   AS BIGINT) AS mid,
               lead(et, 1) OVER wu AS nxt,
               lead(d, 1) OVER wu AS nxt_d
        FROM days
        WINDOW wu AS (PARTITION BY u ORDER BY tus, event_id)),
    sq2 AS (SELECT * FROM sq WHERE nxt IS NOT NULL),
    train AS (
        SELECT et AS cur, nxt AS nx, CAST(COUNT(*) AS BIGINT) AS c
        FROM sq2 WHERE nxt_d <= mid GROUP BY 1, 2),
    model AS (
        SELECT cur, nx AS pred FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY cur ORDER BY c DESC, nx) AS r
            FROM train)
        WHERE r = 1),
    test AS (SELECT et AS cur, nxt FROM sq2 WHERE nxt_d > mid),
    sc AS (
        SELECT t.cur, t.nxt, m.pred
        FROM test t LEFT JOIN model m ON m.cur = t.cur)
    SELECT cur AS event_type, MAX(pred) AS predicted_next,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           CAST(CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END)
               AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS accuracy
    FROM sc GROUP BY 1 ORDER BY 1
"""

ORACLES["haar_energy"] = """
    WITH days AS (
        SELECT event_type AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
                   AS x
        FROM events GROUP BY 1, 2),
    c0 AS (
        SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY d) - 1 AS i,
               x
        FROM days),
    c0f AS (SELECT * FROM c0 WHERE i < 32),
    p1s AS (SELECT k, CAST(FLOOR(i / 2) AS BIGINT) AS pi, i % 2 AS par, x
            FROM c0f),
    p1 AS (
        SELECT k, pi AS i,
               CAST(SUM(CASE WHEN par = 0 THEN x ELSE 0 END) AS BIGINT)
                   AS x0,
               CAST(SUM(CASE WHEN par = 1 THEN x ELSE 0 END) AS BIGINT)
                   AS x1
        FROM p1s GROUP BY 1, 2 HAVING COUNT(*) = 2),
    d1 AS (SELECT k, 1 AS level,
                  CAST(SUM((x0 - x1) * (x0 - x1)) AS BIGINT) AS e
           FROM p1 GROUP BY 1),
    a1 AS (SELECT k, i, x0 + x1 AS x FROM p1),
    p2s AS (SELECT k, CAST(FLOOR(i / 2) AS BIGINT) AS pi, i % 2 AS par, x
            FROM a1),
    p2 AS (
        SELECT k, pi AS i,
               CAST(SUM(CASE WHEN par = 0 THEN x ELSE 0 END) AS BIGINT)
                   AS x0,
               CAST(SUM(CASE WHEN par = 1 THEN x ELSE 0 END) AS BIGINT)
                   AS x1
        FROM p2s GROUP BY 1, 2 HAVING COUNT(*) = 2),
    d2 AS (SELECT k, 2 AS level,
                  CAST(SUM((x0 - x1) * (x0 - x1)) AS BIGINT) AS e
           FROM p2 GROUP BY 1),
    a2 AS (SELECT k, i, x0 + x1 AS x FROM p2),
    p3s AS (SELECT k, CAST(FLOOR(i / 2) AS BIGINT) AS pi, i % 2 AS par, x
            FROM a2),
    p3 AS (
        SELECT k, pi AS i,
               CAST(SUM(CASE WHEN par = 0 THEN x ELSE 0 END) AS BIGINT)
                   AS x0,
               CAST(SUM(CASE WHEN par = 1 THEN x ELSE 0 END) AS BIGINT)
                   AS x1
        FROM p3s GROUP BY 1, 2 HAVING COUNT(*) = 2),
    d3 AS (SELECT k, 3 AS level,
                  CAST(SUM((x0 - x1) * (x0 - x1)) AS BIGINT) AS e
           FROM p3 GROUP BY 1),
    lv AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
           UNION ALL SELECT * FROM d3),
    tot AS (SELECT *, CAST(SUM(e) OVER (PARTITION BY k) AS BIGINT) AS te
            FROM lv)
    SELECT k AS event_type, CAST(level AS INT) AS level,
           CAST(e AS DOUBLE) / 1e4 AS energy,
           FLOOR((CAST(e AS DOUBLE) / CAST(te AS DOUBLE)) * 1e9) / 1e9
               AS energy_share
    FROM tot ORDER BY event_type, level
"""

ORACLES["value_at_risk"] = """
    WITH pts AS (
        SELECT event_type AS k, CAST(FLOOR(value * 1e6) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    cum AS (
        SELECT k, x, c,
               CAST(SUM(c) OVER (PARTITION BY k ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(c) OVER (PARTITION BY k) AS BIGINT) AS n
        FROM pts),
    var_row AS (
        SELECT k, MIN(x) AS var_q
        FROM cum
        WHERE cum >= CAST(FLOOR((5 * n + 99) / 100) AS BIGINT)
        GROUP BY 1),
    tail AS (
        SELECT c.k, MAX(c.n) AS n, MAX(v.var_q) AS var_q,
               CAST(SUM(c.c) AS BIGINT) AS n_tail,
               CAST(SUM(c.x * c.c) AS BIGINT) AS tail_sum
        FROM cum c JOIN var_row v ON v.k = c.k
        WHERE c.x <= v.var_q GROUP BY 1)
    SELECT k AS event_type, CAST(n AS BIGINT) AS n_samples,
           CAST(var_q AS DOUBLE) / 1e6 AS var_value, n_tail,
           CAST(tail_sum AS DOUBLE) / CAST(n_tail AS DOUBLE) / 1e6
               AS expected_shortfall
    FROM tail ORDER BY event_type
"""

ORACLES["kruskal_wallis"] = """
    WITH gv AS (
        SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS gc
        FROM events GROUP BY 1, 2),
    vals AS (
        SELECT value, SUM(gc) AS cnt FROM gv GROUP BY value),
    ranked AS (
        SELECT value,
               2 * (SUM(cnt) OVER (ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt) + cnt + 1 AS two_r
        FROM vals),
    grp AS (
        SELECT g.event_type,
               SUM(g.gc) AS n_i,
               SUM(g.gc * r.two_r) AS s2r
        FROM gv g JOIN ranked r ON g.value = r.value
        GROUP BY g.event_type),
    tot AS (
        SELECT SUM(cnt) AS n, SUM(cnt * cnt * cnt - cnt) AS tie3
        FROM vals),
    per_group AS (
        SELECT t.n AS _n, t.tie3 AS _t3,
               CAST(FLOOR(CAST(g.n_i AS DOUBLE)
                    * (CAST(g.s2r AS DOUBLE) / (2.0 * CAST(g.n_i AS DOUBLE))
                       - (CAST(t.n AS DOUBLE) + 1.0) / 2.0)
                    * (CAST(g.s2r AS DOUBLE) / (2.0 * CAST(g.n_i AS DOUBLE))
                       - (CAST(t.n AS DOUBLE) + 1.0) / 2.0)
                    * 1e6) AS BIGINT) AS qc,
               1 AS k1
        FROM grp g CROSS JOIN tot t),
    agg AS (
        SELECT _n, _t3, SUM(qc) AS sqc, CAST(SUM(k1) AS INT) AS k
        FROM per_group GROUP BY _n, _t3)
    SELECT CAST(_n AS BIGINT) AS n_obs,
           k - 1 AS dof,
           12.0 / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) + 1.0))
               * (CAST(sqc AS DOUBLE) / 1e6) AS h_stat,
           1.0 - CAST(_t3 AS DOUBLE)
               / (CAST(_n AS DOUBLE) * CAST(_n AS DOUBLE) * CAST(_n AS DOUBLE)
                  - CAST(_n AS DOUBLE)) AS tie_correction,
           (12.0 / (CAST(_n AS DOUBLE) * (CAST(_n AS DOUBLE) + 1.0))
               * (CAST(sqc AS DOUBLE) / 1e6))
           / (1.0 - CAST(_t3 AS DOUBLE)
               / (CAST(_n AS DOUBLE) * CAST(_n AS DOUBLE) * CAST(_n AS DOUBLE)
                  - CAST(_n AS DOUBLE))) AS h_corrected
    FROM agg
"""

ORACLES["interarrival_fit"] = """
    WITH gaps AS (
        SELECT event_type, ts, event_id,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id)
                 AS gap_us
        FROM events
        QUALIFY gap_us IS NOT NULL),
    agg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap_us) AS BIGINT) AS s
        FROM gaps GROUP BY event_type),
    ranked AS (
        SELECT g.event_type, a.n, a.s, g.gap_us,
               ROW_NUMBER() OVER (
                   PARTITION BY g.event_type
                   ORDER BY g.gap_us, g.ts, g.event_id) AS i
        FROM gaps g JOIN agg a ON g.event_type = a.event_type),
    devs AS (
        SELECT event_type, n, s,
               GREATEST(
                   CAST(i AS DOUBLE) / CAST(n AS DOUBLE)
                     - FLOOR((1.0 - exp(-(CAST(gap_us AS DOUBLE)
                           * CAST(n AS DOUBLE)) / CAST(s AS DOUBLE)))
                           * 1e9) / 1e9,
                   FLOOR((1.0 - exp(-(CAST(gap_us AS DOUBLE)
                           * CAST(n AS DOUBLE)) / CAST(s AS DOUBLE)))
                           * 1e9) / 1e9
                     - CAST(i - 1 AS DOUBLE) / CAST(n AS DOUBLE)
               ) AS dev
        FROM ranked)
    SELECT event_type, n AS n_gaps,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS mean_gap_s,
           3600.0 / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
               AS rate_per_hour,
           MAX(dev) AS ks_stat
    FROM devs GROUP BY event_type, n, s ORDER BY event_type
"""

ORACLES["ljung_box"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM orders GROUP BY 1),
    base AS (
        SELECT i, CAST(FLOOR(revenue * 1e6) AS BIGINT) AS qx FROM daily),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS BIGINT) AS s FROM base),
    cen AS (
        SELECT i, n,
               CAST(FLOOR(CAST(qx * n - s AS DOUBLE)
                          / CAST(n AS DOUBLE)) AS BIGINT) AS e
        FROM base, tot),
    lags AS (SELECT UNNEST(range(1, 8)) AS lag),
    num AS (
        SELECT l.lag AS lag,
               SUM(CAST(c.e AS HUGEINT) * p.e) AS cnum,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM cen c CROSS JOIN lags l
        JOIN cen p ON c.i - l.lag = p.i
        GROUP BY l.lag),
    den AS (
        SELECT SUM(CAST(e AS HUGEINT) * e) AS cden, MAX(n) AS n FROM cen),
    j AS (
        SELECT lag, n_pairs,
               CAST(cnum AS DOUBLE) / CAST(cden AS DOUBLE) AS rho_raw,
               CAST(n AS DOUBLE) AS nd
        FROM num, den),
    t AS (
        SELECT lag, n_pairs, FLOOR(rho_raw * 1e9) / 1e9 AS rho,
               CAST(FLOOR(nd * (nd + 2.0) * rho_raw * rho_raw
                          / (nd - CAST(lag AS DOUBLE)) * 1e9)
                    AS BIGINT) AS tq
        FROM j)
    SELECT CAST(lag AS INT) AS lag, n_pairs, rho,
           CAST(SUM(tq) OVER (ORDER BY lag ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / 1e9 AS q_stat
    FROM t ORDER BY lag
"""

ORACLES["runs_test"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1),
    med AS (
        SELECT v AS med FROM (
            SELECT v, ROW_NUMBER() OVER (ORDER BY v, i) AS rn,
                   COUNT(*) OVER () AS n
            FROM daily)
        WHERE rn = CAST(CEIL(n * 0.5) AS BIGINT)),
    cls AS (
        SELECT i, v > med AS above
        FROM daily, med WHERE v != med),
    flagged AS (
        SELECT above,
               CASE WHEN LAG(above) OVER (ORDER BY i) IS NULL
                         OR above != LAG(above) OVER (ORDER BY i)
                    THEN 1 ELSE 0 END AS new_run
        FROM cls),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above,
               CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_below,
               CAST(SUM(new_run) AS BIGINT) AS n_runs
        FROM flagged)
    SELECT n_days, n_above, n_below, n_runs,
           FLOOR((1.0 + 2.0 * CAST(n_above AS DOUBLE)
                        * CAST(n_below AS DOUBLE)
                  / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)))
                 * 1e9) / 1e9 AS expected_runs,
           FLOOR((CAST(n_runs AS DOUBLE)
                  - (1.0 + 2.0 * CAST(n_above AS DOUBLE)
                           * CAST(n_below AS DOUBLE)
                     / (CAST(n_above AS DOUBLE)
                        + CAST(n_below AS DOUBLE))))
                 / SQRT(2.0 * CAST(n_above AS DOUBLE)
                        * CAST(n_below AS DOUBLE)
                        * (2.0 * CAST(n_above AS DOUBLE)
                           * CAST(n_below AS DOUBLE)
                           - CAST(n_above AS DOUBLE)
                           - CAST(n_below AS DOUBLE))
                        / ((CAST(n_above AS DOUBLE)
                            + CAST(n_below AS DOUBLE))
                           * (CAST(n_above AS DOUBLE)
                              + CAST(n_below AS DOUBLE))
                           * (CAST(n_above AS DOUBLE)
                              + CAST(n_below AS DOUBLE) - 1.0)))
                 * 1e9) / 1e9 AS z_score
    FROM agg
"""

ORACLES["turning_points"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1),
    tp AS (
        SELECT v, LAG(v) OVER (ORDER BY i) AS pv,
               LEAD(v) OVER (ORDER BY i) AS nv
        FROM daily),
    f AS (
        SELECT CASE WHEN (v > pv AND v > nv) OR (v < pv AND v < nv)
                    THEN 1 ELSE 0 END AS turn
        FROM tp WHERE pv IS NOT NULL AND nv IS NOT NULL),
    agg AS (
        SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n_days,
               CAST(SUM(turn) AS BIGINT) AS n_turning
        FROM f)
    SELECT n_days, n_turning,
           FLOOR(2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0 * 1e9) / 1e9
               AS expected_turning,
           FLOOR((CAST(n_turning AS DOUBLE)
                  - 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0)
                 / SQRT((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0)
                 * 1e9) / 1e9 AS z_score
    FROM agg
"""

ORACLES["drawdown_durations"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1),
    rm AS (
        SELECT i, v,
               MAX(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS runmax
        FROM daily),
    dd AS (
        SELECT i, v, runmax,
               CASE WHEN v < runmax THEN 1 ELSE 0 END AS in_dd
        FROM rm),
    epf AS (
        SELECT i, v, runmax, in_dd,
               CASE WHEN in_dd = 1
                         AND COALESCE(LAG(in_dd) OVER (ORDER BY i), 0) = 0
                    THEN 1 ELSE 0 END AS ep_start
        FROM dd),
    ep AS (
        SELECT i, v, runmax, in_dd,
               SUM(ep_start) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) AS ep_id
        FROM epf),
    eps AS (
        SELECT ep_id, CAST(COUNT(*) AS BIGINT) AS dur,
               MAX(runmax - v) AS depth
        FROM ep WHERE in_dd = 1 GROUP BY ep_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_episodes,
           CAST(MAX(dur) AS BIGINT) AS longest_days,
           CAST(SUM(dur) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_duration_days,
           CAST(MAX(depth) AS DOUBLE) / 1e2 AS max_depth
    FROM eps
"""

ORACLES["seasonal_strength"] = """
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(FLOOR((o_totalprice) * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS value
        FROM orders GROUP BY 1),
    q AS (
        SELECT day, value,
               CAST(FLOOR(value * 1000000.0) AS BIGINT) AS qv
        FROM daily),
    t AS (
        SELECT day, value, qv,
               COUNT(*) OVER w AS win_n,
               SUM(qv) OVER w AS sqv
        FROM q
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING)),
    tr AS (
        SELECT day, value,
               CASE WHEN win_n = 7
                    THEN CAST(sqv AS DOUBLE) / 7.0 / 1000000.0 END AS trend
        FROM t),
    dt AS (
        SELECT *,
               CAST(FLOOR((value - trend) * 1000000.0) AS BIGINT) AS qd,
               dayofweek(day) + 1 AS dow
        FROM tr),
    seas AS (
        SELECT dow,
               CAST(SUM(qd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 / 1000000.0 AS seasonal
        FROM dt WHERE trend IS NOT NULL GROUP BY dow),
    full_dec AS (
        SELECT d.day, d.value, d.trend, s.seasonal,
               d.value - d.trend - s.seasonal AS residual
        FROM dt d LEFT JOIN seas s ON d.dow = s.dow
        WHERE d.trend IS NOT NULL),
    qx AS (
        SELECT CAST(FLOOR(residual * 1e6) AS BIGINT) AS r,
               CAST(FLOOR((value - trend) * 1e6) AS BIGINT) AS sr,
               CAST(FLOOR((value - seasonal) * 1e6) AS BIGINT) AS trr
        FROM full_dec),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS s_r,
               SUM(CAST(r AS HUGEINT) * r) AS ss_r,
               CAST(SUM(sr) AS BIGINT) AS s_sr,
               SUM(CAST(sr AS HUGEINT) * sr) AS ss_sr,
               CAST(SUM(trr) AS BIGINT) AS s_tr,
               SUM(CAST(trr AS HUGEINT) * trr) AS ss_tr
        FROM qx)
    SELECT n AS n_days,
           FLOOR(greatest(0.0,
               1.0 - (CAST(n AS DOUBLE) * CAST(ss_r AS DOUBLE)
                      - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(ss_sr AS DOUBLE)
                        - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE)))
                 * 1e9) / 1e9 AS seasonal_strength,
           FLOOR(greatest(0.0,
               1.0 - (CAST(n AS DOUBLE) * CAST(ss_r AS DOUBLE)
                      - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(ss_tr AS DOUBLE)
                        - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE)))
                 * 1e9) / 1e9 AS trend_strength
    FROM mom
"""

ORACLES["intervention_impact"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1),
    ext AS (
        SELECT CAST(FLOOR(CAST(MIN(i) + MAX(i) AS DOUBLE) / 2.0)
                    AS BIGINT) AS bp
        FROM daily),
    seg AS (SELECT i, y, bp, i >= bp AS post FROM daily, ext),
    mom AS (
        SELECT post, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(i) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(i AS HUGEINT) * y) AS sxy,
               SUM(CAST(i AS HUGEINT) * i) AS sxx,
               MAX(bp) AS bp
        FROM seg GROUP BY post),
    fit AS (
        SELECT post, n, bp,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS icept
        FROM mom)
    SELECT pre.bp AS bp_day,
           pre.n AS n_pre, post.n AS n_post,
           FLOOR(pre.slope / 1e2 * 1e9) / 1e9 AS slope_pre,
           FLOOR(post.slope / 1e2 * 1e9) / 1e9 AS slope_post,
           FLOOR((post.slope - pre.slope) / 1e2 * 1e9) / 1e9
               AS slope_change,
           FLOOR(((post.icept + post.slope * CAST(pre.bp AS DOUBLE))
                  - (pre.icept + pre.slope * CAST(pre.bp AS DOUBLE)))
                 / 1e2 * 1e9) / 1e9 AS level_change
    FROM (SELECT * FROM fit WHERE NOT post) pre
    CROSS JOIN (SELECT * FROM fit WHERE post) post
"""

ORACLES["hurst_exponent"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS i,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1),
    hbase AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY i) - 1 AS rn FROM daily),
    hexp AS (
        SELECT x, rn, bs, CAST(FLOOR(rn / bs) AS BIGINT) AS blk,
               rn % bs AS pos
        FROM hbase CROSS JOIN (SELECT UNNEST([8, 16, 32, 64]) AS bs)),
    hper AS (
        SELECT bs, blk, COUNT(*) AS nb,
               CAST(SUM(x) AS BIGINT) AS sb,
               SUM(CAST(x AS HUGEINT) * x) AS ssb
        FROM hexp GROUP BY 1, 2),
    hfull AS (SELECT * FROM hper WHERE nb = bs),
    hdev AS (
        SELECT e.bs, e.blk, f.sb, f.ssb,
               SUM(CAST(e.x AS HUGEINT) * e.bs - f.sb) OVER (
                   PARTITION BY e.bs, e.blk ORDER BY e.pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM hexp e JOIN hfull f ON e.bs = f.bs AND e.blk = f.blk),
    hrs AS (
        SELECT bs,
               CAST(FLOOR(CAST(MAX(cum) - MIN(cum) AS DOUBLE)
                          / SQRT(CAST(ssb AS DOUBLE) * CAST(bs AS DOUBLE)
                                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                          * 1e9) AS BIGINT) AS qrs
        FROM hdev GROUP BY bs, blk, sb, ssb),
    hsize AS (
        SELECT bs, CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(qrs) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e9) AS mean_rs
        FROM hrs GROUP BY bs),
    hpts AS (
        SELECT bs, n_blocks, mean_rs,
               CASE bs WHEN 8 THEN 2079441541
                       WHEN 16 THEN 2772588722
                       WHEN 32 THEN 3465735902
                       ELSE 4158883083 END AS qx,
               CAST(FLOOR(ln(mean_rs) * 1e9) AS BIGINT) AS qy
        FROM hsize),
    hmom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               SUM(CAST(qx AS HUGEINT) * qy) AS sxy,
               SUM(CAST(qx AS HUGEINT) * qx) AS sxx
        FROM hpts),
    hfit AS (
        SELECT FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e9) / 1e9 AS hurst
        FROM hmom)
    SELECT CAST(bs AS INT) AS block_size, n_blocks, mean_rs, hurst
    FROM hpts CROSS JOIN hfit ORDER BY block_size
"""

ORACLES["cross_correlation"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
               CAST(FLOOR(COALESCE(
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE),
                   0.0) * 1e6) AS BIGINT) AS qa,
               CAST(FLOOR(COALESCE(
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE),
                   0.0) * 1e6) AS BIGINT) AS qb
        FROM events GROUP BY 1),
    pairs AS (
        SELECT t.lag, a.qa, b.qb
        FROM daily a
        CROSS JOIN (SELECT UNNEST(generate_series(-7, 7)) AS lag) t
        JOIN daily b ON a.i + t.lag = b.i),
    mom AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qa) AS BIGINT) AS sx,
               CAST(SUM(qb) AS BIGINT) AS sy,
               SUM(CAST(qa AS HUGEINT) * qb) AS sxy,
               SUM(CAST(qa AS HUGEINT) * qa) AS sxx,
               SUM(CAST(qb AS HUGEINT) * qb) AS syy
        FROM pairs GROUP BY 1)
    SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
           (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)
            - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
           / sqrt((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                   - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
                  * (CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) / 1e12)
                     - (CAST(sy AS DOUBLE) / 1e6)
                       * (CAST(sy AS DOUBLE) / 1e6))) AS ccf
    FROM mom ORDER BY lag
"""

ORACLES["spectral_entropy"] = """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1),
    folded AS (
        SELECT t.p, i % t.p AS k, q
        FROM daily CROSS JOIN
             (SELECT UNNEST(generate_series(2, 16)) AS p) t),
    phases AS (
        SELECT p, k, CAST(COUNT(*) AS BIGINT) AS nk,
               CAST(SUM(q) AS BIGINT) AS sk
        FROM folded GROUP BY 1, 2),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(q) AS BIGINT) AS ss
        FROM daily),
    perp AS (
        SELECT p,
               CAST(SUM(CAST(FLOOR(CAST(nk AS DOUBLE)
                   * ((CAST(sk AS DOUBLE) / 1e6 / CAST(nk AS DOUBLE)
                       - CAST(ss AS DOUBLE) / 1e6 / CAST(nn AS DOUBLE))
                      * (CAST(sk AS DOUBLE) / 1e6 / CAST(nk AS DOUBLE)
                         - CAST(ss AS DOUBLE) / 1e6 / CAST(nn AS DOUBLE)))
                   * 1e6) AS BIGINT)) AS BIGINT) AS v
        FROM phases CROSS JOIN tot GROUP BY 1),
    wsum AS (SELECT CAST(SUM(v) AS BIGINT) AS w_all FROM perp),
    weighted AS (
        SELECT p,
               CAST(v AS DOUBLE) / 1e6 AS between_var,
               CAST(v AS DOUBLE) / CAST(w_all AS DOUBLE) AS weight,
               CASE WHEN v > 0
                    THEN CAST(FLOOR(CAST(v AS DOUBLE) / CAST(w_all AS DOUBLE)
                              * ln(CAST(v AS DOUBLE) / CAST(w_all AS DOUBLE))
                              * 1e9) AS BIGINT)
                    ELSE 0 END AS qe
        FROM perp CROSS JOIN wsum),
    ent AS (
        SELECT -CAST(SUM(qe) AS DOUBLE) / 1e9 AS entropy FROM weighted)
    SELECT CAST(p AS INT) AS period, between_var, weight, entropy
    FROM weighted CROSS JOIN ent ORDER BY period
"""

ORACLES["ar1_halflife"] = """
    WITH daily AS (
        SELECT event_type AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS qx
        FROM events GROUP BY 1, 2),
    pairs AS (
        SELECT a.k, a.qx, b.qx AS qy
        FROM daily a JOIN daily b ON a.k = b.k AND a.i + 1 = b.i),
    mom AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               SUM(CAST(qx AS HUGEINT) * qy) AS sxy,
               SUM(CAST(qx AS HUGEINT) * qx) AS sxx
        FROM pairs GROUP BY 1),
    fit AS (
        SELECT k, n,
               (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)
                - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
               / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                  - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
                   AS phi
        FROM mom)
    SELECT k AS event_type, n AS n_pairs, phi,
           CASE WHEN phi > 0 AND phi < 1
                THEN FLOOR(-ln(2.0) / ln(phi) * 1e6) / 1e6
                ELSE NULL END AS halflife_days
    FROM fit ORDER BY event_type
"""

ORACLES["transition_entropy"] = """
    WITH steps AS (
        SELECT LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_type,
               event_type AS to_type
        FROM events),
    counts AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_steps
        FROM steps WHERE from_type IS NOT NULL GROUP BY 1, 2),
    cells AS (
        SELECT from_type, n_steps,
               CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS BIGINT)
                   AS row_n
        FROM counts),
    qcells AS (
        SELECT from_type, n_steps, row_n,
               CAST(FLOOR(ln(CAST(n_steps AS DOUBLE)
                             / CAST(row_n AS DOUBLE)) * 1e6) AS BIGINT)
                   AS qlp
        FROM cells),
    per_from AS (
        SELECT from_type,
               CAST(MAX(row_n) AS BIGINT) AS n_out,
               CAST(COUNT(*) AS BIGINT) AS n_targets,
               CAST(SUM(n_steps * qlp) AS BIGINT) AS sum_nqlp
        FROM qcells GROUP BY 1),
    ent AS (
        SELECT from_type, n_out, n_targets,
               -CAST(sum_nqlp AS DOUBLE) / CAST(n_out AS DOUBLE) / 1e6
                   AS entropy
        FROM per_from),
    tot AS (
        SELECT CAST(SUM(CAST(FLOOR(entropy * CAST(n_out AS DOUBLE) * 1e6)
                             AS BIGINT)) AS DOUBLE)
               / CAST(CAST(SUM(n_out) AS BIGINT) AS DOUBLE) / 1e6
                   AS entropy_rate
        FROM ent)
    SELECT from_type, n_out, n_targets, entropy, entropy_rate
    FROM ent CROSS JOIN tot ORDER BY from_type
"""

ORACLES["weekly_profile_drift"] = """
    WITH base AS (
        SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
               dayofweek(CAST(ts AS TIMESTAMP)) AS dow
        FROM events),
    weekly AS (
        SELECT wk, dow, CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY 1, 2),
    tw AS (SELECT wk, CAST(SUM(n) AS BIGINT) AS tw FROM weekly GROUP BY 1),
    gd AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS g FROM base GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
    cells AS (
        SELECT t.wk, d.dow, t.tw, d.g, nn.nn, COALESCE(w.n, 0) AS n
        FROM tw t CROSS JOIN gd d CROSS JOIN nn
        LEFT JOIN weekly w ON w.wk = t.wk AND w.dow = d.dow),
    scored AS (
        SELECT wk, tw, nn, n, g,
               CASE WHEN n > 0 THEN CAST(FLOOR(ln(
                   (CAST(n AS DOUBLE) / CAST(tw AS DOUBLE))
                   / ((CAST(n AS DOUBLE) / CAST(tw AS DOUBLE)
                       + CAST(g AS DOUBLE) / CAST(nn AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) ELSE 0 END AS qa,
               CAST(FLOOR(ln(
                   (CAST(g AS DOUBLE) / CAST(nn AS DOUBLE))
                   / ((CAST(n AS DOUBLE) / CAST(tw AS DOUBLE)
                       + CAST(g AS DOUBLE) / CAST(nn AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) AS qb
        FROM cells),
    agg AS (
        SELECT wk, tw, nn,
               CAST(SUM(n * qa) AS BIGINT) AS sa,
               CAST(SUM(g * qb) AS BIGINT) AS sb
        FROM scored GROUP BY 1, 2, 3)
    SELECT wk AS week_start, tw AS n_events,
           (CAST(sa AS DOUBLE) / CAST(tw AS DOUBLE)
            + CAST(sb AS DOUBLE) / CAST(nn AS DOUBLE)) / 2e6
               AS js_divergence
    FROM agg ORDER BY week_start
"""

ORACLES["dow_hour_interaction"] = """
    WITH cells AS (
        SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
               hour(CAST(ts AS TIMESTAMP)) AS hour,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT *,
               CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS dn,
               CAST(SUM(obs) OVER (PARTITION BY hour) AS BIGINT) AS hn,
               CAST(SUM(obs) OVER () AS BIGINT) AS nn
        FROM cells),
    scored AS (
        SELECT dow, hour, obs, dn, hn, nn,
               CAST(dn AS DOUBLE) * CAST(hn AS DOUBLE) / CAST(nn AS DOUBLE)
                   AS expected,
               (CAST(obs AS DOUBLE)
                - CAST(dn AS DOUBLE) * CAST(hn AS DOUBLE)
                      / CAST(nn AS DOUBLE))
               / sqrt(CAST(dn AS DOUBLE) * CAST(hn AS DOUBLE)
                      / CAST(nn AS DOUBLE)) AS std_residual
        FROM m),
    q AS (
        SELECT *,
               CAST(FLOOR(std_residual * std_residual * 1e9) AS BIGINT)
                   AS qchi
        FROM scored)
    SELECT dow, hour, obs, expected, std_residual,
           CAST(CAST(SUM(qchi) OVER () AS BIGINT) AS DOUBLE) / 1e9
               / CAST(nn AS DOUBLE) AS phi2
    FROM q ORDER BY dow, hour
"""

ORACLES["burstiness_index"] = """
    WITH gaps AS (
        SELECT user_id,
               CAST(FLOOR((epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))) / 1000000)
                   AS BIGINT) AS g
        FROM events),
    mom AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS sx,
               SUM(CAST(g AS HUGEINT) * g) AS sxx
        FROM gaps WHERE g IS NOT NULL GROUP BY 1
        HAVING COUNT(*) >= 5)
    SELECT user_id, n AS n_gaps,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_s,
           sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS std_gap_s,
           (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE)
            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE)
              + CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS burstiness
    FROM mom ORDER BY user_id
"""

ORACLES["seasonality_stability"] = """
    WITH base AS (
        SELECT event_type AS et,
               dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events),
    mid AS (SELECT CAST(FLOOR((MIN(d) + MAX(d)) / 2) AS BIGINT) AS mid
            FROM base),
    cells AS (
        SELECT et, dow,
               CAST(SUM(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM base CROSS JOIN mid GROUP BY 1, 2),
    grid AS (
        SELECT e.et, w.dow,
               COALESCE(c.n1, 0) AS n1, COALESCE(c.n2, 0) AS n2
        FROM (SELECT DISTINCT et FROM cells) e
        CROSS JOIN (SELECT DISTINCT dow FROM cells) w
        LEFT JOIN cells c ON c.et = e.et AND c.dow = w.dow),
    g AS (
        SELECT *,
               CAST(SUM(n1) OVER (PARTITION BY et) AS BIGINT) AS t1,
               CAST(SUM(n2) OVER (PARTITION BY et) AS BIGINT) AS t2
        FROM grid),
    scored AS (
        SELECT et, t1, t2, n1, n2,
               CASE WHEN n1 > 0 THEN CAST(FLOOR(ln(
                   (CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                   / ((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                       + CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) ELSE 0 END AS qa,
               CASE WHEN n2 > 0 THEN CAST(FLOOR(ln(
                   (CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
                   / ((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                       + CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)) / 2.0))
                   * 1e6) AS BIGINT) ELSE 0 END AS qb
        FROM g),
    agg AS (
        SELECT et, t1, t2,
               CAST(SUM(n1 * qa) AS BIGINT) AS sa,
               CAST(SUM(n2 * qb) AS BIGINT) AS sb
        FROM scored GROUP BY 1, 2, 3)
    SELECT et AS event_type, t1 AS n_first_half, t2 AS n_second_half,
           (CAST(sa AS DOUBLE) / CAST(t1 AS DOUBLE)
            + CAST(sb AS DOUBLE) / CAST(t2 AS DOUBLE)) / 2e6
               AS js_divergence
    FROM agg ORDER BY event_type
"""

ORACLES["anomaly_persistence"] = """
    WITH daily AS (
        SELECT event_type AS et,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    mom AS (
        SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sx,
               SUM(CAST(q AS HUGEINT) * q) AS sxx
        FROM daily GROUP BY 1),
    stats AS (
        SELECT et,
               CAST(sx AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS mu,
               sqrt(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                    - (CAST(sx AS DOUBLE) / 1e6)
                      * (CAST(sx AS DOUBLE) / 1e6))
                   / CAST(n AS DOUBLE) AS sig
        FROM mom),
    flagged AS (
        SELECT d.et, d.d
        FROM daily d JOIN stats s ON d.et = s.et
        WHERE (CAST(d.q AS DOUBLE) / 1e6 - s.mu) / s.sig > 2.0
           OR (CAST(d.q AS DOUBLE) / 1e6 - s.mu) / s.sig < -2.0),
    runs AS (
        SELECT et, CAST(COUNT(*) AS BIGINT) AS rl
        FROM (
            SELECT et,
                   d - ROW_NUMBER() OVER (PARTITION BY et ORDER BY d)
                       AS grp
            FROM flagged)
        GROUP BY et, grp)
    SELECT et AS event_type,
           CAST(SUM(rl) AS BIGINT) AS n_flagged_days,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(SUM(CASE WHEN rl >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_persistent_runs,
           CAST(MAX(rl) AS BIGINT) AS max_run_days,
           CAST(COUNT(*) - SUM(CASE WHEN rl >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS isolated_share
    FROM runs GROUP BY 1 ORDER BY event_type
"""

ORACLES["volume_bars"] = """
    WITH base AS (
        SELECT event_type, ts, event_id, value,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS q,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn,
               COALESCE(SUM(CAST(FLOOR(value * 1e6) AS BIGINT))
                            OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING),
                        0) AS cum_before
        FROM events),
    totals AS (
        SELECT event_type,
               GREATEST(CAST(SUM(q) // 20 AS BIGINT),
                        CAST(1 AS BIGINT)) AS thr
        FROM base GROUP BY 1),
    barred AS (
        SELECT b.event_type, CAST(b.cum_before // t.thr AS BIGINT) AS bar,
               b.rn, b.value, b.q
        FROM base b JOIN totals t ON b.event_type = t.event_type)
    SELECT event_type, bar, CAST(COUNT(*) AS BIGINT) AS n_events,
           arg_min(value, rn) AS open,
           MAX(value) AS high, MIN(value) AS low,
           arg_max(value, rn) AS close,
           CAST(SUM(q) AS DOUBLE) / 1e6 AS bar_value
    FROM barred GROUP BY 1, 2 ORDER BY event_type, bar
"""

ORACLES["first_passage_time"] = """
    WITH base AS (
        SELECT user_id, ts, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               SUM(CAST(FLOOR(value * 1e6) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
        FROM events),
    firsts AS (
        SELECT user_id, event_type AS cohort, CAST(ts AS DATE) AS first_day
        FROM base WHERE rn = 1),
    crossings AS (
        SELECT user_id, arg_min(CAST(ts AS DATE), rn) AS cross_day
        FROM base WHERE cum >= 300000000 GROUP BY 1),
    joined AS (
        SELECT f.cohort,
               date_diff('day', f.first_day, c.cross_day) AS days
        FROM firsts f LEFT JOIN crossings c ON f.user_id = c.user_id)
    SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(days) AS BIGINT) AS n_crossed,
           CAST(COUNT(days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS crossed_share,
           CAST(SUM(days) AS DOUBLE) / CAST(COUNT(days) AS DOUBLE)
               AS mean_days_to_cross,
           CAST(MAX(days) AS BIGINT) AS max_days_to_cross
    FROM joined GROUP BY 1 ORDER BY cohort
"""

ORACLES["retention_halflife"] = """
    WITH origin AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
    wk AS (
        SELECT user_id,
               CAST(FLOOR(date_diff('day', d0, CAST(ts AS DATE)) / 7)
                    AS BIGINT) AS wkidx
        FROM events CROSS JOIN origin),
    first AS (
        SELECT user_id, MIN(wkidx) AS cohort FROM wk GROUP BY 1),
    sizes AS (
        SELECT cohort, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM first GROUP BY 1),
    active AS (
        SELECT f.cohort, w.wkidx - f.cohort AS k,
               CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
        FROM wk w JOIN first f ON w.user_id = f.user_id
        GROUP BY 1, 2),
    pts AS (
        SELECT a.cohort, a.k,
               CAST(FLOOR(LN(CAST(a.n_active AS DOUBLE)
                             / CAST(s.n_users AS DOUBLE)) * 1e6)
                    AS BIGINT) AS lq
        FROM active a JOIN sizes s ON a.cohort = s.cohort
        WHERE a.n_active > 0),
    mom AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_weeks,
               SUM(k) AS sx, SUM(CAST(k AS DECIMAL(38,0)) * k) AS sxx,
               SUM(lq) AS sy, SUM(CAST(k AS DECIMAL(38,0)) * lq) AS sxy
        FROM pts GROUP BY 1)
    SELECT cohort, n_weeks,
           (CAST(n_weeks AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
            - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6))
           / (CAST(n_weeks AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               AS decay_per_week,
           -0.6931471805599453e0
           / ((CAST(n_weeks AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
               - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6))
              / (CAST(n_weeks AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
               AS halflife_weeks
    FROM mom WHERE n_weeks >= 3
      AND (CAST(n_weeks AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
           - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1e6)) != 0
    ORDER BY cohort
"""

ORACLES["session_concurrency"] = """
    WITH flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
        SELECT *, CAST(SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
        ) AS INT) AS session_id
        FROM flagged),
    sess AS (
        SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
        FROM sessions GROUP BY 1, 2),
    touched AS (
        SELECT UNNEST(generate_series(date_trunc('hour', st),
                                      date_trunc('hour', en),
                                      INTERVAL 1 HOUR)) AS h
        FROM sess)
    SELECT EXTRACT(hour FROM h) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS session_hours,
           CAST(COUNT(DISTINCT CAST(h AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(COUNT(DISTINCT CAST(h AS DATE)) AS DOUBLE)
               AS avg_concurrent
    FROM touched GROUP BY 1 ORDER BY hour_of_day
"""

ORACLES["peak_hour_stability"] = """
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    peaks AS (
        SELECT day, hr FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                                         ORDER BY n DESC, hr) AS rk
            FROM hourly)
        WHERE rk = 1)
    SELECT hr AS peak_hour, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS day_share
    FROM peaks GROUP BY 1 ORDER BY peak_hour
"""

ORACLES["type_affinity"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    marg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ut GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_all FROM ut),
    co AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type != b.event_type
        GROUP BY 1, 2)
    SELECT ta AS type_a, tb AS type_b, n_both,
           CAST(n_both AS DOUBLE) / CAST(t.n_all AS DOUBLE) AS support,
           CAST(n_both AS DOUBLE) * CAST(t.n_all AS DOUBLE)
               / (CAST(ma.n_users AS DOUBLE) * CAST(mb.n_users AS DOUBLE))
               AS lift
    FROM co JOIN marg ma ON co.ta = ma.event_type
    JOIN marg mb ON co.tb = mb.event_type
    CROSS JOIN tot t
    ORDER BY type_a, type_b
"""

ORACLES["anomaly_cooccurrence"] = """
    WITH daily AS (
        SELECT event_type AS et,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    mom AS (
        SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(q) AS sx, SUM(CAST(q AS DECIMAL(38,0)) * q) AS sxx
        FROM daily GROUP BY 1),
    params AS (
        SELECT et,
               CAST(sx AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS mu,
               SQRT(GREATEST(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
                             - (CAST(sx AS DOUBLE) / 1e6)
                               * (CAST(sx AS DOUBLE) / 1e6), 0.0))
                   / CAST(n AS DOUBLE) AS sig
        FROM mom),
    flagged AS (
        SELECT d.et, d.d
        FROM daily d JOIN params p ON d.et = p.et
        WHERE p.sig > 0
          AND ((CAST(d.q AS DOUBLE) / 1e6 - p.mu) / p.sig > 2.0
               OR (CAST(d.q AS DOUBLE) / 1e6 - p.mu) / p.sig < -2.0)),
    sizes AS (
        SELECT et, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM flagged GROUP BY 1),
    inter AS (
        SELECT a.et AS ta, b.et AS tb,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM flagged a JOIN flagged b
          ON a.d = b.d AND a.et < b.et
        GROUP BY 1, 2)
    SELECT i.ta AS type_a, i.tb AS type_b, i.n_shared,
           sa.n_days AS na, sb.n_days AS nb,
           CAST(i.n_shared AS DOUBLE)
               / CAST(sa.n_days + sb.n_days - i.n_shared AS DOUBLE)
               AS jaccard
    FROM inter i JOIN sizes sa ON i.ta = sa.et
    JOIN sizes sb ON i.tb = sb.et
    ORDER BY type_a, type_b
"""

ORACLES["value_concentration_trend"] = """
    WITH du AS (
        SELECT date_trunc('day', ts) AS day, user_id,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE)
                          * 1e6) AS BIGINT) AS q
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT day, q,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY q DESC, user_id) AS rk,
               COUNT(*) OVER (PARTITION BY day) AS n_users
        FROM du)
    SELECT day, CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN rk <= n_users // 10 + 1 THEN q END)
                AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS top_decile_share
    FROM ranked GROUP BY 1 ORDER BY day
"""

ORACLES["transition_latency"] = """
    WITH pairs AS (
        SELECT LAG(event_type) OVER w AS from_type,
               event_type AS to_type,
               date_diff('second', LAG(ts) OVER w, ts) AS lat
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(lat) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_latency_s,
           CAST(MAX(lat) AS BIGINT) AS max_latency_s
    FROM pairs
    WHERE from_type IS NOT NULL AND from_type != to_type
    GROUP BY 1, 2 ORDER BY from_type, to_type
"""

ORACLES["lifecycle_value_curve"] = """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY 1),
    aged AS (
        SELECT e.user_id,
               CAST(FLOOR(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7)
                    AS BIGINT) AS week_age,
               CAST(FLOOR(e.value * 1e6) AS BIGINT) AS q
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT week_age,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(q) AS DOUBLE) / 1e6 AS total_value,
           CAST(SUM(q) AS DOUBLE) / 1e6
               / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS value_per_user
    FROM aged GROUP BY 1 ORDER BY week_age
"""

ORACLES["weekend_lift"] = """
    WITH tagged AS (
        SELECT event_type,
               dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6) AS wknd,
               value
        FROM events),
    per AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN NOT wknd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_weekday,
               CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_weekend,
               CAST(SUM(CASE WHEN NOT wknd
                             THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN NOT wknd THEN 1 END) AS DOUBLE)
                   AS weekday_mean,
               CAST(SUM(CASE WHEN wknd
                             THEN CAST(value AS DECIMAL(18,8)) END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN wknd THEN 1 END) AS DOUBLE)
                   AS weekend_mean
        FROM tagged GROUP BY 1)
    SELECT event_type, n_weekday, n_weekend, weekday_mean, weekend_mean,
           weekend_mean / weekday_mean AS weekend_lift
    FROM per ORDER BY event_type
"""

ORACLES["type_mix_entropy_trend"] = """
    WITH per AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2),
    daily AS (
        SELECT day, SUM(n) AS total,
               SUM(CASE WHEN n > 1
                        THEN CAST(FLOOR(CAST(n AS DOUBLE)
                                        * ln(CAST(n AS DOUBLE)) * 1e6)
                                  AS BIGINT)
                        ELSE 0 END) AS s
        FROM per GROUP BY 1),
    q AS (
        SELECT datediff('day', DATE '2024-01-01', day) AS x,
               CAST(FLOOR((ln(CAST(total AS DOUBLE))
                           - CAST(s AS DOUBLE) / CAST(total AS DOUBLE) / 1e6)
                          * 1e6) AS BIGINT) AS qh
        FROM daily),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(qh) AS BIGINT) AS sy,
               CAST(SUM(x * qh) AS BIGINT) AS sxy
        FROM q)
    SELECT n_days,
           CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e6 AS mean_entropy,
           CAST(n_days * sxy - sx * sy AS DOUBLE)
               / CAST(n_days * sxx - sx * sx AS DOUBLE) / 1e6
               AS entropy_slope_per_day
    FROM stats
"""

ORACLES["gap_regularity"] = """
    WITH gaps AS (
        SELECT event_type, user_id,
               (epoch_us(lead(ts) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id))
                - epoch_us(ts)) // 60000000 AS g
        FROM events),
    mom AS (
        SELECT event_type, user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS sg,
               CAST(SUM(g * g) AS BIGINT) AS sgg
        FROM gaps WHERE g IS NOT NULL
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2 AND SUM(g) > 0),
    scored AS (
        SELECT event_type,
               CAST(FLOOR(sqrt(GREATEST(0e0,
                   CAST(n * sgg - sg * sg AS DOUBLE)))
                   / CAST(sg AS DOUBLE) * 1e6) AS BIGINT) AS qcv
        FROM mom)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(qcv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
               AS mean_cv,
           CAST(SUM(CASE WHEN qcv < 500000 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS regular_share
    FROM scored GROUP BY 1 ORDER BY event_type
"""

ORACLES["daily_new_returning"] = """
    WITH days AS (
        SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events),
    first AS (
        SELECT user_id, MIN(day) AS first_day FROM days GROUP BY 1),
    tagged AS (
        SELECT d.day, d.day = f.first_day AS is_new
        FROM days d JOIN first f USING (user_id))
    SELECT day,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS new_user_events,
           CAST(SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_events,
           CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS new_share
    FROM tagged GROUP BY 1 ORDER BY day
"""

ORACLES["round_value_bias"] = """
    WITH per AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(CASE WHEN c % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mult10,
               CAST(SUM(CASE WHEN c % 10000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mult100
        FROM (SELECT event_type,
                     CAST(FLOOR(value * 100.0) AS BIGINT) AS c
              FROM events)
        GROUP BY 1)
    SELECT event_type, n_values, n_mult10, n_mult100,
           CAST(n_mult10 AS DOUBLE) / CAST(n_values AS DOUBLE)
               AS mult10_share,
           CAST(n_mult100 AS DOUBLE) / CAST(n_values AS DOUBLE)
               AS mult100_share
    FROM per ORDER BY event_type
"""

ORACLES["interarrival_hazard"] = """
    WITH gaps AS (
        SELECT (epoch_us(lead(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                - epoch_us(ts)) // 60000000 AS g
        FROM events),
    per AS (
        SELECT CAST(LEAST(g // 5, 12) AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_in_bucket
        FROM gaps WHERE g IS NOT NULL GROUP BY 1)
    SELECT bucket, n_in_bucket,
           CAST(SUM(n_in_bucket) OVER (
               ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n_at_risk,
           CAST(n_in_bucket AS DOUBLE)
               / CAST(SUM(n_in_bucket) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS DOUBLE) AS hazard
    FROM per ORDER BY bucket
"""

ORACLES["session_depth_histogram"] = """
    WITH flags AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 30 * 60 * 1000000
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
        SELECT user_id,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flags),
    depth AS (
        SELECT user_id, sid, COUNT(*) AS depth
        FROM sess GROUP BY 1, 2),
    per AS (
        SELECT CAST(LEAST(depth, 10) AS INT) AS depth_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(depth) AS BIGINT) AS n_events
        FROM depth GROUP BY 1)
    SELECT depth_bucket, n_sessions, n_events,
           CAST(n_sessions AS DOUBLE)
               / CAST(SUM(n_sessions) OVER () AS DOUBLE) AS session_share,
           CAST(n_events AS DOUBLE)
               / CAST(SUM(n_events) OVER () AS DOUBLE) AS event_share
    FROM per ORDER BY depth_bucket
"""

ORACLES["gap_autocorrelation"] = """
    WITH gaps AS (
        SELECT event_type, user_id, ts, event_id,
               (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 60000000 AS g
        FROM events
        WINDOW w AS (PARTITION BY event_type, user_id
                     ORDER BY ts, event_id)),
    pairs AS (
        SELECT event_type, g AS x,
               lead(g) OVER (PARTITION BY event_type, user_id
                             ORDER BY ts, event_id) AS y
        FROM gaps),
    mom AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL
        GROUP BY 1)
    SELECT event_type,
           n AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(GREATEST(1e0, CAST(n * sxx - sx * sx AS DOUBLE)))
               / sqrt(GREATEST(1e0, CAST(n * syy - sy * sy AS DOUBLE)))
               AS gap_autocorr_r1
    FROM mom ORDER BY event_type
"""

ORACLES["revenue_run_lengths"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8)))
                               AS DOUBLE) * 1e6) AS BIGINT) AS qd
        FROM orders GROUP BY 1),
    flagged AS (
        SELECT d, qd * COUNT(*) OVER () > SUM(qd) OVER () AS above
        FROM daily),
    runs AS (
        SELECT above,
               ROW_NUMBER() OVER (ORDER BY d)
                 - ROW_NUMBER() OVER (PARTITION BY above ORDER BY d) AS grp
        FROM flagged),
    per_run AS (
        SELECT above, grp, COUNT(*) AS run_len FROM runs GROUP BY 1, 2)
    SELECT CASE WHEN above THEN 'above' ELSE 'below' END AS direction,
           CAST(run_len AS BIGINT) AS run_len,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM per_run GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["month_end_effect"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8)))
                               AS DOUBLE) * 1e6) AS BIGINT) AS qd
        FROM orders GROUP BY 1),
    per AS (
        SELECT date_trunc('month', d) AS month,
               SUM(CASE WHEN date_diff('day', CAST(d AS DATE),
                                       last_day(CAST(d AS DATE))) <= 2
                        THEN qd END) AS q_end,
               COUNT(CASE WHEN date_diff('day', CAST(d AS DATE),
                                         last_day(CAST(d AS DATE))) <= 2
                          THEN 1 END) AS n_end,
               SUM(CASE WHEN date_diff('day', CAST(d AS DATE),
                                       last_day(CAST(d AS DATE))) > 2
                        THEN qd END) AS q_rest,
               COUNT(CASE WHEN date_diff('day', CAST(d AS DATE),
                                         last_day(CAST(d AS DATE))) > 2
                          THEN 1 END) AS n_rest
        FROM daily GROUP BY 1)
    SELECT month,
           CAST(n_end AS BIGINT) AS n_end_days,
           CAST(n_rest AS BIGINT) AS n_rest_days,
           CAST(q_end AS DOUBLE) / CAST(n_end AS DOUBLE) / 1e6
               AS mean_end_revenue,
           CAST(q_rest AS DOUBLE) / CAST(n_rest AS DOUBLE) / 1e6
               AS mean_rest_revenue,
           CASE WHEN n_end > 0 AND n_rest > 0 THEN
               (CAST(q_end AS DOUBLE) / CAST(n_end AS DOUBLE) / 1e6)
               / (CAST(q_rest AS DOUBLE) / CAST(n_rest AS DOUBLE) / 1e6)
           END AS end_lift
    FROM per ORDER BY month
"""
