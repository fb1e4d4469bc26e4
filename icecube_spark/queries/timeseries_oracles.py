"""DuckDB oracle SQL for SURVEY §2 group C (twin of timeseries_queries.py)."""

from icecube_spark.functions.parity import sql_dsum

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
