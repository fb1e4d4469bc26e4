"""Time-series queries (SURVEY §2 group C)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icecube_spark import catalog
from icecube_spark.functions.parity import dsum
from icecube_spark.operators import asof, timeseries


def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — as-of join: each event gets the user's most recent order.

    Generalizes the reference's nearest-acquisition alignment
    (sar_datacube.py:108-160). user_id keys directly into o_custkey.
    """
    ev = catalog.load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof.asof_join(
        ev,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        left_key="user_id",
        right_key="o_custkey",
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id", "ts", "user_id", "o_orderkey", "o_orderdate", "o_totalprice"
    )


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1b — forward as-of join: each event gets the user's NEXT order
    (earliest order at-or-after the event)."""
    ev = catalog.load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof.asof_join(
        ev,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        left_key="user_id",
        right_key="o_custkey",
        tiebreak="o_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id", "ts", "user_id", "o_orderkey", "o_orderdate", "o_totalprice"
    )


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1c — nearest as-of join with tolerance: the user's closest
    order in time, either side, within 7 days; ties go backward.
    Both direction carries share one exchange (two in-partition
    sorts, zero extra shuffles)."""
    ev = catalog.load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof.asof_join(
        ev,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        left_key="user_id",
        right_key="o_custkey",
        tiebreak="o_orderkey",
        direction="nearest",
        tolerance=7 * 86400 * 1_000_000,  # 7 days in µs
    )
    return out.select(
        "event_id", "ts", "user_id", "o_orderkey", "o_orderdate", "o_totalprice"
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — session windows (gap > 30 min) with per-session stats."""
    ev = catalog.load(spark, sf_dir, "events")
    sess = timeseries.sessionize(ev, "ts", "user_id", gap_minutes=30)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — tumbling 1-hour aggregate; batch twin of streaming/events.py."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        {"n_events": F.count(F.lit(1)), "sum_value": dsum("value")},
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


def rolling_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — 7-day rolling mean of daily order revenue (RANGE frame)."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = (
        orders.withColumn("day", F.to_date("o_orderdate").cast("timestamp"))
        .groupBy("day")
        .agg(dsum("o_totalprice").alias("revenue"))
        .withColumn("day_num", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
    )
    out = timeseries.rolling_window_agg(
        daily, "day_num", "revenue", preceding=6
    )
    return out.select(
        "day",
        "revenue",
        F.col("rolling_avg").alias("rolling_avg_7d"),
        F.col("n_in_window").alias("n_days_in_window"),
    )


def range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — bucketed range join: for every error event, how many click
    events the same user produced in the following hour. The naive
    plan is an inequality join (cartesian per user); the bucketed plan
    equi-joins on (user, hour-bucket) with bounded interval fanout.
    """
    from icecube_spark.operators.rangejoin import bucketed_interval_join

    ev = catalog.load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = bucketed_interval_join(
        clicks, errors, key="user_id", point_ts="click_ts",
        start_col="t0", end_col="t1",
    )
    counts = pairs.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_clicks_next_hour")
    )
    return (
        errors.join(counts, "error_id", "left")
        .select(
            "error_id",
            "user_id",
            F.col("t0").alias("error_ts"),
            F.coalesce("n_clicks_next_hour", F.lit(0)).alias("n_clicks_next_hour"),
        )
        .orderBy("error_id")
    )


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — daily OHLC bars per event_type: open/high/low/close +
    volume, tie-broken deterministically via (ts, value) struct
    ordering. One shuffle on the group key, map-side partials."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.ohlc(ev, "ts", "value", ["event_type"], "day")
    return out.select(
        "event_type", "bucket", "open", "high", "low", "close", "volume", "n"
    )


def gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — per-user inter-event gap profile: number of gaps, mean
    gap seconds (decimal-exact), max gap. The lag window and the
    aggregate share one shuffle on user_id. The datacube analogue of
    the reference's temporal-resolution estimation (how sparse is
    each stack's time axis)."""
    ev = catalog.load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from icecube_spark.operators.timeseries import _us

    gap = _us("ts") - _us(F.lag("ts").over(w))
    gaps = ev.select("user_id", gap.alias("gap_us")).where(
        F.col("gap_us").isNotNull()
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum(F.col("gap_us")) / F.count(F.lit(1)) / 1e6).alias(
                "mean_gap_s"
            ),
            (F.max("gap_us") / 1e6).alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — per-type z-score outliers: events whose value deviates
    more than 3 sigma from their event_type's mean. Mean/std come from
    decimal-exact sum and sum-of-squares (one agg pass), broadcast
    back onto the stream — two scans, one tiny shuffle, no window.
    Engine-exact: both engines derive std from identical doubles via
    identical IEEE arithmetic."""
    ev = catalog.load(spark, sf_dir, "events")
    sq = F.col("value") * F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s1"),
        dsum(sq).alias("s2"),
    )
    stats = stats.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", (F.col("value") - F.col("mean")) / F.col("std"))
        .where(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", "mean", "std", "zscore")
        .orderBy("event_id")
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 — per-user daily time-weighted average of `value`
    (TimescaleDB time_weight parity): each event's value is weighted
    by the microseconds until the user's next event that day. Lead
    window and aggregate share one (user, day) shuffle."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.time_weighted_avg(
        ev, "ts", "value", ["user_id"], tiebreak_col="event_id", bucket="day"
    )
    return out.orderBy("user_id", "bucket")


def trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 — per-event_type OLS trend of the daily-mean value series
    (slope per day, intercept at the 2024-01-01 series epoch).
    Generalizes the reference's acquisition-axis stacking
    (sar_datacube.py:108-160) to the standard time-series velocity
    product: two shuffles, the second over one row per (type, day)."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "day_num"
            ),
        )
        .agg((dsum("value") / F.count(F.lit(1))).alias("daily_mean"))
    )
    out = timeseries.trend_stats(daily, "day_num", "daily_mean", ["event_type"])
    return out.orderBy("event_type")


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — hypertable-style continuous aggregate: one pass producing
    hour, day, and month resolutions via ROLLUP (TimescaleDB
    continuous-aggregate pattern). grouping_id disambiguates levels;
    partial aggregation keeps it one shuffle."""
    ev = catalog.load(spark, sf_dir, "events")
    month = F.date_trunc("month", "ts").alias("month")
    day = F.date_trunc("day", "ts").alias("day")
    hour = F.date_trunc("hour", "ts").alias("hour")
    return (
        ev.select(month, day, hour, "value")
        .rollup("month", "day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            F.grouping_id().alias("level"),
        )
        .where(F.col("month").isNotNull() | (F.col("level") == 7))
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16 — retention triangle over events: users bucketed by first-
    active day, counted per later active day. One wide shuffle on
    user_id serves cohort-window + dedup; the rollup moves only
    deduped (user, day) rows."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.cohort_retention(ev, "ts", "user_id")
    return out.orderBy("cohort_day", "day_offset")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17 — signup → view → purchase ordered funnel with per-step
    user counts and conversion rates. Chained partition-only windows
    over a single user_id exchange."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.funnel_conversion(
        ev, "ts", "user_id", "event_type", ["signup", "view", "purchase"]
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 — exact discrete p50/p90/p99 of value per event_type
    (PERCENTILE_DISC rank-selection — engine-exact, no interpolation).
    Single exchange: ordered + unordered windows and the final groupBy
    all reuse the event_type partitioning."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.percentile_disc(
        ev, ["event_type"], "value", tiebreak_col="event_id"
    )
    return out.orderBy("event_type")


def calendar_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 — per-user daily values with calendar-exact 1-day and 7-day
    lag features (null across gaps). One explicit user_id exchange
    reused by the daily agg and every RANGE window."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.calendar_lags(ev, "ts", "user_id", "value", lags=(1, 7))
    return out.orderBy("user_id", "day_num")


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20 — per-customer cumulative order spend (lifetime-to-date
    ledger): one shuffle on o_custkey, decimal prefix sums."""
    orders = catalog.load(spark, sf_dir, "orders")
    out = timeseries.running_total(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], "o_totalprice"
    )
    return out.orderBy("o_custkey", "seq")


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21 — event-type Markov transition matrix over per-user
    timelines with conditional probabilities."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.transition_counts(ev, "user_id", "ts", "event_type", "event_id")
    return out.orderBy("from_type", "to_type")


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C22 — DAU + trailing-7-day distinct actives + stickiness."""
    ev = catalog.load(spark, sf_dir, "events")
    out = timeseries.rolling_active_users(ev, "ts", "user_id", window_days=7)
    return out.orderBy("day")


def conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23 — signup→purchase time-to-convert profile: exact
    rank-selected lag quantiles in microseconds."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.conversion_lag_quantiles(
        ev, "ts", "user_id", "event_type", "signup", "purchase"
    )


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24 — weekday×hour activity heat map per event type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.activity_heatmap(ev, "ts", "event_type").orderBy(
        "event_type", "dow", "hour"
    )


def coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 — per-user time-axis coverage (active days, span, longest
    gap, completeness)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.coverage_report(ev, "ts", "user_id").orderBy("user_id")


def rapid_repeat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26 — same-type sub-second repeat detector (bot / dup-fire
    signal) per user."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.rapid_repeats(
        ev, "ts", "user_id", "event_type", "event_id", max_gap_s=60
    ).orderBy("user_id")


def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27 — JSON payload promotion (from_json) + per-type profile of
    the extracted field."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.json_props_stats(ev, "event_type", "props").orderBy("event_type")


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28 — fixed-width value histogram per event type (drift
    monitor input)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.value_histogram(ev, "event_type", "value", width=50.0).orderBy(
        "event_type", "bucket"
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29 — SCD2 state-history compression of the event stream."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.scd2_intervals(
        ev, "user_id", "ts", "event_type", "event_id"
    ).orderBy("user_id", "valid_from_us")


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30 — last-touch purchase attribution by channel."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.last_touch_attribution(
        ev, "ts", "user_id", "event_type", "event_id", target="purchase"
    ).orderBy("channel")


def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31 — exponentially-weighted smoothing of per-type daily means
    (alpha=1/2 truncated to 10 points; exact power-of-two weights)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.ewma_smooth(ev, "ts", "event_type", "value").orderBy(
        "event_type", "day"
    )


def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32 — top-20 first-three-event onboarding paths across users."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.top_event_paths(ev, "ts", "user_id", "event_type", "event_id")


def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33 — per-user-per-day union of 5-minute activity intervals
    (gaps-and-islands interval algebra)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.interval_coverage(ev, "ts", "user_id").orderBy(
        "user_id", "day"
    )


def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34 — CUSUM level-shift scan over per-type daily counts."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.changepoint_cusum(ev, "ts", "event_type").orderBy("event_type")


def downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C35 — LTTB-style visual downsampling: one dominant point per
    20-point bucket per event type (parallel-anchor variant)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.downsample_lttb(
        ev, "ts", "event_type", "value", "event_id"
    ).orderBy("event_type", "bucket")


def seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C36 — detrended weekday seasonality per event type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.seasonal_dow(ev, "ts", "event_type").orderBy(
        "event_type", "dow"
    )


def feature_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37 — wide per-user feature pivot (counts + exact sums per
    event type)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.feature_pivot(
        ev, "user_id", "event_type", "value",
        ["click", "error", "purchase", "signup", "view"],
    ).orderBy("user_id")


def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38 — MERGE INTO semantics: the events stream is interpreted as
    a CDC feed against the orders snapshot (error=delete, else
    upsert of a derived price; latest event per key wins)."""
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ev = catalog.load(spark, sf_dir, "events")
    changes = ev.select(
        ((F.col("event_id") % 30000) + 1).alias("o_orderkey"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        (F.col("value") * 100).alias("o_totalprice"),
        "ts",
        "event_id",
    )
    return timeseries.cdc_merge(
        orders,
        changes,
        key_col="o_orderkey",
        value_col="o_totalprice",
        op_col="op",
        order_cols=["ts", "event_id"],
    ).orderBy("o_orderkey")


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18b — approx_percentile sketch quantiles per event type
    (rows-only: the sketch is engine-specific; the unit test pins the
    error vs exact C18). This is the 100 TB quantile path — a
    KLL/GK-style mergeable sketch, one pass, constant memory per
    group — where exact rank-selection (C18) is the small-scale twin.
    """
    ev = catalog.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"
            ).alias("q"),
        )
        .select(
            "event_type",
            "n",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p90"),
            F.col("q")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


def acf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C40 — autocorrelation of the daily event-value total at lags
    1..7 (weekly seasonality diagnostic)."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(dsum("value").alias("daily_value"))
    return timeseries.acf(daily, "day_num", "daily_value", max_lag=7).orderBy(
        "lag"
    )


def burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C41 — per-user hourly activity bursts (>=3 events and >=2x the
    user's own mean hourly rate)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.burst_detection(ev, "ts", "user_id").orderBy(
        "user_id", "hour_start"
    )


def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C42 — additive trend/weekday-seasonal/residual decomposition
    of daily order revenue (STL-lite)."""
    from icecube_spark.functions.parity import qsum

    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").cast("timestamp").alias("day")
    ).agg(qsum(F.col("o_totalprice")).alias("revenue"))
    return timeseries.seasonal_decompose(daily, "day", "revenue").orderBy("day")


def order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C45 — daily open-order backlog (sweep-line running sum)."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    return timeseries.order_backlog(orders, li).orderBy("day")


def m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C46 — M4 per-pixel-exact downsampling of the value series,
    100 buckets per event type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.m4_downsample(
        ev, "ts", "event_type", "value", "event_id", n_buckets=100
    ).orderBy("event_type", "bucket")


def pit_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47 — point-in-time join: each order (as an audit probe) is
    labeled with its customer's event-stream state (SCD2 interval) at
    a deterministic probe instant inside the event era. The order
    dates themselves predate the event stream, so the probe time is
    derived as a reproducible offset into the stream's year — the
    mechanism under test (interval-cover temporal lookup) is exactly
    the warehouse "AS OF" join."""
    ev = catalog.load(spark, sf_dir, "events")
    iv = timeseries.scd2_intervals(ev, "user_id", "ts", "event_type", "event_id")
    probe_us = (
        F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
        + (F.col("o_orderkey") % 31536000) * F.lit(1000000)
    )
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey"),
        probe_us.cast("bigint").alias("o_ts_us"),
    )
    out = timeseries.pit_join(
        orders, iv.withColumnRenamed("user_id", "__iv_user"), "o_custkey", "o_ts_us", "__iv_user"
    )
    return out.select(
        "o_orderkey", "o_custkey", "o_ts_us", "state", "valid_from_us", "valid_to_us"
    ).orderBy("o_orderkey")


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50 — robust MAD outliers per event type (|x−med| > 3·1.4826·MAD)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.mad_outliers(ev, "event_type", "value", "event_id").orderBy(
        "event_type", "event_id"
    )


def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C52 — winsorized robust value summary per event_type: exact
    discrete [p5, p95] fences, clip counts, raw vs clipped means."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.winsorize_stats(
        ev, ["event_type"], "value", tiebreak_col="event_id"
    ).orderBy("event_type")


def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C53 — Kaplan-Meier time-to-first-purchase curve (log scale),
    right-censored at the observation end."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.kaplan_meier(
        ev, "ts", "user_id", F.col("event_type") == "purchase"
    )


def forecast_baseline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C55 — seasonal-naive (t-7) forecast MAE/MASE per event_type on
    the daily value series."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.forecast_baseline_eval(
        ev, "ts", "event_type", "value", season=7
    )


def peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C59 — strict local maxima on the daily value series per
    event_type: days whose total strictly exceeds both calendar
    neighbors (missing neighbor = not a peak). The alarm primitive
    burst_detection's rate model doesn't give: point peaks.

    Plan: one (key, day) aggregate, then two calendar-exact RANGE
    lags on the same key exchange; the peak predicate is a codegen
    compare of decimal-fold sums."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.to_date(F.col("ts").cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num"),
            "value",
        )
        .groupBy("event_type", "day_num")
        .agg(dsum("value").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day_num")
    prev = F.max("v").over(w.rangeBetween(-1, -1))
    nxt = F.max("v").over(w.rangeBetween(1, 1))
    return (
        daily.select(
            "event_type",
            "day_num",
            "v",
            prev.alias("prev_v"),
            nxt.alias("next_v"),
        )
        .where(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("v") > F.col("prev_v"))
            & (F.col("v") > F.col("next_v"))
        )
        .orderBy("event_type", "day_num")
    )


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C60 — max peak-to-trough drawdown of the cumulative daily
    value per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.max_drawdown(ev, "ts", "event_type", "value")


def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C61 — 7-day rolling mean ±2σ envelope with breach flags per
    event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.bollinger_bands(ev, "ts", "event_type", "value")


def bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C63 — daily bounce rate: share of 30-minute-gap sessions that
    contain exactly one event, per session-start day. The
    engagement-quality KPI sessionize (C2) feeds.

    Plan: the C2 session assignment (one user-key exchange), then a
    (user, session) collapse on the SAME exchange, then one small
    (day) aggregate. Rates are exact integer divisions.
    """
    ev = catalog.load(spark, sf_dir, "events")
    sess = timeseries.sessionize(
        ev.select("user_id", F.col("ts").cast("timestamp").alias("ts")),
        "ts",
        "user_id",
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
    )
    return (
        per_session.groupBy(
            F.to_date("start_ts").cast("timestamp").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            (
                F.col("n_bounces").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("bounce_rate"),
        )
        .orderBy("day")
    )


def series_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C64 — lead-lag cross-correlation between two daily series
    (click vs purchase): normalized cross-correlation at every lag in
    [-7, +7], ranked — does one series SHIFT the other, and by how
    many days? The time-domain twin of cube_coregister's spatial
    scan, and the causal-screening step before any "X drives Y"
    claim.

    Exactness: daily values quantize to micro-units; per-lag products
    and the normalizing moments are exact integer sums; the
    normalized r at each lag is one fixed-shape double expression
    (overlap-windowed means), quantized to a 1e-9 grid for the same
    int128-cast reason as corr_matrix; ranking compares (r, lag).

    Plan: two conditional daily aggregates in one pass (the A26
    trick); series A explodes over the 15 candidate lags map-side
    and equi-joins B on the shifted day — 15× fanout on DAYS, not
    events; per-lag moments are a 15-row aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.datediff(
                F.to_date(F.col("ts").cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_num")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    F.floor(F.col("value") * F.lit(1e6)).cast("bigint"),
                )
            ).alias("qa"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(1e6)).cast("bigint"),
                )
            ).alias("qb"),
        )
        .na.fill({"qa": 0, "qb": 0})
    )
    lags = F.explode(F.expr("sequence(-7, 7)")).alias("lag")
    a = daily.select("day_num", "qa", lags).select(
        (F.col("day_num") + F.col("lag")).alias("b_day"), "lag", "qa"
    )
    b = daily.select(F.col("day_num").alias("b_day"), "qb")
    j = a.join(b, "b_day")
    dec = "decimal(38,0)"
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("qa").cast(dec)).alias("sa"),
        F.sum(F.col("qb").cast(dec)).alias("sb"),
        F.sum(F.col("qa").cast(dec) * F.col("qa")).alias("saa"),
        F.sum(F.col("qb").cast(dec) * F.col("qb")).alias("sbb"),
        F.sum(F.col("qa").cast(dec) * F.col("qb")).alias("sab"),
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa, sbb, sab = (
        F.col("saa").cast("double"),
        F.col("sbb").cast("double"),
        F.col("sab").cast("double"),
    )
    raw = (n * sab - sa * sb) / (
        F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
    )
    r = F.floor(raw * F.lit(1e9)).cast("bigint").cast("double") / F.lit(1e9)
    scored = m.select("lag", "n", r.alias("r"))
    w = Window.partitionBy().orderBy(F.desc("r"), F.asc("lag"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "lag", F.col("n").alias("n_overlap"), "r")
        .orderBy("rank")
    )


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C65 — Theil–Sen robust daily-trend slope per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.theil_sen_trend(ev, "ts", "event_type", "value")


def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66 — two-sample KS drift (early vs late half) per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.ks_drift(ev, "ts", "event_type", "value")


def benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C67 — Benford first-digit audit of values per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.benford_deviation(ev, "event_type", "value")


def record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C68 — record-breaking daily totals per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.record_days(ev, "ts", "event_type", "value")


def mean_shift_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C69 — best single mean-shift split day per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.mean_shift_split(ev, "ts", "event_type", "value")


def dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C70 — one-way ANOVA of values across day-of-week groups."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.dow_anova(ev, "ts", "event_type", "value")


def active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C71 — consecutive-active-day streaks per user (gaps & islands)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.active_streaks(ev, "ts", "user_id")


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C75 — Population Stability Index (early-half baseline deciles)
    per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.psi_drift(ev, "ts", "event_type", "value")


def window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C76 — 7-day time-capped ordered funnel (ClickHouse
    windowFunnel semantics)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.window_funnel_strict(
        ev, "ts", "user_id", "event_type", ["signup", "view", "purchase"]
    )


def sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C77 — SAX symbolization of daily totals per event_type (weekly
    PAA, 4-symbol Gaussian-breakpoint alphabet)."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.sax_symbols(ev, "ts", "event_type", "value")


def period_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C78 — dominant periodicity (ACF argmax over lags 2..14) per
    event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.period_detect(ev, "ts", "event_type", "value")


def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79 — difference-in-differences of purchase vs view values
    across the mid-range split."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.diff_in_diff(ev, "ts", "event_type", "value", "purchase", "view")


def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C81 — linear multi-touch credit split across view/click
    touches in the 7 days before each purchase."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.multitouch_attribution(ev, "ts", "user_id", "event_type")


def markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C82 — next-event prediction accuracy of the early-half-trained
    Markov model on late-half transitions."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.markov_accuracy(ev, "ts", "user_id", "event_type")


def haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C83 — 3-level Haar wavelet detail-energy shares of the daily
    series per event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.haar_energy(ev, "ts", "event_type", "value")


def value_at_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C84 — historical 5% VaR + expected shortfall of values per
    event_type."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.value_at_risk(ev, "event_type", "value")


def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C85 — Kruskal-Wallis H: the k-sample rank test of `value`
    across event types (the nonparametric ANOVA — dow_anova's
    rank-based twin, mann_whitney's k-group generalization), with the
    tie-corrected statistic. Used to decide "do these five metric
    streams share a distribution?" without normality assumptions.

    Plan: ranks come from DISTINCT-value cumulative counts — one
    groupBy collapses N events to distinct values, one ordered window
    over that (much smaller) frame assigns midranks, and per-group
    rank sums join back on the value key; nothing ranks raw rows. At
    100 TB the distinct-value window is a range-partitioned sort —
    the same two-pass global-rank discipline as survival_km.

    Exactness: midranks are held as 2·rank integers (BIGINT), group
    contributions quantize to 1e-6 before the 5-row fold, and the
    tie-correction sums t³−t in exact integers, so H hashes exactly.
    """
    ev = catalog.load(spark, sf_dir, "events")
    gv = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("gc")
    )
    vals = gv.groupBy("value").agg(F.sum("gc").alias("cnt"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.withColumn("cum", F.sum("cnt").over(wv)).select(
        "value",
        # 2 × average rank of a tie group, exact in integers:
        # avg_rank = (cum - cnt) + (cnt + 1) / 2
        (F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + F.lit(1))
        .alias("two_r"),
    )
    grp = (
        gv.join(ranked, "value")
        .groupBy("event_type")
        .agg(
            F.sum("gc").alias("n_i"),
            F.sum(F.col("gc") * F.col("two_r")).alias("s2r"),
        )
    )
    tot = vals.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .alias("tie3"),
    )
    n = F.col("n").cast("double")
    mean_rank = F.col("s2r").cast("double") / (
        F.lit(2.0) * F.col("n_i").cast("double")
    )
    dev = mean_rank - (n + F.lit(1.0)) / F.lit(2.0)
    contrib = F.floor(
        F.col("n_i").cast("double") * dev * dev * F.lit(1e6)
    ).cast("bigint")
    per_group = grp.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("_n"), F.col("tie3").alias("_t3"),
        contrib.alias("qc"),
        F.lit(1).alias("k1"),
    )
    agg = per_group.groupBy("_n", "_t3").agg(
        F.sum("qc").alias("sqc"), F.sum("k1").cast("int").alias("k")
    )
    an = F.col("_n").cast("double")
    h = (
        F.lit(12.0) / (an * (an + F.lit(1.0)))
        * (F.col("sqc").cast("double") / F.lit(1e6))
    )
    corr = F.lit(1.0) - F.col("_t3").cast("double") / (
        an * an * an - an
    )
    return agg.select(
        F.col("_n").alias("n_obs"),
        (F.col("k") - F.lit(1)).alias("dof"),
        h.alias("h_stat"),
        corr.alias("tie_correction"),
        (h / corr).alias("h_corrected"),
    )


def interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C86 — inter-arrival exponential fit + one-sample KS: per event
    type, the MLE rate of an exponential model over consecutive-event
    gaps and the Kolmogorov-Smirnov distance between the empirical
    gap distribution and that fitted exponential. KS near 0 ⇒ the
    stream is memoryless (Poisson arrivals — queueing math applies);
    large KS ⇒ bursty/scheduled traffic (burst_detection's formal
    counterpart).

    Plan: one per-type ordered window for gaps (key-partitioned, no
    global sort), a second for gap ranks, one aggregate. Exactness:
    gaps are exact integer microseconds; each exp() argument is a
    ratio of exact integers (identical double both engines); the
    model CDF snaps to a 1e-9 grid per distinct gap; the KS statistic
    is a MAX of identically-computed doubles — no order-dependent
    float fold anywhere.
    """
    from icecube_spark.operators.timeseries import _us

    from icecube_spark.operators.pipeline import (
        distributed_lag,
        distributed_rank,
    )

    ev = catalog.load(spark, sf_dir, "events")
    # per-type previous-timestamp via the keyed distributed_lag —
    # bit-identical to the type-partitioned lag window the oracle
    # uses, without holding a whole type's events in one task
    gaps = (
        distributed_lag(
            ev.select(
                "event_type", "ts", "event_id", _us(F.col("ts")).alias("__us")
            ),
            ["ts", "event_id"],
            "__us",
            lag_col="__prev",
            key_cols=["event_type"],
        )
        .withColumn("gap_us", F.col("__us") - F.col("__prev"))
        .where(F.col("gap_us").isNotNull())
        .select("event_type", "ts", "event_id", "gap_us")
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_us").alias("s"),
    )

    # per-type gap ranks via the keyed distributed_rank — bit-identical
    # to the type-partitioned window the oracle uses, without holding a
    # whole type's gap rows in one task at 100 TB
    ranked = distributed_rank(
        gaps,
        ["gap_us", "ts", "event_id"],
        rank_col="i",
        key_cols=["event_type"],
    ).join(F.broadcast(agg), "event_type")
    # fitted CDF at each gap, quantized once per row to a 1e-9 grid
    fexp = F.floor(
        (
            F.lit(1.0)
            - F.exp(
                -(F.col("gap_us").cast("double") * F.col("n").cast("double"))
                / F.col("s").cast("double")
            )
        ) * F.lit(1e9)
    ) / F.lit(1e9)
    nn = F.col("n").cast("double")
    dev = F.greatest(
        F.col("i").cast("double") / nn - fexp,
        fexp - (F.col("i") - F.lit(1)).cast("double") / nn,
    )
    ks = ranked.groupBy("event_type", "n", "s").agg(
        F.max(dev).alias("ks_stat")
    )
    mean_gap_s = (
        F.col("s").cast("double") / F.col("n").cast("double") / F.lit(1e6)
    )
    return ks.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        mean_gap_s.alias("mean_gap_s"),
        (F.lit(3600.0) / mean_gap_s).alias("rate_per_hour"),
        "ks_stat",
    ).orderBy("event_type")


def ljung_box_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C87 — Ljung-Box Q on the daily order-revenue series, lags
    1..7: residual-autocorrelation sign-off for the forecasting
    family (C55/C42). Daily revenue folds as exact integer cents
    before the operator's quantized moments."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        (
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
            ).cast("double")
            / F.lit(1e2)
        ).alias("revenue")
    )
    return timeseries.ljung_box(daily, "day_num", "revenue", max_lag=7)


def runs_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C88 — Wald-Wolfowitz runs test on daily order revenue
    (integer cents), days at the median excluded."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
        ).alias("cents")
    )
    return timeseries.runs_test(daily, "day_num", "cents")


def turning_points_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C89 — turning-point randomness test on daily order revenue
    (integer cents)."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
        ).alias("cents")
    )
    return timeseries.turning_points(daily, "day_num", "cents")


def drawdown_durations_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C90 — drawdown-episode profile of daily order revenue
    (integer cents; depth reported in currency units)."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
        ).alias("cents")
    )
    return timeseries.drawdown_durations(daily, "day_num", "cents")


def seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C91 — Hyndman seasonal/trend strength of the daily revenue
    decomposition: F_s = max(0, 1 - Var(R)/Var(S+R)) and
    F_t = max(0, 1 - Var(R)/Var(T+R)) over C42's STL-lite output.
    THE one-number summaries that decide whether a forecast model
    needs seasonal terms at all (Hyndman & Athanasopoulos, FPP).

    Exactness: the decomposition columns are already engine-exact;
    each variance operand quantizes to floor(x*1e6) BIGINT and the
    unnormalized variance n·Σx²−(Σx)² folds in DECIMAL(38,0); the
    strengths are single divisions of exact integers, snapped 1e-9.

    Plan: one extra single-row aggregate over the calendar-bounded
    decomposition frame.
    """
    from icecube_spark.functions.parity import qsum  # noqa: F401

    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").cast("timestamp").alias("day")
    ).agg(
        (
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(1e6)).cast("bigint")
            ).cast("double")
            / F.lit(1e6)
        ).alias("revenue")
    )
    dec = timeseries.seasonal_decompose(daily, "day", "revenue").where(
        F.col("trend").isNotNull()
    )
    qr = F.floor(F.col("residual") * F.lit(1e6)).cast("bigint")
    qsr = F.floor((F.col("value") - F.col("trend")) * F.lit(1e6)).cast("bigint")
    qtr = F.floor((F.col("value") - F.col("seasonal")) * F.lit(1e6)).cast(
        "bigint"
    )
    q = dec.select(qr.alias("r"), qsr.alias("sr"), qtr.alias("tr"))
    agg = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").alias("s_r"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r")).alias("ss_r"),
        F.sum("sr").alias("s_sr"),
        F.sum(F.col("sr").cast("decimal(38,0)") * F.col("sr")).alias("ss_sr"),
        F.sum("tr").alias("s_tr"),
        F.sum(F.col("tr").cast("decimal(38,0)") * F.col("tr")).alias("ss_tr"),
    )
    def uvar(ss, s):
        return (
            F.col("n").cast("double") * F.col(ss).cast("double")
            - F.col(s).cast("double") * F.col(s).cast("double")
        )
    grid = lambda c: F.floor(c * F.lit(1e9)) / F.lit(1e9)  # noqa: E731
    vr, vsr, vtr = uvar("ss_r", "s_r"), uvar("ss_sr", "s_sr"), uvar("ss_tr", "s_tr")
    return agg.select(
        F.col("n").alias("n_days"),
        grid(
            F.greatest(F.lit(0.0), F.lit(1.0) - vr / vsr)
        ).alias("seasonal_strength"),
        grid(
            F.greatest(F.lit(0.0), F.lit(1.0) - vr / vtr)
        ).alias("trend_strength"),
    )


def intervention_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C92 — interrupted time-series (segmented regression) on daily
    revenue around the series midpoint: pre/post OLS slopes, the
    slope change, and the level change at the breakpoint. The
    single-series causal-read companion to diff_in_diff (which needs
    a control group; ITS needs only the break date).

    Exactness: OLS moments are exact integer folds (days x cents,
    DECIMAL(38,0)); slopes are single divisions; the level change
    evaluates the same expression shape in both engines; outputs
    snap to a 1e-9 grid.

    Plan: one daily rollup, one broadcast 1-row extent, a 2-group
    moment aggregate — flat cost at any corpus size.
    """
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("i")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
        ).alias("y")
    )
    ext = daily.agg(
        F.floor(
            (F.min("i") + F.max("i")).cast("double") / F.lit(2.0)
        ).cast("bigint").alias("bp")
    )
    seg = daily.crossJoin(F.broadcast(ext)).select(
        "i", "y", "bp", (F.col("i") >= F.col("bp")).alias("post")
    )
    mom = seg.groupBy("post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("i").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("i")).alias("sxx"),
        F.max("bp").alias("bp"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / nd
    fit = mom.select(
        "post", "n", "bp",
        slope.alias("slope"), intercept.alias("icept"),
    )
    pre = fit.where(~F.col("post")).select(
        F.col("n").alias("n_pre"), F.col("slope").alias("slope_pre"),
        F.col("icept").alias("icept_pre"), "bp",
    )
    post = fit.where(F.col("post")).select(
        F.col("n").alias("n_post"), F.col("slope").alias("slope_post"),
        F.col("icept").alias("icept_post"),
    )
    j = pre.crossJoin(F.broadcast(post))
    bpd = F.col("bp").cast("double")
    grid = lambda c: F.floor(c * F.lit(1e9)) / F.lit(1e9)  # noqa: E731
    return j.select(
        F.col("bp").alias("bp_day"),
        "n_pre",
        "n_post",
        grid(F.col("slope_pre") / F.lit(1e2)).alias("slope_pre"),
        grid(F.col("slope_post") / F.lit(1e2)).alias("slope_post"),
        grid(
            (F.col("slope_post") - F.col("slope_pre")) / F.lit(1e2)
        ).alias("slope_change"),
        grid(
            (
                (F.col("icept_post") + F.col("slope_post") * bpd)
                - (F.col("icept_pre") + F.col("slope_pre") * bpd)
            )
            / F.lit(1e2)
        ).alias("level_change"),
    )


def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C93 — R/S Hurst exponent of daily order revenue (block sizes
    8-64 days; per-size mean R/S plus the fitted H on each row)."""
    orders = catalog.load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e2)).cast("bigint")
        ).alias("cents")
    )
    return timeseries.hurst_rs(daily, "day_num", "cents")


def cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C94 — lead/lag cross-correlation between the daily click-value
    and purchase-value series at lags -7..+7: does click activity
    lead purchases (and by how many days)? The two-series complement
    of C40's ACF."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(
        F.coalesce(
            dsum(F.when(F.col("event_type") == "click", F.col("value"))),
            F.lit(0.0),
        ).alias("click_value"),
        F.coalesce(
            dsum(F.when(F.col("event_type") == "purchase", F.col("value"))),
            F.lit(0.0),
        ).alias("purchase_value"),
    )
    return timeseries.ccf(
        daily, "day_num", "click_value", "purchase_value", max_lag=7
    ).orderBy("lag")


def spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C95 — folded-phase spectrum (periods 2..16) + spectral entropy
    of the daily event-value series: one-number periodicity-vs-noise
    texture, trig-free for cross-engine exactness."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_num")
    ).agg(dsum("value").alias("daily_value"))
    return timeseries.spectral_entropy(
        daily, "day_num", "daily_value", max_period=16
    )


def ar1_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C96 — AR(1) shock-decay fit per event type on the daily value
    series: lag-1 slope phi and mean-reversion half-life."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_num"),
    ).agg(dsum("value").alias("daily_value"))
    return timeseries.ar1_halflife(
        daily, "day_num", "event_type", "daily_value"
    ).orderBy("event_type")


def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C97 — behavioral predictability of the event stream: Shannon
    entropy of each event type's OUTGOING transition distribution
    (from C21's Markov matrix) plus the stationary-weighted entropy
    rate repeated on every row. Low row entropy = deterministic
    next-step behavior (funnels); the rate is the one-number
    "how predictable is the stream" readout used to compare cohorts
    or detect bot traffic.

    Exactness: transition counts are exact ints; ln(p) quantizes to
    micro-nats per cell before the integer fold (entropy_by_group's
    scheme); weights and the rate are fixed-order exact-int
    divisions.

    Plan: C21's one key-window shuffle + |types|^2 aggregate; the
    entropy stage works entirely on the types-bounded matrix.
    """
    ev = catalog.load(spark, sf_dir, "events")
    counts = timeseries.transition_counts(
        ev, "user_id", "ts", "event_type", "event_id"
    ).select("from_type", "to_type", "n_steps")
    wf = Window.partitionBy("from_type")
    cells = counts.withColumn(
        "row_n", F.sum("n_steps").over(wf)
    ).withColumn(
        "qlp",
        F.floor(
            F.log(
                F.col("n_steps").cast("double") / F.col("row_n").cast("double")
            )
            * F.lit(1e6)
        ).cast("bigint"),
    )
    per_from = cells.groupBy("from_type").agg(
        F.max("row_n").cast("bigint").alias("n_out"),
        F.count(F.lit(1)).cast("bigint").alias("n_targets"),
        F.sum(F.col("n_steps") * F.col("qlp")).alias("sum_nqlp"),
    )
    ent = (
        -F.col("sum_nqlp").cast("double")
        / F.col("n_out").cast("double")
        / F.lit(1e6)
    )
    per_from = per_from.select(
        "from_type", "n_out", "n_targets", ent.alias("entropy")
    )
    tot = per_from.agg(
        F.sum("n_out").cast("bigint").alias("nn"),
        F.sum(
            F.floor(
                F.col("entropy")
                * F.col("n_out").cast("double")
                * F.lit(1e6)
            ).cast("bigint")
        ).alias("qsum"),
    ).select(
        (
            F.col("qsum").cast("double")
            / F.col("nn").cast("double")
            / F.lit(1e6)
        ).alias("entropy_rate")
    )
    return (
        per_from.join(F.broadcast(tot))
        .select("from_type", "n_out", "n_targets", "entropy", "entropy_rate")
        .orderBy("from_type")
    )


def weekly_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C98 — timetable-shift detector: per calendar week, the
    Jensen-Shannon divergence between that week's day-of-week event
    distribution and the corpus-global profile. A quiet weekly JSD
    says the rhythm is stable; spikes flag schedule changes,
    outages or bot bursts that C24's static heatmap averages away.

    Exactness: the F27 JSD scheme — ln(p/m) quantizes to micro-nats
    per cell, reductions are exact integer folds, one fixed-order
    double readout per week. The week x 7-dow grid is completed
    explicitly so partial weeks score against the full profile.

    Plan: one (week, dow) fact aggregate; the grid, global profile
    and readout all live on calendar-bounded frames (weeks x 7
    rows) with broadcast joins.
    """
    ev = catalog.load(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("week", F.col("ts").cast("timestamp")).alias("wk"),
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"),
    )
    weekly = base.groupBy("wk", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tw = weekly.groupBy("wk").agg(F.sum("n").cast("bigint").alias("tw"))
    gd = base.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("g")
    )
    nn = base.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    grid = tw.crossJoin(F.broadcast(gd)).crossJoin(F.broadcast(nn))
    cells = grid.join(weekly, ["wk", "dow"], "left").select(
        "wk",
        "dow",
        "tw",
        "g",
        "nn",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    pa = F.col("n").cast("double") / F.col("tw").cast("double")
    pb = F.col("g").cast("double") / F.col("nn").cast("double")
    m = (pa + pb) / F.lit(2.0)
    qa = F.when(
        F.col("n") > 0, F.floor(F.log(pa / m) * F.lit(1e6)).cast("bigint")
    ).otherwise(F.lit(0))
    qb = F.floor(F.log(pb / m) * F.lit(1e6)).cast("bigint")
    agg = cells.groupBy("wk", "tw", "nn").agg(
        F.sum(F.col("n") * qa).alias("sa"),
        F.sum(F.col("g") * qb).alias("sb"),
    )
    js = (
        F.col("sa").cast("double") / F.col("tw").cast("double")
        + F.col("sb").cast("double") / F.col("nn").cast("double")
    ) / F.lit(2e6)
    return agg.select(
        F.col("wk").alias("week_start"),
        F.col("tw").alias("n_events"),
        js.alias("js_divergence"),
    ).orderBy("week_start")


def dow_hour_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C99 — two-way activity decomposition: does the hourly shape
    change by weekday, or do day-of-week and hour-of-day act
    independently? Per (dow, hour) cell: observed events, the
    independence expectation row_total*col_total/N, and the
    standardized residual; one chi2/N (mean-square contingency phi^2)
    readout repeated per row. High phi^2 = the heatmap's shape is
    day-dependent and C24's marginal profiles mislead.

    Exactness: counts exact; expectation and residual are fixed-
    order exact-int doubles; phi^2 folds a 1e-9-quantized integer.

    Plan: one (dow, hour) aggregate (<=168 cells); margins and the
    fold are windows over that bounded table.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"),
        F.hour(F.col("ts").cast("timestamp")).alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    wd = Window.partitionBy("dow")
    wh = Window.partitionBy("hour")
    wa = Window.partitionBy()
    m = (
        cells.withColumn("dn", F.sum("obs").over(wd))
        .withColumn("hn", F.sum("obs").over(wh))
        .withColumn("nn", F.sum("obs").over(wa))
    )
    exp = (
        F.col("dn").cast("double")
        * F.col("hn").cast("double")
        / F.col("nn").cast("double")
    )
    resid = (F.col("obs").cast("double") - exp) / F.sqrt(exp)
    scored = m.withColumn("expected", exp).withColumn(
        "std_residual", resid
    ).withColumn(
        "qchi", F.floor(resid * resid * F.lit(1e9)).cast("bigint")
    )
    return scored.withColumn(
        "phi2",
        F.sum("qchi").over(wa).cast("double")
        / F.lit(1e9)
        / F.col("nn").cast("double"),
    ).select(
        "dow", "hour", "obs", "expected", "std_residual", "phi2"
    ).orderBy("dow", "hour")


def burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C100 — per-user Goh-Barabasi burstiness B = (s-m)/(s+m) of
    interarrival gaps: metronome vs Poisson vs bursty triage."""
    ev = catalog.load(spark, sf_dir, "events")
    return timeseries.burstiness_index(ev, "user_id", "ts").orderBy(
        "user_id"
    )


def seasonality_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C101 — is each event type's weekly rhythm STATIONARY? Per
    type, the Jensen-Shannon divergence between the first-half and
    second-half day-of-week distributions (calendar midpoint split).
    C98 scans week-by-week against the global profile; this is the
    per-type before/after answer — a high value means C36/C42
    seasonal models fitted on the full window are blending two
    different regimes.

    Exactness: the F27 JSD scheme over an explicit type x 7-dow
    grid (zero cells kept — a dow present in only one half still
    contributes through the mixture); micro-nat integer folds, one
    double readout per type.

    Plan: one (type, dow, half) aggregate, grid completion and the
    fold on types x 7 rows — all broadcast-scale.
    """
    ev = catalog.load(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("et"),
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    mid = base.agg(
        F.floor((F.min("d") + F.max("d")) / F.lit(2)).alias("mid")
    )
    halves = base.crossJoin(F.broadcast(mid)).select(
        "et", "dow", (F.col("d") <= F.col("mid")).alias("h1")
    )
    cells = halves.groupBy("et", "dow").agg(
        F.sum(F.when(F.col("h1"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~F.col("h1"), 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    grid = (
        cells.select("et")
        .distinct()
        .crossJoin(
            F.broadcast(
                cells.select("dow").distinct()
            )
        )
        .join(cells, ["et", "dow"], "left")
        .select(
            "et",
            "dow",
            F.coalesce(F.col("n1"), F.lit(0)).alias("n1"),
            F.coalesce(F.col("n2"), F.lit(0)).alias("n2"),
        )
    )
    we = Window.partitionBy("et")
    g = grid.withColumn("t1", F.sum("n1").over(we)).withColumn(
        "t2", F.sum("n2").over(we)
    )
    pa = F.col("n1").cast("double") / F.col("t1").cast("double")
    pb = F.col("n2").cast("double") / F.col("t2").cast("double")
    m = (pa + pb) / F.lit(2.0)
    qa = F.when(
        F.col("n1") > 0, F.floor(F.log(pa / m) * F.lit(1e6)).cast("bigint")
    ).otherwise(F.lit(0))
    qb = F.when(
        F.col("n2") > 0, F.floor(F.log(pb / m) * F.lit(1e6)).cast("bigint")
    ).otherwise(F.lit(0))
    agg = g.groupBy("et", "t1", "t2").agg(
        F.sum(F.col("n1") * qa).alias("sa"),
        F.sum(F.col("n2") * qb).alias("sb"),
    )
    js = (
        F.col("sa").cast("double") / F.col("t1").cast("double")
        + F.col("sb").cast("double") / F.col("t2").cast("double")
    ) / F.lit(2e6)
    return agg.select(
        F.col("et").alias("event_type"),
        F.col("t1").alias("n_first_half"),
        F.col("t2").alias("n_second_half"),
        js.alias("js_divergence"),
    ).orderBy("event_type")


def anomaly_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C102 — spike or shift? Per event type, z-score the daily value
    series (|z| > 2 flags), then classify flagged days into isolated
    spikes vs persistent runs (>= 2 consecutive flagged days). C11
    lists the anomalies; this says whether they're transient noise
    (alert fatigue) or level shifts worth a changepoint follow-up.

    Exactness: z uses exact integer moments (micro-quantized daily
    values) in one fixed-order double chain; run grouping is the
    exact integer day - rank trick; all counts exact.

    Plan: one (type, day) aggregate; moments per type on the
    calendar-bounded frame; run detection via one type-partitioned
    window over flagged days only.
    """
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.floor(dsum("value") * F.lit(1e6)).cast("bigint").alias("q")
    )
    mom = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sx"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / F.lit(1e6) / n
    sig = (
        F.sqrt(
            n * (F.col("sxx").cast("double") / F.lit(1e12))
            - (F.col("sx").cast("double") / F.lit(1e6))
            * (F.col("sx").cast("double") / F.lit(1e6))
        )
        / n
    )
    z = (F.col("q").cast("double") / F.lit(1e6) - F.col("mu")) / F.col("sig")
    flagged = (
        daily.join(
            F.broadcast(mom.select("et", mu.alias("mu"), sig.alias("sig"))),
            "et",
        )
        .where((z > 2.0) | (z < -2.0))
        .select("et", "d")
    )
    wr = Window.partitionBy("et").orderBy("d")
    runs = flagged.select(
        "et", (F.col("d") - F.row_number().over(wr)).alias("grp")
    ).groupBy("et", "grp").agg(F.count(F.lit(1)).cast("bigint").alias("rl"))
    return (
        runs.groupBy(F.col("et").alias("event_type"))
        .agg(
            F.sum("rl").cast("bigint").alias("n_flagged_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.sum(F.when(F.col("rl") >= 2, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_persistent_runs"),
            F.max("rl").cast("bigint").alias("max_run_days"),
        )
        .select(
            "event_type",
            "n_flagged_days",
            "n_runs",
            "n_persistent_runs",
            "max_run_days",
            (
                (F.col("n_runs") - F.col("n_persistent_runs")).cast("double")
                / F.col("n_runs").cast("double")
            ).alias("isolated_share"),
        )
        .orderBy("event_type")
    )


def volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C103 — event-driven (volume) bars: per event type, close a bar
    every time cumulative value crosses 1/20 of the type's total, and
    report each bar's OHLC, event count, and value. C10's bars are
    clock-aligned; these are information-aligned (equal value per
    bar, the tick/volume-bar sampling used to de-cluster bursty
    series before modeling).

    Exactness: values are micro-quantized once; the running total and
    the bar threshold are pure integer arithmetic, so bar membership
    is engine-exact; OHLC picks raw doubles by exact integer rank.

    Plan: ONE keyed distributed_cumsum pass emits both the per-type
    running sum and sequence number (range-partitioned local
    prefix sums + broadcast offsets — bit-identical to the type-
    partitioned window form, without holding a whole type's events in
    one task at 100 TB), then one (type, bar) aggregate; open/close
    via min_by/max_by on the exact rank — no second window.
    """
    from icecube_spark.operators.pipeline import distributed_cumsum

    ev = catalog.load(spark, sf_dir, "events")
    base = distributed_cumsum(
        ev.select(
            "event_type",
            "ts",
            "event_id",
            "value",
            F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("q"),
        ),
        ["ts", "event_id"],
        "q",
        cum_col="cum",
        key_cols=["event_type"],
        rank_col="rn",
    ).withColumn("cum_before", F.col("cum") - F.col("q"))
    totals = base.groupBy("event_type").agg(
        F.greatest(
            F.expr("sum(q) div 20").cast("bigint"), F.lit(1).cast("bigint")
        ).alias("thr")
    )
    barred = base.join(F.broadcast(totals), "event_type").select(
        "event_type",
        F.expr("cum_before div thr").cast("bigint").alias("bar"),
        "rn",
        "value",
        "q",
    )
    return (
        barred.groupBy("event_type", "bar")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min_by("value", "rn").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "rn").alias("close"),
            (F.sum("q").cast("double") / F.lit(1e6)).alias("bar_value"),
        )
        .orderBy("event_type", "bar")
    )


def first_passage_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C104 — first-passage analysis: per user, days from their first
    event until cumulative value first crosses 300, cohorted by the
    type of their first event. C16 tracks WHO stays active; this
    tracks HOW FAST accounts accumulate to a milestone (time-to-value
    — the activation metric growth teams pair with retention).

    Exactness: the running total folds micro-quantized integers, so
    the crossing row is engine-exact; day gaps and the per-cohort
    mean divide exact integers.

    Plan: one user-partitioned window (running sum + first-row
    marker), a crossing filter, one cohort aggregate over <= users
    rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("q"),
    ).withColumns(
        {
            "rn": F.row_number().over(w),
            "cum": F.sum("q").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        }
    )
    firsts = base.where(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("cohort"),
        F.to_date("ts").alias("first_day"),
    )
    crossings = (
        base.where(F.col("cum") >= 300_000_000)
        .groupBy("user_id")
        .agg(F.min_by(F.to_date("ts"), "rn").alias("cross_day"))
    )
    joined = firsts.join(crossings, "user_id", "left").select(
        "cohort",
        F.datediff(F.col("cross_day"), F.col("first_day")).alias("days"),
    )
    return (
        joined.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.count("days").cast("bigint").alias("n_crossed"),
            (
                F.count("days").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("crossed_share"),
            (
                F.sum("days").cast("double") / F.count("days").cast("double")
            ).alias("mean_days_to_cross"),
            F.max("days").cast("bigint").alias("max_days_to_cross"),
        )
        .orderBy("cohort")
    )


def retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C105 — exponential retention fit: per weekly signup cohort,
    regress ln(retention share) on week offset and report the decay
    rate and half-life in weeks. C16 tabulates the retention matrix;
    this compresses each cohort's row into the two numbers a growth
    model actually consumes (lambda, t-half).

    Exactness: shares are exact count ratios; ln() is quantized once
    per cell (floor(ln(r)*1e6) micro-nats, the unigram_logprob
    discipline) so the regression folds exact integers; the one
    remaining double chain is fixed-order.

    Plan: two distinct-user aggregates (cohort size, cohort-offset
    activity), one cohort-level regression fold over <= weeks^2 rows.
    """
    ev = catalog.load(spark, sf_dir, "events")
    origin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    wk = ev.crossJoin(F.broadcast(origin)).select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.col("d0")) / F.lit(7)
        ).cast("bigint").alias("wkidx"),
    )
    first = wk.groupBy("user_id").agg(F.min("wkidx").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    active = (
        wk.join(first, "user_id")
        .select(
            "cohort", (F.col("wkidx") - F.col("cohort")).alias("k"), "user_id"
        )
        .groupBy("cohort", "k")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    pts = (
        active.join(sizes, "cohort")
        .where(F.col("n_active") > 0)
        .select(
            "cohort",
            "k",
            F.floor(
                F.log(
                    F.col("n_active").cast("double")
                    / F.col("n_users").cast("double")
                )
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    mom = pts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.sum("k").alias("sx"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("k")).alias("sxx"),
        F.sum("lq").alias("sy"),
        F.sum(F.col("k").cast("decimal(38,0)") * F.col("lq")).alias("sxy"),
    )
    n = F.col("n_weeks").cast("double")
    num = n * (F.col("sxy").cast("double") / F.lit(1e6)) - F.col("sx").cast(
        "double"
    ) * (F.col("sy").cast("double") / F.lit(1e6))
    den = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    lam = num / den
    return (
        mom.where(F.col("n_weeks") >= 3)
        .select("cohort", "n_weeks", lam.alias("decay_per_week"))
        .where(F.col("decay_per_week") != 0)
        .select(
            "cohort",
            "n_weeks",
            "decay_per_week",
            (F.lit(-0.6931471805599453) / F.col("decay_per_week")).alias(
                "halflife_weeks"
            ),
        )
        .orderBy("cohort")
    )


def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C106 — concurrency load profile: how many 30-min-gap sessions
    (C2's definition) touch each hour of day, across how many days,
    and the resulting average concurrent-session load per active
    hour. C24's heatmap counts EVENTS; capacity planning needs
    SESSIONS-in-flight, which is what a connection pool or stateful-
    stream operator actually holds.

    Exactness: session bounds come from the exact C2 window; the
    hour fanout is integer timestamp arithmetic; counts and the one
    ratio are exact.

    Plan: the C2 session window, a per-session aggregate, a bounded
    hour-sequence explode (sessions are gap-bounded, so the fanout
    per session is small), one 24-row aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    s = timeseries.sessionize(ev, "ts", "user_id")
    sess = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    touched = sess.select(
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', st), date_trunc('hour', en),"
                " interval 1 hour)"
            )
        ).alias("h")
    )
    return (
        touched.groupBy(F.hour("h").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("session_hours"),
            F.countDistinct(F.to_date("h")).cast("bigint").alias("n_days"),
        )
        .select(
            "hour_of_day",
            "session_hours",
            "n_days",
            (
                F.col("session_hours").cast("double")
                / F.col("n_days").cast("double")
            ).alias("avg_concurrent"),
        )
        .orderBy("hour_of_day")
    )


def peak_hour_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C107 — is the daily traffic peak stable? Per day, find the
    argmax activity hour (ties to the earlier hour), then report the
    distribution of peak hours across days with each hour's share.
    C24's heatmap shows average shape; capacity planning needs to
    know whether the peak MOVES (a fat peak-hour histogram = no
    single provisioning window).

    Exactness: argmax by exact counts with deterministic tie-break;
    shares divide exact integers.

    Plan: one (day, hour) count, one day-partitioned rank window
    (days bound the partitions), one 24-row-max aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "hr")
    peaks = hourly.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    wall = Window.partitionBy()
    return (
        peaks.groupBy(F.col("hr").alias("peak_hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
        .select(
            "peak_hour",
            "n_days",
            (
                F.col("n_days").cast("double")
                / F.sum("n_days").over(wall).cast("double")
            ).alias("day_share"),
        )
        .orderBy("peak_hour")
    )


def type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C108 — event-type affinity: for each ordered type pair, the
    lift between "user does A" and "user does B" (observed co-users
    over independence expectation). B29 computes lift on basket
    items; this is the behavioral analogue over the event stream —
    which activities travel together across USERS, the input to any
    feature-bundling or cross-promotion call.

    Exactness: all counts are exact distinct-user integers; lift and
    support divide exact integers.

    Plan: one distinct (user, type) frame, a type-keyed self-join
    (types bound the fanout), two tiny broadcast marginals.
    """
    ev = catalog.load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    marg = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    tot = ut.agg(F.countDistinct("user_id").cast("bigint").alias("n_all"))
    a = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("ta"))
    b = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("tb"))
    both = (
        a.join(b, "u")
        .where(F.col("ta") != F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    ma = marg.select(F.col("event_type").alias("ta"), F.col("n_users").alias("na"))
    mb = marg.select(F.col("event_type").alias("tb"), F.col("n_users").alias("nb"))
    return (
        both.join(F.broadcast(ma), "ta")
        .join(F.broadcast(mb), "tb")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n_both",
            (
                F.col("n_both").cast("double")
                / F.col("n_all").cast("double")
            ).alias("support"),
            (
                F.col("n_both").cast("double")
                * F.col("n_all").cast("double")
                / (
                    F.col("na").cast("double")
                    * F.col("nb").cast("double")
                )
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


def anomaly_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C109 — do anomalies travel together? For each event-type pair,
    the Jaccard overlap of their |z| > 2 daily-anomaly day sets
    (C11's flags). Shared anomaly days point at a common external
    driver (outage, campaign); disjoint sets say the alerts are
    independent and should page different owners.

    Exactness: the flag sets replay C102's exact integer-moment
    z-scores; overlaps and Jaccard divide exact counts.

    Plan: one (type, day) aggregate + per-type moments (C102's
    shape), then a day-keyed self-join of the small flagged frame
    and a <=types² rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.floor(dsum("value") * F.lit(1e6)).cast("bigint").alias("q")
    )
    mom = daily.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sx"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    mu = F.col("sx").cast("double") / F.lit(1e6) / n
    sig = (
        F.sqrt(
            F.greatest(
                n * (F.col("sxx").cast("double") / F.lit(1e12))
                - (F.col("sx").cast("double") / F.lit(1e6))
                * (F.col("sx").cast("double") / F.lit(1e6)),
                F.lit(0.0),
            )
        )
        / n
    )
    z = (F.col("q").cast("double") / F.lit(1e6) - F.col("mu")) / F.col("sig")
    flagged = (
        daily.join(
            F.broadcast(mom.select("et", mu.alias("mu"), sig.alias("sig"))),
            "et",
        )
        .where(F.col("sig") > 0)
        .where((z > 2.0) | (z < -2.0))
        .select("et", "d")
    )
    sizes = flagged.groupBy("et").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    a = flagged.select(F.col("et").alias("ta"), "d")
    b = flagged.select(F.col("et").alias("tb"), "d")
    inter = (
        a.join(b, "d")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("et").alias("ta"), F.col("n_days").alias("na"))
    sb = sizes.select(F.col("et").alias("tb"), F.col("n_days").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n_shared",
            "na",
            "nb",
            (
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def value_concentration_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C110 — whale concentration over time: per day, the share of
    total event value produced by that day's top-10% users. A rising
    line means the platform increasingly depends on a few heavy
    accounts — the concentration-risk time series behind B30's
    static Pareto snapshot.

    Exactness: daily per-user sums are micro-quantized integers;
    rank cuts are exact integer windows; shares divide exact sums.

    Plan: one (day, user) aggregate, then per-day ranks via the keyed
    distributed_rank — a day-partitioned window would hold a whole
    day's user rows in ONE task at 100 TB; the range-partitioned form
    splits big days across tasks (bit-identical to the window form).
    """
    from icecube_spark.operators.pipeline import distributed_rank

    ev = catalog.load(spark, sf_dir, "events")
    du = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("user_id")
    ).agg(F.floor(dsum("value") * F.lit(1e6)).cast("bigint").alias("q"))
    ranked = distributed_rank(
        du,
        [F.col("q").desc(), F.col("user_id").asc()],
        rank_col="rk",
        n_col="n_users",
        key_cols=["day"],
    )
    return (
        ranked.groupBy("day")
        .agg(
            F.max("n_users").cast("bigint").alias("n_users"),
            (
                F.sum(
                    F.when(
                        F.col("rk") <= F.expr("n_users div 10 + 1"),
                        F.col("q"),
                    )
                ).cast("double")
                / F.sum("q").cast("double")
            ).alias("top_decile_share"),
        )
        .orderBy("day")
    )


def transition_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C111 — transition response time: for each consecutive
    same-user event pair with a TYPE change, the latency from A to B
    — count, mean, and max seconds per directed (from, to) pair.
    C21 counts the transitions; this times them, which is what an
    SLA or journey-optimization review actually needs.

    Exactness: latencies are exact integer seconds from the same
    user-window lag both engines order identically; the mean divides
    exact integer sums.

    Plan: one user-partitioned lag window, one bounded (from, to)
    aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
        (
            F.unix_timestamp(F.col("ts"))
            - F.unix_timestamp(F.lag("ts").over(w))
        ).cast("bigint").alias("lat"),
    ).where(
        F.col("from_type").isNotNull()
        & (F.col("from_type") != F.col("to_type"))
    )
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            (
                F.sum("lat").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_latency_s"),
            F.max("lat").cast("bigint").alias("max_latency_s"),
        )
        .orderBy("from_type", "to_type")
    )


def lifecycle_value_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C112 — value by account age: per week-since-first-event, how
    many users are that old, total value produced, and per-user mean
    — the activation-economics curve (does week-2 value hold up?)
    that C16's retention counts can't show because it ignores value.

    Exactness: per-week value folds micro-quantized integers; the
    per-user mean divides exact sums.

    Plan: one user-min aggregate, a broadcast-free join back on the
    user key, one (week) rollup over the calendar-bounded frame.
    """
    ev = catalog.load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    aged = ev.join(firsts, "user_id").select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.col("d0")) / F.lit(7)
        ).cast("bigint").alias("week_age"),
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("q"),
    )
    return (
        aged.groupBy("week_age")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum("q").cast("double") / F.lit(1e6)).alias("total_value"),
            (
                F.sum("q").cast("double")
                / F.lit(1e6)
                / F.countDistinct("user_id").cast("double")
            ).alias("value_per_user"),
        )
        .orderBy("week_age")
    )


def weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C113 — weekend engagement lift per event type: weekday vs
    weekend event counts and mean values, and the weekend/weekday
    value ratio. The day-class contrast every traffic-shaping and
    capacity plan starts from — coarser than C99's full dow-hour
    surface, but directly actionable (one number per type).

    Exactness: conditional means fold DECIMAL(18,8) sums over exact
    counts; the lift divides two such doubles.

    Plan: ONE (event_type) aggregate with conditional folds — no
    second pass, no join; groups bounded by the type vocabulary.
    """
    ev = catalog.load(spark, sf_dir, "events")
    wknd = F.dayofweek(F.col("ts").cast("timestamp")).isin(1, 7)
    dec = F.col("value").cast("decimal(18,8)")
    per = ev.groupBy("event_type").agg(
        F.sum(F.when(~wknd, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_weekday"),
        F.sum(F.when(wknd, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("n_weekend"),
        (
            F.sum(F.when(~wknd, dec)).cast("double")
            / F.sum(F.when(~wknd, F.lit(1))).cast("double")
        ).alias("weekday_mean"),
        (
            F.sum(F.when(wknd, dec)).cast("double")
            / F.sum(F.when(wknd, F.lit(1))).cast("double")
        ).alias("weekend_mean"),
    )
    return per.select(
        "event_type", "n_weekday", "n_weekend", "weekday_mean",
        "weekend_mean",
        (F.col("weekend_mean") / F.col("weekday_mean")).alias("weekend_lift"),
    ).orderBy("event_type")


def type_mix_entropy_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C114 — is the event-type mix homogenizing or diversifying?
    Daily Shannon entropy of the type distribution (micro-nat
    quantized) and its OLS slope over the day axis, one summary row.
    A collapsing mix (negative slope) usually means one producer is
    drowning the stream — the temporal twin of P10's static source
    mix.

    Exactness: per-day entropy uses the F45/G11 integer scheme
    (floor(n·ln n·1e6) folds, H = ln(total) − s/total/1e6, floored to
    micro-nats); the slope runs the C15 normal-equation integer folds
    on (day index, micro-nat) pairs — no decimal casts anywhere.

    Plan: one (day, type) aggregate, one day rollup (31 rows), one
    1-row summary.
    """
    ev = catalog.load(spark, sf_dir, "events")
    per = ev.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = per.groupBy("day").agg(
        F.sum("n").alias("total"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.floor(
                    F.col("n").cast("double")
                    * F.log(F.col("n").cast("double")) * F.lit(1e6)
                ).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("s"),
    )
    q = daily.select(
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).alias("x"),
        F.floor(
            (
                F.log(F.col("total").cast("double"))
                - F.col("s").cast("double") / F.col("total").cast("double")
                / F.lit(1e6)
            )
            * F.lit(1e6)
        ).cast("bigint").alias("qh"),
    )
    stats = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("qh").alias("sy"),
        F.sum(F.col("x") * F.col("qh")).alias("sxy"),
    )
    n = F.col("n_days")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return stats.select(
        "n_days",
        (
            F.col("sy").cast("double") / n.cast("double") / F.lit(1e6)
        ).alias("mean_entropy"),
        (
            num.cast("double") / den.cast("double") / F.lit(1e6)
        ).alias("entropy_slope_per_day"),
    )


def gap_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C115 — per-type arrival regularity: for users with >= 3 events
    of a type, the coefficient of variation of their inter-arrival
    gaps (minutes), averaged per type, plus the share of "regular"
    users (CV < 0.5). Regular arrivals are schedulers/bots; bursty
    ones are humans — the per-user companion to C86's global
    interarrival fit.

    Exactness: gaps floor to whole minutes (exact BIGINTs); CV uses
    the integer normal-equation moments (n·Σg² − (Σg)², minute scale
    keeps every product < 2^63 at any SF) with one sqrt/div at the
    end; per-type means fold floor(CV·1e6) integers.

    Plan: one (type, user) ordered window for gaps, one (type, user)
    moment aggregate, one type rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt = F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
    gaps = (
        ev.select(
            "event_type", "user_id",
            F.expr(
                "(({nxt}) - ({us})) div 60000000".format(
                    nxt="unix_micros(cast(lead(ts) over "
                        "(partition by event_type, user_id "
                        "order by ts, event_id) as timestamp))",
                    us="unix_micros(cast(ts as timestamp))",
                )
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    mom = gaps.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    ).where((F.col("n") >= 2) & (F.col("sg") > 0))
    qcv = F.floor(
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                (F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg"))
                .cast("double"),
            )
        )
        / F.col("sg").cast("double") * F.lit(1e6)
    ).cast("bigint")
    scored = mom.select("event_type", qcv.alias("qcv"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            (
                F.sum("qcv").cast("double")
                / F.count(F.lit(1)).cast("double") / F.lit(1e6)
            ).alias("mean_cv"),
            (
                F.sum(
                    F.when(F.col("qcv") < 500000, F.lit(1)).otherwise(F.lit(0))
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("regular_share"),
        )
        .orderBy("event_type")
    )


def daily_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C116 — growth quality per day: events attributable to users on
    their FIRST active day vs returning users, and the new share.
    A stream whose traffic is mostly first-day users is acquisition-
    driven; mostly-returning is engagement-driven — the daily
    decomposition behind C16's cohort matrix.

    Exactness: counts only; the share divides exact counts.

    Plan: one (user) min-day aggregate joined back on user (same
    key — co-located at scale via bucketing), one day rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    # date_trunc (timestamp) not cast-to-DATE: Spark DATE comes back
    # as pandas object dtype and hash-mismatches the oracle's datetime64
    days = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    tagged = days.join(first, "user_id").select(
        "day", (F.col("day") == F.col("first_day")).alias("is_new")
    )
    return (
        tagged.groupBy("day")
        .agg(
            F.sum(F.when(F.col("is_new"), F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint").alias("new_user_events"),
            F.sum(F.when(~F.col("is_new"), F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint").alias("returning_events"),
            (
                F.sum(
                    F.when(F.col("is_new"), F.lit(1)).otherwise(F.lit(0))
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("new_share"),
        )
        .orderBy("day")
    )


def round_value_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C117 — round-number bias per event type: the share of values
    landing exactly on multiples of 10 and of 100 (cent precision).
    Human-entered and synthetic values cluster on round numbers;
    organic measurements don't — the complement to C67's Benford
    first-digit test for fraud/synthetic-data triage.

    Exactness: values quantize to exact cents; multiples are integer
    modulo tests; shares divide exact counts.

    Plan: ONE map-side-combinable aggregate per type.
    """
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * F.lit(100.0)).cast("bigint")
    per = ev.select("event_type", cents.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(
            F.when(F.col("c") % 1000 == 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_mult10"),
        F.sum(
            F.when(F.col("c") % 10000 == 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_mult100"),
    )
    return per.select(
        "event_type", "n_values", "n_mult10", "n_mult100",
        (
            F.col("n_mult10").cast("double") / F.col("n_values").cast("double")
        ).alias("mult10_share"),
        (
            F.col("n_mult100").cast("double") / F.col("n_values").cast("double")
        ).alias("mult100_share"),
    ).orderBy("event_type")


def interarrival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C118 — empirical hazard curve of event inter-arrivals: for
    wait-time buckets (minutes), P(next event arrives in this bucket
    | waited this long) = bucket count / at-risk count. A flat hazard
    is memoryless (Poisson); a rising one means overdue events
    cluster — the actionable transform of C86's distribution fit.

    Exactness: gaps floor to whole minutes; the at-risk denominator
    is a suffix sum of exact counts; one division per bucket.

    Plan: one ordered window for gaps (per user), one bucket
    aggregate, one suffix window over the bucket-bounded frame.
    """
    ev = catalog.load(spark, sf_dir, "events")
    g = F.expr(
        "(unix_micros(cast(lead(ts) over (partition by user_id"
        " order by ts, event_id) as timestamp))"
        " - unix_micros(cast(ts as timestamp))) div 60000000"
    )
    gaps = ev.select("user_id", g.alias("g")).where(F.col("g").isNotNull())
    # bucket = min(g div 5, 12): 5-minute buckets, 1h+ tail pooled
    b = F.least(F.expr("g div 5"), F.lit(12)).cast("int")
    per = gaps.select(b.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in_bucket")
    )
    w = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return per.select(
        "bucket",
        "n_in_bucket",
        F.sum("n_in_bucket").over(w).cast("bigint").alias("n_at_risk"),
        (
            F.col("n_in_bucket").cast("double")
            / F.sum("n_in_bucket").over(w).cast("double")
        ).alias("hazard"),
    ).orderBy("bucket")


def session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C119 — session depth distribution: sessions (30-minute
    inactivity gap, the C2 rule) bucketed by event count, with the
    share of sessions and of events each depth bucket carries.
    Depth-1 bounce mass vs long-tail marathon sessions is the
    engagement-shape read behind C63's bounce rate.

    Exactness: sessionization is integer gap logic (the C2 window);
    buckets are exact integer caps; shares divide exact counts.

    Plan: one per-user ordered window (new-session flags), a running
    session-id sum over the same window, one (session) count, one
    bucket rollup.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    )
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    depth = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("depth")
    )
    bucket = F.least(F.col("depth"), F.lit(10)).cast("int")
    per = depth.select(bucket.alias("depth_bucket"), "depth").groupBy(
        "depth_bucket"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("depth").cast("bigint").alias("n_events"),
    )
    wall = Window.partitionBy()
    return per.select(
        "depth_bucket", "n_sessions", "n_events",
        (
            F.col("n_sessions").cast("double")
            / F.sum("n_sessions").over(wall).cast("double")
        ).alias("session_share"),
        (
            F.col("n_events").cast("double")
            / F.sum("n_events").over(wall).cast("double")
        ).alias("event_share"),
    ).orderBy("depth_bucket")


def gap_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C120 — do bursts follow bursts? Lag-1 autocorrelation of
    consecutive inter-arrival gaps per event type (pairs (g_i,
    g_{i+1}) within a user's stream). Positive r1 = clustered/bursty
    arrivals, ~0 = memoryless — the sequential complement of C115's
    per-user regularity.

    Exactness: gaps floor to whole minutes; Pearson r folds the five
    integer moments (n, Σx, Σy, Σxy, Σx², Σy²) exactly (minute scale
    keeps every product < 2^63) and converts once at the end.

    Plan: two chained per-user windows (gap, then its successor),
    one type aggregate.
    """
    ev = catalog.load(spark, sf_dir, "events")
    w = "partition by event_type, user_id order by ts, event_id"
    g = F.expr(
        f"(unix_micros(cast(lead(ts) over ({w}) as timestamp))"
        " - unix_micros(cast(ts as timestamp))) div 60000000"
    )
    gaps = ev.select("event_type", "user_id", "ts", "event_id", g.alias("g"))
    w2 = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    pairs = gaps.select(
        "event_type",
        F.col("g").alias("x"),
        F.lead("g").over(w2).alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        (
            num
            / F.sqrt(F.greatest(F.lit(1.0), denx))
            / F.sqrt(F.greatest(F.lit(1.0), deny))
        ).alias("gap_autocorr_r1"),
    ).orderBy("event_type")


def revenue_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C121 — persistence spectrum of daily revenue: lengths of
    consecutive-observed-day runs above/below the global mean
    (gaps-and-islands), histogrammed by direction. Long above-mean
    runs are demand regimes, not noise — C88's runs_test z-score only
    counts runs; this is the full length distribution that shows
    WHERE the persistence lives.

    Exactness: daily revenue floors to micro-units; above/below uses
    the integer cross-product test qd·n > Σq (no float mean); run ids
    are differences of two ROW_NUMBERs.

    Plan: one day aggregate, two windows over the bounded day
    sequence (day count, not row count), two tiny rollups.
    """
    od = catalog.load(spark, sf_dir, "orders")
    daily = od.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d")).agg(
        F.floor(dsum("o_totalprice") * F.lit(1e6)).cast("bigint").alias("qd")
    )
    wall = Window.partitionBy()
    flagged = daily.select(
        "d",
        (F.col("qd") * F.count(F.lit(1)).over(wall) > F.sum("qd").over(wall))
        .alias("above"),
    )
    w1 = Window.partitionBy().orderBy("d")
    w2 = Window.partitionBy("above").orderBy("d")
    runs = flagged.select(
        "above",
        (F.row_number().over(w1) - F.row_number().over(w2)).alias("grp"),
    )
    per_run = runs.groupBy("above", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        per_run.groupBy("above", "run_len")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"))
        .select(
            F.when(F.col("above"), F.lit("above"))
            .otherwise(F.lit("below")).alias("direction"),
            F.col("run_len").cast("bigint").alias("run_len"),
            "n_runs",
        )
        .orderBy("direction", "run_len")
    )


def month_end_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C122 — calendar-edge demand artifact: per month, mean daily
    revenue over the last 3 calendar days vs the rest of the month,
    and their ratio. Quota-driven order batching shows up exactly
    here and contaminates any month-seasonality fit (C76/C91) that
    assumes within-month uniformity; C113's weekend lift can't see it
    because month edges move through the week.

    Exactness: daily revenue floors to micro-units; both means divide
    exact integer sums; the ratio is guarded so an end- or rest-empty
    month yields NULL identically in both engines.

    Plan: one day aggregate, one month rollup — both bounded keys.
    """
    od = catalog.load(spark, sf_dir, "orders")
    daily = od.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d")).agg(
        F.floor(dsum("o_totalprice") * F.lit(1e6)).cast("bigint").alias("qd")
    )
    is_end = F.datediff(F.last_day(F.to_date("d")), F.to_date("d")) <= 2
    per = daily.groupBy(F.date_trunc("month", F.col("d")).alias("month")).agg(
        F.sum(F.when(is_end, F.col("qd"))).alias("q_end"),
        F.count(F.when(is_end, F.lit(1))).alias("n_end"),
        F.sum(F.when(~is_end, F.col("qd"))).alias("q_rest"),
        F.count(F.when(~is_end, F.lit(1))).alias("n_rest"),
    )
    mean_end = F.col("q_end").cast("double") / F.col("n_end").cast("double") / F.lit(1e6)
    mean_rest = F.col("q_rest").cast("double") / F.col("n_rest").cast("double") / F.lit(1e6)
    return per.select(
        "month",
        F.col("n_end").cast("bigint").alias("n_end_days"),
        F.col("n_rest").cast("bigint").alias("n_rest_days"),
        mean_end.alias("mean_end_revenue"),
        mean_rest.alias("mean_rest_revenue"),
        F.when(
            (F.col("n_end") > 0) & (F.col("n_rest") > 0),
            mean_end / mean_rest,
        ).alias("end_lift"),
    ).orderBy("month")
